"""Lexical ranked retrieval (BM25) over a document table.

The vector side of this engine answers dense/sparse/binary ANN; this
module is the lexical complement — Okapi BM25 scoring of a literal
query against the whitespace-tokenized corpus, the standard first-stage
retriever next to embedding search in LLM data pipelines (and the
hybrid-retrieval partner of the ANN operators).

Scale shape (for literal queries, the common case — tens of terms):
per-term tf and dl are pure array-expression projections (no explode,
no shuffle, whole-stage codegen); the corpus statistics (N, avg doc
length, per-term document frequencies) reduce to ONE scalar row via a
single global aggregation whose partial combine runs map-side, then
broadcast back with a 1-row cross join.  Scoring is again a pure
projection, and the top-k is a TakeOrdered.  Net cost: two passes over
the corpus and k rows to the driver — no corpus-cardinality shuffle at
all.  (For query sets of thousands of terms an explode + term-keyed
join wins instead; that shape is `curation.unigram_lm_score`'s.)

Determinism: per-term score contributions are floored to 1e-6-scaled
integers before summation (see queries._scaled_sum's rationale), so
cross-engine float-sum ordering can never flip the ranking; ties break
on doc_id.

Reference analogue: none (pgvecto.rs delegates lexical search to
Postgres FTS); BM25 constants follow Robertson/Sparck-Jones with the
Lucene +1 idf floor.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .curation import _norm_tokens

__all__ = ["bm25_score", "bm25_topk"]


def _tf(toks: Column, term: str) -> Column:
    return F.size(F.filter(toks, lambda x: x == F.lit(term)))


def bm25_score(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Adds ``score_u`` (1e-6-scaled integer BM25 score vs the literal
    ``query_terms``) and ``dl`` (doc length in tokens) to every row.

    score = Σ_t idf_t · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)),
    idf_t = ln((N − df_t + 0.5)/(df_t + 0.5) + 1); each term's
    contribution is floored to a scaled integer, so the total is exact
    integer arithmetic.
    """
    toks = _norm_tokens(F.col(text_col))
    with_tf = df.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("dl"),
        *[_tf(toks, t).cast("long").alias(f"__tf_{i}") for i, t in enumerate(query_terms)],
    )
    stats = with_tf.agg(
        F.count(F.lit(1)).alias("__n_docs"),
        F.sum("dl").alias("__sum_dl"),
        *[
            F.sum((F.col(f"__tf_{i}") > 0).cast("long")).alias(f"__df_{i}")
            for i in range(len(query_terms))
        ],
    )
    scored = with_tf.crossJoin(F.broadcast(stats))
    avgdl = F.col("__sum_dl") / F.col("__n_docs")
    contribs = []
    for i in range(len(query_terms)):
        tf = F.col(f"__tf_{i}").cast("double")
        dfreq = F.col(f"__df_{i}").cast("double")
        idf = F.log(
            (F.col("__n_docs").cast("double") - dfreq + F.lit(0.5))
            / (dfreq + F.lit(0.5))
            + F.lit(1.0)
        )
        num = tf * F.lit(k1 + 1.0)
        denom = tf + F.lit(k1) * (
            F.lit(1.0 - b) + F.lit(b) * (F.col("dl").cast("double") / avgdl)
        )
        contribs.append(
            F.floor((idf * (num / denom)) * F.lit(1000000.0) + F.lit(0.5)).cast("long")
        )
    total = contribs[0]
    for c in contribs[1:]:
        total = total + c
    return scored.select(F.col(id_col), F.col("dl"), total.alias("score_u"))


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents by BM25 score (ties on doc id) — the ranked
    lexical retrieval query.  TakeOrdered keeps only k rows per
    partition before the single-partition merge."""
    scored = bm25_score(df, query_terms, text_col, id_col, k1, b)
    return scored.orderBy(F.desc("score_u"), id_col).limit(k)
