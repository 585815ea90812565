"""BM25 lexical retrieval (operators/retrieval.py) vs a pure-Python
reference implementation."""

from __future__ import annotations

import math

from pgvecto_rs_spark.operators.retrieval import bm25_score, bm25_topk


def _ref_bm25(corpus: dict[int, str], terms: list[str], k1=1.2, b=0.75):
    toks = {i: t.lower().split() for i, t in corpus.items()}
    n = len(corpus)
    avgdl = sum(len(t) for t in toks.values()) / n
    out = {}
    for i, t in toks.items():
        dl = len(t)
        s = 0
        for q in terms:
            tf = t.count(q)
            df = sum(1 for tt in toks.values() if q in tt)
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            num = tf * (k1 + 1.0)
            denom = tf + k1 * ((1.0 - b) + b * (dl / avgdl))
            s += math.floor((idf * (num / denom)) * 1000000.0 + 0.5)
        out[i] = s
    return out


class TestBM25:
    CORPUS = {
        1: "a b a",
        2: "b c",
        3: "c c c c",
        4: "d d",
    }

    def _df(self, spark):
        return spark.createDataFrame(
            [(i, t) for i, t in self.CORPUS.items()], "doc_id long, text string"
        )

    def test_scores_match_reference(self, spark):
        terms = ["a", "c"]
        got = {
            r["doc_id"]: r["score_u"]
            for r in bm25_score(self._df(spark), terms).collect()
        }
        assert got == _ref_bm25(self.CORPUS, terms)

    def test_topk_order_and_ties(self, spark):
        terms = ["a", "c"]
        ref = _ref_bm25(self.CORPUS, terms)
        want = sorted(ref, key=lambda i: (-ref[i], i))[:3]
        rows = bm25_topk(self._df(spark), terms, k=3).collect()
        assert [r["doc_id"] for r in rows] == want

    def test_absent_term_scores_zero(self, spark):
        got = {
            r["doc_id"]: r["score_u"]
            for r in bm25_score(self._df(spark), ["zzz"]).collect()
        }
        assert set(got.values()) == {0}
