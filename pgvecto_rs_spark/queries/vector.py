"""Dense/sparse/binary vector queries: exact top-k (incl. the NaN/Inf
total-order window), range, knn-join, scalar functions, vector
aggregates."""

from __future__ import annotations

import math
import os
from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pgvecto_rs_spark.functions import binary as VB
from pgvecto_rs_spark.functions import dense as VD
from pgvecto_rs_spark.functions import sparse as VS
from pgvecto_rs_spark.operators import asof as OA
from pgvecto_rs_spark.operators import clustering as CL
from pgvecto_rs_spark.operators import curation as CU
from pgvecto_rs_spark.operators import dedup as DD
from pgvecto_rs_spark.operators import retrieval as RT
from pgvecto_rs_spark.operators import search as SR
from pgvecto_rs_spark.operators import textanalysis as TA

from pgvecto_rs_spark.queries._core import (  # noqa: F401
    DIMS,
    Q64,
    Q64_SQL,
    SPARSE_THRESHOLD,
    RANGE_RADIUS,
    STOPWORDS_SQL,
    QueryFn,
    register,
    _REGISTRY,
    _q_col,
    _tune,
    _emb,
    _docs,
    _events,
    _r4,
    _r4t,
    _scaled_sum,
    _SQL_L2,
    _SQL_DOT,
    _SQL_NORMSQ_E,
    _Q_NORM,
    _tmp_index_dir,
    _open_cached,
)




# ---------------------------------------------------------------------------
# 1. dense top-k (ORDER BY v <-> q LIMIT k  — README.md:118-121 flagship)
# ---------------------------------------------------------------------------

@register(
    "topk_l2",
    f"""
    SELECT vec_id, ROUND(d, 4) AS dist FROM (
      SELECT vec_id, {_SQL_L2} AS d FROM embeddings
    ) ORDER BY d, vec_id LIMIT 10
    """,
)
def topk_l2(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = SR.top_k(_emb(spark, sf_dir), "embedding", Q64, 10, metric="l2", tiebreaker="vec_id")
    return df.select("vec_id", _r4(F.col("distance")).alias("dist"))


@register(
    "topk_dot",
    f"""
    SELECT vec_id, ROUND(d, 4) AS dist FROM (
      SELECT vec_id, -({_SQL_DOT}) AS d FROM embeddings
    ) ORDER BY d, vec_id LIMIT 10
    """,
)
def topk_dot(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = SR.top_k(_emb(spark, sf_dir), "embedding", Q64, 10, metric="dot", tiebreaker="vec_id")
    return df.select("vec_id", _r4(F.col("distance")).alias("dist"))


@register(
    "topk_cos",
    f"""
    SELECT vec_id, ROUND(d, 4) AS dist FROM (
      SELECT vec_id,
             1.0 - ({_SQL_DOT}) / SQRT(({_SQL_NORMSQ_E}) * {sum(x * x for x in Q64)!r}) AS d
      FROM embeddings
    ) ORDER BY d, vec_id LIMIT 10
    """,
)
def topk_cos(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = SR.top_k(_emb(spark, sf_dir), "embedding", Q64, 10, metric="cos", tiebreaker="vec_id")
    return df.select("vec_id", _r4(F.col("distance")).alias("dist"))


@register(
    "nan_inf_topk_order",
    f"""
    WITH c AS (
      SELECT vec_id,
             CASE WHEN vec_id % 500 = 7 THEN 'NaN'::DOUBLE
                  WHEN vec_id % 500 = 11 THEN 'Infinity'::DOUBLE
                  ELSE CAST(embedding[1] AS DOUBLE) END AS e1,
             embedding
      FROM embeddings
    ), s AS (
      SELECT vec_id,
             (e1 - ({Q64_SQL})[1]) ^ 2
             + list_sum(list_transform(range(2, {DIMS + 1}),
                 i -> (CAST(embedding[i] AS DOUBLE) - ({Q64_SQL})[i]) ^ 2)) AS dd
      FROM c
    )
    SELECT vec_id,
           CASE WHEN isnan(dd) THEN 'nan'
                WHEN isinf(dd) THEN 'inf'
                ELSE 'finite' END AS kind,
           CASE WHEN isnan(dd) OR isinf(dd) THEN -1.0
                ELSE FLOOR(dd * 10000 + 0.5) / 10000.0 END AS dist
    FROM s
    ORDER BY dd DESC, vec_id LIMIT 30
    """,
)
def nan_inf_topk_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total-order parity for non-finite distances: the reference sorts
    distances through an order-preserving f32->i32 bijection
    (crates/base/src/distance.rs:17-44) so NaN/Inf order
    deterministically (-Inf < finite < +Inf < NaN); Spark and DuckDB
    both place NaN above +Inf in double ordering, so the farthest-k
    window over a corpus with injected NaN/Inf elements must contain
    exactly the same rows: every NaN row, then every +Inf row, then the
    largest finite distances.  Non-finite distances are surfaced as a
    `kind` tag with a -1.0 dist sentinel so the
    value-hash carries no NaN/NULL (pandas turns SQL NULL doubles into
    NaN on fetch)."""
    emb = _emb(spark, sf_dir)
    nan, inf = F.lit(float("nan")), F.lit(float("inf"))
    e1 = (
        F.when(F.col("vec_id") % 500 == 7, nan)
        .when(F.col("vec_id") % 500 == 11, inf)
        .otherwise(F.col("embedding").getItem(0).cast("double"))
    )
    corrupted = emb.withColumn(
        "embedding",
        F.concat(F.array(e1.cast("float")), F.slice("embedding", 2, DIMS - 1)),
    )
    df = SR.top_k(
        corrupted, "embedding", Q64, 30, metric="l2",
        tiebreaker="vec_id", descending=True,
    )
    d = F.col("distance")
    return df.select(
        "vec_id",
        F.when(F.isnan(d), F.lit("nan"))
        .when(d == inf, F.lit("inf"))
        .otherwise(F.lit("finite"))
        .alias("kind"),
        F.when(F.isnan(d) | (d == inf), F.lit(-1.0))
        .otherwise(_r4t(d))
        .alias("dist"),
    )


# ---------------------------------------------------------------------------
# 2. range ("sphere") search — WHERE v <<->> sphere(q, r)
# ---------------------------------------------------------------------------

@register(
    "range_l2",
    f"""
    SELECT vec_id, ROUND(d, 4) AS dist FROM (
      SELECT vec_id, {_SQL_L2} AS d FROM embeddings
    ) WHERE d < {RANGE_RADIUS}
    """,
)
def range_l2(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = SR.range_search(_emb(spark, sf_dir), "embedding", Q64, RANGE_RADIUS, metric="l2")
    return df.select("vec_id", _r4(F.col("distance")).alias("dist"))


# ---------------------------------------------------------------------------
# 3. knn-join (LATERAL top-k per query row)
# ---------------------------------------------------------------------------

@register(
    "knn_join_l2",
    """
    SELECT query_id, neighbor_id, ROUND(d, 4) AS dist FROM (
      SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
             list_distance(CAST(q.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) ^ 2 AS d,
             ROW_NUMBER() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_distance(CAST(q.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])),
                        e.vec_id
             ) AS rn
      FROM embeddings q CROSS JOIN embeddings e
      WHERE q.vec_id < 5
    ) WHERE rn <= 3
    """,
)
def knn_join_l2(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    left = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    out = SR.knn_join(
        left, emb, "qvec", "embedding", k=3, metric="l2", partition_keys=["query_id"],
        tiebreaker="vec_id",
    )
    return out.select(
        "query_id", F.col("vec_id").alias("neighbor_id"), _r4(F.col("distance")).alias("dist")
    )


@register(
    "emb_knn_classify",
    """
    SELECT qid, true_label, predicted_label FROM (
      SELECT qid, true_label, label AS predicted_label,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY n DESC, label) AS r
      FROM (
        SELECT qid, true_label, label, COUNT(*) AS n FROM (
          SELECT q.vec_id AS qid, q.label AS true_label, c.label,
                 ROW_NUMBER() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY list_distance(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])),
                            c.vec_id
                 ) AS rn
          FROM embeddings q CROSS JOIN embeddings c
          WHERE q.vec_id % 10 = 0 AND c.vec_id % 10 <> 0
        ) WHERE rn <= 10 GROUP BY 1, 2, 3
      )
    ) WHERE r = 1
    """,
)
def emb_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN label propagation — the label-spreading step of dataset
    curation (propagate quality/domain labels from a labeled seed set
    to unlabeled data): every 10th vector plays the query side, its
    label predicted by majority vote (count DESC, label ASC tie-break)
    over its 10 nearest corpus neighbors.

    Scale shape: the whole labeled query set answers in ONE corpus scan
    via FlatIndex.search_batch (per-Arrow-batch (rows × queries) gemm —
    the same batched kernel batch_topk_l2 oracle-checks), then corpus
    labels broadcast onto the k·|queries| neighbor rows and a tiny
    (query, label) vote aggregation picks the winner; at larger corpus
    scale the IVF batch path substitutes (knn_join_ivf_l2's shape)."""
    from pgvecto_rs_spark.indexes import FlatIndex

    emb = _emb(spark, sf_dir)
    left = emb.where(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("true_label"),
        F.col("embedding").alias("qvec"),
    )
    path = _tmp_index_dir("flatcls", sf_dir)
    if not os.path.exists(os.path.join(path, "_vindex_meta.json")):
        FlatIndex.create(
            spark, _emb(spark, sf_dir).where(F.col("vec_id") % 10 != 0),
            path, metric="l2",
        )
    idx = _open_cached(FlatIndex, spark, path)
    nn = idx.search_batch(left.select("qid", "qvec"), "qid", "qvec", k=10)
    labels = emb.where(F.col("vec_id") % 10 != 0).select(
        F.col("vec_id").alias("id"), "label"
    )
    truth = left.select("qid", "true_label")
    votes = (
        nn.join(F.broadcast(labels), "id")
        .join(F.broadcast(truth), nn.query_id == truth.qid)
        .groupBy("qid", "true_label", "label")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("n"), F.asc("label"))
    return (
        votes.withColumn("__r", F.row_number().over(w))
        .where(F.col("__r") == 1)
        .select("qid", "true_label", F.col("label").alias("predicted_label"))
    )


@register(
    "emb_triplets",
    """
    WITH pairs AS (
      SELECT a.vec_id AS aid, a.label AS albl, c.vec_id AS cid, c.label AS clbl,
             list_distance(CAST(a.embedding AS DOUBLE[]),
                           CAST(c.embedding AS DOUBLE[])) ^ 2 AS d
      FROM embeddings a JOIN embeddings c ON c.vec_id <> a.vec_id
      WHERE a.vec_id % 10 = 0
    ),
    pos AS (
      SELECT aid, cid, d,
             ROW_NUMBER() OVER (PARTITION BY aid ORDER BY d DESC, cid) AS rn
      FROM pairs WHERE clbl = albl
    ),
    neg AS (
      SELECT aid, cid, d,
             ROW_NUMBER() OVER (PARTITION BY aid ORDER BY d, cid) AS rn
      FROM pairs WHERE clbl <> albl
    )
    SELECT p.aid AS aid, p.cid AS pos_id, ROUND(p.d, 4) AS pos_dist,
           n.cid AS neg_id, ROUND(n.d, 4) AS neg_dist
    FROM pos p JOIN neg n ON p.aid = n.aid AND p.rn = 1 AND n.rn = 1
    """,
)
def emb_triplets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-hard triplet mining (FaceNet/Hermans batch-hard) — the
    contrastive-training pair-selection stage of an embedding
    fine-tuning pipeline: every 10th vector is an anchor; emit its
    hardest positive (FARTHEST same-label row, the confusable pair)
    and hardest negative (NEAREST different-label row, the impostor).

    Scale shape (operators/mining.py): anchors broadcast, the corpus
    is scanned once with per-partition partial struct-argmax/argmin
    (map-side combine), so the only shuffle carries |anchors| rows —
    never the corpus.  Ties break on candidate id via the struct's
    second field, replayed in the oracle by ROW_NUMBER tie-breaks."""
    from pgvecto_rs_spark.operators.mining import batch_hard_triplets

    emb = _emb(spark, sf_dir)
    anchors = emb.where(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("aid"),
        F.col("label").alias("albl"),
        F.col("embedding").alias("avec"),
    )
    cand = emb.select(
        F.col("vec_id").alias("cid"),
        F.col("label").alias("clbl"),
        F.col("embedding").alias("cvec"),
    )
    out = batch_hard_triplets(anchors, cand)
    return out.select(
        "aid",
        "pos_id",
        _r4(F.col("pos_dist")).alias("pos_dist"),
        "neg_id",
        _r4(F.col("neg_dist")).alias("neg_dist"),
    )


# ---------------------------------------------------------------------------
# 4. scalar functions: norm / normalize / dims / slice / arithmetic
# ---------------------------------------------------------------------------

@register(
    "vector_norms",
    f"""
    SELECT vec_id,
           ROUND(SQRT({_SQL_NORMSQ_E}), 4) AS norm,
           CAST({DIMS} AS INT) AS dims,
           ROUND(SQRT(list_sum(list_transform(
             list_transform(embedding, x -> CAST(CAST(x AS DOUBLE) / SQRT({_SQL_NORMSQ_E}) AS FLOAT)),
             y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)))), 4) AS unit_norm
    FROM embeddings WHERE vec_id < 20
    """,
)
def vector_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _emb(spark, sf_dir).where(F.col("vec_id") < 20)
    return df.select(
        "vec_id",
        _r4(VD.vector_norm("embedding")).alias("norm"),
        VD.vector_dims("embedding").cast("int").alias("dims"),
        _r4(VD.vector_norm(VD.vector_normalize("embedding"))).alias("unit_norm"),
    )


@register(
    "slice_arith",
    """
    SELECT vec_id,
           ROUND(list_sum(list_transform(embedding[9:16],
             x -> CAST(CAST(x + x AS FLOAT) AS DOUBLE) + CAST(CAST(x * x AS FLOAT) AS DOUBLE))), 4) AS s
    FROM embeddings WHERE vec_id < 50
    """,
)
def slice_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """v[8:16] slice (0-based, end-exclusive), then f32 add/mul parity:
    Σ (x+x) + (x*x) with the inner ops rounded to f32 like the
    reference's f32 kernels."""
    df = _emb(spark, sf_dir).where(F.col("vec_id") < 50)
    s = VD.vector_slice("embedding", 8, 16)
    both = F.zip_with(
        VD.vector_add(s, s, check=False),
        VD.vector_mul(s, s, check=False),
        lambda a, m: a.cast("double") + m.cast("double"),
    )
    total = F.aggregate(both, F.lit(0.0), lambda acc, x: acc + x)
    return df.select("vec_id", _r4(total).alias("s"))


# ---------------------------------------------------------------------------
# 5. vector aggregates: sum(vector) / avg(vector) grouped
# ---------------------------------------------------------------------------

@register(
    "agg_sum_vector",
    """
    SELECT label, CAST(ord AS BIGINT) AS pos,
           CAST(SUM(CAST(FLOOR(val * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_val_u
    FROM (
      SELECT label, CAST(unnest(embedding) AS DOUBLE) AS val,
             generate_subscripts(embedding, 1) AS ord
      FROM embeddings
    )
    GROUP BY label, ord
    """,
)
def agg_sum_vector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sum(vector) GROUP BY label (src/datatype/aggregate_vecf32.rs) as a
    posexplode + partial-aggregate plan: map-side combine on
    (label, pos) — the Spark-native analogue of sfunc/combinefunc.

    Values are compared as micro-scaled integers (see _scaled_sum): float
    components are dyadic rationals whose decimal expansions hit exact
    rounding ties, so DECIMAL sums are not engine-portable.
    """
    df = _emb(spark, sf_dir)
    return (
        df.select("label", F.posexplode("embedding").alias("pos", "val"))
        .groupBy("label", "pos")
        .agg(_scaled_sum(F.col("val"), 1000000.0).alias("sum_val_u"))
        .select("label", (F.col("pos") + 1).cast("long").alias("pos"), "sum_val_u")
    )


@register(
    "agg_avg_vector",
    """
    SELECT label, CAST(ord AS BIGINT) AS pos,
           FLOOR(CAST(SUM(CAST(FLOOR(val * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
                 / 1000000.0 / COUNT(*) * 10000.0 + 0.5) / 10000.0 AS avg_val
    FROM (
      SELECT label, CAST(unnest(embedding) AS DOUBLE) AS val,
             generate_subscripts(embedding, 1) AS ord
      FROM embeddings
    )
    GROUP BY label, ord
    """,
)
def agg_avg_vector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """avg(vector) via the tie-free scaled-integer sum (see _scaled_sum)
    and the tie-free round-4 (_r4t) — DECIMAL sums and ROUND(double)
    both diverge between engines at exact decimal ties."""
    df = _emb(spark, sf_dir)
    cnt = F.count(F.lit(1))
    s = _scaled_sum(F.col("val"), 1000000.0)
    return (
        df.select("label", F.posexplode("embedding").alias("pos", "val"))
        .groupBy("label", "pos")
        .agg(_r4t(s.cast("double") / F.lit(1000000.0) / cnt).alias("avg_val"))
        .select("label", (F.col("pos") + 1).cast("long").alias("pos"), "avg_val")
    )


# ---------------------------------------------------------------------------
# 6. sparse vectors (thresholded embeddings as svector)
# ---------------------------------------------------------------------------

def _sparse_emb(df: DataFrame) -> DataFrame:
    thresholded = F.transform(
        F.col("embedding"),
        lambda x: F.when(F.abs(x) > SPARSE_THRESHOLD, x).otherwise(F.lit(0.0)).cast("float"),
    )
    return df.withColumn("svec", VS.dense_to_svector(thresholded))


_SQL_SPARSE_E = f"CASE WHEN abs(embedding[i]) > {SPARSE_THRESHOLD} THEN CAST(embedding[i] AS DOUBLE) ELSE 0.0 END"
_SQL_SPARSE_Q = f"CASE WHEN abs(({Q64_SQL})[i]) > {SPARSE_THRESHOLD} THEN ({Q64_SQL})[i] ELSE 0.0 END"


@register(
    "sparse_topk_dot",
    f"""
    SELECT vec_id, ROUND(d, 4) AS dist FROM (
      SELECT vec_id,
             -(list_sum(list_transform(range(1, {DIMS + 1}),
                i -> ({_SQL_SPARSE_E}) * ({_SQL_SPARSE_Q})))) AS d
      FROM embeddings
    ) ORDER BY d, vec_id LIMIT 10
    """,
)
def sparse_topk_dot(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _sparse_emb(_emb(spark, sf_dir))
    # Build the query svector as a PURE LITERAL (indexes/values computed
    # in Python) instead of dense_to_svector(<64-lit array>): the dot's
    # per-element lookup references the whole query subtree, so the
    # Catalyst-expression form re-evaluated filter+zip over the 64-lit
    # array for EVERY element of every row (~1.2 ms/row measured, the
    # entire cost of this query).  A foldable literal struct lets
    # ConstantFolding collapse the lookup map once; values go through
    # the same float32 cast so every product is bit-identical.
    import numpy as np

    qsv = VS.svector(
        DIMS,
        F.array(*[F.lit(i) for i, x in enumerate(Q64) if abs(x) > SPARSE_THRESHOLD]),
        F.array(
            *[
                F.lit(float(np.float32(x)))
                for x in Q64
                if abs(x) > SPARSE_THRESHOLD
            ]
        ),
    )
    d = VS.svector_neg_dot(F.col("svec"), qsv, check=False)
    return (
        df.select("vec_id", d.alias("d"))
        .orderBy("d", "vec_id")
        .limit(10)
        .select("vec_id", _r4(F.col("d")).alias("dist"))
    )


@register(
    "sparse_norm",
    f"""
    SELECT vec_id,
           ROUND(SQRT(list_sum(list_transform(range(1, {DIMS + 1}),
             i -> ({_SQL_SPARSE_E}) * ({_SQL_SPARSE_E})))), 4) AS norm,
           CAST(len(list_filter(embedding, x -> abs(x) > {SPARSE_THRESHOLD})) AS INT) AS nnz
    FROM embeddings WHERE vec_id < 50
    """,
)
def sparse_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _sparse_emb(_emb(spark, sf_dir)).where(F.col("vec_id") < 50)
    return df.select(
        "vec_id",
        _r4(VS.svector_norm("svec")).alias("norm"),
        F.size(F.col("svec")["values"]).cast("int").alias("nnz"),
    )


# ---------------------------------------------------------------------------
# 7. binary vectors (binarized embeddings)
# ---------------------------------------------------------------------------

_SQL_BIT_E = "CASE WHEN embedding[i] > 0 THEN 1 ELSE 0 END"
_SQL_BIT_Q = f"CASE WHEN ({Q64_SQL})[i] > 0 THEN 1 ELSE 0 END"


@register(
    "bin_hamming_topk",
    f"""
    SELECT vec_id, CAST(d AS BIGINT) AS dist FROM (
      SELECT vec_id,
             list_sum(list_transform(range(1, {DIMS + 1}),
               i -> CASE WHEN ({_SQL_BIT_E}) != ({_SQL_BIT_Q}) THEN 1 ELSE 0 END)) AS d
      FROM embeddings
    ) ORDER BY d, vec_id LIMIT 10
    """,
)
def bin_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _emb(spark, sf_dir).withColumn("bvec", VB.binarize("embedding"))
    qb = VB.binarize(_q_col())
    d = VB.bvector_hamming_distance(F.col("bvec"), qb, check=False)
    return (
        df.select("vec_id", d.cast("long").alias("dist"))
        .orderBy("dist", "vec_id")
        .limit(10)
    )


@register(
    "bin_hamming_ivf_topk",
    f"""
    SELECT vec_id, CAST(d AS BIGINT) AS dist FROM (
      SELECT vec_id,
             list_sum(list_transform(range(1, {DIMS + 1}),
               i -> CASE WHEN ({_SQL_BIT_E}) != ({_SQL_BIT_Q}) THEN 1 ELSE 0 END)) AS d
      FROM embeddings
    ) ORDER BY d, vec_id LIMIT 10
    """,
)
def bin_hamming_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bvector × IVF cell via the 0/1 reduction: Hamming(x, y) ==
    squared-L2 on the {0,1}-embedded bits, so binary vectors ride the
    ENTIRE dense index machinery unchanged (build, probing = partition
    pruning, radii, batch) — the Spark-first answer to the reference's
    per-type index instantiations (crates/ivf over BVectOwned).  The
    bit-packed struct is the wire/compute format (functions/binary.py);
    the 0/1 array is its index-side embedding, with f16 storage as the
    2-bytes-per-bit compression knob where packed words would need a
    custom scan.  Full probe ⇒ exact integer Hamming, oracle-checked."""
    from pgvecto_rs_spark.indexes import IVFIndex

    path = _tmp_index_dir("ivfbits", sf_dir)
    if not os.path.exists(os.path.join(path, "_vindex_meta.json")):
        bits = _emb(spark, sf_dir).select(
            "vec_id",
            VB.bvector_to_dense(VB.binarize("embedding")).alias("bits01"),
        )
        IVFIndex.create(
            spark, bits, path, vector_col="bits01", id_col="vec_id",
            metric="l2", nlist=8,
        )
    idx = _open_cached(IVFIndex, spark, path)
    qbits = [1.0 if x > 0 else 0.0 for x in Q64]
    out = idx.search(qbits, k=10, nprobe=8)
    return out.select(
        F.col("id").alias("vec_id"),
        F.round(F.col("distance")).cast("long").alias("dist"),
    )


@register(
    "bin_hamming_hnsw_topk",
    f"""
    SELECT vec_id, CAST(d AS BIGINT) AS dist FROM (
      SELECT vec_id,
             list_sum(list_transform(range(1, {DIMS + 1}),
               i -> CASE WHEN ({_SQL_BIT_E}) != ({_SQL_BIT_Q}) THEN 1 ELSE 0 END)) AS d
      FROM embeddings
    ) ORDER BY d, vec_id LIMIT 10
    """,
)
def bin_hamming_hnsw_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bvector × HNSW, same 0/1 reduction as bin_hamming_ivf_topk: the
    graph builds and traverses on the bit embedding where squared L2 IS
    integer Hamming; deterministic build + ef-exhaustive at gate scale
    makes the brute Hamming SQL a true oracle."""
    from pgvecto_rs_spark.indexes.hnsw import HNSWIndex

    path = _tmp_index_dir("hnswbits", sf_dir)
    if not os.path.exists(os.path.join(path, "_vindex_meta.json")):
        bits = _emb(spark, sf_dir).select(
            "vec_id",
            VB.bvector_to_dense(VB.binarize("embedding")).alias("bits01"),
        )
        HNSWIndex.create(
            spark, bits, path, vector_col="bits01", id_col="vec_id",
            metric="l2", segment_rows=512,
        )
    idx = _open_cached(HNSWIndex, spark, path)
    qbits = [1.0 if x > 0 else 0.0 for x in Q64]
    out = idx.search(qbits, k=10, ef_search=100)
    return out.select(
        F.col("id").alias("vec_id"),
        F.round(F.col("distance")).cast("long").alias("dist"),
    )


@register(
    "bin_jaccard_topk",
    f"""
    SELECT vec_id, ROUND(d, 4) AS dist FROM (
      SELECT vec_id,
             1.0 - CAST(list_sum(list_transform(range(1, {DIMS + 1}),
                     i -> CASE WHEN ({_SQL_BIT_E}) = 1 AND ({_SQL_BIT_Q}) = 1 THEN 1 ELSE 0 END)) AS DOUBLE)
                 / CAST(list_sum(list_transform(range(1, {DIMS + 1}),
                     i -> CASE WHEN ({_SQL_BIT_E}) = 1 OR ({_SQL_BIT_Q}) = 1 THEN 1 ELSE 0 END)) AS DOUBLE) AS d
      FROM embeddings
    ) ORDER BY d, vec_id LIMIT 10
    """,
)
def bin_jaccard_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _emb(spark, sf_dir).withColumn("bvec", VB.binarize("embedding"))
    qb = VB.binarize(_q_col())
    d = VB.bvector_jaccard_distance(F.col("bvec"), qb, check=False)
    return (
        df.select("vec_id", d.alias("d"))
        .orderBy("d", "vec_id")
        .limit(10)
        .select("vec_id", _r4(F.col("d")).alias("dist"))
    )


# ---------------------------------------------------------------------------
# 12. sparse aggregate (svector.slt:22-80 semantics at table scale)
# ---------------------------------------------------------------------------

@register(
    "agg_sum_svector",
    f"""
    SELECT label, idx, ROUND(CAST(CAST(s AS FLOAT) AS DOUBLE), 4) AS sum_val FROM (
      SELECT label, CAST(ord - 1 AS INT) AS idx,
             SUM(CASE WHEN abs(val) > {SPARSE_THRESHOLD} THEN CAST(val AS DOUBLE) ELSE 0.0 END) AS s
      FROM (
        SELECT label, unnest(embedding) AS val, generate_subscripts(embedding, 1) AS ord
        FROM embeddings
      ) GROUP BY label, ord
    ) WHERE CAST(s AS FLOAT) != 0 AND idx IN (
      SELECT DISTINCT ord - 1 FROM (
        SELECT unnest(embedding) AS val, generate_subscripts(embedding, 1) AS ord FROM embeddings
      ) WHERE abs(val) > {SPARSE_THRESHOLD}
    )
    """,
)
def agg_sum_svector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sum(svector) GROUP BY label with zero-drop finalize
    (aggregate_svecf32.rs), output exploded for the oracle compare."""
    from pgvecto_rs_spark.functions import aggregates as AG

    df = _sparse_emb(_emb(spark, sf_dir))
    summed = AG.sum_svector(df, ["label"], "svec")
    return summed.select(
        "label",
        F.explode(
            F.arrays_zip(
                F.col("sum_svec")["indexes"].alias("idx"),
                F.col("sum_svec")["values"].alias("v"),
            )
        ).alias("e"),
    ).select(
        "label",
        F.col("e.idx").alias("idx"),
        _r4(F.col("e.v").cast("double")).alias("sum_val"),
    )


@register(
    "topk_l2_by_label",
    f"""
    SELECT label, vec_id, ROUND(d, 4) AS dist, rank FROM (
      SELECT label, vec_id, d,
             ROW_NUMBER() OVER (PARTITION BY label ORDER BY d, vec_id) AS rank
      FROM (SELECT label, vec_id, {_SQL_L2} AS d FROM embeddings)
    ) WHERE rank <= 3
    """,
)
def topk_l2_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped vector search: the 3 nearest vectors to the query PER
    label — 'top-k per partition', the per-tenant / per-shard flavor of
    the flagship query.  One label-keyed shuffle + in-partition rank;
    no global sort (each group's candidates never leave their
    partition)."""
    emb = _emb(spark, sf_dir)
    d = VD.l2sq_distance(F.col("embedding"), _q_col(), check=False)
    scored = emb.select("label", "vec_id", d.alias("d"))
    w = Window.partitionBy("label").orderBy("d", "vec_id")
    return (
        scored.select(
            "label", "vec_id", "d", F.row_number().over(w).alias("rank")
        )
        .where(F.col("rank") <= 3)
        .select("label", "vec_id", _r4(F.col("d")).alias("dist"), "rank")
    )
