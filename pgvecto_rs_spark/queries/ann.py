"""ANN index query paths: IVF/HNSW/flat-SQ/sparse-inverted/fresh
top-k + range variants, batch search, planner, text/SQL surfaces,
vecf16 and order-operator parity."""

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
from pgvecto_rs_spark.queries.vector import (  # noqa: F401
    _SQL_SPARSE_E,
    _SQL_SPARSE_Q,
    _sparse_emb,
)




@register(
    "ivf_topk_l2",
    f"""
    SELECT id, ROUND(d, 4) AS dist FROM (
      SELECT vec_id AS id, {_SQL_L2} AS d FROM embeddings
    ) ORDER BY d, id LIMIT 10
    """,
)
def ivf_topk_l2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with nprobe = nlist (full probe) is exact — oracle-checkable
    end-to-end through the index build + partition-pruned search path."""
    from pgvecto_rs_spark.indexes import IVFIndex

    path = _tmp_index_dir("ivf", sf_dir)
    if not os.path.exists(os.path.join(path, "_vindex_meta.json")):
        IVFIndex.create(spark, _emb(spark, sf_dir), path, metric="l2", nlist=8)
    idx = _open_cached(IVFIndex, spark, path)
    out = idx.search(Q64, k=10, nprobe=8)
    return out.select("id", _r4(F.col("distance")).alias("dist"))


@register(
    "ivf_range_l2",
    f"""
    SELECT id, ROUND(d, 4) AS dist FROM (
      SELECT vec_id AS id, {_SQL_L2} AS d FROM embeddings
    ) WHERE d < {RANGE_RADIUS}
    """,
)
def ivf_range_l2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-accelerated range search: the sphere predicate pushed
    through the IVF layout with triangle-inequality list pruning
    (IVFIndex.range_search) — provably the exact full-scan result, so
    the brute-force sphere SQL is a true oracle, not a recall floor."""
    from pgvecto_rs_spark.indexes import IVFIndex

    path = _tmp_index_dir("ivf", sf_dir)
    if not os.path.exists(os.path.join(path, "_vindex_meta.json")):
        IVFIndex.create(spark, _emb(spark, sf_dir), path, metric="l2", nlist=8)
    idx = _open_cached(IVFIndex, spark, path)
    out = idx.range_search(Q64, RANGE_RADIUS)
    return out.select("id", _r4(F.col("distance")).alias("dist"))


@register(
    "hnsw_topk_l2",
    f"""
    SELECT id, ROUND(d, 4) AS dist FROM (
      SELECT vec_id AS id, {_SQL_L2} AS d FROM embeddings
    ) ORDER BY d, id LIMIT 10
    """,
)
def hnsw_topk_l2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Executor-resident per-segment graph search.  Build and search are
    fully deterministic (hash segment assignment, deterministic levels),
    and at oracle scale ef_search=100 recovers the exact top-10, so the
    graph path itself is oracle-checked against brute-force SQL."""
    from pgvecto_rs_spark.indexes.hnsw import HNSWIndex

    path = _tmp_index_dir("hnsw", sf_dir)
    if not os.path.exists(os.path.join(path, "_vindex_meta.json")):
        # small segments parallelize the per-segment python build and
        # exercise the multi-segment merge path
        HNSWIndex.create(spark, _emb(spark, sf_dir), path, metric="l2", segment_rows=512)
    idx = _open_cached(HNSWIndex, spark, path)
    out = idx.search(Q64, k=10, ef_search=100)
    return out.select("id", _r4(F.col("distance")).alias("dist"))


@register(
    "hnsw_range_l2",
    f"""
    SELECT id, ROUND(d, 4) AS dist FROM (
      SELECT vec_id AS id, {_SQL_L2} AS d FROM embeddings
    ) WHERE d < {RANGE_RADIUS}
    """,
)
def hnsw_range_l2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VBASE sphere scan on the graph stream (HNSWIndex.range_search):
    per-segment in-task ef widening until the ordered candidate stream
    crosses the radius.  Deterministic build + widening-to-exhaustive
    at oracle scale ⇒ the brute sphere SQL is a true oracle here (same
    justification as hnsw_topk_l2)."""
    from pgvecto_rs_spark.indexes.hnsw import HNSWIndex

    path = _tmp_index_dir("hnsw", sf_dir)
    if not os.path.exists(os.path.join(path, "_vindex_meta.json")):
        HNSWIndex.create(spark, _emb(spark, sf_dir), path, metric="l2", segment_rows=512)
    idx = _open_cached(HNSWIndex, spark, path)
    out = idx.range_search(Q64, RANGE_RADIUS, ef_search=100)
    return out.select("id", _r4(F.col("distance")).alias("dist"))


@register(
    "sparse_inv_topk_dot",
    f"""
    SELECT vec_id, ROUND(d, 4) AS dist FROM (
      SELECT vec_id,
             -(list_sum(list_transform(range(1, {DIMS + 1}),
                i -> ({_SQL_SPARSE_E}) * ({_SQL_SPARSE_Q})))) AS d
      FROM embeddings
    ) ORDER BY d, vec_id LIMIT 10
    """,
)
def sparse_inv_topk_dot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sparse SCALE path: posting-list join + groupBy-sum over the
    inverted index (exact for Dot — only overlapping dims contribute),
    oracle-checked against the same brute-force SQL as sparse_topk_dot."""
    from pgvecto_rs_spark.indexes.sparse_inverted import SparseInvertedIndex

    path = _tmp_index_dir("spinv", sf_dir)
    if not os.path.exists(os.path.join(path, "_vindex_meta.json")):
        SparseInvertedIndex.create(
            spark, _sparse_emb(_emb(spark, sf_dir)), path,
            svector_col="svec", id_col="vec_id",
        )
    idx = _open_cached(SparseInvertedIndex, spark, path)
    q = {i: x for i, x in enumerate(Q64) if abs(x) > SPARSE_THRESHOLD}
    out = idx.search(q, k=10)
    return out.select(F.col("id").alias("vec_id"), _r4(F.col("distance")).alias("dist"))


@register(
    "ivf_pq_topk_l2",
    f"""
    SELECT id, ROUND(d, 4) AS dist FROM (
      SELECT vec_id AS id, {_SQL_L2} AS d FROM embeddings
    ) ORDER BY d, id LIMIT 10
    """,
)
def ivf_pq_topk_l2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF x PQ composition (crates/ivf/src/lib.rs:68-119 scoring via its
    Quantizer): residual product codes scanned first, exact rerank.  At
    full probe + full rerank the result is exact, oracle-checking the
    whole code/LUT/rerank pipeline; recall floors at tighter operating
    points live in TestAlgoQuantMatrix."""
    from pgvecto_rs_spark.indexes import IVFIndex

    path = _tmp_index_dir("ivfpq", sf_dir)
    if not os.path.exists(os.path.join(path, "_vindex_meta.json")):
        IVFIndex.create(
            spark, _emb(spark, sf_dir), path, metric="l2",
            nlist=8, quantization="pq", pq_ratio=4,
        )
    idx = _open_cached(IVFIndex, spark, path)
    out = idx.search(Q64, k=10, nprobe=8, rerank_size=idx.meta["n_rows"])
    return out.select("id", _r4(F.col("distance")).alias("dist"))


# ---------------------------------------------------------------------------
# 1024-dim regime (r12 verdict #6): the high-dim cell lived only in
# scripts/ann_quality_experiment.py; this registers it with the driver
# so the oracle and BENCH track it every round.  The corpus widens the
# 64-dim embeddings to 1024 dims by tiling 16x with a deterministic
# integer-rational per-position scale — integer arithmetic + one IEEE
# division only, so Spark and DuckDB derive bit-identical f32 vectors
# (a libm transcendental would not be cross-engine reproducible).
# ---------------------------------------------------------------------------

DIMS_HI = 1024
Q1024 = [round(0.2 * math.sin(i + 1), 4) for i in range(DIMS_HI)]
_Q1024_SQL = "[" + ", ".join(repr(x) for x in Q1024) + "]"
_HI_SCALE_SQL = "(CAST(((i-1)*37 + 11) % 97 AS DOUBLE)/97.0 - 0.5)"
_SQL_L2_1024 = (
    f"list_sum(list_transform(range(1, {DIMS_HI + 1}), "
    f"i -> (CAST(CAST(embedding[((i-1)%64)+1] AS DOUBLE) * {_HI_SCALE_SQL} AS FLOAT)"
    f" - ({_Q1024_SQL})[i]) ^ 2))"
)


def _emb1024(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir)
    seq = F.sequence(F.lit(0), F.lit(DIMS_HI - 1))

    def elem(i):
        scale = ((i * 37 + 11) % 97).cast("double") / F.lit(97.0) - F.lit(0.5)
        base = F.element_at(F.col("embedding"), (i % 64 + 1).cast("int"))
        return (base.cast("double") * scale).cast("float")

    return e.select("vec_id", F.transform(seq, elem).alias("embedding"))


@register(
    "ivf_pq_1024_topk",
    f"""
    SELECT id, ROUND(d, 4) AS dist FROM (
      SELECT vec_id AS id, {_SQL_L2_1024} AS d FROM embeddings
    ) ORDER BY d, id LIMIT 10
    """,
)
def ivf_pq_1024_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF x PQ at 1024 dims / pq_ratio 8 (128 subspaces of 8 dims) —
    the coarse-code regime where r12 found and fixed the rerank-window
    recall cliff (quantization.scaled_rerank_window).  Full probe +
    full rerank makes the result exact, so brute-force SQL over the
    same derived vectors is a true oracle for the whole high-dim
    code/LUT/rerank pipeline."""
    from pgvecto_rs_spark.indexes import IVFIndex

    path = _tmp_index_dir("ivfpq1024", sf_dir)
    if not os.path.exists(os.path.join(path, "_vindex_meta.json")):
        IVFIndex.create(
            spark, _emb1024(spark, sf_dir), path, metric="l2",
            nlist=8, quantization="pq", pq_ratio=8,
        )
    idx = _open_cached(IVFIndex, spark, path)
    out = idx.search(Q1024, k=10, nprobe=8, rerank_size=idx.meta["n_rows"])
    return out.select("id", _r4(F.col("distance")).alias("dist"))


@register(
    "fresh_topk_l2",
    f"""
    SELECT id, ROUND(d, 4) AS dist FROM (
      SELECT vec_id AS id, {_SQL_L2} AS d FROM embeddings
    ) WHERE (id % 7 <> 0) OR (id % 14 = 0)
    ORDER BY d, id LIMIT 10
    """,
)
def fresh_topk_l2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freshness layer end-to-end with MVCC visibility: seal all rows,
    tombstone every id % 7 == 0, then re-insert id % 14 == 0 at a later
    version (re-insert after delete is visible again, delete.rs:52-65).
    The oracle is the equivalent predicate over the base table."""
    from pgvecto_rs_spark.streaming.freshness import FreshVectorIndex

    path = _tmp_index_dir("fresh", sf_dir)
    if not os.path.exists(os.path.join(path, "_vindex_meta.json")):
        emb = _emb(spark, sf_dir)
        FreshVectorIndex.create(spark, emb, path, metric="l2", sealed_kind="flat")
        idx = FreshVectorIndex.open(spark, path)
        idx.delete_df(emb.where(F.col("vec_id") % 7 == 0), id_col="vec_id")
        idx.insert(emb.where(F.col("vec_id") % 14 == 0))
    else:
        idx = _open_cached(FreshVectorIndex, spark, path)
    out = idx.search(Q64, k=10)
    return out.select("id", _r4(F.col("distance")).alias("dist"))


@register(
    "fresh_range_l2",
    f"""
    SELECT id, ROUND(d, 4) AS dist FROM (
      SELECT vec_id AS id, {_SQL_L2} AS d FROM embeddings
    ) WHERE ((id % 7 <> 0) OR (id % 14 = 0)) AND d < {RANGE_RADIUS}
    """,
)
def fresh_range_l2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sphere search through the freshness layer (same tombstone/
    re-insert state as fresh_topk_l2): sealed pruned range ∪ brute
    delta range − tombstones, deduped to best-per-id.  Oracle = the
    same visibility predicate AND the sphere over the base table."""
    from pgvecto_rs_spark.streaming.freshness import FreshVectorIndex

    path = _tmp_index_dir("fresh", sf_dir)
    if not os.path.exists(os.path.join(path, "_vindex_meta.json")):
        emb = _emb(spark, sf_dir)
        FreshVectorIndex.create(spark, emb, path, metric="l2", sealed_kind="flat")
        idx = FreshVectorIndex.open(spark, path)
        idx.delete_df(emb.where(F.col("vec_id") % 7 == 0), id_col="vec_id")
        idx.insert(emb.where(F.col("vec_id") % 14 == 0))
    else:
        idx = _open_cached(FreshVectorIndex, spark, path)
    out = idx.range_search(Q64, RANGE_RADIUS)
    return out.select("id", _r4(F.col("distance")).alias("dist"))


@register(
    "flat_sq8_topk_l2",
    f"""
    SELECT id, ROUND(d, 4) AS dist FROM (
      SELECT vec_id AS id, {_SQL_L2} AS d FROM embeddings
    ) ORDER BY d, id LIMIT 10
    """,
)
def flat_sq8_topk_l2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 two-phase scan with the error-bound reranker (the default):
    sound per-candidate bounds make the adaptive rerank set provably
    contain the exact top-k, so the result is exact and oracle-checkable
    end-to-end through the code column + decode + bound + rerank path."""
    from pgvecto_rs_spark.indexes import FlatIndex

    path = _tmp_index_dir("sq8", sf_dir)
    if not os.path.exists(os.path.join(path, "_vindex_meta.json")):
        FlatIndex.create(spark, _emb(spark, sf_dir), path, metric="l2", quantization="sq8")
    idx = _open_cached(FlatIndex, spark, path)
    out = idx.search(Q64, k=10)
    return out.select("id", _r4(F.col("distance")).alias("dist"))


@register(
    "flat_sq8_range_l2",
    f"""
    SELECT id, ROUND(d, 4) AS dist FROM (
      SELECT vec_id AS id, {_SQL_L2} AS d FROM embeddings
    ) WHERE d < {RANGE_RADIUS}
    """,
)
def flat_sq8_range_l2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase coded sphere scan: pass 1 reads only the SQ8 code
    column and keeps rows whose sound error-bound LOWER bound is inside
    the radius (every in-range row survives by construction); pass 2
    fetches exact vectors for just that ring and refilters — exact, at
    code-column I/O plus answer-proportional vector I/O."""
    from pgvecto_rs_spark.indexes import FlatIndex

    path = _tmp_index_dir("sq8", sf_dir)
    if not os.path.exists(os.path.join(path, "_vindex_meta.json")):
        FlatIndex.create(spark, _emb(spark, sf_dir), path, metric="l2", quantization="sq8")
    idx = _open_cached(FlatIndex, spark, path)
    out = idx.range_search(Q64, RANGE_RADIUS)
    return out.select("id", _r4(F.col("distance")).alias("dist"))


SPARSE_RANGE_RADIUS = -0.1  # dot > 0.1: ~15% of overlap docs at sf0.01


@register(
    "sparse_inv_range_dot",
    f"""
    SELECT vec_id, ROUND(d, 4) AS dist FROM (
      SELECT vec_id,
             -(list_sum(list_transform(range(1, {DIMS + 1}),
                i -> ({_SQL_SPARSE_E}) * ({_SQL_SPARSE_Q})))) AS d
      FROM embeddings
    ) WHERE d < {SPARSE_RANGE_RADIUS} AND d <> 0.0
    """,
)
def sparse_inv_range_dot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sphere predicate through the postings layout: only the query
    terms' postings scan, one doc-keyed sum, threshold filter.  Exact
    over the overlap contract (docs sharing no term with the query have
    distance exactly 0 and are excluded on both sides — same contract
    as the sparse top-k, which also ranks only overlapping docs)."""
    from pgvecto_rs_spark.indexes.sparse_inverted import SparseInvertedIndex

    path = _tmp_index_dir("spinv", sf_dir)
    if not os.path.exists(os.path.join(path, "_vindex_meta.json")):
        SparseInvertedIndex.create(
            spark, _sparse_emb(_emb(spark, sf_dir)), path,
            svector_col="svec", id_col="vec_id",
        )
    idx = _open_cached(SparseInvertedIndex, spark, path)
    q = {i: x for i, x in enumerate(Q64) if abs(x) > SPARSE_THRESHOLD}
    out = idx.range_search(q, SPARSE_RANGE_RADIUS)
    return out.select(F.col("id").alias("vec_id"), _r4(F.col("distance")).alias("dist"))


_SQL_BATCH_L2 = (
    "list_sum(list_transform(range(1, 65), "
    "i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(q.embedding[i] AS DOUBLE)) ^ 2))"
)


@register(
    "batch_topk_l2",
    f"""
    SELECT query_id, id, ROUND(d, 4) AS dist FROM (
      SELECT q.vec_id AS query_id, e.vec_id AS id,
             {_SQL_BATCH_L2} AS d,
             ROW_NUMBER() OVER (
               PARTITION BY q.vec_id
               ORDER BY {_SQL_BATCH_L2}, e.vec_id
             ) AS rn
      FROM embeddings q CROSS JOIN embeddings e
      WHERE q.vec_id < 32 AND q.embedding IS NOT NULL
    ) WHERE rn <= 10
    """,
)
def batch_topk_l2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-query batched exact search through FlatIndex.search_batch: the
    whole query set is answered in ONE scan (per-Arrow-batch distance is
    a shared kernel call per query, per-batch top-k bounds the shuffle)
    — the amortized-dispatch path a lookup microbatch takes at scale.
    Results are bit-identical to 32 per-query searches."""
    from pgvecto_rs_spark.indexes import FlatIndex

    path = _tmp_index_dir("flatb", sf_dir)
    if not os.path.exists(os.path.join(path, "_vindex_meta.json")):
        FlatIndex.create(spark, _emb(spark, sf_dir), path, metric="l2")
    idx = _open_cached(FlatIndex, spark, path)
    qdf = (
        _emb(spark, sf_dir)
        .where(F.col("vec_id") < 32)
        .where(F.col("embedding").isNotNull())
        .select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"))
    )
    out = idx.search_batch(qdf, "qid", "qv", k=10)
    return out.select("query_id", "id", _r4(F.col("distance")).alias("dist"))


# ---------------------------------------------------------------------------
# 14. planner: sphere + ORDER BY + LIMIT (pushdown_plan.slt decisions)
# ---------------------------------------------------------------------------

@register(
    "planner_topk_sphere",
    f"""
    SELECT vec_id, ROUND(d, 4) AS dist FROM (
      SELECT vec_id, {_SQL_L2} AS d FROM embeddings
    ) WHERE d < {RANGE_RADIUS} ORDER BY d, vec_id LIMIT 5
    """,
)
def planner_topk_sphere(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY dist LIMIT k with a same-column sphere -> threshold
    merge (am_scan.rs:41-52), routed by the Planner (seqscan path)."""
    from pgvecto_rs_spark.plans import IndexCatalog, Planner
    from pgvecto_rs_spark.plans.rewrite import Sphere

    planner = Planner(IndexCatalog())
    out = planner.top_k(
        "embeddings",
        _emb(spark, sf_dir),
        "embedding",
        Q64,
        k=5,
        metric="l2",
        spheres=[Sphere("embedding", Q64, RANGE_RADIUS, "l2")],
    )
    assert planner.last_decision["threshold"] == RANGE_RADIUS
    return out.select("vec_id", _r4(F.col("distance")).alias("dist"))


# ---------------------------------------------------------------------------
# 15. text format round-trip (text_vecf32.rs parity at table scale)
# ---------------------------------------------------------------------------

@register("text_roundtrip", "SELECT COUNT(*) AS n_ok FROM embeddings")
def text_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """format -> parse every embedding and count exact round-trips —
    must equal the table count (shortest-repr float contract)."""
    from pgvecto_rs_spark.functions import text_format as TFM

    df = _emb(spark, sf_dir)
    rt = TFM.parse_vector(TFM.format_vector(F.col("embedding")))
    return df.where(rt == F.col("embedding")).agg(F.count(F.lit(1)).alias("n_ok"))


# ---------------------------------------------------------------------------
# 16. offline embedding source + ANN over it (north-star pipeline)
# ---------------------------------------------------------------------------

@register(
    "sql_surface_topk",
    f"""
    SELECT vec_id, ROUND(d, 4) AS dist FROM (
      SELECT vec_id, {_SQL_L2} AS d FROM embeddings
    ) ORDER BY d, vec_id LIMIT 5
    """,
)
def sql_surface_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's literal SQL shape, through our registered SQL
    scalar functions (pgvecto_rs_spark.sql): Catalyst inlines the
    function body, so this plan equals the Column-API plan."""
    from pgvecto_rs_spark.sql import register_sql_functions

    register_sql_functions(spark)
    _emb(spark, sf_dir).createOrReplaceTempView("emb_sql_v")
    qsql = "array(" + ", ".join(f"CAST({x!r} AS FLOAT)" for x in Q64) + ")"
    # Spark disallows SQL UDFs directly inside Sort; the idiomatic form
    # computes the distance in a subquery and sorts the column.
    return spark.sql(
        f"""
        SELECT vec_id, ROUND(d, 4) AS dist FROM (
          SELECT vec_id, vec_l2sq(embedding, {qsql}) AS d FROM emb_sql_v
        ) ORDER BY d, vec_id LIMIT 5
        """
    )


# DuckDB has no float16, so the oracle reads a parquet file of
# f16-grid-snapped embeddings materialized (via numpy, independently of
# the Spark path) by the query function just before it runs.  Fixed
# path: the harness always executes the Spark query, then its oracle.
_VECF16_ORACLE_FILE = "/tmp/pgvrs_vecf16_oracle.parquet"


def _materialize_f16_oracle(sf_dir: str) -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = tbl.column("vec_id").to_pylist()
    snapped = [
        None
        if e is None
        else np.asarray(e, dtype=np.float32).astype(np.float16).astype(np.float32).tolist()
        for e in tbl.column("embedding").to_pylist()
    ]
    out = pa.table(
        {"vec_id": ids, "embedding": pa.array(snapped, type=pa.list_(pa.float32()))}
    )
    pq.write_table(out, _VECF16_ORACLE_FILE)


@register(
    "vecf16_topk_l2",
    f"""
    SELECT vec_id, ROUND(d, 4) AS dist FROM (
      SELECT vec_id, {_SQL_L2} AS d FROM '{_VECF16_ORACLE_FILE}'
    ) ORDER BY d, vec_id LIMIT 10
    """,
)
def vecf16_topk_l2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """vecf16 path: snap embeddings to the IEEE f16 grid (the vecf16
    storage model, crates/base/src/scalar/f16.rs computes via f32),
    then L2 top-10.  The oracle runs the same top-k over an
    independently materialized f16-snapped copy of the table."""
    _materialize_f16_oracle(sf_dir)
    df = _emb(spark, sf_dir).withColumn("emb16", VD.to_f16_grid("embedding"))
    d = VD.l2sq_distance(F.col("emb16"), _q_col(), check=False)
    return (
        df.select("vec_id", d.alias("d"))
        .orderBy("d", "vec_id")
        .limit(10)
        .select("vec_id", _r4(F.col("d")).alias("dist"))
    )


# Anchor for the order-operator query: Q64 with every 5th element zeroed
# (zeros exercise the svector comparator's absent-index-vs-zero branches)
ORDER_ANCHOR = [0.0 if i % 5 == 0 else Q64[i] for i in range(DIMS)]


def _order_anchor_sql_lists():
    """(float_list, bit_list, f16_list) SQL literals for the oracle."""
    import numpy as np

    f32 = [float(np.float32(x)) for x in ORDER_ANCHOR]
    bits = [1 if x > 0 else 0 for x in ORDER_ANCHOR]
    f16 = [float(np.float32(np.float16(np.float32(x)))) for x in ORDER_ANCHOR]
    fmt = lambda xs: "[" + ", ".join(repr(v) for v in xs) + "]"
    return fmt(f32), fmt(bits), fmt(f16)


_ORDER_F32, _ORDER_BITS, _ORDER_F16 = _order_anchor_sql_lists()


@register(
    "vec_order_ops",
    f"""
    SELECT
      CAST(SUM(CASE WHEN fl <  af THEN 1 ELSE 0 END) AS BIGINT) AS sv_lt,
      CAST(SUM(CASE WHEN fl <= af THEN 1 ELSE 0 END) AS BIGINT) AS sv_le,
      CAST(SUM(CASE WHEN fl >  af THEN 1 ELSE 0 END) AS BIGINT) AS sv_gt,
      CAST(SUM(CASE WHEN bl <  ab THEN 1 ELSE 0 END) AS BIGINT) AS bv_lt,
      CAST(SUM(CASE WHEN bl >  ab THEN 1 ELSE 0 END) AS BIGINT) AS bv_gt,
      CAST(SUM(CASE WHEN hl <  ah THEN 1 ELSE 0 END) AS BIGINT) AS f16_lt,
      CAST(SUM(CASE WHEN hl >  ah THEN 1 ELSE 0 END) AS BIGINT) AS f16_gt
    FROM (
      SELECT
        CAST(e.embedding AS FLOAT[]) AS fl,
        list_transform(range(1, 65), i -> CASE WHEN e.embedding[i] > 0 THEN 1 ELSE 0 END) AS bl,
        CAST(h.embedding AS FLOAT[]) AS hl,
        CAST({_ORDER_F32} AS FLOAT[]) AS af,
        {_ORDER_BITS} AS ab,
        CAST({_ORDER_F16} AS FLOAT[]) AS ah
      FROM embeddings e JOIN '{_VECF16_ORACLE_FILE}' h USING (vec_id)
      WHERE e.embedding IS NOT NULL
    )
    """,
)
def vec_order_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order operators over all four orderable vector types in one
    aggregate: svector as-if-densified compare (svect.rs:404-444),
    bvector reverse_bits bit-lex compare (bvect.rs:260-276), vecf16
    f16-grid lex compare, against a fixed anchor with zeroed entries
    (so the svector comparator's absent-index branches are exercised on
    every row).  The oracle spells each comparison as DuckDB's native
    lexicographic list comparison over the equivalent dense layouts —
    an independent formulation of the same order.

    Scale shape: a single projection + partial-agg scan, no shuffle of
    vector data; the comparators are pure Column expressions.

    r13 shape: the row-side conversions (dense_to_svector, binarize)
    are PROJECTED once per row and the anchor svector/bvector are PURE
    LITERAL structs (indices/words computed in Python, same float32
    semantics — the sparse_topk_dot trick).  The old form passed the
    conversion subtrees straight into the comparators, whose interpreted
    HOF lambdas re-evaluated them per union element per comparator —
    measured 30 s of single-task wall on 2,000 rows at sf0.1; now ~0.2 s.
    A unit test pins literal == operator output for the anchors."""
    import numpy as np

    _materialize_f16_oracle(sf_dir)
    emb = _emb(spark, sf_dir).where(F.col("embedding").isNotNull())
    anchor_f = F.array(*[F.lit(float(x)) for x in ORDER_ANCHOR]).cast("array<float>")
    # anchor svector literal == dense_to_svector(anchor_f): float32
    # values, exact zeros dropped
    a32 = [float(np.float32(x)) for x in ORDER_ANCHOR]
    asv = VS.svector(
        len(a32),
        F.array(*[F.lit(i) for i, x in enumerate(a32) if x != 0.0]),
        F.array(*[F.lit(x) for x in a32 if x != 0.0]),
    )
    # anchor bvector literal == binarize(anchor_f): bit i = (v[i] > 0)
    words = []
    for j in range((len(a32) + VB.BITS_PER_WORD - 1) // VB.BITS_PER_WORD):
        w = 0
        for k in range(VB.BITS_PER_WORD):
            i = j * VB.BITS_PER_WORD + k
            if i < len(a32) and a32[i] > 0.0:
                w |= 1 << k
        words.append(w)
    abv = VB.bvector(len(a32), F.array(*[F.lit(w) for w in words]))
    proj = emb.select(
        F.col("embedding"),
        VS.dense_to_svector(F.col("embedding")).alias("__sv"),
        VB.binarize(F.col("embedding")).alias("__bv"),
    )
    sv, bv = F.col("__sv"), F.col("__bv")
    one = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("long")
    return proj.agg(
        one(VS.svector_lt(sv, asv)).alias("sv_lt"),
        one(VS.svector_le(sv, asv)).alias("sv_le"),
        one(VS.svector_gt(sv, asv)).alias("sv_gt"),
        one(VB.bvector_lt(bv, abv)).alias("bv_lt"),
        one(VB.bvector_gt(bv, abv)).alias("bv_gt"),
        one(VD.vecf16_lt(F.col("embedding"), anchor_f)).alias("f16_lt"),
        one(VD.vecf16_gt(F.col("embedding"), anchor_f)).alias("f16_gt"),
    )


@register(
    "ivf_vecf16_topk_l2",
    f"""
    SELECT id, ROUND(d, 4) AS dist FROM (
      SELECT vec_id AS id, {_SQL_L2} AS d FROM '{_VECF16_ORACLE_FILE}'
    ) ORDER BY d, id LIMIT 10
    """,
)
def ivf_vecf16_topk_l2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ivf × vecf16 cell: lists store binary16 words (2 bytes/dim);
    training, assignment, radii and the probed scans all run on the
    decoded grid values, so full probe is exactly the vecf16 type's
    top-k.  Oracle = exact top-k over the independently f16-snapped
    table."""
    from pgvecto_rs_spark.indexes import IVFIndex

    _materialize_f16_oracle(sf_dir)
    path = _tmp_index_dir("ivff16", sf_dir)
    if not os.path.exists(os.path.join(path, "_vindex_meta.json")):
        IVFIndex.create(
            spark, _emb(spark, sf_dir), path, metric="l2", nlist=8, storage="f16"
        )
    idx = _open_cached(IVFIndex, spark, path)
    out = idx.search(Q64, k=10, nprobe=8)
    return out.select("id", _r4(F.col("distance")).alias("dist"))


@register(
    "hnsw_vecf16_topk_l2",
    f"""
    SELECT id, ROUND(d, 4) AS dist FROM (
      SELECT vec_id AS id, {_SQL_L2} AS d FROM '{_VECF16_ORACLE_FILE}'
    ) ORDER BY d, id LIMIT 10
    """,
)
def hnsw_vecf16_topk_l2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hnsw × vecf16 cell of the type × algorithm matrix: graph
    segments store raw binary16 words (2 bytes/dim on disk, halving
    index I/O), build and traversal run on the decoded grid values —
    the reference's f16-computes-via-f32 model, every algorithm
    accepting every vector type.  Oracle = exact top-k over the
    independently f16-snapped table (distances on the grid are the
    type's exact distances, so no recall gap at gate scale)."""
    from pgvecto_rs_spark.indexes.hnsw import HNSWIndex

    _materialize_f16_oracle(sf_dir)
    path = _tmp_index_dir("hnswf16", sf_dir)
    if not os.path.exists(os.path.join(path, "_vindex_meta.json")):
        HNSWIndex.create(
            spark, _emb(spark, sf_dir), path, metric="l2",
            segment_rows=512, storage="f16",
        )
    idx = _open_cached(HNSWIndex, spark, path)
    out = idx.search(Q64, k=10, ef_search=100)
    return out.select("id", _r4(F.col("distance")).alias("dist"))


@register(
    "knn_join_ivf_l2",
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
def knn_join_ivf_l2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed similarity join at full probe (= exact, oracle-checked):
    both sides shuffle by centroid list id — an equi-join, never a
    cross join — then per-query window top-k."""
    from pgvecto_rs_spark.operators.knn_ivf import knn_join_ivf

    emb = _emb(spark, sf_dir)
    left = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    out = knn_join_ivf(
        left, emb, "qid", "qv", "vec_id", "embedding",
        k=3, nlist=8, nprobe=8, replicas=1,
    )
    return out.select("query_id", "neighbor_id", _r4(F.col("distance")).alias("dist"))
