"""Deterministic fixed-point k-means over an embedding column.

Semantic clustering is the backbone of several 100 TB-pipeline steps:
SemDeDup-style semantic dedup (cluster, then prune near-identical
vectors inside each cluster), corpus sharding by topic, and IVF-list
style partitioning of downstream work.  A float k-means is
NON-reproducible at scale — float centroid sums depend on partition
order, so two runs (or two engines) assign boundary points differently.
This implementation is exactly reproducible by construction:

- inputs are quantized once to 1e-6 fixed-point int64
  (``floor(x*1e6 + 0.5)``);
- distances are integer sums of squared int diffs (exact — no float
  summation order anywhere);
- centroid updates are ``floor(sum/n)`` in integers, so centroids stay
  int64 and every engine/run/partitioning produces bit-identical
  assignments;
- init is the k vectors with the smallest ids; ties in assignment break
  to the smallest cluster index.

Quantization error (≤5e-7 per coordinate) is orders below any
clustering decision boundary that matters; determinism is worth far
more than the 6th decimal at pipeline scale.

Scale shape per iteration: one full pass for assignment (native
Catalyst expressions — k zip_with/aggregate folds per row, no Python,
no shuffle) and one (cluster, dim)-keyed partial aggregation whose
result is k·dims rows — collected to the driver (bounded: 8·64 longs
here, ≤ a few MB for any real k·dims) and re-broadcast as literals in
the next pass's expression tree.  Compare crates/k_means in the
reference (rayon-parallel Lloyd over one node): same algorithm, with
Spark's map-side partial aggregation playing rayon's reduce role.

Overflow bounds: |x|≤B ⇒ per-dim diff² ≤ (2B·1e6)², distance ≤
dims·(2B·1e6)² — for B≈1, dims≤1024 that is ≤4e18 < int64 max.  The
per-cluster inertia SUM can overflow int64 beyond ~1e9 rows·cluster;
report at DECIMAL/double precision there (documented, like
queries._scaled_sum's headroom note).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["kmeans_assign", "kmeans_fit", "semdedup"]

_SCALE = 1000000.0


def _quantized(vec_col: str) -> Column:
    return F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * F.lit(_SCALE) + F.lit(0.5)).cast("long"),
    )


def _dist_to(c: list[int]) -> Column:
    """Exact int64 squared L2 between the quantized row vector and a
    literal quantized centroid."""
    lit = F.array(*[F.lit(int(v)).cast("long") for v in c])
    return F.aggregate(
        F.zip_with(F.col("__xu"), lit, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


# Hard cap on centroid-literal cells in the expression path: the
# Catalyst tree embeds k·dims literals (plus a fold per centroid), so
# analysis/codegen cost grows with k·dims — past ~64·1024 cells a plan
# takes minutes to analyze or trips Janino's 64KB method limit.  The
# numpy path is bit-identical (see _assign_numpy) and O(1) plan size;
# "auto" already routes anything >= 128 cells there, so this cap only
# guards an explicit impl="expr" at unreasonable scale.
MAX_EXPR_LITERAL_CELLS = 65536


def _assign_expr(qdf: DataFrame, centroids: list[list[int]]) -> DataFrame:
    """Adds cluster (argmin, ties -> smallest index) and dist_u columns.
    Pure projection: k integer fold expressions + one array_min."""
    cells = len(centroids) * len(centroids[0])
    if cells > MAX_EXPR_LITERAL_CELLS:
        raise ValueError(
            f"impl='expr' embeds k*dims = {cells} centroid literals in the "
            f"Catalyst plan (cap {MAX_EXPR_LITERAL_CELLS}); use impl='numpy' "
            "or 'auto' — bit-identical results with O(1) plan size"
        )
    best = F.array_min(
        F.array(
            *[
                F.struct(_dist_to(c).alias("d"), F.lit(j).alias("j"))
                for j, c in enumerate(centroids)
            ]
        )
    )
    return qdf.select(
        "*", best["j"].alias("cluster"), best["d"].alias("dist_u")
    )


def _assign_numpy(qdf: DataFrame, centroids: list[list[int]]) -> DataFrame:
    """Same result as ``_assign_expr`` via an Arrow-batched BLAS matmul
    — the scale path for large k·dims, where the Catalyst fold's
    per-element interpretation dominates.

    BIT-IDENTICAL to the expr path, not approximately: every quantized
    coordinate is an integer ≤ ~1e6·B, so products (≤1e12·B²) and their
    dim-wise partial sums (≤dims·1e12·B²) are integers below 2^53 —
    float64 dgemm therefore commits NO rounding in any summation order,
    and the ``x² − 2xy + y²`` expansion reproduces the exact integer
    distance.  np.argmin returns the first minimum = smallest cluster
    index, matching array_min's struct tie-break.  Bounds are asserted
    per batch; inputs outside them fall back to exact int64 matmul.
    """
    import numpy as np

    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    # NB: StructType.add mutates in place — never call it on df.schema
    schema = StructType(
        list(qdf.schema.fields)
        + [
            StructField("cluster", IntegerType(), False),
            StructField("dist_u", LongType(), False),
        ]
    )
    C = np.asarray(centroids, dtype=np.int64)

    def gen(batches):
        Cd = C.astype(np.float64)
        cnorm = (Cd * Cd).sum(axis=1)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array(pdf["__xu"].tolist(), dtype=np.int64)
            # exactness bound: dims · max² < 2^53
            if X.size and abs(X).max() ** 2 * X.shape[1] < 2**53:
                Xd = X.astype(np.float64)
                d = (
                    (Xd * Xd).sum(axis=1)[:, None]
                    - 2.0 * (Xd @ Cd.T)
                    + cnorm[None, :]
                )
                d = d.astype(np.int64)  # exact by construction
            else:  # pragma: no cover - huge-magnitude fallback
                d = (
                    (X * X).sum(axis=1)[:, None]
                    - 2 * (X @ C.T)
                    + (C * C).sum(axis=1)[None, :]
                )
            j = d.argmin(axis=1)
            out = pdf.copy()
            out["cluster"] = j.astype("int32")
            out["dist_u"] = d[np.arange(len(X)), j]
            yield out

    return qdf.mapInPandas(gen, schema=schema)


def _assign(
    qdf: DataFrame, centroids: list[list[int]], impl: str = "auto"
) -> DataFrame:
    if impl == "auto":
        # numpy (bit-identical, see _assign_numpy's exactness argument)
        # unless the centroid set is trivial: the expr path costs
        # O(k·dims) py4j round-trips just to BUILD the fold expressions
        # (~2 s at k=8, dims=64) plus interpreted evaluation per row;
        # the Arrow path pays one pandas-UDF stage regardless of k
        impl = "numpy" if len(centroids) * len(centroids[0]) >= 128 else "expr"
    return (_assign_numpy if impl == "numpy" else _assign_expr)(qdf, centroids)


def kmeans_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iters: int = 2,
    impl: str = "auto",
) -> list[list[int]]:
    """Runs ``iters`` Lloyd updates from the deterministic init and
    returns the final quantized centroids (k lists of int64)."""
    dims = len(df.select(vec_col).first()[0])
    qdf = df.select(F.col(id_col).alias("__id"), _quantized(vec_col).alias("__xu"))
    centroids = [
        list(r["__xu"]) for r in qdf.orderBy("__id").limit(k).collect()
    ]
    for _ in range(iters):
        assigned = _assign(qdf, centroids, impl)
        sums = (
            assigned.select("cluster", F.posexplode("__xu").alias("i", "x"))
            .groupBy("cluster", "i")
            .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        by_cluster: dict[int, list[int]] = {}
        counts: dict[int, int] = {}
        for r in sums:
            by_cluster.setdefault(r["cluster"], [0] * dims)[r["i"]] = r["s"]
            counts[r["cluster"]] = r["n"]
        centroids = [
            [s // counts[j] for s in by_cluster[j]] if j in by_cluster else c
            for j, c in enumerate(centroids)
        ]
    return centroids


def kmeans_assign(
    df: DataFrame,
    centroids: list[list[int]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    impl: str = "auto",
) -> DataFrame:
    """(id, cluster, dist_u) for every row against fixed quantized
    centroids — one shuffle-free pass."""
    qdf = df.select(F.col(id_col), _quantized(vec_col).alias("__xu"))
    return _assign(qdf, centroids, impl).select(
        id_col, "cluster", "dist_u"
    )


def semdedup(
    df: DataFrame,
    centroids: list[list[int]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.9,
    impl: str = "auto",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023) semantic dedup: assign every vector
    to its cluster, then inside each cluster drop any vector that has a
    LOWER-id neighbor with cosine similarity >= ``threshold`` (one
    deterministic representative per near-duplicate neighborhood).
    Returns (id, cluster, kept).

    The pairwise check is cluster-blocked — never an all-pairs cross
    join; that is the entire point of clustering first.  Work is sum of
    cluster sizes squared; choose k so clusters stay bounded (SemDeDup
    uses tens of thousands of clusters at corpus scale — k here is
    per-call).  Determinism: dot products and norms are exact int64 on
    the quantized vectors; IEEE sqrt/division are correctly rounded, so
    the similarity threshold compares bit-identical doubles in any
    engine — in BOTH implementations: the Catalyst equi-join fold
    (``expr``) and the per-cluster blockwise dgemm (``numpy``, see
    ``_assign_numpy``'s exactness argument) agree bit-for-bit.
    """
    use_numpy = impl == "numpy" or (
        impl == "auto" and len(centroids) * len(centroids[0]) >= 2048
    )
    qdf = df.select(F.col(id_col), _quantized(vec_col).alias("__xu"))
    assigned = _assign(qdf, centroids, impl).select(
        id_col,
        "cluster",
        "__xu",
        F.aggregate(
            F.transform(F.col("__xu"), lambda x: x * x),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("__nsq"),
    )
    if use_numpy:
        return _semdedup_pairwise_numpy(assigned, id_col, threshold)
    a = assigned.select(
        F.col(id_col).alias("__ida"), "cluster",
        F.col("__xu").alias("__xa"), F.col("__nsq").alias("__na"),
    )
    b = assigned.select(
        F.col(id_col).alias("__idb"), "cluster",
        F.col("__xu").alias("__xb"), F.col("__nsq").alias("__nb"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("__xa"), F.col("__xb"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    sim = dot.cast("double") / (
        F.sqrt(F.col("__na").cast("double")) * F.sqrt(F.col("__nb").cast("double"))
    )
    dropped = (
        a.join(b, "cluster")
        .where(
            (F.col("__ida") < F.col("__idb"))
            & (F.col("__na") > 0)
            & (F.col("__nb") > 0)
        )
        .where(sim >= F.lit(threshold))
        .select(F.col("__idb").alias(id_col))
        .distinct()
    )
    return assigned.join(
        dropped.withColumn("__drop", F.lit(True)), id_col, "left"
    ).select(
        id_col, "cluster", F.coalesce(~F.col("__drop"), F.lit(True)).alias("kept")
    )


def _semdedup_pairwise_numpy(
    assigned: DataFrame, id_col: str, threshold: float
) -> DataFrame:
    """Per-cluster blockwise pairwise cosine check (applyInPandas
    grouped by cluster).  Each cluster's rows sort by id; a column is
    dropped when any lower-id row reaches the threshold.  dgemm on the
    quantized int64 coordinates is exact below 2^53 (see
    ``_assign_numpy``), and sim = dot / (sqrt(na)·sqrt(nb)) is the same
    three correctly-rounded IEEE ops the join path runs — bit-identical
    verdicts.  Column blocks of 4096 bound the similarity matrix to
    O(cluster_size · 4096) doubles."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.types import (
        BooleanType,
        IntegerType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            assigned.schema[id_col],
            StructField("cluster", IntegerType(), False),
            StructField("kept", BooleanType(), False),
        ]
    )
    blk = 4096

    def fn(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        m = len(pdf)
        X = np.array(pdf["__xu"].tolist(), dtype=np.int64).astype(np.float64)
        n = (X * X).sum(axis=1)
        valid = n > 0
        rt = np.sqrt(n)
        dropped = np.zeros(m, dtype=bool)
        rows_idx = np.arange(m)
        for s in range(0, m, blk):
            e = min(s + blk, m)
            S = X @ X[s:e].T
            with np.errstate(divide="ignore", invalid="ignore"):
                sim = S / (rt[:, None] * rt[s:e][None, :])
            mask = (
                (rows_idx[:, None] < np.arange(s, e)[None, :])
                & valid[:, None]
                & valid[s:e][None, :]
            )
            dropped[s:e] |= ((sim >= threshold) & mask).any(axis=0)
        return pd.DataFrame(
            {
                id_col: pdf[id_col],
                "cluster": pdf["cluster"].astype("int32"),
                "kept": ~dropped,
            }
        )

    return assigned.groupBy("cluster").applyInPandas(fn, schema=out_schema)


def kdist_outliers(
    df: DataFrame,
    k: int = 4,
    top: int = 20,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    nn: DataFrame | None = None,
) -> DataFrame:
    """Embedding-outlier scoring by k-th-nearest-neighbor distance
    (the k-distance of LOF): the ``top`` vectors whose k-th neighbor is
    farthest — isolated/noisy samples a curation pipeline drops or
    down-weights.  Returns (id, kdist) ordered (kdist desc, id).

    Needs each vector's top-(k+1) neighbors INCLUDING itself: the
    top-k+1 always contains at least k non-self rows, so rank k among
    non-self rows is exact even under exact-duplicate ties.

    ``nn``: precomputed neighbor table ``(query_id, id, distance)``
    holding the top-(k+1) per query — pass
    ``FlatIndex.search_batch(corpus, ..., k=k+1)`` so the whole
    corpus-as-queries set answers in ONE gemm scan (the
    `batch_topk_l2` kernel; at larger scale the IVF batch path
    substitutes).  When None, falls back to a self `search.knn_join`
    — fine for bounded query sets and tests, quadratic dispatch for
    corpus-sized ones (queries.emb_outliers shows the batched wiring).

    Determinism: ordered on the ROUND(·,4) distance with id tie-break,
    matching the oracle's rounding so near-ties cannot diverge across
    engines.
    """
    from pyspark.sql import Window

    if nn is None:
        from .search import knn_join

        left = df.select(
            F.col(id_col).alias("__qid"), F.col(vec_col).alias("__qvec")
        )
        nn = knn_join(
            left,
            df,
            "__qvec",
            vec_col,
            k=k + 1,
            metric="l2",
            partition_keys=["__qid"],
            tiebreaker=id_col,
        ).select(
            F.col("__qid").alias("query_id"),
            F.col(id_col).alias("id"),
            "distance",
        )
    nonself = nn.where(F.col("id") != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy("distance", "id")
    kth = (
        nonself.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == k)
        .select(
            F.col("query_id").alias(id_col),
            F.round(F.col("distance"), 4).alias("kdist"),
        )
    )
    return kth.orderBy(F.desc("kdist"), id_col).limit(top)
