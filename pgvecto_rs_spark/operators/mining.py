"""Contrastive training-pair mining over an embedding table.

Batch-hard triplet mining (FaceNet, Schroff et al. 2015; the "batch
hard" variant of Hermans et al. 2017): for every anchor, the hardest
positive (FARTHEST same-label row — the pair the model most confuses)
and the hardest negative (NEAREST different-label row — the impostor
closest to crossing the margin).  This is the pair-selection step of
contrastive/triplet fine-tuning pipelines — run it over the corpus to
emit (anchor, positive, negative) triplets for a metric-learning pass.

Scale shape: the anchor set (a labeled sample, typically orders of
magnitude smaller than the corpus) broadcasts; the corpus is scanned
ONCE, each partition computing per-anchor partial (max same-label,
min diff-label) struct aggregates — Spark's partial-aggregation pushes
the argmax/argmin map-side, so the only shuffle carries |anchors|
rows, never the corpus.  For anchor sets too large to broadcast, the
IVF-bucketed knn-join (operators/knn_ivf.py) substitutes for the
negative side and a label-bucketed equi-join for the positive side.

Determinism: hardest positive ties break on the SMALLEST candidate id
(max over struct(d, -id)); hardest negative ties likewise (min over
struct(d, id)) — both replayable in ANSI SQL via ROW_NUMBER.

Reference analogue: none (pgvecto.rs users run the per-anchor ORDER BY
distance LIMIT 1 lateral-join by hand); the distance dispatch is
shared with operators/search.py (crates/base/src/distance.rs:5-10).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pgvecto_rs_spark.operators import search as SR

__all__ = ["batch_hard_triplets"]

# Above this anchor count the gemm path's driver collect + task closure
# would be unreasonably large (65k anchors x 64 dims x 8 B = 33 MB);
# fall back to the broadcast-join expression path, which streams the
# anchor table through Spark's own broadcast machinery.
MAX_GEMM_ANCHORS = 65_536


def batch_hard_triplets(
    anchors: DataFrame,
    corpus: DataFrame,
    anchor_id: str = "aid",
    anchor_label: str = "albl",
    anchor_vec: str = "avec",
    corpus_id: str = "cid",
    corpus_label: str = "clbl",
    corpus_vec: str = "cvec",
    metric: str = "l2",
) -> DataFrame:
    """(aid, pos_id, pos_dist, neg_id, neg_dist): per anchor, the
    farthest same-label corpus row and the nearest different-label
    corpus row (the anchor row itself excluded by id).  Anchors with
    no same-label or no different-label peer are dropped (no triplet
    exists for them).  One broadcast + one corpus scan + one
    |anchors|-row shuffle; NULL corpus vectors are skipped, matching
    index semantics (src/index/am.rs:199-211).

    NULL labels are excluded from BOTH sides on BOTH paths: under SQL
    semantics ``NULL == x`` is NULL, so a NULL-label row is neither a
    positive nor a negative — we filter such rows (and NULL-label /
    NULL-vector anchors, which can never yield a triplet) up front so
    the gemm fast path agrees with the expression path exactly.  NaN
    float labels follow Spark's NaN == NaN = TRUE ordering semantics
    on both paths."""
    # Symmetric pre-filters keep the two execution paths semantically
    # identical regardless of which one the anchor count selects.
    anchors = anchors.where(
        F.col(anchor_vec).isNotNull() & F.col(anchor_label).isNotNull()
    )
    corpus = corpus.where(
        F.col(corpus_vec).isNotNull() & F.col(corpus_label).isNotNull()
    )
    if metric in ("l2", "dot", "cos"):
        n_anchors = anchors.count()
        if 0 < n_anchors <= MAX_GEMM_ANCHORS:
            return _gemm_triplets(
                anchors, corpus, anchor_id, anchor_label, anchor_vec,
                corpus_id, corpus_label, corpus_vec, metric,
            )
    j = corpus.join(
        F.broadcast(anchors), F.col(corpus_id) != F.col(anchor_id)
    )
    d = SR.distance(F.col(corpus_vec), F.col(anchor_vec), metric)
    j = j.withColumn("__d", d)
    same = F.col(corpus_label) == F.col(anchor_label)
    agg = j.groupBy(anchor_id).agg(
        F.max(
            F.when(
                same,
                F.struct(
                    F.col("__d").alias("d"), (-F.col(corpus_id)).alias("nid")
                ),
            )
        ).alias("__p"),
        F.min(
            F.when(
                ~same,
                F.struct(F.col("__d").alias("d"), F.col(corpus_id).alias("id")),
            )
        ).alias("__n"),
    )
    return (
        agg.where(F.col("__p").isNotNull() & F.col("__n").isNotNull())
        .select(
            F.col(anchor_id),
            (-F.col("__p.nid")).alias("pos_id"),
            F.col("__p.d").alias("pos_dist"),
            F.col("__n.id").alias("neg_id"),
            F.col("__n.d").alias("neg_dist"),
        )
    )


def _gemm_triplets(
    anchors: DataFrame,
    corpus: DataFrame,
    anchor_id: str,
    anchor_label: str,
    anchor_vec: str,
    corpus_id: str,
    corpus_label: str,
    corpus_vec: str,
    metric: str,
) -> DataFrame:
    """Dense-metric fast path: one gemm per corpus Arrow batch.

    The expression path evaluates the distance as a higher-order-
    function fold per (corpus x anchor) pair — interpreted, outside
    whole-stage codegen, and the dominant cost of the operator (5.2 s
    for a 2k x 200 x 64-dim mining run).  Here each mapInPandas batch
    computes the full distance block with one matmul (||c||^2 +
    ||a||^2 - 2 C@A^T for L2, clamped at 0) and reduces it to ONE
    partial (hardest-pos, hardest-neg) row per anchor, so the shuffle
    still carries only |anchors| rows per partition and the final
    combine is the same struct-argmax/argmin aggregate.  Selection is
    unchanged for any candidate gap wider than gemm round-off
    (~1e-12 relative — far below real embedding gaps; exact duplicate
    vectors still tie exactly and resolve by id).  Ties break on the
    smallest candidate id, as in the expression path.
    """
    rows = anchors.select(anchor_id, anchor_label, anchor_vec).collect()
    aids = np.asarray([r[0] for r in rows], dtype=np.int64)
    albls = np.asarray([r[1] for r in rows])
    amat = np.asarray([list(r[2]) for r in rows], dtype=np.float64)
    a_sq = np.einsum("ij,ij->i", amat, amat)

    out_schema = (
        f"{anchor_id} long, pd double, pnid long, nd double, nid long"
    )

    def part(batches):
        for pdf in batches:
            vec_ok = pdf[corpus_vec].notna()
            pdf = pdf[vec_ok]
            if not len(pdf):
                continue
            cids = pdf[corpus_id].to_numpy(dtype=np.int64)
            clbls = pdf[corpus_label].to_numpy()
            cmat = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[corpus_vec]]
            )
            dots = cmat @ amat.T
            if metric == "l2":
                c_sq = np.einsum("ij,ij->i", cmat, cmat)
                dist = np.maximum(
                    c_sq[:, None] + a_sq[None, :] - 2.0 * dots, 0.0
                )
            elif metric == "dot":
                dist = -dots
            else:  # cos
                c_sq = np.einsum("ij,ij->i", cmat, cmat)
                dist = 1.0 - dots / np.sqrt(c_sq[:, None] * a_sq[None, :])
            same = clbls[:, None] == albls[None, :]
            # Spark orders NaN = NaN as TRUE; numpy says False — align
            # with the expression path for float labels.
            if (
                np.issubdtype(clbls.dtype, np.floating)
                and np.issubdtype(albls.dtype, np.floating)
            ):
                same |= np.isnan(clbls)[:, None] & np.isnan(albls)[None, :]
            selfp = cids[:, None] == aids[None, :]
            res = {anchor_id: [], "pd": [], "pnid": [], "nd": [], "nid": []}
            for j in range(len(aids)):
                dcol = dist[:, j]
                ok = ~selfp[:, j]
                pm = same[:, j] & ok
                nm = ~same[:, j] & ok
                p_d = p_nid = n_d = n_id = None
                if pm.any():
                    dm = dcol[pm]
                    p_d = dm.max()
                    p_nid = -int(cids[pm][dm == p_d].min())
                if nm.any():
                    dm = dcol[nm]
                    n_d = dm.min()
                    n_id = int(cids[nm][dm == n_d].min())
                if p_d is None and n_d is None:
                    continue
                res[anchor_id].append(int(aids[j]))
                res["pd"].append(p_d)
                res["pnid"].append(p_nid)
                res["nd"].append(n_d)
                res["nid"].append(n_id)
            if res[anchor_id]:
                # Missing sides ride as nulls: the id columns use the
                # pandas nullable Int64 dtype (a float None would become
                # NaN, which Spark's ordering treats as LARGEST and
                # would beat every real distance in the max).
                yield pd.DataFrame(
                    {
                        anchor_id: pd.array(res[anchor_id], dtype="Int64"),
                        "pd": pd.array(res["pd"], dtype="Float64"),
                        "pnid": pd.array(res["pnid"], dtype="Int64"),
                        "nd": pd.array(res["nd"], dtype="Float64"),
                        "nid": pd.array(res["nid"], dtype="Int64"),
                    }
                )

    partials = corpus.mapInPandas(part, schema=out_schema)
    agg = partials.groupBy(anchor_id).agg(
        F.max(
            F.when(
                F.col("pd").isNotNull(),
                F.struct(F.col("pd").alias("d"), F.col("pnid").alias("nid")),
            )
        ).alias("__p"),
        F.min(
            F.when(
                F.col("nd").isNotNull(),
                F.struct(F.col("nd").alias("d"), F.col("nid").alias("id")),
            )
        ).alias("__n"),
    )
    return (
        agg.where(F.col("__p").isNotNull() & F.col("__n").isNotNull())
        .select(
            F.col(anchor_id),
            (-F.col("__p.nid")).alias("pos_id"),
            F.col("__p.d").alias("pos_dist"),
            F.col("__n.id").alias("neg_id"),
            F.col("__n.d").alias("neg_dist"),
        )
    )
