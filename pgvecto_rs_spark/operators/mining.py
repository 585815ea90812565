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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pgvecto_rs_spark.operators import search as SR

__all__ = ["batch_hard_triplets"]


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
    index semantics (src/index/am.rs:199-211)."""
    j = corpus.join(
        F.broadcast(anchors), F.col(corpus_id) != F.col(anchor_id)
    ).where(F.col(corpus_vec).isNotNull())
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
