"""Streaming near-duplicate admission: incremental MinHash-LSH dedup
at ingest.

The batch pipeline (``dedup.lsh_candidate_pairs`` →
``dedup.verify_pairs_jaccard`` → components → keep-one) answers "which
documents of a finished corpus are near-dups".  An INGEST pipeline asks
the online form: *as documents arrive, admit each one only if no
near-duplicate was admitted before it* — the admission policy a
training-data collector runs continuously.

:class:`StreamingNearDup` maintains a persistent store of admitted
documents' LSH band codes (plus their text, for exact verification) and
processes each micro-batch with the same proven stages:

1. batch signatures (``minhash_signatures_df`` — per-row Arrow map, no
   shuffle) banded into (band, bucket) codes;
2. cross-batch candidates = equi-join of batch codes against the
   admitted store's codes (bucket-confined, never corpus × batch);
3. in-batch candidates = bucket-grouped pair expansion within the
   micro-batch;
4. exact k-shingle Jaccard verification of both candidate sets
   (``verify_pairs_jaccard``);
5. greedy sequential admission in ``id`` order: a document is rejected
   iff it verifies against an already-admitted document (previously
   admitted, or admitted earlier in this same batch).  Only the
   VERIFIED near-dup pair list — not the batch — is resolved on the
   driver: its cardinality is the number of true near-dup pairs
   touching the batch, which the admission policy itself keeps small
   (duplicates of admitted docs are never re-admitted to collide with
   again).
6. survivors' (id, text) and band codes appended to the store
   (Parquet atomic commit — the same WAL-analogue crash story as
   ``FreshVectorIndex``).

The one-shot batch form (:meth:`admit_all`) runs the identical code
path on a static DataFrame, and is the oracle the streaming tests
compare against: any split of the corpus into arrival batches must
produce the same admitted set as one pass.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgvecto_rs_spark.operators.dedup import (
    minhash_signatures_df,
    verify_pairs_jaccard,
)

__all__ = ["StreamingNearDup"]

_BANDS_SCHEMA = "band int, bucket long, doc_id long"


class StreamingNearDup:
    """Incremental near-dup admission over a persistent LSH store.

    Parameters mirror the batch LSH pipeline: ``num_perm`` hash
    permutations split into ``bands`` bands (``num_perm % bands == 0``),
    ``k``-shingle Jaccard verified at ``threshold``.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        threshold: float = 0.9,
        num_perm: int = 32,
        bands: int = 8,
        k: int = 5,
        seed: int = 42,
        text_col: str = "text",
        id_col: str = "doc_id",
    ) -> None:
        if num_perm % bands:
            raise ValueError("num_perm must divide evenly into bands")
        self.spark = spark
        self.path = path
        self.threshold = threshold
        self.num_perm = num_perm
        self.bands = bands
        self.k = k
        self.seed = seed
        self.text_col = text_col
        self.id_col = id_col
        os.makedirs(path, exist_ok=True)

    # -- store ---------------------------------------------------------

    def _admitted_path(self) -> str:
        return os.path.join(self.path, "admitted")

    def _bands_path(self) -> str:
        return os.path.join(self.path, "bands")

    def admitted(self) -> DataFrame:
        """(id, text) of every admitted document so far."""
        p = self._admitted_path()
        if not os.path.isdir(p):
            return self.spark.createDataFrame(
                [], f"{self.id_col} long, {self.text_col} string"
            )
        return self.spark.read.parquet(p)

    def _stored_bands(self) -> DataFrame:
        p = self._bands_path()
        if not os.path.isdir(p):
            return self.spark.createDataFrame([], _BANDS_SCHEMA)
        return self.spark.read.parquet(p)

    # -- banding -------------------------------------------------------

    def _band_codes(self, df: DataFrame) -> DataFrame:
        """(doc_id, band, bucket) — xxhash64 of each band's signature
        slice, seeded by the band id (the same banding rule as
        ``lsh_candidate_pairs``: a LONG bucket key, no string alloc)."""
        rpb = self.num_perm // self.bands
        sig = minhash_signatures_df(
            df, self.text_col, self.id_col, self.num_perm, self.k, self.seed
        )
        return sig.select(
            F.col("__id").alias("doc_id"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            F.xxhash64(
                                F.lit(b),
                                *[
                                    F.col("__sig")[b * rpb + r]
                                    for r in range(rpb)
                                ],
                            ).alias("bucket"),
                        )
                        for b in range(self.bands)
                    ]
                )
            ).alias("bb"),
        ).select("doc_id", "bb.band", "bb.bucket")

    # -- admission -----------------------------------------------------

    def process_batch(self, batch_df: DataFrame) -> list[int]:
        """Admit one micro-batch; returns the admitted ids (sorted).

        Contract: ids are unique across the whole stream (ingest keys);
        a re-sent id is the caller's bug, not a duplicate to detect —
        content duplicates are what this operator detects.
        """
        batch = batch_df.select(self.id_col, self.text_col).cache()
        try:
            codes = self._band_codes(batch).cache()
            ids = [r[0] for r in batch.select(self.id_col).collect()]
            if not ids:
                return []

            # 2. cross-batch candidates: batch codes vs admitted codes
            stored = self._stored_bands()
            cross = (
                codes.alias("n")
                .join(
                    stored.alias("o"),
                    (F.col("n.band") == F.col("o.band"))
                    & (F.col("n.bucket") == F.col("o.bucket")),
                )
                .select(
                    F.col("o.doc_id").alias("id_a"),
                    F.col("n.doc_id").alias("id_b"),
                )
                .where(F.col("id_a") != F.col("id_b"))
                .distinct()
            )
            # 3. in-batch candidates
            within = (
                codes.alias("x")
                .join(
                    codes.alias("y"),
                    (F.col("x.band") == F.col("y.band"))
                    & (F.col("x.bucket") == F.col("y.bucket")),
                )
                .select(
                    F.col("x.doc_id").alias("id_a"),
                    F.col("y.doc_id").alias("id_b"),
                )
                .where(F.col("id_a") < F.col("id_b"))
                .distinct()
            )

            # 4. exact verification over the union corpus (batch texts +
            # only the admitted texts that appear in a candidate pair —
            # verify_pairs_jaccard semi-joins the corpus down itself)
            pairs = cross.unionByName(within)
            corpus = batch.unionByName(
                self.admitted().select(self.id_col, self.text_col)
            )
            verified = verify_pairs_jaccard(
                corpus,
                pairs,
                self.text_col,
                self.id_col,
                self.k,
                self.threshold,
            )
            # bounded driver fetch: true near-dup pairs touching this
            # batch (see module docstring)
            edges = [(r["id_a"], r["id_b"]) for r in verified.collect()]

            # 5. greedy sequential admission in id order
            batch_ids = set(ids)
            blocked_by_old: set[int] = set()
            neighbors: dict[int, set[int]] = {}
            for a, b in edges:
                if a in batch_ids and b in batch_ids:
                    neighbors.setdefault(a, set()).add(b)
                    neighbors.setdefault(b, set()).add(a)
                else:
                    blocked_by_old.add(b if a not in batch_ids else a)
            admitted: list[int] = []
            admitted_set: set[int] = set()
            for i in sorted(ids):
                if i in blocked_by_old:
                    continue
                if neighbors.get(i) and neighbors[i] & admitted_set:
                    continue
                admitted.append(i)
                admitted_set.add(i)

            # 6. persist survivors (atomic Parquet append)
            if admitted:
                keep = self.spark.createDataFrame(
                    [(int(i),) for i in admitted], f"{self.id_col} long"
                )
                surv = batch.join(F.broadcast(keep), self.id_col, "left_semi")
                surv.write.mode("append").parquet(self._admitted_path())
                codes.join(
                    F.broadcast(keep.withColumnRenamed(self.id_col, "doc_id")),
                    "doc_id",
                    "left_semi",
                ).write.mode("append").parquet(self._bands_path())
            return admitted
        finally:
            batch.unpersist()
            try:
                codes.unpersist()
            except Exception:  # noqa: BLE001 — codes may not exist yet
                pass

    def admit_all(self, df: DataFrame) -> list[int]:
        """One-shot batch form: identical policy over a static corpus
        (the oracle for streaming-vs-batch equivalence tests)."""
        return self.process_batch(df)

    def foreach_batch_sink(self):
        """For ``stream.writeStream.foreachBatch(snd.foreach_batch_sink())``."""

        def sink(batch_df: DataFrame, epoch_id: int) -> None:
            self.process_batch(batch_df)

        return sink
