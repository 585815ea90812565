"""Index freshness: growing delta + versioned tombstones + compaction.

Reference semantics (SURVEY.md §2.8):

- growing segment: append-only WAL-backed rows, searched brute-force
  (crates/index/src/segment/growing.rs:132-220)
- delete/MVCC: versioned delete map; a payload is visible iff its
  insert-time version is current (crates/index/src/delete.rs:10-74,
  filtered during vbase at crates/index/src/lib.rs:416-422)
- sealing/merge: background optimizer folds growing segments into
  sealed ones and applies deletes
  (crates/index/src/optimizing/mod.rs:33-131)
- crash recovery: WAL replay (lib.rs:128-211) — Parquet's atomic
  task-commit protocol plays the WAL role here: a partially-written
  append never becomes visible.

Spark design: the sealed part is any of the ANN indexes (flat/ivf/hnsw);
the growing part is an append-only Parquet directory searched exactly;
tombstones are (id, version) rows.  A search unions
``sealed ∖ tombstones`` with ``delta_live`` and takes the global top-k
— the LoserTree merge analogue.  ``compact()`` is the optimizer pass:
rebuild the sealed index over the live rows, clear delta + tombstones.

Structured Streaming: ``foreach_batch_sink()`` returns a function for
``writeStream.foreachBatch`` so a stream of (id, vector) rows feeds the
growing segment with exactly-once batches — the ``aminsert`` path.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgvecto_rs_spark.indexes import base
from pgvecto_rs_spark.indexes.flat import FlatIndex
from pgvecto_rs_spark.indexes.hnsw import HNSWIndex
from pgvecto_rs_spark.indexes.ivf import IVFIndex
from pgvecto_rs_spark.operators.search import distance as dist_expr

_KINDS = {"flat": FlatIndex, "ivf": IVFIndex, "hnsw": HNSWIndex}


class FreshVectorIndex:
    """A vector index that stays searchable while rows arrive/leave."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self.meta = base.read_meta(path)
        cls = _KINDS[self.meta["sealed_kind"]]
        self.sealed = cls.open(spark, os.path.join(path, "sealed"))

    # ------------------------------------------------------------------
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        df: DataFrame,
        path: str,
        vector_col: str = "embedding",
        id_col: str = "vec_id",
        metric: str = "l2",
        sealed_kind: str = "flat",
        **index_opts,
    ) -> "FreshVectorIndex":
        idx_cls = _KINDS[sealed_kind]
        idx_cls.create(
            spark,
            df,
            os.path.join(path, "sealed"),
            vector_col=vector_col,
            id_col=id_col,
            metric=metric,
            **index_opts,
        )
        meta = {
            "kind": "fresh",
            "sealed_kind": sealed_kind,
            "metric": metric.lower(),
            "vector_col": vector_col,
            "id_col": id_col,
            "version": 1,
            "index_opts": index_opts,
        }
        base.write_meta(path, meta)
        os.makedirs(os.path.join(path, "delta"), exist_ok=True)
        os.makedirs(os.path.join(path, "tombstones"), exist_ok=True)
        return cls(spark, path)

    open = classmethod(lambda cls, spark, path: cls(spark, path))

    # ------------------------------------------------------------------
    def _bump(self) -> int:
        self.meta["version"] += 1
        base.write_meta(self.path, self.meta)
        return self.meta["version"]

    def insert(self, df: DataFrame) -> None:
        """Append (id, vector) rows to the growing segment
        (``aminsert`` path; NULL vectors skipped like am.rs:266-278)."""
        v = self._bump()
        kernel, do_norm = base.resolve_metric(self.meta["metric"])
        vec = base.normalized_col(self.meta["vector_col"], do_norm).cast("array<float>")
        (
            df.where(F.col(self.meta["vector_col"]).isNotNull())
            .select(
                F.col(self.meta["id_col"]).cast("long").alias("id"),
                vec.alias("vec"),
                F.lit(v).alias("version"),
            )
            .write.mode("append")
            .parquet(os.path.join(self.path, "delta", "rows"))
        )

    def delete(self, ids: Sequence[int]) -> None:
        """Tombstone ids at the current version (delete.rs:52-65 —
        deletes shadow strictly-older inserts, so a later re-insert of
        the same id is visible again)."""
        v = self._bump()
        self.spark.createDataFrame(
            [(int(i), v) for i in ids], "id long, version int"
        ).write.mode("append").parquet(os.path.join(self.path, "tombstones", "rows"))

    def delete_df(self, ids_df: DataFrame, id_col: str = "id") -> None:
        """Distributed bulk delete: tombstone every id in ``ids_df``
        (the ambulkdelete path) without materializing ids on the driver —
        at scale a delete predicate selects millions of rows."""
        v = self._bump()
        (
            ids_df.select(
                F.col(id_col).cast("long").alias("id"), F.lit(v).alias("version")
            )
            .write.mode("append")
            .parquet(os.path.join(self.path, "tombstones", "rows"))
        )

    def foreach_batch_sink(self, auto_compact_rows: int | None = None):
        """For ``stream.writeStream.foreachBatch(idx.foreach_batch_sink())``.

        ``auto_compact_rows`` triggers compaction when the growing
        segment exceeds that many rows — the streaming analogue of the
        optimizer's seal-on-size (max_growing_segment_size = 20,000,
        crates/base/src/index.rs:210-213)."""

        def sink(batch_df: DataFrame, epoch_id: int) -> None:
            self.insert(batch_df)
            if auto_compact_rows is not None:
                self.maybe_compact(auto_compact_rows)

        return sink

    def maybe_compact(
        self,
        max_growing_rows: int = 20_000,
        delete_threshold: float = 0.2,
    ) -> bool:
        """Compact iff the growing segment exceeds the size threshold
        (seal-on-size, optimizing/mod.rs:33-131) OR the tombstoned
        fraction of the sealed index exceeds ``delete_threshold`` (the
        reference's deleted-row GC trigger, crates/base/src/index.rs:
        261-264 default 0.2: past that, every search drags a dead-row
        anti-join worth a fifth of the index).  Returns True if a
        compaction ran."""
        delta = self._delta()
        if delta is not None and delta.count() >= max_growing_rows:
            self.compact()
            return True
        tombs = self._tombstones()
        if tombs is not None:
            sealed_rows = max(1, int(self.sealed.meta.get("n_rows", 1)))
            n_dead = tombs.select("id").distinct().count()
            if n_dead / sealed_rows >= delete_threshold:
                self.compact()
                return True
        return False

    # ------------------------------------------------------------------
    def _read_cached(self, sub: str) -> DataFrame | None:
        """DataFrame handle for ``{path}/{sub}/rows``, cached per file
        fingerprint: re-creating it per search re-runs Spark's file
        listing + schema job (~100 ms each — the dominant warm fresh-
        query cost, same rationale as IVFIndex._lists); inserts/deletes
        change the fingerprint and refresh the handle."""
        p = os.path.join(self.path, sub, "rows")
        files = tuple(
            (f, os.path.getmtime(f), os.path.getsize(f))
            for f in sorted(glob.glob(os.path.join(p, "*.parquet")))
        )
        if not files:
            return None
        cache = getattr(self, "_df_cache", None)
        if cache is None:
            cache = self._df_cache = {}
        hit = cache.get(sub)
        if hit is not None and hit[0] == files:
            return hit[1]
        df = self.spark.read.parquet(p)
        cache[sub] = (files, df)
        return df

    def _delta(self) -> DataFrame | None:
        return self._read_cached("delta")

    def _tombstones(self) -> DataFrame | None:
        return self._read_cached("tombstones")

    def _tomb_agg(self) -> DataFrame | None:
        """Per-id max tombstone version, as a DataFrame — never collected
        to the driver (at scale the tombstone set is millions of ids; it
        flows into searches as a broadcast anti-/left-join only)."""
        tomb = self._tombstones()
        if tomb is None:
            return None
        return tomb.groupBy("id").agg(F.max("version").alias("tv"))

    def search(self, query: Sequence[float], k: int = 10, **search_opts) -> DataFrame:
        """Top-k over sealed ∪ growing, minus tombstoned rows — the
        vbase union + delete filter (crates/index/src/lib.rs:387-423)."""
        tomb_agg = self._tomb_agg()

        # sealed side: rows predate all tombstones -> any tombstone kills
        # (broadcast anti-join inside the index's widening loop)
        sealed = self.sealed.search(query, k=k, exclude=tomb_agg, **search_opts)

        delta = self._delta()
        if delta is None:
            return sealed
        # growing side: brute-force exact over the (small) delta, with
        # version visibility: insert version must beat the tombstone's
        kernel, do_norm = base.resolve_metric(self.meta["metric"])
        q = base.prep_query(query, do_norm)
        d = dist_expr(F.col("vec"), [float(x) for x in q], kernel)
        live = delta
        if tomb_agg is not None:
            live = (
                delta.join(F.broadcast(tomb_agg), "id", "left")
                .where(F.col("tv").isNull() | (F.col("version") > F.col("tv")))
                .drop("tv")
            )
        growing = live.select(
            "id", base.post_map(self.meta["metric"], d).alias("distance")
        )
        merged = sealed.select("id", "distance").unionByName(growing)
        # the same id can be visible on both sides (re-insert without
        # delete); keep its best distance, dedup BEFORE the limit so the
        # result never falls short of k
        merged = merged.groupBy("id").agg(F.min("distance").alias("distance"))
        return merged.orderBy(F.col("distance").asc(), F.col("id").asc()).limit(k)

    def range_search(
        self, query: Sequence[float], radius: float, **search_opts
    ) -> DataFrame:
        """Sphere search over sealed ∪ growing, minus tombstoned rows —
        the freshness twin of ``search``: the sealed index's own
        ``range_search`` (pruned: IVF triangle-inequality lists, HNSW
        stream widening, flat SQ code-bound prefilter) unions a
        brute-forced exact range over the small delta with version
        visibility, deduped to each id's best distance."""
        tomb_agg = self._tomb_agg()
        sealed = self.sealed.range_search(
            query, radius, exclude=tomb_agg, **search_opts
        )
        delta = self._delta()
        if delta is None:
            return sealed
        kernel, do_norm = base.resolve_metric(self.meta["metric"])
        q = base.prep_query(query, do_norm)
        d = dist_expr(F.col("vec"), [float(x) for x in q], kernel)
        live = delta
        if tomb_agg is not None:
            live = (
                delta.join(F.broadcast(tomb_agg), "id", "left")
                .where(F.col("tv").isNull() | (F.col("version") > F.col("tv")))
                .drop("tv")
            )
        growing = live.select(
            "id", base.post_map(self.meta["metric"], d).alias("distance")
        ).where(F.col("distance") < F.lit(float(radius)))
        merged = sealed.select("id", "distance").unionByName(growing)
        return merged.groupBy("id").agg(F.min("distance").alias("distance"))

    # ------------------------------------------------------------------
    def compact(self, incremental: bool | None = None) -> None:
        """The optimizer pass (optimizing/mod.rs:58-105): fold delta into
        the sealed index, apply deletes, clear delta + tombstones.

        For HNSW and IVF sealed indexes the default is *incremental*:
        only the segments / list partitions whose membership changed are
        rebuilt (the reference merges only affected segments,
        optimizing/mod.rs:58-105; HNSW delete-patching,
        hnsw/src/lib.rs:359-390) — at 100x scale a full rebuild per
        compaction is the dominant cost.  Falls back to a full rebuild
        when the delta outgrows half the sealed capacity (HNSW: segment
        count is fixed at create time; IVF: centroids would drift too
        far from the merged distribution)."""
        if incremental is None:
            incremental = self.meta["sealed_kind"] in ("hnsw", "ivf")
        if incremental and self.meta["sealed_kind"] in ("hnsw", "ivf"):
            delta = self._delta()
            if self.meta["sealed_kind"] == "hnsw":
                cap = self.sealed.meta["n_segments"] * self.sealed.meta.get(
                    "segment_rows", 20_000
                )
                small = delta is None or delta.count() <= cap // 2
            else:
                n_sealed = self.sealed.meta.get("n_rows", 0)
                small = delta is None or delta.count() <= max(10_000, n_sealed // 2)
            if small:
                self._compact_incremental()
                return

        tomb_agg = self._tomb_agg()
        sealed_rows = self.spark.read.parquet(
            os.path.join(self.sealed.path, "rows" if self.meta["sealed_kind"] == "flat" else "")
        ) if self.meta["sealed_kind"] == "flat" else None
        if sealed_rows is None:
            # generic path: re-read sealed vectors from the index layout
            sub = {"ivf": "lists", "hnsw": "graph"}[self.meta["sealed_kind"]]
            sealed_rows = self.spark.read.parquet(os.path.join(self.sealed.path, sub)).select("id", "vec")
        else:
            sealed_rows = sealed_rows.select("id", "vec")
        # IVF multi-assignment (replicas>1) stores each id in several
        # lists; dedup before rebuilding or every compaction multiplies
        # rows and storage by the replica factor.
        sealed_rows = sealed_rows.dropDuplicates(["id"])
        if tomb_agg is not None:
            # any tombstone kills a sealed row (all sealed inserts predate
            # all tombstones) — broadcast anti-join, never an IN-list
            sealed_rows = sealed_rows.join(
                F.broadcast(tomb_agg.select("id")), "id", "left_anti"
            )
        live = sealed_rows
        delta = self._delta()
        if delta is not None:
            d_live = delta
            if tomb_agg is not None:
                d_live = (
                    delta.join(F.broadcast(tomb_agg), "id", "left")
                    .where(F.col("tv").isNull() | (F.col("version") > F.col("tv")))
                    .drop("tv")
                )
            # an id can live on both sides (re-insert) or twice in the
            # delta; keep the newest version per id (sealed rows rank as
            # version 0 — they predate every delta append)
            from pyspark.sql import Window

            live = (
                sealed_rows.withColumn("version", F.lit(0))
                .unionByName(d_live.select("id", "vec", "version"))
                .withColumn(
                    "_rn",
                    F.row_number().over(
                        Window.partitionBy("id").orderBy(F.col("version").desc())
                    ),
                )
                .where(F.col("_rn") == 1)
                .select("id", "vec")
            )

        idx_cls = _KINDS[self.meta["sealed_kind"]]
        new_path = os.path.join(self.path, "sealed_new")
        idx_cls.create(
            self.spark,
            live,
            new_path,
            vector_col="vec",
            id_col="id",
            metric=self.meta["metric"],
            **self.meta.get("index_opts", {}),
        )
        old = os.path.join(self.path, "sealed")
        shutil.rmtree(old)
        os.rename(new_path, old)
        for sub in ("delta", "tombstones"):
            shutil.rmtree(os.path.join(self.path, sub), ignore_errors=True)
            os.makedirs(os.path.join(self.path, sub), exist_ok=True)
        self.sealed = idx_cls.open(self.spark, old)
        self._bump()

    def _compact_incremental(self) -> None:
        """Fold delta + tombstones into the sealed index by rebuilding
        only the affected segments (HNSW) / list partitions (IVF) via
        the index's apply_updates."""
        from pyspark.sql import Window

        tomb_agg = self._tomb_agg()
        delta = self._delta()
        d_live = None
        if delta is not None:
            d_live = delta
            if tomb_agg is not None:
                d_live = (
                    delta.join(F.broadcast(tomb_agg), "id", "left")
                    .where(F.col("tv").isNull() | (F.col("version") > F.col("tv")))
                    .drop("tv")
                )
            # newest version per id wins within the delta
            d_live = (
                d_live.withColumn(
                    "_rn",
                    F.row_number().over(
                        Window.partitionBy("id").orderBy(F.col("version").desc())
                    ),
                )
                .where(F.col("_rn") == 1)
                .select("id", "vec")
            )
        self.sealed.apply_updates(delete_ids=tomb_agg, insert_rows=d_live)
        for sub in ("delta", "tombstones"):
            shutil.rmtree(os.path.join(self.path, sub), ignore_errors=True)
            os.makedirs(os.path.join(self.path, sub), exist_ok=True)
        self.sealed = _KINDS[self.meta["sealed_kind"]].open(
            self.spark, os.path.join(self.path, "sealed")
        )
        self._bump()

    def stat(self) -> dict:
        """vector_index_stat analogue (src/index/views.rs:17-80)."""
        delta = self._delta()
        tomb = self._tombstones()
        growing = delta.count() if delta is not None else 0
        return {
            "idx_status": "NORMAL",
            "idx_indexing": False,
            "idx_tuples": self.sealed.meta.get("n_rows", 0) + growing,
            "idx_sealed": [self.sealed.meta.get("n_rows", 0)],
            "idx_growing": [growing] if growing else [],
            "idx_tombstones": tomb.count() if tomb is not None else 0,
            "idx_options": {"sealed_kind": self.meta["sealed_kind"], "metric": self.meta["metric"]},
        }
