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
- crash recovery: WAL replay + FileAtomic manifest
  (crates/index/src/lib.rs:128-211) — Parquet's atomic task-commit
  protocol plays the WAL role here; the generation MANIFEST below
  plays FileAtomic's.

Spark design: the sealed part is any of the ANN indexes (flat/ivf/hnsw);
the growing part is an append-only Parquet directory searched exactly;
tombstones are (id, version) rows.  A search unions
``sealed ∖ tombstones`` with ``delta_live`` and takes the global top-k
— the LoserTree merge analogue.  ``compact()`` is the optimizer pass:
rebuild the sealed index over the live rows, clear delta + tombstones.

Concurrency (the FileAtomic analogue, crates/index/src/lib.rs:128-211):
all mutable state lives under a numbered generation directory
``gen-NNNNNN/{sealed,delta,tombstones}`` named by ``MANIFEST.json``.
``compact()`` builds the next generation COMPLETELY (never touching the
current one), hardlinks any delta/tombstone files that arrived during
the rebuild into it, then commits by atomically replacing the manifest
(write-temp + ``os.replace``).  The previous generation stays on disk
until the *next* commit (grace-period GC: generation G is deleted when
G+2 commits), so a concurrently planned DataFrame — including cached
handles and mid-flight FileScan tasks — keeps valid files.  Writers
(insert/delete) serialize against the commit step with a lock so an
append always lands in a generation that is either folded or carried
forward; readers never take the lock.

Structured Streaming: ``foreach_batch_sink()`` returns a function for
``writeStream.foreachBatch`` so a stream of (id, vector) rows feeds the
growing segment with exactly-once batches — the ``aminsert`` path.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import threading
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgvecto_rs_spark.indexes import base
from pgvecto_rs_spark.indexes.flat import FlatIndex
from pgvecto_rs_spark.indexes.hnsw import HNSWIndex
from pgvecto_rs_spark.indexes.ivf import IVFIndex
from pgvecto_rs_spark.operators.search import distance as dist_expr

_KINDS = {"flat": FlatIndex, "ivf": IVFIndex, "hnsw": HNSWIndex}

_MANIFEST = "MANIFEST.json"


def _gen_name(n: int) -> str:
    return f"gen-{n:06d}"


def _publish_manifest(path: str, gen: int) -> None:
    """Atomically publish the manifest: write-temp + flush + fsync +
    ``os.replace``.  The fsync matters — without it a crash between the
    replace and the data reaching disk can publish an empty/partial
    manifest that makes every subsequent ``open()`` fail (FileAtomic
    parity, crates/index/src/lib.rs:128-211)."""
    tmp = os.path.join(path, _MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump({"generation": gen}, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(path, _MANIFEST))


def _link_or_copy_tree(src: str, dst: str) -> None:
    """Clone a directory tree cheaply: hardlink immutable data files
    (Spark never rewrites a committed parquet file in place — overwrite
    modes unlink and write fresh inodes, which leaves the source link
    intact), but COPY .json metadata, which index code rewrites via
    ``open(.., "w")`` and would otherwise mutate the shared inode."""
    for root, _dirs, files in os.walk(src):
        rel = os.path.relpath(root, src)
        troot = os.path.join(dst, rel) if rel != "." else dst
        os.makedirs(troot, exist_ok=True)
        for f in files:
            s, d = os.path.join(root, f), os.path.join(troot, f)
            if f.endswith(".json"):
                shutil.copy2(s, d)
            else:
                os.link(s, d)


class FreshVectorIndex:
    """A vector index that stays searchable while rows arrive/leave."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self.meta = base.read_meta(path)
        # writers + manifest commits serialize on this; readers don't
        self._write_lock = threading.RLock()
        self._compact_lock = threading.Lock()
        self._df_cache: dict = {}
        self._migrate_legacy_layout()
        self._gen = self._read_manifest()
        cls = _KINDS[self.meta["sealed_kind"]]
        self.sealed = cls.open(spark, os.path.join(self._gen_dir(), "sealed"))

    # -- generation bookkeeping ----------------------------------------
    def _migrate_legacy_layout(self) -> None:
        """Pre-generation indexes kept sealed/delta/tombstones at the
        root; fold them into gen-000000 once, on open."""
        if os.path.exists(os.path.join(self.path, _MANIFEST)):
            return
        g0 = os.path.join(self.path, _gen_name(0))
        os.makedirs(g0, exist_ok=True)
        for sub in ("sealed", "delta", "tombstones"):
            src = os.path.join(self.path, sub)
            if os.path.exists(src):
                os.rename(src, os.path.join(g0, sub))
            else:
                os.makedirs(os.path.join(g0, sub), exist_ok=True)
        self._write_manifest(0)

    def _read_manifest(self) -> int:
        with open(os.path.join(self.path, _MANIFEST)) as f:
            return int(json.load(f)["generation"])

    def _write_manifest(self, gen: int) -> None:
        _publish_manifest(self.path, gen)

    def _gen_dir(self, gen: int | None = None) -> str:
        return os.path.join(self.path, _gen_name(self._gen if gen is None else gen))

    def _refresh(self) -> None:
        """Adopt a newer generation committed by another handle/thread
        on the same path (readers see commits without any locking)."""
        gen = self._read_manifest()
        if gen == self._gen:
            return
        with self._write_lock:
            if gen == self._gen:
                return
            cls = _KINDS[self.meta["sealed_kind"]]
            self.sealed = cls.open(self.spark, os.path.join(self._gen_dir(gen), "sealed"))
            self._df_cache.clear()
            self._gen = gen
            self.meta = base.read_meta(self.path)

    def _gc(self, keep_from: int) -> None:
        """Delete generations below ``keep_from``.  Called after a
        commit with ``keep_from = new_gen - 1`` so the previous
        generation survives one full compaction cycle — the grace
        period for in-flight plans."""
        for d in glob.glob(os.path.join(self.path, "gen-*")):
            name = os.path.basename(d)
            try:
                n = int(name.split("-", 1)[1])
            except ValueError:
                continue
            if n < keep_from:
                shutil.rmtree(d, ignore_errors=True)

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
        g0 = os.path.join(path, _gen_name(0))
        idx_cls.create(
            spark,
            df,
            os.path.join(g0, "sealed"),
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
        os.makedirs(os.path.join(g0, "delta"), exist_ok=True)
        os.makedirs(os.path.join(g0, "tombstones"), exist_ok=True)
        _publish_manifest(path, 0)
        return cls(spark, path)

    open = classmethod(lambda cls, spark, path: cls(spark, path))

    # ------------------------------------------------------------------
    def _bump(self) -> int:
        self.meta["version"] += 1
        base.write_meta(self.path, self.meta)
        return self.meta["version"]

    def insert(self, df: DataFrame) -> None:
        """Append (id, vector) rows to the growing segment
        (``aminsert`` path; NULL vectors skipped like am.rs:266-278).

        Serialized with compaction commits (not with the rebuild) so an
        append lands either in the generation being folded — where the
        commit step carries its files forward — or in the committed new
        one; it can never vanish into a just-retired directory."""
        with self._write_lock:
            self._refresh()
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
                .parquet(os.path.join(self._gen_dir(), "delta", "rows"))
            )

    def delete(self, ids: Sequence[int]) -> None:
        """Tombstone ids at the current version (delete.rs:52-65 —
        deletes shadow strictly-older inserts, so a later re-insert of
        the same id is visible again)."""
        with self._write_lock:
            self._refresh()
            v = self._bump()
            self.spark.createDataFrame(
                [(int(i), v) for i in ids], "id long, version int"
            ).write.mode("append").parquet(
                os.path.join(self._gen_dir(), "tombstones", "rows")
            )

    def delete_df(self, ids_df: DataFrame, id_col: str = "id") -> None:
        """Distributed bulk delete: tombstone every id in ``ids_df``
        (the ambulkdelete path) without materializing ids on the driver —
        at scale a delete predicate selects millions of rows."""
        with self._write_lock:
            self._refresh()
            v = self._bump()
            (
                ids_df.select(
                    F.col(id_col).cast("long").alias("id"), F.lit(v).alias("version")
                )
                .write.mode("append")
                .parquet(os.path.join(self._gen_dir(), "tombstones", "rows"))
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
        self._refresh()
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
    def _list_files(self, sub: str, gen: int | None = None) -> tuple[str, ...]:
        p = os.path.join(self._gen_dir(gen), sub, "rows")
        return tuple(sorted(glob.glob(os.path.join(p, "*.parquet"))))

    def _read_cached(self, sub: str, files: tuple[str, ...] | None = None) -> DataFrame | None:
        """DataFrame handle for the growing/tombstone rows, cached per
        file fingerprint: re-creating it per search re-runs Spark's file
        listing + schema job (~100 ms each — the dominant warm fresh-
        query cost, same rationale as IVFIndex._lists); inserts/deletes
        change the fingerprint and refresh the handle.  When ``files``
        is given the read is pinned to EXACTLY that snapshot (used by
        compaction so concurrently arriving appends are carried forward
        instead of half-folded)."""
        if files is None:
            files = self._list_files(sub)
        if not files:
            return None
        fp = tuple((f, os.path.getmtime(f), os.path.getsize(f)) for f in files)
        hit = self._df_cache.get(sub)
        if hit is not None and hit[0] == fp:
            return hit[1]
        df = self.spark.read.parquet(*files)
        self._df_cache[sub] = (fp, df)
        return df

    def _delta(self) -> DataFrame | None:
        return self._read_cached("delta")

    def _tombstones(self) -> DataFrame | None:
        return self._read_cached("tombstones")

    def _tomb_agg(self, tomb: DataFrame | None = None) -> DataFrame | None:
        """Per-id max tombstone version, as a DataFrame — never collected
        to the driver (at scale the tombstone set is millions of ids; it
        flows into searches as a broadcast anti-/left-join only).

        The aggregate is MATERIALIZED once per tombstone-file
        fingerprint (eager localCheckpoint, cached like the raw handles
        in ``_read_cached``): every search consumes it in TWO broadcast
        builds (sealed-side anti-join + growing-side visibility join),
        so without this each search re-ran the tombstone parquet scan +
        groupBy twice — the in-memory delete map the reference keeps
        (crates/index/src/delete.rs) is the design analogue.  Writers
        clear ``_df_cache``, which invalidates this too."""
        if tomb is None:
            tomb = self._tombstones()
        if tomb is None:
            return None
        fp = self._df_cache.get("tombstones")
        hit = self._df_cache.get("tomb_agg")
        if hit is not None and fp is not None and hit[0] == fp[0]:
            return hit[1]
        agg = tomb.groupBy("id").agg(F.max("version").alias("tv")).localCheckpoint(
            eager=True
        )
        if fp is not None:
            self._df_cache["tomb_agg"] = (fp[0], agg)
        return agg

    def search(self, query: Sequence[float], k: int = 10, **search_opts) -> DataFrame:
        """Top-k over sealed ∪ growing, minus tombstoned rows — the
        vbase union + delete filter (crates/index/src/lib.rs:387-423)."""
        self._refresh()
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
        self._refresh()
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
    def _commit(self, old_gen: int, snap_delta: tuple, snap_tomb: tuple) -> None:
        """Publish generation ``old_gen + 1``: carry forward any delta/
        tombstone files that arrived after the snapshot (hardlinks — the
        writers hold .parquet files immutable once committed), atomically
        swap the manifest, then GC generations older than ``old_gen``
        (grace period: the just-retired generation survives until the
        NEXT commit, so every in-flight plan keeps valid files)."""
        new_gen = old_gen + 1
        with self._write_lock:
            for sub, snap in (("delta", snap_delta), ("tombstones", snap_tomb)):
                dst = os.path.join(self._gen_dir(new_gen), sub, "rows")
                carried = [f for f in self._list_files(sub, old_gen) if f not in set(snap)]
                if carried:
                    os.makedirs(dst, exist_ok=True)
                for f in carried:
                    os.link(f, os.path.join(dst, os.path.basename(f)))
                os.makedirs(os.path.join(self._gen_dir(new_gen), sub), exist_ok=True)
            self._write_manifest(new_gen)
            self._gen = new_gen
            self._df_cache.clear()
            self.sealed = _KINDS[self.meta["sealed_kind"]].open(
                self.spark, os.path.join(self._gen_dir(), "sealed")
            )
            self._bump()
        self._gc(keep_from=old_gen)

    def compact(self, incremental: bool | None = None) -> None:
        """The optimizer pass (optimizing/mod.rs:58-105): fold delta into
        the sealed index, apply deletes, publish a new generation with an
        empty delta + tombstones.

        For HNSW and IVF sealed indexes the default is *incremental*:
        only the segments / list partitions whose membership changed are
        rebuilt (the reference merges only affected segments,
        optimizing/mod.rs:58-105; HNSW delete-patching,
        hnsw/src/lib.rs:359-390) — at 100x scale a full rebuild per
        compaction is the dominant cost.  Falls back to a full rebuild
        when the delta outgrows half the sealed capacity (HNSW: segment
        count is fixed at create time; IVF: centroids would drift too
        far from the merged distribution)."""
        with self._compact_lock:
            self._refresh()
            old_gen = self._gen
            snap_delta = self._list_files("delta", old_gen)
            snap_tomb = self._list_files("tombstones", old_gen)
            delta = self._read_cached("delta", snap_delta)
            tomb_agg = self._tomb_agg(self._read_cached("tombstones", snap_tomb))

            if incremental is None:
                incremental = self.meta["sealed_kind"] in ("hnsw", "ivf")
            if incremental and self.meta["sealed_kind"] in ("hnsw", "ivf"):
                if self.meta["sealed_kind"] == "hnsw":
                    cap = self.sealed.meta["n_segments"] * self.sealed.meta.get(
                        "segment_rows", 20_000
                    )
                    small = delta is None or delta.count() <= cap // 2
                else:
                    n_sealed = self.sealed.meta.get("n_rows", 0)
                    small = delta is None or delta.count() <= max(10_000, n_sealed // 2)
                if small:
                    self._compact_incremental(old_gen, delta, tomb_agg, snap_delta, snap_tomb)
                    return

            sealed_path = os.path.join(self._gen_dir(old_gen), "sealed")
            if self.meta["sealed_kind"] == "flat":
                sealed_rows = self.spark.read.parquet(
                    os.path.join(sealed_path, "rows")
                ).select("id", "vec")
            else:
                sub = {"ivf": "lists", "hnsw": "graph"}[self.meta["sealed_kind"]]
                sealed_rows = self.spark.read.parquet(
                    os.path.join(sealed_path, sub)
                ).select("id", "vec")
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
            new_sealed = os.path.join(self._gen_dir(old_gen + 1), "sealed")
            shutil.rmtree(self._gen_dir(old_gen + 1), ignore_errors=True)
            idx_cls.create(
                self.spark,
                live,
                new_sealed,
                vector_col="vec",
                id_col="id",
                metric=self.meta["metric"],
                **self.meta.get("index_opts", {}),
            )
            self._commit(old_gen, snap_delta, snap_tomb)

    def _compact_incremental(
        self,
        old_gen: int,
        delta: DataFrame | None,
        tomb_agg: DataFrame | None,
        snap_delta: tuple,
        snap_tomb: tuple,
    ) -> None:
        """Fold delta + tombstones into the sealed index by rebuilding
        only the affected segments (HNSW) / list partitions (IVF) via
        the index's apply_updates — run against a hardlink CLONE of the
        sealed directory in the next generation, so the current
        generation's files are never touched (apply_updates' dynamic
        partition overwrite unlinks and writes fresh inodes; the old
        generation keeps its links)."""
        from pyspark.sql import Window

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
        old_sealed = os.path.join(self._gen_dir(old_gen), "sealed")
        new_sealed = os.path.join(self._gen_dir(old_gen + 1), "sealed")
        shutil.rmtree(self._gen_dir(old_gen + 1), ignore_errors=True)
        _link_or_copy_tree(old_sealed, new_sealed)
        clone = _KINDS[self.meta["sealed_kind"]].open(self.spark, new_sealed)
        clone.apply_updates(delete_ids=tomb_agg, insert_rows=d_live)
        self._commit(old_gen, snap_delta, snap_tomb)

    def stat(self) -> dict:
        """vector_index_stat analogue (src/index/views.rs:17-80)."""
        self._refresh()
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

    def cleanup_stale_transactions(self, max_age_seconds: float = 86_400.0) -> int:
        """Disk GC for crash-abandoned transactions: remove ``txn-*``
        staging directories whose mtime is older than
        ``max_age_seconds``.  Staged batches are invisible to readers
        until commit, so this can never lose committed data — it only
        reclaims the space a process that died mid-transaction left
        behind (Postgres reclaims the same way via vacuum after an
        aborted xact).  Returns the number of directories removed."""
        import time

        n = 0
        now = time.time()
        for d in glob.glob(os.path.join(self.path, "txn-*")):
            try:
                if os.path.isdir(d) and now - os.path.getmtime(d) >= max_age_seconds:
                    shutil.rmtree(d, ignore_errors=True)
                    # Count only what actually went away: rmtree with
                    # ignore_errors can fail (permissions, live writer on
                    # another mount) and a survivor must not be counted —
                    # it will be retried, and recounted, next call.
                    if not os.path.isdir(d):
                        n += 1
            except OSError:
                continue
        return n

    # ------------------------------------------------------------------
    def begin(self) -> "IndexTransaction":
        """Open a transaction: writes staged through it are INVISIBLE to
        every reader (including this handle) until ``commit()``;
        ``rollback()`` discards them without a trace — the mirror of the
        reference's xact commit/abort hooks (src/index/hooks.rs:76-106,
        tests/transaction/test.sql: an aborted transaction leaves the
        index exactly as it was).

        Usable as a context manager: commit on clean exit, rollback on
        exception."""
        return IndexTransaction(self)


class IndexTransaction:
    """Transaction-scoped write batch for :class:`FreshVectorIndex`.

    Staged rows live in a ``txn-<id>/`` directory next to the ``gen-*``
    generations; readers only ever resolve files through the manifest's
    generation directory, so staged files are structurally invisible —
    no flag checks on the read path.  ``commit()`` publishes by
    hardlinking the staged parquet parts into the live generation's
    delta/tombstones under the writer lock (same per-file granularity
    as a plain ``insert()`` append), so a compaction racing the commit
    either folds the files or carries them forward, exactly like any
    other append.  ``rollback()`` removes the staging directory.

    Versions are assigned at STAGE time from the index's global version
    counter: the write's serialization point is when it is staged, the
    commit only makes the batch visible atomically-per-file.  (A
    non-transactional delete of the same id issued between stage and
    commit therefore shadows the staged insert — a documented
    divergence from Postgres snapshot semantics, where the delete could
    not have seen the uncommitted row.)
    """

    def __init__(self, idx: FreshVectorIndex):
        import uuid

        self._idx = idx
        self._dir = os.path.join(idx.path, f"txn-{uuid.uuid4().hex[:12]}")
        self._open = True
        self._staged = 0  # stage() calls recorded — commit() cross-checks
        os.makedirs(os.path.join(self._dir, "delta", "rows"), exist_ok=True)
        os.makedirs(os.path.join(self._dir, "tombstones", "rows"), exist_ok=True)
        # Liveness marker, stamped once at begin(): a Spark parquet
        # append RECREATES a missing target directory, so a staging dir
        # GC'd mid-transaction would otherwise come back from the dead
        # holding only post-GC batches — and commit would publish that
        # partial batch silently.  Every stage and the commit verify the
        # marker; a recreated dir lacks it and fails loudly instead.
        with open(os.path.join(self._dir, "OPEN"), "w") as f:
            f.write("txn liveness marker — see IndexTransaction.__init__\n")

    def _check_open(self) -> None:
        if not self._open:
            raise RuntimeError("transaction already committed or rolled back")

    def _check_marker(self) -> None:
        """Fail loudly if the staging dir was GC'd (and possibly
        recreated by a later parquet write) mid-transaction."""
        if not os.path.isfile(os.path.join(self._dir, "OPEN")):
            self._open = False
            raise RuntimeError(
                f"transaction staging dir {self._dir} was removed "
                f"mid-transaction ({self._staged} staged batch(es) may be "
                "lost) — was it GC'd as stale while staging stalled past "
                "max_age_seconds?"
            )

    def _staged_write(self, writer, path: str) -> None:
        """Run a staging parquet append; if it blows up BECAUSE the
        staging dir was swept mid-write (GC raced the write itself, not
        just the gaps between writes), surface the documented loud
        RuntimeError instead of a raw Spark task failure."""
        try:
            writer.parquet(path)
        except Exception as e:  # noqa: BLE001 - re-raised unless swept
            if os.path.isfile(os.path.join(self._dir, "OPEN")):
                raise
            self._open = False
            raise RuntimeError(
                f"transaction staging dir {self._dir} was removed "
                f"mid-write ({self._staged} staged batch(es) may be "
                "lost) — was it GC'd as stale while staging stalled "
                "past max_age_seconds?"
            ) from e

    def _touch(self) -> None:
        """Refresh the staging dir's mtime on every stage: parquet writes
        land in ``txn-*/delta/rows/`` and do NOT bump the top-level dir,
        which is what :meth:`FreshVectorIndex.cleanup_stale_transactions`
        judges staleness by — without this, a long-lived transaction that
        keeps writing could be GC'd mid-flight."""
        try:
            os.utime(self._dir)
        except OSError:
            pass

    def _next_version(self) -> int:
        idx = self._idx
        with idx._write_lock:
            idx._refresh()
            return idx._bump()

    def insert(self, df: DataFrame) -> None:
        """Stage (id, vector) rows — the transactional ``aminsert``."""
        self._check_open()
        idx = self._idx
        v = self._next_version()
        kernel, do_norm = base.resolve_metric(idx.meta["metric"])
        vec = base.normalized_col(idx.meta["vector_col"], do_norm).cast("array<float>")
        w = (
            df.where(F.col(idx.meta["vector_col"]).isNotNull())
            .select(
                F.col(idx.meta["id_col"]).cast("long").alias("id"),
                vec.alias("vec"),
                F.lit(v).alias("version"),
            )
            .write.mode("append")
        )
        self._staged_write(w, os.path.join(self._dir, "delta", "rows"))
        self._staged += 1
        self._touch()
        self._check_marker()

    def delete(self, ids: Sequence[int]) -> None:
        self._check_open()
        v = self._next_version()
        w = self._idx.spark.createDataFrame(
            [(int(i), v) for i in ids], "id long, version int"
        ).write.mode("append")
        self._staged_write(w, os.path.join(self._dir, "tombstones", "rows"))
        self._staged += 1
        self._touch()
        self._check_marker()

    def delete_df(self, ids_df: DataFrame, id_col: str = "id") -> None:
        self._check_open()
        v = self._next_version()
        w = (
            ids_df.select(
                F.col(id_col).cast("long").alias("id"), F.lit(v).alias("version")
            )
            .write.mode("append")
        )
        self._staged_write(w, os.path.join(self._dir, "tombstones", "rows"))
        self._staged += 1
        self._touch()
        self._check_marker()

    def commit(self) -> None:
        """Publish the staged batch into the live generation.

        Raises ``RuntimeError`` instead of silently committing nothing if
        the staging directory disappeared (e.g. a too-aggressive
        ``cleanup_stale_transactions`` on another handle, or manual rm) —
        a stage was recorded, so an empty publish means staged writes
        were LOST and the caller must know."""
        self._check_open()
        idx = self._idx
        if self._staged and not os.path.isdir(self._dir):
            self._open = False
            raise RuntimeError(
                f"transaction staging dir {self._dir} vanished before commit "
                f"({self._staged} staged batch(es) lost) — was it GC'd as stale?"
            )
        # a GC'd-then-recreated dir (parquet append resurrects missing
        # paths) holds only post-GC batches — the marker catches it
        self._check_marker()
        published = 0
        linked: list[str] = []
        with idx._write_lock:
            idx._refresh()
            try:
                for sub in ("delta", "tombstones"):
                    files = sorted(
                        glob.glob(os.path.join(self._dir, sub, "rows", "*.parquet"))
                    )
                    published += len(files)
                    if not files:
                        continue
                    dst = os.path.join(idx._gen_dir(), sub, "rows")
                    os.makedirs(dst, exist_ok=True)
                    for f in files:
                        target = os.path.join(dst, os.path.basename(f))
                        os.link(f, target)
                        linked.append(target)
            except OSError as e:
                # staging swept away between the marker check and the
                # hardlink (GC racing commit): unlink what was already
                # published so the batch stays all-or-nothing, then fail
                # loudly — never a partial publish presented as success
                for t in linked:
                    try:
                        os.unlink(t)
                    except OSError:
                        pass
                self._open = False
                idx._df_cache.clear()
                raise RuntimeError(
                    f"transaction staging files under {self._dir} vanished "
                    f"during commit ({e}) — staged writes lost"
                ) from e
            idx._df_cache.clear()
        if self._staged and published == 0:
            self._open = False
            raise RuntimeError(
                f"transaction staged {self._staged} batch(es) but no parquet "
                f"parts were found under {self._dir} at commit — staged "
                "writes lost"
            )
        self._open = False
        shutil.rmtree(self._dir, ignore_errors=True)

    def rollback(self) -> None:
        """Discard the staged batch — the index is untouched."""
        self._check_open()
        self._open = False
        shutil.rmtree(self._dir, ignore_errors=True)

    def __enter__(self) -> "IndexTransaction":
        return self

    def __exit__(self, exc_type, exc, tb) -> None:
        if not self._open:
            return
        if exc_type is None:
            self.commit()
        else:
            self.rollback()
