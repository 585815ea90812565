"""Flat (brute-force) index with optional scalar quantization.

Reference: crates/flat/src/lib.rs (vbase :42-64 = scan all codes, keep a
rerank window, rerank by exact distance; build :83-107), scalar
quantization crates/quantization/src/scalar.rs:32-120 (per-dim min/max,
k-bit codes; bits ∈ {1,2,4,8} — crates/base/src/index.rs:447-462),
window reranker crates/quantization/src/reranker/flat.rs, error-bound
reranker crates/quantization/src/reranker/error.rs.

Spark design:

- exact path: the scan IS the index — Parquet columnar + TakeOrdered.
- SQ path: store ``codes array<smallint>`` next to the exact vectors
  (``sq{1,2,4,8}``; Parquet dictionary/RLE encoding compresses the
  low-cardinality codes, so 1/2/4-bit cells shrink on disk without an
  explicit bit-packing pass).  First pass scans only the code column,
  computes approximate distances natively (decode = min + code·Δ inside
  zip_with), then reranks by exact distance.  Two rerank policies:

  * **error-bound** (default, reranker/error.rs analogue): the per-dim
    rounding error ε_j = width_j / (2·levels) gives sound bounds on the
    true distance per candidate; the rerank set = every candidate whose
    lower bound beats the k-th smallest upper bound.  Adaptive — no
    fixed window guess — and provably exact.
  * **window** (reranker/flat.rs): fixed ``max(k, rerank_size)`` window
    when the caller passes ``rerank_size``.
"""

from __future__ import annotations

import math
import os
from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgvecto_rs_spark.indexes import base
from pgvecto_rs_spark.operators.search import distance as dist_expr

SQ_BITS = 8  # default (crates/base/src/index.rs:447-462)
_SQ_KINDS = {"sq1": 1, "sq2": 2, "sq4": 4, "sq8": 8}
_ISIN_LITERAL_CAP = 512  # max ids to inline as IN-list literals (planning cost)


class FlatIndex:
    #: range_search returns the provably-complete sphere (exact scan /
    #: SQ error-bound two-phase) -- the planner may answer a bare sphere
    #: predicate with it.
    RANGE_EXACT = True

    def __init__(self, spark: SparkSession, path: str, meta: dict):
        self.spark = spark
        self.path = path
        self.meta = meta

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        df: DataFrame,
        path: str,
        vector_col: str = "embedding",
        id_col: str = "vec_id",
        metric: str = "l2",
        quantization: str | None = None,  # None | "sq{1,2,4,8}" | "pq" | "rabitq"
        where=None,  # partial index predicate (partition.slt 'partial index')
        pq_ratio: int = 1,  # dims per subspace (base/src/index.rs:475-496)
        pq_bits: int = 8,  # codebook size 2^bits (base/src/index.rs:482-496)
        seed: int = 42,
        storage: str = "f32",  # "f32" | "f16" (vecf16: 2 bytes/dim)
    ) -> "FlatIndex":
        kernel, do_norm = base.resolve_metric(metric)
        os.makedirs(path, exist_ok=True)
        src = df.where(F.col(vector_col).isNotNull())
        if where is not None:
            src = src.where(where)  # partial index: only matching rows are indexed
        vec = base.normalized_col(vector_col, do_norm).cast("array<float>")
        prepared = src.select(F.col(id_col).alias("id"), vec.alias("vec"))

        if storage == "f16":
            # vecf16 storage model (crates/base/src/scalar/f16.rs): values
            # live on the IEEE binary16 grid, 2 bytes per dim on disk.  A
            # BINARY column of raw f16 words guarantees the 2-byte layout
            # (Parquet has no 16-bit physical type); compute decodes to
            # f32/f64 per Arrow batch, exactly like the reference computes
            # f16 via f32.
            if quantization is not None:
                raise ValueError("f16 storage does not compose with quantization")

            @F.pandas_udf("binary")
            def to_f16_bytes(v: pd.Series) -> pd.Series:
                return v.map(
                    lambda x: None
                    if x is None
                    else np.asarray(x, dtype=np.float32).astype(np.float16).tobytes()
                )

            dims = len(prepared.select("vec").first()["vec"])
            prepared = prepared.select("id", to_f16_bytes("vec").alias("vec16"))
            prepared.write.mode("overwrite").parquet(os.path.join(path, "rows"))
            n = spark.read.parquet(os.path.join(path, "rows")).count()
            meta = {
                "kind": "flat",
                "metric": metric.lower(),
                "kernel": kernel,
                "normalize": do_norm,
                "quantization": None,
                "storage": "f16",
                "dims": dims,
                "n_rows": int(n),
            }
            base.write_meta(path, meta)
            return cls(spark, path, meta)
        if storage != "f32":
            raise ValueError(f"unknown storage {storage!r} (f32 | f16)")

        meta: dict = {
            "kind": "flat",
            "metric": metric.lower(),
            "kernel": kernel,
            "normalize": do_norm,
            "quantization": quantization,
            "storage": "f32",
        }

        if quantization in ("pq", "rabitq"):
            from pgvecto_rs_spark.indexes import quantization as Qz

            dims = len(prepared.select("vec").first()["vec"])
            meta["dims"] = dims
            # uniform sample, not limit(): limit takes the first
            # partitions only, which trains codebooks on a biased slice
            # when the input is sorted or partition-skewed
            n_total = prepared.count()
            fraction = min(1.0, Qz.TRAIN_CAP / max(n_total, 1))
            sample = (
                prepared.select("vec")
                .sample(fraction=fraction, seed=seed)
                .limit(Qz.TRAIN_CAP)
                .collect()
            )
            x = np.asarray([r["vec"] for r in sample], dtype=np.float64)
            if quantization == "pq":
                n_sub = dims // pq_ratio
                books = Qz.pq_train(x, n_sub, bits=pq_bits, seed=seed)
                np.save(os.path.join(path, "pq_codebooks.npy"), books, allow_pickle=False)
                prepared = prepared.withColumn("codes", Qz.pq_encode_udf(books, spark)("vec"))
                meta["pq_subspaces"] = n_sub
                meta["pq_ratio"] = int(pq_ratio)
            else:
                proj = Qz.rabitq_projection(dims, seed)
                np.save(os.path.join(path, "rabitq_proj.npy"), proj, allow_pickle=False)
                enc = Qz.rabitq_encode_udf(proj, spark)("vec")
                prepared = prepared.withColumn("rq", enc)

        if quantization in _SQ_KINDS:
            # per-dim min/max over the dataset (scalar.rs:32-60 trains
            # the same bounds); one aggregation pass.
            bits = _SQ_KINDS[quantization]
            dims = len(prepared.select("vec").first()["vec"])
            exploded = prepared.select(F.posexplode("vec").alias("pos", "x"))
            mm = (
                exploded.groupBy("pos")
                .agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
                .orderBy("pos")
                .collect()
            )
            lo = np.array([r["lo"] for r in mm], dtype=np.float64)
            hi = np.array([r["hi"] for r in mm], dtype=np.float64)
            width = np.where(hi > lo, hi - lo, 1.0)
            lo_c = F.array(*[F.lit(float(v)) for v in lo])
            w_c = F.array(*[F.lit(float(v)) for v in width])
            levels = (1 << bits) - 1
            codes = F.zip_with(
                F.col("vec").cast("array<double>"),
                F.zip_with(lo_c, w_c, lambda a, b: F.struct(a.alias("lo"), b.alias("w"))),
                lambda x, p: F.least(
                    F.lit(levels),
                    F.greatest(
                        F.lit(0), F.round((x - p["lo"]) / p["w"] * levels, 0).cast("int")
                    ),
                ).cast("smallint"),
            )
            prepared = prepared.withColumn("codes", codes)
            meta["sq_lo"] = lo.tolist()
            meta["sq_width"] = width.tolist()
            meta["sq_bits"] = bits
            meta["dims"] = dims

        # range-partitioned + sorted by id: Parquet min/max stats then
        # skip row groups for the rerank's `id IN (...)` fetch — the
        # two-phase scan reads the codes column in pass 1 and only the
        # touched row groups' vectors in pass 2
        (
            prepared.repartitionByRange(max(2, spark.sparkContext.defaultParallelism), "id")
            .sortWithinPartitions("id")
            .write.mode("overwrite")
            .parquet(os.path.join(path, "rows"))
        )
        n = spark.read.parquet(os.path.join(path, "rows")).count()
        meta["n_rows"] = int(n)
        base.write_meta(path, meta)
        return cls(spark, path, meta)

    @classmethod
    def open(cls, spark: SparkSession, path: str) -> "FlatIndex":
        return cls(spark, path, base.read_meta(path))

    def _rows(self):
        # cached handle: avoids re-running the file-listing job per query
        if getattr(self, "_rows_df", None) is None:
            self._rows_df = self.spark.read.parquet(os.path.join(self.path, "rows"))
        return self._rows_df

    # ------------------------------------------------------------------
    def _decoded_codes(self) -> F.Column:
        """Approximate vector from codes: lo + code/levels * width."""
        levels = float((1 << self.meta.get("sq_bits", SQ_BITS)) - 1)
        lo_c = F.array(*[F.lit(float(v)) for v in self.meta["sq_lo"]])
        w_c = F.array(*[F.lit(float(v)) for v in self.meta["sq_width"]])
        return F.zip_with(
            F.col("codes"),
            F.zip_with(lo_c, w_c, lambda a, b: F.struct(a.alias("lo"), b.alias("w"))),
            lambda c, p: (p["lo"] + c.cast("double") / levels * p["w"]).cast("float"),
        )

    def _sq_bounds(self, df: DataFrame, qlist: list[float]) -> DataFrame:
        """Sound per-row distance bounds from SQ codes: decode error per
        dim is at most ε_j = width_j / (2·levels), so the true distance
        lies in [__lb, __ub] around the decoded-code distance __adist."""
        bits = self.meta.get("sq_bits", SQ_BITS)
        levels = (1 << bits) - 1
        eps = np.asarray(self.meta["sq_width"], dtype=np.float64) / (2.0 * levels)
        kernel = self.meta["kernel"]
        adist = dist_expr(self._decoded_codes(), qlist, kernel)
        if kernel == "l2":
            # |√d_exact − √d_approx| ≤ ||ε||₂  (adist is squared L2)
            e = float(np.sqrt((eps**2).sum()))
            rt = F.sqrt(F.greatest(adist, F.lit(0.0)))
            upper = (rt + F.lit(e)) * (rt + F.lit(e))
            lower_expr = F.greatest(rt - F.lit(e), F.lit(0.0))
            lower = lower_expr * lower_expr
        else:  # dot: |Δ| ≤ Σ |q_j|·ε_j, bounds are linear
            e = float(np.abs(np.asarray(qlist)) @ eps)
            upper = adist + F.lit(e)
            lower = adist - F.lit(e)
        return df.withColumn("__adist", adist).withColumn("__ub", upper).withColumn("__lb", lower)

    def _sq_error_rerank(self, df: DataFrame, qlist: list[float], k: int) -> DataFrame:
        """Error-bound reranker (reranker/error.rs analogue, exact by
        construction): sound bounds from ``_sq_bounds``; rerank set =
        candidates whose lower bound beats the k-th smallest upper
        bound — adaptive (no window guess) and provably contains the
        exact top-k.  Costs one tiny threshold job over the code
        column, then reranks only the qualifying rows."""
        scored = self._sq_bounds(df, qlist)
        thresh_row = (
            scored.orderBy(F.col("__ub").asc(), F.col("id").asc())
            .limit(k)
            .agg(F.max("__ub").alias("t"))
            .collect()
        )
        if not thresh_row or thresh_row[0]["t"] is None:
            return scored.where(F.lit(False))  # empty input, keep schema
        t = float(thresh_row[0]["t"])
        return scored.where(F.col("__lb") <= t)

    # candidate sets larger than this rerank in-plan (join) instead of
    # via a driver id-list fetch
    RERANK_FETCH_CAP = 8192

    def _fetch_rerank(self, rows: DataFrame, cand: DataFrame, qlist: list[float]) -> DataFrame:
        """Second phase of the quantized scan: fetch candidates' exact
        vectors by id and rescore — the reference's by-pointer rerank.

        Candidate ids collect to the driver (the reference materializes
        candidate pointers the same way) and come back as an `id IN
        (...)` predicate: against the id-sorted Parquet layout that is a
        pushed filter with row-group min/max skipping, so pass 2 reads
        only the touched row groups' vector chunks instead of the whole
        vector column.  Falls back to a broadcast join when the
        candidate set exceeds RERANK_FETCH_CAP — a PLAIN shuffle join,
        not a forced broadcast: a large-radius range scan can make the
        candidate ring corpus-scale, and force-broadcasting that would
        hit the broadcast size limit / driver memory (AQE still picks
        broadcast on its own when the set turns out small)."""
        exact = dist_expr(F.col("vec"), qlist, self.meta["kernel"])
        ids = [
            r["id"] for r in cand.select("id").limit(self.RERANK_FETCH_CAP + 1).collect()
        ]
        if len(ids) <= _ISIN_LITERAL_CAP:
            fetched = rows.where(F.col("id").isin(ids))
        elif len(ids) <= self.RERANK_FETCH_CAP:
            # giant IN-lists cost more to plan/codegen than the row-group
            # skipping saves; ship the ids as a broadcast join instead
            iddf = self.spark.createDataFrame([(int(i),) for i in ids], "id bigint")
            fetched = rows.join(F.broadcast(iddf), "id")
        else:
            fetched = rows.join(cand.select("id"), "id")
        return fetched.withColumn("distance", base.post_map(self.meta["metric"], exact))

    def search(
        self,
        query: Sequence[float],
        k: int = 10,
        rerank_size: int = 0,
        filter=None,
        exclude: DataFrame | None = None,
    ) -> DataFrame:
        """Top-k; for scalar quantization the default rerank policy is the
        error-bound reranker (exact by construction); passing
        ``rerank_size`` > 0 selects the fixed window instead (GUC
        sq_rerank_size semantics, src/gucs/executing.rs:4-14).  pq and
        rabitq estimators carry no sound error bound and always use the
        window.  ``exclude`` is an id-set DataFrame removed via broadcast
        anti-join (tombstones) before ranking."""
        q = base.prep_query(query, self.meta["normalize"])
        qlist = [float(v) for v in q]
        if not rerank_size:
            # alter(default_rerank_size) persists the reference's
            # sq_rerank_size GUC analogue into meta (maintenance.py)
            rerank_size = int(self.meta.get("default_rerank_size", 0))
        df = base.apply_residual(self._rows(), filter, exclude)

        if self.meta.get("storage") == "f16":
            kernel = self.meta["kernel"]
            qv = np.asarray(qlist, dtype=np.float64)

            @F.pandas_udf("double")
            def f16_score(vb: pd.Series) -> pd.Series:
                mat = np.asarray(
                    [np.frombuffer(b, dtype=np.float16) for b in vb], dtype=np.float64
                )
                return pd.Series(base.np_kernel_distance(kernel, mat, qv))

            out = df.withColumn(
                "distance", base.post_map(self.meta["metric"], f16_score(F.col("vec16")))
            )
            return (
                out.orderBy(F.col("distance").asc(), F.col("id").asc())
                .limit(k)
                .select("id", "distance")
            )

        quant = self.meta.get("quantization")
        if quant in _SQ_KINDS and rerank_size == 0:
            # pass 1 reads ONLY (id, codes) — projection pruning keeps
            # the vector column out of the approximate scan's I/O
            cand = self._sq_error_rerank(df.select("id", "codes"), qlist, k)
            out = self._fetch_rerank(df, cand, qlist)
            return (
                out.orderBy(F.col("distance").asc(), F.col("id").asc())
                .limit(k)
                .select("id", "distance")
            )
        if quant in _SQ_KINDS or quant in ("pq", "rabitq"):
            from pgvecto_rs_spark.indexes.quantization import scaled_rerank_window

            # flat's approximate pass scores the WHOLE corpus, so the
            # scale-aware default window pools over n_rows
            window = scaled_rerank_window(
                quant, k, self.meta["n_rows"], rerank_size,
                pq_ratio=int(self.meta.get("pq_ratio", 4)),
            )
            if quant in _SQ_KINDS:
                approx = dist_expr(self._decoded_codes(), qlist, self.meta["kernel"])
                code_cols = ["id", "codes"]
            elif quant == "pq":
                from pgvecto_rs_spark.indexes import quantization as Qz

                books = np.load(os.path.join(self.path, "pq_codebooks.npy"))
                lut = Qz.pq_lut(books, np.asarray(qlist), self.meta["kernel"])
                approx = Qz.pq_approx_distance("codes", lut)
                code_cols = ["id", "codes"]
            else:
                from pgvecto_rs_spark.indexes import quantization as Qz

                proj = np.load(os.path.join(self.path, "rabitq_proj.npy"))
                score = Qz.rabitq_score_udf(proj, np.asarray(qlist), self.meta["kernel"], self.spark)
                approx = score(F.col("rq.norm"), F.col("rq.words"))
                code_cols = ["id", "rq"]
            cand = (
                df.select(*code_cols)
                .withColumn("adist", approx)
                .orderBy(F.col("adist").asc(), F.col("id").asc())
                .limit(window)
            )
            out = self._fetch_rerank(df, cand, qlist)
            return (
                out.orderBy(F.col("distance").asc(), F.col("id").asc())
                .limit(k)
                .select("id", "distance")
            )

        from pgvecto_rs_spark.operators.search import arrow_distance

        d = arrow_distance(qlist, self.meta["kernel"])(F.col("vec"))
        out = df.withColumn("distance", base.post_map(self.meta["metric"], d))
        return out.orderBy(F.col("distance").asc(), F.col("id").asc()).limit(k).select("id", "distance")

    def range_search(
        self,
        query: Sequence[float],
        radius: float,
        filter=None,
        exclude: DataFrame | None = None,
    ) -> DataFrame:
        """All rows with distance < ``radius`` (SQL-level units) — EXACT
        for every storage/quantization cell.

        Raw f32 and f16 storage: one scan + filter.  SQ codes run the
        two-phase sphere: the first pass reads ONLY the code column and
        keeps rows whose sound LOWER bound (``_sq_bounds``) is inside
        the radius — the true distance is ≥ that bound, so every
        in-range row survives the prefilter by construction — then
        exact vectors are fetched for just that candidate set and
        refiltered.  At width·levels⁻¹ code error the candidate ring is
        a thin shell around the sphere: the exact-vector I/O is
        proportional to the answer, not the corpus.  PQ/RaBitQ
        estimators carry no sound bound, so those cells fall back to
        the exact vector scan (same answer, no I/O skip)."""
        q = base.prep_query(query, self.meta["normalize"])
        qlist = [float(v) for v in q]
        metric = self.meta["metric"]
        kradius = float(radius) - 1.0 if metric == "cos" else float(radius)
        df = base.apply_residual(self._rows(), filter, exclude)

        if self.meta.get("storage") == "f16":
            kernel = self.meta["kernel"]
            qv = np.asarray(qlist, dtype=np.float64)

            @F.pandas_udf("double")
            def f16_score(vb: pd.Series) -> pd.Series:
                mat = np.asarray(
                    [np.frombuffer(b, dtype=np.float16) for b in vb], dtype=np.float64
                )
                return pd.Series(base.np_kernel_distance(kernel, mat, qv))

            out = df.withColumn(
                "distance", base.post_map(metric, f16_score(F.col("vec16")))
            )
            return out.where(F.col("distance") < F.lit(float(radius))).select(
                "id", "distance"
            )

        quant = self.meta.get("quantization")
        if quant in _SQ_KINDS:
            # elementwise relative margin: FP error in the code bound
            # scales with the bound's own magnitude (dot/cos bounds can
            # dwarf |kradius|), so widen by max(1, |kradius|, |__lb|)
            margin = F.lit(1e-9) * F.greatest(
                F.lit(max(1.0, abs(kradius))), F.abs(F.col("__lb"))
            )
            cand = self._sq_bounds(df.select("id", "codes"), qlist).where(
                F.col("__lb") < F.lit(kradius) + margin
            )
            out = self._fetch_rerank(df, cand, qlist)
        else:
            from pgvecto_rs_spark.operators.search import arrow_distance

            d = arrow_distance(qlist, self.meta["kernel"])(F.col("vec"))
            out = df.withColumn("distance", base.post_map(metric, d))
        return out.where(F.col("distance") < F.lit(float(radius))).select(
            "id", "distance"
        )

    def search_batch(
        self,
        queries: DataFrame,
        query_id_col: str,
        query_vec_col: str,
        k: int = 10,
    ) -> DataFrame:
        """Batched exact search (the hnsw.search_batch analogue): many
        queries answered in ONE scan — the per-Arrow-batch distance is a
        single (rows x queries) gemm, and per-batch per-query top-k
        bounds the shuffle to k rows per (query, input partition).  At
        warm local scale the per-query path is dispatch-dominated;
        batching amortizes job setup across the whole query set.
        Quantized variants run the two-phase shape batched (one
        codes-only approximate scan + one pushed-id exact rerank, fixed
        window policy); f16 storage falls back to per-query search.
        Returns (query_id, id, distance), k rows per query."""
        from pyspark.sql import Window

        from pgvecto_rs_spark.indexes import batch as BT

        qrows = BT.collect_queries_or_none(queries, query_id_col, query_vec_col)
        if qrows is None:
            # over-cap query set: executor-assembled blocks x rows files,
            # never materialized on the driver (exact for every storage/
            # quantization cell — the distributed scan reads true vectors)
            return BT.flat_batch_distributed(
                self, queries, query_id_col, query_vec_col, k
            )

        if self.meta.get("quantization") is not None:
            return self._search_batch_quantized(
                queries, query_id_col, query_vec_col, k, qrows=qrows
            )
        if self.meta.get("storage") == "f16":
            # the block runner decodes vec16 natively; even under-cap
            # batches use it (a per-query loop would build an n-way
            # unionByName plan, unplannable past a few hundred queries)
            return BT.flat_batch_distributed(
                self, queries, query_id_col, query_vec_col, k
            )

        kernel, metric = self.meta["kernel"], self.meta["metric"]
        rows = qrows
        qids = [int(r[0]) for r in rows]
        qmat = np.asarray(
            [base.prep_query(r[1], self.meta["normalize"]) for r in rows], dtype=np.float64
        )
        qb = self.spark.sparkContext.broadcast((qids, qmat))
        kk = int(k)

        def scan(batches):
            qids_l, qm = qb.value
            for pdf in batches:
                if not len(pdf):
                    continue
                mat = np.asarray(pdf["vec"].tolist(), dtype=np.float64)
                ids = pdf["id"].to_numpy()
                # per-query columns use the exact same arithmetic as the
                # single-query scan (np_kernel_distance), so batched
                # results are bit-identical to per-query search
                d = np.empty((len(mat), len(qm)))
                for qi in range(len(qm)):
                    d[:, qi] = base.np_kernel_distance(kernel, mat, qm[qi])
                top = min(kk, len(ids))
                part = np.argpartition(d, top - 1, axis=0)[:top]
                out_qid, out_id, out_d = [], [], []
                for qi in range(len(qids_l)):
                    sel = part[:, qi]
                    out_qid.extend([qids_l[qi]] * len(sel))
                    out_id.extend(ids[sel].tolist())
                    out_d.extend(d[sel, qi].tolist())
                yield pd.DataFrame(
                    {"query_id": out_qid, "id": out_id, "distance": out_d}
                )

        cand = (
            self._rows()
            .select("id", "vec")
            .mapInPandas(scan, "query_id bigint, id bigint, distance double")
            .withColumn("distance", base.post_map(metric, F.col("distance")))
        )
        w = Window.partitionBy("query_id").orderBy(F.col("distance").asc(), F.col("id").asc())
        return (
            cand.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= kk)
            .drop("_rn")
        )

    def _search_batch_quantized(
        self,
        queries: DataFrame,
        query_id_col: str,
        query_vec_col: str,
        k: int,
        rerank_size: int = 0,
        qrows: list | None = None,
    ) -> DataFrame:
        """Batched two-phase for quantized flat: ONE codes-only scan
        approximates all queries (decode-on-access), a global per-query
        approx window, then ONE pushed-id fetch reranks every query's
        candidates exactly (the IVF batched shape without the list
        partitioning)."""
        from pyspark.sql import Window

        meta = self.meta
        quant = meta["quantization"]
        if not rerank_size:
            rerank_size = int(meta.get("default_rerank_size", 0))
        from pgvecto_rs_spark.indexes.quantization import scaled_rerank_window

        win = scaled_rerank_window(
            quant, k, meta["n_rows"], rerank_size,
            pq_ratio=int(meta.get("pq_ratio", 4)),
        )
        kk = int(k)
        kernel, metric = meta["kernel"], meta["metric"]
        # search_batch already collected the query set (cap check);
        # reuse it — the old re-collect here was one redundant Spark
        # job per batched quantized search (r11 verdict #5)
        rows = (
            qrows
            if qrows is not None
            else queries.select(query_id_col, query_vec_col).collect()
        )
        qids = [int(r[0]) for r in rows]
        qmat = np.asarray(
            [base.prep_query(r[1], meta["normalize"]) for r in rows], dtype=np.float64
        )
        sc = self.spark.sparkContext
        if quant in _SQ_KINDS:
            payload = (
                "sq",
                np.asarray(meta["sq_lo"], dtype=np.float64),
                np.asarray(meta["sq_width"], dtype=np.float64),
                float((1 << meta.get("sq_bits", 8)) - 1),
            )
        elif quant == "pq":
            payload = ("pq", np.load(os.path.join(self.path, "pq_codebooks.npy")))
        elif quant == "rabitq":
            payload = ("rabitq", np.load(os.path.join(self.path, "rabitq_proj.npy")))
        else:
            raise ValueError(quant)
        bc = sc.broadcast((qmat, payload))

        def scan(batches):
            qm, pl = bc.value
            kind = pl[0]
            for pdf in batches:
                if not len(pdf):
                    continue
                ids = pdf["id"].to_numpy()
                if kind == "sq":
                    _, lo_, w_, lv = pl
                    codes = np.asarray(pdf["codes"].tolist(), dtype=np.float64)
                    approx = lo_[None, :] + codes / lv * w_[None, :]
                elif kind == "pq":
                    books = pl[1]
                    codes = np.asarray(pdf["codes"].tolist(), dtype=np.int64)
                    n_sub, _, sub = books.shape
                    approx = np.empty((len(codes), n_sub * sub))
                    for s in range(n_sub):
                        approx[:, s * sub : (s + 1) * sub] = books[s][codes[:, s]]
                else:
                    proj = pl[1]
                    d_ = proj.shape[0]
                    nm = pdf["rq_norm"].to_numpy(dtype=np.float64)
                    w = np.asarray(pdf["rq_words"].tolist(), dtype=np.int64).astype(
                        np.uint32
                    )
                    nw = w.shape[1]
                    bits = (
                        (w[:, :, None] >> np.arange(32, dtype=np.uint32)[None, None, :]) & 1
                    )
                    bits = bits.reshape(len(w), nw * 32)[:, :d_].astype(np.float64)
                    approx = (nm[:, None] / np.sqrt(d_)) * ((2.0 * bits - 1.0) @ proj)
                top = min(win, len(ids))
                oq: list[int] = []
                oi: list[int] = []
                od: list[float] = []
                for qi in range(len(qm)):
                    dd = base.np_kernel_distance(kernel, approx, qm[qi])
                    sel = np.argpartition(dd, top - 1)[:top]
                    oq.extend([qi] * len(sel))
                    oi.extend(ids[sel].tolist())
                    od.extend(dd[sel].tolist())
                yield pd.DataFrame({"qi": oq, "id": oi, "adist": od})

        if quant == "rabitq":
            cols = [
                F.col("id"),
                F.col("rq.norm").alias("rq_norm"),
                F.col("rq.words").alias("rq_words"),
            ]
        else:
            cols = [F.col("id"), F.col("codes")]
        approx_cand = self._rows().select(*cols).mapInPandas(
            scan, "qi int, id bigint, adist double"
        )
        w1 = Window.partitionBy("qi").orderBy(F.col("adist").asc(), F.col("id").asc())
        cand_rows = (
            approx_cand.withColumn("_rn", F.row_number().over(w1))
            .where(F.col("_rn") <= win)
            .select("qi", "id")
            .collect()
        )
        pairs_py = [(int(r["qi"]), int(r["id"])) for r in cand_rows]
        uniq_ids = sorted({i for _, i in pairs_py})
        rowsrc = self._rows().select("id", "vec")
        # literal-inline only small id sets (planning cost — see the
        # IVF batch fetch; same _ISIN_LITERAL_CAP rule)
        if len(uniq_ids) <= _ISIN_LITERAL_CAP:
            fetched = rowsrc.where(F.col("id").isin(uniq_ids))
        else:
            ids_df = self.spark.createDataFrame([(i,) for i in uniq_ids], "id bigint")
            fetched = rowsrc.join(F.broadcast(ids_df), "id")
        pairs = self.spark.createDataFrame(pairs_py, "qi int, id bigint")
        joined = fetched.join(F.broadcast(pairs), "id")
        bq = sc.broadcast(qmat)

        @F.pandas_udf("double")
        def exact_d(v: pd.Series, qi: pd.Series) -> pd.Series:
            qm = bq.value
            mat = np.asarray(v.tolist(), dtype=np.float64)
            qa = qi.to_numpy()
            out = np.empty(len(mat))
            for qq in np.unique(qa):
                m = qa == qq
                out[m] = base.np_kernel_distance(kernel, mat[m], qm[int(qq)])
            return pd.Series(out)

        qid_arr = F.array(*[F.lit(q) for q in qids])
        scored = joined.withColumn(
            "distance", base.post_map(metric, exact_d(F.col("vec"), F.col("qi")))
        ).withColumn("query_id", F.element_at(qid_arr, F.col("qi") + 1).cast("long"))
        w2 = Window.partitionBy("query_id").orderBy(
            F.col("distance").asc(), F.col("id").asc()
        )
        return (
            scored.withColumn("_rn", F.row_number().over(w2))
            .where(F.col("_rn") <= kk)
            .select("query_id", "id", "distance")
        )

    def stat(self) -> dict:
        return {
            "idx_status": "NORMAL",
            "idx_indexing": False,
            "idx_tuples": self.meta["n_rows"],
            "idx_sealed": [self.meta["n_rows"]],
            "idx_growing": [],
            "idx_options": {k: self.meta.get(k) for k in ("kind", "metric", "quantization")},
        }
