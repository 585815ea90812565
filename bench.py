#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Measurement protocol mirrors the reference CLI (crates/cli/src/main.rs:131-160):
per-query wall time of the Spark action (collect), build/IO setup excluded
via a warm-up pass that caches the input tables.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# Headline set: one per operator family (dense topk x3 metrics, range,
# knn-join, aggregates, sparse, binary, text pipeline, dedup, events,
# relational).
BENCH_QUERIES = [
    "topk_l2",
    "topk_l2_by_label",
    "topk_cos",
    "topk_dot",
    "range_l2",
    "knn_join_l2",
    "agg_sum_vector",
    "agg_sum_svector",
    "sparse_topk_dot",
    "sparse_inv_topk_dot",
    "sparse_inv_range_dot",
    "bin_hamming_topk",
    "bin_hamming_ivf_topk",
    "bin_hamming_hnsw_topk",
    "ivf_topk_l2",
    "ivf_range_l2",
    "ivf_pq_topk_l2",
    "ivf_pq_1024_topk",
    "hnsw_topk_l2",
    "hnsw_range_l2",
    "hnsw_vecf16_topk_l2",
    "ivf_vecf16_topk_l2",
    "flat_sq8_topk_l2",
    "flat_sq8_range_l2",
    "batch_topk_l2",
    "fresh_topk_l2",
    "fresh_range_l2",
    "doc_token_count",
    "doc_dedup_exact",
    "doc_minhash_pairs",
    "doc_dedup_keep",
    "doc_simhash_pairs",
    "doc_embed_hash_topk",
    "doc_decontaminate",
    "doc_dup_ngrams",
    "doc_top_terms",
    "doc_lm_score",
    "doc_repetition",
    "doc_bm25_topk",
    "doc_hybrid_rrf",
    "doc_bpe_merges",
    "doc_bpe_tokens",
    "doc_bpe_batched",
    "doc_mixture_sample",
    "doc_dsir_weights",
    "doc_dup_passages",
    "doc_shuffle_order",
    "doc_quality_ntile",
    "emb_srp_neardup",
    "emb_kmeans",
    "emb_knn_classify",
    "emb_triplets",
    "emb_mmr_topk",
    "emb_outliers",
    "emb_semdedup",
    "chunk_embed_topk",
    "chunk_embed_pool",
    "doc_maxsim_topk",
    "mm_image_stats",
    "mm_image_progressive",
    "mm_image_gif",
    "mm_image_knn",
    "mm_image_neardup",
    "mm_audio_stats",
    "mm_audio_neardup",
    "mm_video_frames",
    "mm_gif_frames",
    "mm_mp4_index",
    "mm_mp4_sample",
    "mm_mp4_idr",
    "mm_video_idr_neardup",
    "mm_mp4_captions",
    "mm_srt_cues",
    "mm_mp3_index",
    "mm_ogg_index",
    "mm_audio_flac",
    "mm_audio_flac_stereo",
    "events_hourly",
    "events_sessions",
    "events_asof",
    "events_rolling",
    "events_quantiles",
    "tpch_q1",
    "tpch_q3",
    "tpch_q4",
    "tpch_q6",
    "tpch_q5",
    "tpch_q7",
    "tpch_q8",
    "tpch_q9",
    "tpch_q10",
    "tpch_q12",
    "tpch_q13",
    "tpch_q14",
    "tpch_q15",
    "tpch_q16",
    "tpch_q17",
    "tpch_q18",
    "tpch_q19",
    "tpch_q20",
    "tpch_q21",
    "tpch_q22",
    "tpch_q2",
    "tpch_q11",
]


# ANN queries whose result is an approximate top-10 of the same (query,
# metric) that the exact scan `topk_l2` answers; recall@10 = overlap of
# returned ids with the exact ids.
ANN_RECALL_QUERIES = [
    "ivf_topk_l2",
    "ivf_pq_topk_l2",
    "hnsw_topk_l2",
    "flat_sq8_topk_l2",
]


def _ann_recall(spark, registry) -> dict[str, float]:
    """recall@10 of each ANN query vs the exact `topk_l2` ids.

    All four answer the same (Q64, l2) query over embeddings; the id
    column is the first output column (`vec_id` or `id`).  fresh_topk_l2
    is excluded — it searches a tombstoned/re-inserted dataset with a
    different ground truth."""
    out: dict[str, float] = {}
    try:
        truth = {r[0] for r in registry["topk_l2"](spark, SF_DIR).collect()}
    except Exception:  # noqa: BLE001
        return out
    if not truth:
        return out
    for n in ANN_RECALL_QUERIES:
        if n not in registry:
            continue
        try:
            got = {r[0] for r in registry[n](spark, SF_DIR).collect()}
            out[n] = round(len(got & truth) / len(truth), 4)
        except Exception:  # noqa: BLE001
            pass
    return out


def _batch_speedup(spark) -> dict:
    """search_batch amortization: 32 queries answered per-query vs one
    batched pass (flat exact scan + IVF probe-pruned scan)."""
    import tempfile

    from pyspark.sql import functions as F

    from pgvecto_rs_spark.indexes import FlatIndex, IVFIndex

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qdf = emb.orderBy("vec_id").limit(32).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    queries = [(int(r["qid"]), list(r["qv"])) for r in qdf.collect()]
    out = {}
    with tempfile.TemporaryDirectory() as d:
        idxs = {
            "flat": (FlatIndex.create(spark, emb, f"{d}/flat", metric="l2"), {}, {}),
            "ivf": (
                IVFIndex.create(spark, emb, f"{d}/ivf", metric="l2", nlist=64),
                {"nprobe": 8},
                {"nprobe": 8},
            ),
            # the quantized two-phase batch path (one codes-only approx
            # scan + one pushed-id exact rerank for the whole query set)
            "ivf_pq": (
                IVFIndex.create(
                    spark, emb, f"{d}/ivfpq", metric="l2", nlist=64,
                    quantization="pq", pq_ratio=4,
                ),
                {"nprobe": 8, "rerank_size": 40},
                {"nprobe": 8, "rerank_size": 40},
            ),
        }
        walls = {}
        for name, (idx, skw, bkw) in idxs.items():
            idx.search(queries[0][1], k=10, **skw).collect()  # warm
            t0 = time.perf_counter()
            for _, qv in queries:
                idx.search(qv, k=10, **skw).collect()
            per_query = time.perf_counter() - t0
            idx.search_batch(qdf, "qid", "qv", k=10, **bkw).collect()  # warm
            t0 = time.perf_counter()
            idx.search_batch(qdf, "qid", "qv", k=10, **bkw).collect()
            batched = time.perf_counter() - t0
            out[name] = round(per_query / batched, 2)
            # absolute batched wall recorded alongside the ratio (r10
            # verdict item 7): the pq ratio's numerator is itself
            # LUT-fast, so the RATIO understates the batched path —
            # regressions of the batched wall itself are what must not
            # hide behind the ratio explanation
            walls[name] = round(batched, 3)
        out["batched_wall_sec"] = walls
    return out


def _canary_heavy(spark, sf_dir):
    """~2 s pure-Catalyst load canary (r7 advice: the five sub-second
    canaries are jitter-bound; the 4-shape r9 version still ran
    ~0.96-1.15 s at sf0.1, so shape 5 adds a count-distinct rollup and
    a self-join delta aggregation to reach the target).  Five fixed
    shapes over lineitem ⋈ orders ⋈ part, deliberately un-pruned: a
    high-cardinality (orderkey, linenumber) aggregation, a full
    range-partitioned sort folded to a bit_xor checksum, a part-side
    join aggregation over (l_partkey), a second independent
    sort/checksum keyed on (l_shipdate, suppkey), and a
    count(DISTINCT l_orderkey) x sum rollup per (l_returnflag,
    l_linestatus, month(l_shipdate)) plus a lineitem self-join on
    (l_orderkey, l_linenumber+1) aggregating price deltas.  No engine
    code paths of ours — machine + JVM throughput only, so its
    builder-vs-driver ratio isolates load.  Returns a 1-row DataFrame
    so the bench loop can time it like any registered query."""
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    p = spark.read.parquet(f"{sf_dir}/part.parquet")
    j = li.join(o, li.l_orderkey == o.o_orderkey)
    g = j.groupBy("l_orderkey", "l_linenumber").agg(
        F.sum("l_extendedprice").alias("s"), F.sum("o_totalprice").alias("t")
    )
    a = g.agg(
        F.count("*").alias("n"), F.sum("s").alias("ss"), F.sum("t").alias("st")
    )
    srt = (
        j.select("l_orderkey", "l_linenumber", "l_extendedprice", "o_totalprice")
        .repartitionByRange(32, "l_extendedprice")
        .sortWithinPartitions("l_extendedprice", "l_orderkey", "l_linenumber")
        .select(
            F.xxhash64(
                "l_orderkey", "l_linenumber", "l_extendedprice", "o_totalprice"
            ).alias("h")
        )
        .agg(F.expr("bit_xor(h)").alias("cksum"))
    )
    pj = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("l_partkey")
        .agg(
            F.sum("l_quantity").alias("q"),
            F.avg("l_extendedprice").alias("ap"),
            F.count("*").alias("c"),
            F.max("p_retailprice").alias("rp"),
        )
        .agg(
            F.count("*").alias("np"),
            F.sum("q").alias("sq"),
            F.sum("ap").alias("sap"),
            F.sum("rp").alias("srp"),
        )
    )
    srt2 = (
        li.select("l_shipdate", "l_suppkey", "l_orderkey", "l_discount", "l_tax")
        .repartitionByRange(32, "l_shipdate", "l_suppkey")
        .sortWithinPartitions("l_shipdate", "l_suppkey", "l_orderkey")
        .select(
            F.xxhash64(
                "l_shipdate", "l_suppkey", "l_orderkey", "l_discount", "l_tax"
            ).alias("h")
        )
        .agg(F.expr("bit_xor(h)").alias("cksum2"))
    )
    dist = (
        li.groupBy("l_returnflag", "l_linestatus", F.month("l_shipdate"))
        .agg(
            F.countDistinct("l_orderkey").alias("no"),
            F.countDistinct("l_partkey").alias("np_"),
            F.sum("l_extendedprice").alias("sp"),
        )
        .agg(
            F.count("*").alias("ng"),
            F.sum("no").alias("sno"),
            F.sum("np_").alias("snp"),
            F.sum("sp").alias("ssp"),
        )
    )
    l2 = li.select(
        F.col("l_orderkey").alias("o2"),
        (F.col("l_linenumber") - 1).alias("n2"),
        F.col("l_extendedprice").alias("p2"),
    )
    sj = (
        li.join(l2, (li.l_orderkey == l2.o2) & (li.l_linenumber == l2.n2))
        .select((F.col("p2") - F.col("l_extendedprice")).alias("d"))
        .agg(
            F.count("*").alias("nd"),
            F.sum("d").alias("sd"),
            F.max(F.abs("d")).alias("md"),
        )
    )
    return (a.crossJoin(srt).crossJoin(pj).crossJoin(srt2)
            .crossJoin(dist).crossJoin(sj))  # 1x1x...x1


def _canary_dispatch(spark, sf_dir):
    """Dispatch/shuffle-floor load canary (r10).  The five classic
    canaries + canary_heavy are SCAN/AGG-bound, and r10's bench runs
    showed they can read ~1.0x vs the committed reference while every
    multi-stage sub-second query runs 1.5-1.7x slower — i.e. the box's
    scheduler/shuffle latency degraded but its scan throughput did not
    (adjudicated code-neutral by an r9-tree A/B on the same box; see
    BENCHNOTES r10).  This shape isolates that mode: a chain of SIX
    tiny stage-boundary shuffles over a 200k-row synthetic — per-stage
    data is negligible, so its wall time is almost purely task
    dispatch + exchange setup.  Pure Catalyst, no engine code of ours."""
    from pyspark.sql import functions as F

    df = spark.range(200_000).select(
        (F.col("id") % 997).alias("k"), F.col("id").alias("v")
    )
    for i in range(6):
        df = (
            df.groupBy(((F.col("k") + i) % 991).alias("k"))
            .agg(F.sum("v").alias("v"), F.count(F.lit(1)).alias("c"))
            .select("k", (F.col("v") + F.col("c")).alias("v"))
        )
    return df.agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))


def _release_storage(spark) -> None:
    """Release per-query localCheckpoint blocks between timings.

    Several operators localCheckpoint intermediates (lineage
    truncation); the blocks stay in executor storage until the RDD's
    JVM reference is collected, so an 89-query bench accumulates
    storage pressure that inflates later queries (measured:
    mm_image_neardup 7.7 s inside the full run vs 3.2 s isolated).
    A python gc pass drops the py4j proxies of DataFrames the finished
    query no longer references; Spark's ContextCleaner then unpersists
    those RDDs asynchronously.  DataFrames pinned in module-level
    caches (embedded chunks/docs, kmeans centroids) keep strong refs
    and are untouched — blindly unpersisting everything would destroy
    them (a localCheckpointed RDD cannot be recomputed)."""
    import gc

    gc.collect()
    try:
        spark.sparkContext._jvm.System.gc()  # nudge the ContextCleaner
    except Exception:  # noqa: BLE001 - cleanup is best-effort
        pass


def main() -> None:
    from pgvecto_rs_spark.session import get_spark
    from pgvecto_rs_spark import queries as Q

    spark = get_spark("pgvecto-rs-spark-bench", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    registry = Q.queries()
    registry["canary_heavy"] = _canary_heavy  # bench-local load canary
    registry["canary_dispatch"] = _canary_dispatch  # shuffle-floor canary
    names = [n for n in BENCH_QUERIES if n in registry] + [
        "canary_heavy", "canary_dispatch"]

    # Warm-up: materialize JVM/codegen paths, index builds and OS page
    # cache, excluded from timing (the reference excludes build/IO too).
    # Per-query isolation: one sick query must not zero the whole bench,
    # so failures are recorded as {"err": ...} and timing continues.
    # r11 verdict #2: a cache-version bump makes every index-backed
    # query pay its build inside this pass; when a warm touch is slow
    # (build happened), run the full query once more untimed and
    # release the build's storage debris so the timed loop measures
    # steady state — and record warmup_s so BENCH_rN shows WHERE
    # one-time cost went instead of leaking it into query walls.
    errors: dict[str, str] = {}
    warmup_s: dict[str, float] = {}
    for n in names:
        try:
            t0 = time.perf_counter()
            registry[n](spark, SF_DIR).limit(1).collect()
            w = time.perf_counter() - t0
            if w > 2.0:
                # time the extra full run too: warmup_s must report the
                # FULL one-time cost, not just the limit(1) touch
                # (r12 advice — the untimed run was the larger share)
                registry[n](spark, SF_DIR).collect()
                warmup_s[n] = round(time.perf_counter() - t0, 2)
        except Exception as e:  # noqa: BLE001 - harness must survive anything
            errors[n] = f"{type(e).__name__}: {str(e).splitlines()[0][:300]}"
    # one storage release after ALL builds (a System.gc per slow query
    # measured minutes of extra warm-up wall); the timed loop below
    # releases between queries anyway
    _release_storage(spark)

    # Best-of-repeats steady-state per query — the reference CLI
    # averages over `epoch` repeats; min-of-repeats removes GC/
    # compilation jitter that would otherwise dominate run-to-run
    # variance at this scale.  Sub-second queries repeat up to 5 times:
    # their timings are scheduler-jitter-dominated (one cold python
    # worker adds ~0.3 s — measured session-to-session swings of
    # 0.39-1.0 s on the same pandas-UDF query), the extra repeats cost
    # little, and min-of-5 keeps one bad roll out of the record.
    timings: dict[str, float] = {}
    for n in names:
        if n in errors:
            continue
        best = float("inf")
        try:
            for rep in range(5):
                if rep >= 3 and best >= 1.0:
                    break
                if rep >= 2 and best >= 5.0:
                    break
                t0 = time.perf_counter()
                registry[n](spark, SF_DIR).collect()
                best = min(best, time.perf_counter() - t0)
            timings[n] = round(best, 4)
        except Exception as e:  # noqa: BLE001
            errors[n] = f"{type(e).__name__}: {str(e).splitlines()[0][:300]}"
        _release_storage(spark)

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    detail = {
        "metric": "total_query_wall_time",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # bump when _canary_heavy's shapes change: timings across shapes
        # are not load-comparable, so the ratio code skips it on mismatch
        "canary_heavy_shape": 5,
    }
    if warmup_s:
        # one-time setup (index builds after a cache bump) paid during
        # warm-up, SEPARATE from query walls — sidecar only
        detail["warmup_s"] = warmup_s
    if errors:
        detail["errors"] = errors
    recall = _ann_recall(spark, registry)
    if recall:
        detail["recall_at_10"] = recall
    try:
        detail["batch_speedup_32q"] = _batch_speedup(spark)
    except Exception as e:  # noqa: BLE001
        detail.setdefault("errors", {})["batch_speedup_32q"] = f"{type(e).__name__}: {e}"

    # Per-query detail goes to a sidecar file; stdout's FINAL line is a
    # compact (<1.5 kB) summary.  The driver captures only the last
    # 2000 chars of output and parses the final JSON line — an 80-query
    # timing map starts the captured tail mid-JSON and parses as null
    # (BENCH_r04/r05 regression).
    here = os.path.dirname(os.path.abspath(__file__))
    # Snapshot the COMMITTED previous run before overwriting: its frozen
    # canary queries are the machine-load reference for this run.
    # r8 lesson: an sf0.01 iteration run committed into BENCHDETAIL.json
    # silently disabled load normalization for the whole round (the
    # sf-guard below skipped it) — so snapshots are now ALSO kept
    # per-sf (BENCHDETAIL_sf{sf}.json): the sf0.1 reference survives
    # any number of local sf0.01 runs, and the canary compares against
    # the same-sf file first.
    sf_name = os.path.join(here, f"BENCHDETAIL_sf{detail['sf']}.json")
    prev_detail: dict = {}
    for cand in (sf_name, os.path.join(here, "BENCHDETAIL.json")):
        try:
            with open(cand) as f:
                prev_detail = json.load(f)
            break
        except Exception:  # noqa: BLE001 - first run / corrupt file
            prev_detail = {}
    with open(os.path.join(here, "BENCHDETAIL.json"), "w") as f:
        json.dump(detail, f, indent=1)
    with open(sf_name, "w") as f:
        json.dump(detail, f, indent=1)

    out = {
        "metric": "total_query_wall_time",
        "value": detail["value"],
        "unit": "sec",
        "sf": detail["sf"],
        "n_queries": len(timings),
        "n_errors": len(errors),
        # the headline per-family shapes + the 5 slowest, so the driver
        # line alone shows where time goes; full map in BENCHDETAIL.json
        "queries": dict(
            sorted(timings.items(), key=lambda kv: -kv[1])[:5]
        ),
    }
    if recall:
        out["recall_at_10"] = recall
    if "batch_speedup_32q" in detail:
        out["batch_speedup_32q"] = detail["batch_speedup_32q"]
    try:  # geomean vs the r1 first-measurement contract, when available
        with open(os.path.join(here, "BENCH_r01.json")) as f:
            r1p = json.load(f).get("parsed") or {}
        r1 = r1p.get("queries") or {}
        import math

        def _gm(rs):
            return math.exp(sum(math.log(r) for r in rs) / len(rs))

        ratios = [timings[n] / r1[n] for n in timings if r1.get(n)]
        if ratios:
            out["geomean_vs_r1"] = round(_gm(ratios), 4)
        # Load canary: pure-Catalyst queries measured against the
        # COMMITTED previous run (BENCHDETAIL.json at process start —
        # the builder's run of this tree).  Their ratio isolates
        # MACHINE LOAD, not plan quality: the r6 driver re-run was a
        # uniform ~1.58x slower than the builder's run of the identical
        # tree, including pure-scan tpch_q6.  (Not vs r1 — the r1
        # harness lacked warmup/min-of-repeats, so r1 ratios embed
        # harness fixes, not load.)  geomean_vs_r1_loadnorm rescales
        # geomean_vs_r1 to the previous run's load conditions.
        canaries = ["tpch_q1", "tpch_q6", "events_hourly",
                    "doc_token_count", "doc_dedup_exact",
                    "canary_dispatch"]  # skipped if absent from prev run
        if prev_detail.get("canary_heavy_shape") == detail["canary_heavy_shape"]:
            canaries.append("canary_heavy")
        prevq = prev_detail.get("queries") or {}
        cr = [timings[c] / prevq[c] for c in canaries if prevq.get(c) and timings.get(c)]
        if cr and ratios and prev_detail.get("sf") == detail["sf"]:
            out["canary_load_ratio"] = round(_gm(cr), 4)
            out["geomean_vs_r1_loadnorm"] = round(
                _gm(ratios) / out["canary_load_ratio"], 4
            )
            # dispatch-floor ratio reported separately (r10 verdict item
            # 5): scan/agg canaries can read ~1.0x while task-dispatch
            # latency is inflated — a high dispatch ratio with a flat
            # scan ratio marks dispatch-bound queries (tpch_q21,
            # doc_decontaminate, ...) as load, not code
            if prevq.get("canary_dispatch") and timings.get("canary_dispatch"):
                out["canary_dispatch_ratio"] = round(
                    timings["canary_dispatch"] / prevq["canary_dispatch"], 4
                )
    except Exception:  # noqa: BLE001
        pass
    if errors:
        first = next(iter(errors.items()))
        out["first_error"] = f"{first[0]}: {first[1][:120]}"
    out["detail"] = "BENCHDETAIL.json"
    line = json.dumps(out)
    if len(line) > 1500:  # hard guard: drop optional keys till it fits
        for k in ("queries", "recall_at_10", "first_error", "batch_speedup_32q"):
            out.pop(k, None)
            line = json.dumps(out)
            if len(line) <= 1500:
                break
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
