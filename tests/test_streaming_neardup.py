"""Streaming near-dup admission (streaming/neardup.py): incremental
MinHash-LSH dedup at ingest, vs its one-shot batch oracle."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from pgvecto_rs_spark.streaming.neardup import StreamingNearDup


def _jacc(a: str, b: str, k: int = 5) -> float:
    def sh(t):
        t = re.sub(r"\s+", " ", t.strip().lower())
        if len(t) < k:
            return {t}
        return {t[i : i + k] for i in range(len(t) - k + 1)}

    sa, sb = sh(a), sh(b)
    return len(sa & sb) / len(sa | sb)


def _mutate(base: str, start: int, n: int) -> str:
    """Replace n chars of base starting at start with 'z' runs."""
    return base[:start] + "z" * n + base[start + n :]


@pytest.fixture(scope="module")
def chain_texts():
    """(a, b, c) with jaccard(a,b) >= 0.9, jaccard(b,c) >= 0.9,
    jaccard(a,c) < 0.9 — the non-transitive chain."""
    base = " ".join(f"tok{i:03d}" for i in range(60))
    a = base
    b = _mutate(base, 100, 12)
    c = _mutate(base, 100, 12)
    c = _mutate(c, 300, 12)
    assert _jacc(a, b) >= 0.9 and _jacc(b, c) >= 0.9 and _jacc(a, c) < 0.9
    return a, b, c


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _corpus(spark, sf_dir, n=120):
    """Real docs + planted near-dup copies (light char mutations)."""
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where(F.col("doc_id") < n)
        .select("doc_id", "text")
    )
    copies = docs.where(F.col("doc_id") < 30).select(
        (F.col("doc_id") + 10_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" x")).alias("text"),
    )
    return docs.unionByName(copies)


class TestGreedyAdmission:
    def test_chain_admits_endpoints(self, spark, tmp_path, chain_texts):
        a, b, c = chain_texts
        snd = StreamingNearDup(spark, str(tmp_path / "s1"), threshold=0.9)
        got = snd.admit_all(_docs(spark, [(1, a), (2, b), (3, c)]))
        # greedy by id: 1 admitted; 2 rejected (dup of 1); 3 admitted
        # (its only near-dup, 2, was never admitted)
        assert got == [1, 3]

    def test_cross_batch_blocking(self, spark, tmp_path, chain_texts):
        a, b, c = chain_texts
        snd = StreamingNearDup(spark, str(tmp_path / "s2"), threshold=0.9)
        assert snd.process_batch(_docs(spark, [(1, a)])) == [1]
        # b is a near-dup of the ADMITTED a -> rejected; c only of b -> in
        assert snd.process_batch(_docs(spark, [(2, b), (3, c)])) == [3]
        admitted = {r["doc_id"] for r in snd.admitted().collect()}
        assert admitted == {1, 3}

    def test_exact_duplicate_rejected_across_batches(self, spark, tmp_path):
        snd = StreamingNearDup(spark, str(tmp_path / "s3"), threshold=0.9)
        t = "the quick brown fox jumps over the lazy dog " * 5
        assert snd.process_batch(_docs(spark, [(1, t)])) == [1]
        assert snd.process_batch(_docs(spark, [(2, t)])) == []


class TestStreamingEqualsBatch:
    def test_any_batch_split_matches_one_shot(self, spark, sf_dir, tmp_path):
        corpus = _corpus(spark, sf_dir).cache()
        corpus.count()
        oracle = StreamingNearDup(spark, str(tmp_path / "oracle"), threshold=0.9)
        want = oracle.admit_all(corpus)
        # 3-way arrival split by id ranges (ascending arrival = id order)
        snd = StreamingNearDup(spark, str(tmp_path / "inc"), threshold=0.9)
        got: list[int] = []
        for lo, hi in [(0, 40), (40, 120), (120, 20_000)]:
            got += snd.process_batch(
                corpus.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
            )
        assert sorted(got) == sorted(want)
        corpus.unpersist()

    def test_foreach_batch_sink(self, spark, sf_dir, tmp_path):
        corpus = _corpus(spark, sf_dir, n=60).cache()
        corpus.count()
        stage = str(tmp_path / "stage")
        corpus.repartition(4).write.mode("overwrite").parquet(stage)
        snd = StreamingNearDup(spark, str(tmp_path / "sink"), threshold=0.9)
        stream = (
            spark.readStream.schema(corpus.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stage)
        )
        q = (
            stream.writeStream.foreachBatch(snd.foreach_batch_sink())
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = {r["doc_id"] for r in snd.admitted().collect()}
        # arrival order differs from id order across files, so the
        # admitted SET can legally differ from the one-shot oracle's;
        # the policy invariants must hold for ANY arrival order:
        # independence (no two admitted docs are near-dups) and
        # maximality (every rejected doc has an admitted near-dup)
        from pgvecto_rs_spark.operators.dedup import (
            lsh_candidate_pairs,
            verify_pairs_jaccard,
        )

        cand = lsh_candidate_pairs(corpus)
        truth = {
            (r["id_a"], r["id_b"])
            for r in verify_pairs_jaccard(
                corpus, cand, threshold=0.9
            ).collect()
        }
        neighbors: dict[int, set[int]] = {}
        for a, b in truth:
            neighbors.setdefault(a, set()).add(b)
            neighbors.setdefault(b, set()).add(a)
        for a, b in truth:
            assert not (a in got and b in got), f"near-dups both admitted: {a},{b}"
        all_ids = {r["doc_id"] for r in corpus.collect()}
        for i in all_ids - got:
            assert neighbors.get(i, set()) & got, f"{i} rejected without cause"
        corpus.unpersist()


class TestDriverMemoryBounds:
    def test_pathological_duplicate_batch_bounded(self, spark, tmp_path):
        """A 100k-doc batch that is ~all exact duplicates must not
        materialize O(n^2) verified pairs on the driver: exact dups
        collapse to one representative per text BEFORE LSH, so the edge
        fetch sees only representative-level pairs.  Admission equals
        the semantic truth: min id per distinct text (texts mutually
        non-similar)."""
        n, n_texts = 100_000, 8
        # mutually dissimilar: disjoint token vocabularies per text
        texts = [
            " ".join(f"t{t}word{i:02d}" for i in range(40)) for t in range(n_texts)
        ]
        df = spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.element_at(
                F.array(*[F.lit(t) for t in texts]),
                (F.col("id") % n_texts + 1).cast("int"),
            ).alias("text"),
        )
        snd = StreamingNearDup(
            spark, str(tmp_path / "snd"), threshold=0.9, max_driver_edges=5_000
        )
        admitted = snd.process_batch(df)
        # min id of text-group t is t itself (id % n_texts == t)
        assert sorted(admitted) == list(range(n_texts))

    def test_near_dup_edge_cap_raises(self, spark, tmp_path):
        """Non-exact near-dup floods can't be collapsed; past
        max_driver_edges the batch fails loudly instead of exhausting
        driver memory."""
        base = " ".join(f"tok{i:03d}" for i in range(80))
        rows = [(i, base + f" suffix{i}") for i in range(120)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        snd = StreamingNearDup(
            spark, str(tmp_path / "snd2"), threshold=0.9, max_driver_edges=100
        )
        with pytest.raises(RuntimeError, match="max_driver_edges"):
            snd.process_batch(df)
