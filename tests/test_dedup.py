"""Dedup operator semantics: embedding near-dup scale path (IVF
bucketing) vs brute truth, SimHash bucket skew guard, LSH determinism,
and the exact-verify stage."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pgvecto_rs_spark.operators import dedup as DD


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet").where(F.col("vec_id") < 150)
    df.cache().count()
    return df


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df.cache().count()
    return df


def _pairset(df):
    return {(r["id_a"], r["id_b"]) for r in df.collect()}


class TestEmbeddingNearDup:
    def test_ivf_full_probe_equals_brute(self, emb):
        """replicas = nlist puts every vector in every list -> candidate
        set is all pairs -> the ivf path must equal brute exactly."""
        brute = _pairset(
            DD.embedding_neardup_pairs(emb, threshold=0.7, method="brute")
        )
        full = _pairset(
            DD.embedding_neardup_pairs(
                emb, threshold=0.7, method="ivf", nlist=4, replicas=4
            )
        )
        assert full == brute

    def test_ivf_bucketed_recall_on_planted_neardups(self, spark, emb):
        """Near-dup semantics: plant jittered copies of 30 vectors and
        require the bucketed path (replicas=2) to recover >=0.95 of the
        true near-dup pairs — near-identical vectors share their nearest
        lists, which is the regime this operator is built for."""
        import numpy as np

        rng = np.random.default_rng(7)
        base = [r["embedding"] for r in emb.limit(30).collect()]
        rows = []
        for i, v in enumerate(base):
            arr = np.asarray(v, dtype=np.float64)
            rows.append((1000 + i, arr.tolist()))
            rows.append((2000 + i, (arr + rng.normal(0, 0.01, arr.shape)).tolist()))
        planted = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        brute = _pairset(
            DD.embedding_neardup_pairs(planted, threshold=0.05, method="brute")
        )
        assert len(brute) >= 30, "planted copies must be near-dups"
        ivf = _pairset(
            DD.embedding_neardup_pairs(
                planted, threshold=0.05, method="ivf", nlist=8, replicas=2
            )
        )
        assert ivf <= brute, "ivf path must never invent pairs"
        assert len(ivf) >= 0.95 * len(brute)

    def test_unknown_method_rejected(self, emb):
        with pytest.raises(ValueError):
            DD.embedding_neardup_pairs(emb, method="annoy")

    def test_brute_guard_refuses_large_input(self, emb):
        """r12 verdict #8: even an EXPLICIT brute call must not
        cartesian a large input by accident — above max_brute_rows it
        raises instead of building the crossJoin plan."""
        with pytest.raises(ValueError, match="quadratic"):
            DD.embedding_neardup_pairs(
                emb, method="brute", max_brute_rows=10
            ).count()
        with pytest.raises(ValueError, match="quadratic"):
            DD.ngram_jaccard_pairs(
                emb.selectExpr("vec_id as doc_id", "'x' as text"),
                max_rows=10,
            ).count()
        # cap=0 disables the guard (explicit opt-out for big validation
        # slices); the bounded fixture passes under the default cap via
        # the parity tests above
        assert (
            DD.embedding_neardup_pairs(
                emb.limit(20), threshold=2.0, method="brute", max_brute_rows=0
            ).count()
            > 0
        )

    def test_default_method_is_scale_path(self):
        """r11 verdict #6: omitting ``method`` must give the bucketed
        IVF path, not the quadratic crossJoin — a 100 TB caller must
        never get the cartesian by omission."""
        import inspect

        sig = inspect.signature(DD.embedding_neardup_pairs)
        assert sig.parameters["method"].default == "ivf"


class TestSimhashBucketCap:
    def test_degenerate_bucket_dropped(self, spark):
        """Many identical docs land in one band bucket per band; with
        max_bucket below the group size the quadratic expansion is
        skipped entirely instead of emitting C(n,2) pairs."""
        n = 40
        df = spark.createDataFrame(
            [(i, "the same boilerplate text repeated verbatim") for i in range(n)],
            "doc_id long, text string",
        )
        uncapped = DD.simhash_candidate_pairs(df, max_hamming=3, max_bucket=1000)
        assert uncapped.count() == n * (n - 1) // 2
        capped = DD.simhash_candidate_pairs(df, max_hamming=3, max_bucket=10)
        assert capped.count() == 0

    def test_pigeonhole_bands_cover_radius(self, spark):
        """Docs within the hamming radius are always candidates: verify
        banding finds pairs the old fixed-4-band scheme would miss
        (hamming in (3, 7])."""
        rows = [
            (1, "a quick brown fox jumps over the lazy dog near the river bank today"),
            (2, "a quick brown fox jumped over the lazy dogs near the river bank today"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        sig = {r["__id"]: r["__sig"] for r in DD.simhash_signatures_df(df).collect()}
        ham = bin((sig[1] ^ sig[2]) & ((1 << 64) - 1)).count("1")
        got = _pairset(DD.simhash_candidate_pairs(df, max_hamming=max(ham, 1)))
        assert (1, 2) in got


class TestVerifyStage:
    def test_verify_filters_false_positives(self, spark):
        df = spark.createDataFrame(
            [
                (1, "identical text body for the pair one two three four five"),
                (2, "identical text body for the pair one two three four five"),
                (3, "completely different content with other words entirely here"),
            ],
            "doc_id long, text string",
        )
        cand = spark.createDataFrame(
            [(1, 2), (1, 3), (2, 3)], "id_a long, id_b long"
        )
        out = DD.verify_pairs_jaccard(df, cand, threshold=0.9)
        assert _pairset(out) == {(1, 2)}
        row = out.collect()[0]
        assert row["jaccard"] == 1.0

    def test_minhash_signature_deterministic(self, docs):
        a = DD.minhash_signatures_df(docs.limit(20)).collect()
        b = DD.minhash_signatures_df(docs.limit(20)).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))


class TestNeardupComponents:
    def test_chain_and_islands(self, spark):
        """A~B, B~C chain collapses into one component labeled min id;
        a separate pair and an isolated pair each get their own."""
        pairs = spark.createDataFrame(
            [(2, 7), (7, 9), (11, 12), (20, 15)], "id_a long, id_b long"
        )
        got = {r["id"]: r["comp"] for r in DD.neardup_components(pairs).collect()}
        assert got == {2: 2, 7: 2, 9: 2, 11: 11, 12: 11, 15: 15, 20: 15}

    def test_long_chain_converges(self, spark):
        """A 12-node path needs multiple propagation rounds; all nodes
        must end in the min-id component."""
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(30, 42)], "id_a long, id_b long"
        )
        got = {r["id"]: r["comp"] for r in DD.neardup_components(pairs).collect()}
        assert set(got.values()) == {30} and len(got) == 13


class TestSrpNearDup:
    def test_codes_deterministic_and_match_formula(self):
        """srp_codes must equal a naive per-bit reimplementation of the
        documented integer-hash formula."""
        import numpy as np

        rng = np.random.default_rng(7)
        mat = rng.normal(size=(5, 8))
        bands, bb, seed, dims = 3, 4, 12345, 8
        got = DD.srp_codes(mat, bands, bb, seed)
        q = np.floor(mat * 16777216.0).astype(np.int64)
        for n in range(5):
            for b in range(bands):
                code = 0
                for j in range(bb):
                    dot = 0
                    for d in range(dims):
                        s = (((b * bb + j) * dims + d) * 2654435761 + seed) % 4294967296
                        s = ((s ^ (s >> 16)) * 73244475) % 4294967296
                        s = ((s ^ (s >> 16)) * 73244475) % 4294967296
                        s = s ^ (s >> 16)
                        sign = 2 * (s & 1) - 1
                        dot += int(q[n, d]) * sign
                    if dot > 0:
                        code |= 1 << j
                assert got[n, b] == code
        assert (DD.srp_codes(mat, bands, bb, seed) == got).all()

    def test_planted_neardups_recovered(self, spark):
        """Jittered copies of base vectors are strongly cosine-similar;
        SRP banding (16 x 4 bits) must recover every planted pair at
        threshold 0.1, and the verify stage must drop dissimilar pairs."""
        import numpy as np

        rng = np.random.default_rng(11)
        base = rng.normal(size=(20, 32)).astype(np.float64)
        base /= np.linalg.norm(base, axis=1, keepdims=True)
        jit = base + rng.normal(scale=0.01, size=base.shape)
        rows = [(i, base[i].tolist()) for i in range(20)] + [
            (100 + i, jit[i].tolist()) for i in range(20)
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        got = _pairset(
            DD.srp_neardup_pairs(df, threshold=0.1, bands=16, band_bits=4)
        )
        planted = {(i, 100 + i) for i in range(20)}
        assert planted <= got
        # nothing below-threshold sneaks through the exact verify
        for r in DD.srp_neardup_pairs(df, threshold=0.1).collect():
            assert r["cos_dist"] < 0.1

    def test_candidates_confined_to_buckets(self, spark):
        """Orthogonal one-hot vectors share no band codes beyond chance;
        with long codes (16 bits/band) none collide -> empty result even
        at threshold 2.0 (verify never sees a cross pair)."""
        import numpy as np

        rows = [(i, (np.eye(24)[i]).tolist()) for i in range(24)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        got = DD.srp_neardup_pairs(df, threshold=2.0, bands=4, band_bits=16)
        assert got.count() == 0


class TestArrowShingleKernel:
    """r14: the vectorized shingle-hash kernel must match the Catalyst
    HOF pipeline (array_distinct(transform(shingles(t,k), xxhash64)))
    bit for bit — hash values AND distinct sets — including unicode,
    astral chars, short and empty docs."""

    FUZZ = [
        "", "a", "abcd", "abcde", " x ", "\t\n mixed   WS\r doc ",
        "héllo wörld ünïcøde shingles test",
        "日本語のテキストです長い文字列",
        "emoji 😀😀 astral 𝕏𝕐 mix ascii",
        "a" * 600,
        "the same word the same word the same word",
    ]

    def test_kernel_matches_catalyst_hof(self, spark):
        import random

        random.seed(9)
        rows = list(self.FUZZ)
        for _ in range(120):
            n = random.randrange(0, 80)
            rows.append(
                "".join(random.choice("abcdefgh ij\tkl mn") for _ in range(n))
            )
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(rows)], "doc_id long, text string"
        )
        old = df.select(
            "doc_id",
            F.array_sort(
                F.array_distinct(
                    F.transform(DD.shingles("text", 5), lambda s: F.xxhash64(s))
                )
            ).alias("h"),
        ).collect()
        new = df.select(
            "doc_id", DD._shingle_hashes_udf(5)(DD._norm_text("text")).alias("h")
        ).collect()
        om = {r["doc_id"]: sorted(r["h"]) for r in old}
        nm = {r["doc_id"]: sorted(r["h"]) for r in new}
        assert om == nm

    def test_xxh64_matches_spark(self, spark):
        """numpy XXH64 == Spark xxhash64 (seed 42) on raw strings."""
        from pgvecto_rs_spark.operators._xxh64 import xxh64_bytes

        rows = [t for t in self.FUZZ if t]
        df = spark.createDataFrame([(t,) for t in rows], "s string")
        got = [r[0] for r in df.select(F.xxhash64("s")).collect()]
        assert got == [xxh64_bytes(t.encode("utf-8")) for t in rows]

    def test_simhash_signature_unchanged(self, spark):
        """Pinned signatures: the fused Arrow stage must reproduce the
        r13 majority-vote signatures (computed here from the Catalyst
        hash arrays, the old pipeline's exact input)."""
        import numpy as np

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(self.FUZZ)], "doc_id long, text string"
        )
        old = df.select(
            "doc_id",
            F.transform(DD.shingles("text", 5), lambda s: F.xxhash64(s)).alias("h"),
        ).collect()

        def majority(hs):
            h = np.asarray(hs, dtype=np.int64).astype(np.uint64)
            shifts = np.arange(64, dtype=np.uint64)
            votes = ((h[:, None] >> shifts) & np.uint64(1)).sum(axis=0)
            sig = int(
                (votes * 2 > len(h)).astype(np.uint64)
                @ (np.uint64(1) << shifts)
            )
            return sig - (1 << 64) if sig >= (1 << 63) else sig

        want = {r["doc_id"]: majority(r["h"]) for r in old}
        got = {
            r["__id"]: r["__sig"]
            for r in DD.simhash_signatures_df(df, "text", "doc_id", 5).collect()
        }
        assert want == got

    def test_minhash_signature_matches_explode_form(self, spark):
        """r14: the fused Arrow map-stage signatures must reproduce the
        r13 explode + partial-agg formulation bit for bit (min over the
        distinct shingle set == min over the position multiset)."""
        import random

        from pgvecto_rs_spark.operators.dedup import _P, _perm_constants

        random.seed(5)
        rows = list(self.FUZZ)
        for _ in range(80):
            rows.append(
                "".join(
                    random.choice("abcde fgh\tij")
                    for _ in range(random.randrange(0, 100))
                )
            )
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(rows)], "doc_id long, text string"
        )
        num_perm, k = 32, 5
        consts = _perm_constants(num_perm, 42)
        t = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
        base = df.select(F.col("doc_id").alias("__id"), t.alias("__t"))
        toks = base.select(
            "__id",
            F.explode(
                F.sequence(
                    F.lit(1), F.greatest(F.length("__t") - (k - 1), F.lit(1))
                )
            ).alias("__i"),
            "__t",
        ).select(
            "__id",
            F.pmod(
                F.xxhash64(F.substring(F.col("__t"), F.col("__i"), k)), F.lit(_P)
            ).alias("__h"),
        )
        mins = [
            F.min(F.pmod(F.lit(a) * F.col("__h") + F.lit(b), F.lit(_P))).alias(
                f"__m{j}"
            )
            for j, (a, b) in enumerate(consts)
        ]
        agg = toks.groupBy("__id").agg(*mins)
        old = {
            r["__id"]: tuple(r[f"__m{j}"] for j in range(num_perm))
            for r in agg.collect()
        }
        new = {
            r["__id"]: tuple(r["__sig"])
            for r in DD.minhash_signatures_df(df).collect()
        }
        assert old == new
