"""Property-based tests (hypothesis) over the codec and function
surfaces — the Spark analogue of the reference's fuzz/sqllogictest
sweeps: random vectors through wire/text round-trips, comparison
operators vs a Python model, slices vs the documented NULL rules,
sparse arithmetic vs dense float32 ground truth.

Each hypothesis example batches its vectors into ONE small Spark job
(max_examples is capped so the suite stays fast); pure-numpy helpers
are fuzzed directly.
"""

from __future__ import annotations

import math
import struct

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pgvecto_rs_spark.functions import dense as VD
from pgvecto_rs_spark.functions import sparse as VS
from pgvecto_rs_spark.functions import text_format as TF
from pgvecto_rs_spark.functions import wire as W

# derandomize: the gate must be reproducible — a fresh random seed
# discovering a new falsifying example mid-CI is a flake, not a catch;
# widen coverage by bumping max_examples deliberately instead.
_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

finite_f32 = st.floats(allow_nan=False, allow_infinity=False, width=32)
any_f32 = st.one_of(
    finite_f32,
    st.sampled_from([float("nan"), float("inf"), float("-inf"), 0.0, -0.0]),
)


def _f32bits(x: float) -> bytes:
    return struct.pack("<f", np.float32(x))


def _rows(spark, vecs, schema="id long, v array<float>"):
    return spark.createDataFrame(
        [(i, [float(np.float32(x)) for x in v]) for i, v in enumerate(vecs)], schema
    )


class TestWireRoundtrip:
    @settings(**_SETTINGS)
    @given(st.lists(st.lists(any_f32, min_size=1, max_size=24), min_size=1, max_size=8))
    def test_dense(self, spark, vecs):
        df = _rows(spark, vecs)
        out = df.select("id", W.vector_recv(W.vector_send("v")).alias("r")).collect()
        got = {r["id"]: r["r"] for r in out}
        for i, v in enumerate(vecs):
            assert [_f32bits(x) for x in got[i]] == [_f32bits(x) for x in v]

    @settings(**_SETTINGS)
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=1, max_value=64),
                st.data(),
            ),
            min_size=1,
            max_size=6,
        )
    )
    def test_sparse(self, spark, specs):
        rows = []
        for rid, (dims, data) in enumerate(specs):
            nnz = data.draw(st.integers(0, dims))
            idxs = sorted(
                data.draw(
                    st.sets(st.integers(0, dims - 1), min_size=nnz, max_size=nnz)
                )
            )
            vals = [
                data.draw(finite_f32.filter(lambda x: np.float32(x) != 0))
                for _ in idxs
            ]
            rows.append((rid, dims, idxs, [float(np.float32(v)) for v in vals]))
        df = spark.createDataFrame(
            rows, "id long, dims int, idx array<int>, val array<float>"
        )
        sv = VS.to_svector(F.col("dims"), "idx", "val")
        out = df.select("id", W.svector_recv(W.svector_send(sv)).alias("r")).collect()
        got = {r["id"]: r["r"] for r in out}
        for rid, dims, idxs, vals in rows:
            r = got[rid]
            assert r["dims"] == dims
            assert list(r["indexes"]) == idxs
            assert [_f32bits(x) for x in r["values"]] == [_f32bits(x) for x in vals]

    @settings(**_SETTINGS)
    @given(
        st.lists(
            st.lists(st.integers(0, 1), min_size=1, max_size=200),
            min_size=1,
            max_size=6,
        )
    )
    def test_bvector(self, spark, bitlists):
        from pgvecto_rs_spark.functions.binary import BITS_PER_WORD, from_bits

        df = spark.createDataFrame(
            [(i, bits) for i, bits in enumerate(bitlists)], "id long, bits array<int>"
        )
        bv = df.select("id", from_bits(F.col("bits")).alias("bv"))
        out = bv.withColumn("back", W.bvector_recv(W.bvector_send("bv"))).collect()
        for r in out:
            bits = bitlists[r["id"]]
            back = r["back"]
            assert back == r["bv"]
            assert back["dims"] == len(bits)
            # independent Python model of the word packing
            words = [0] * ((len(bits) + BITS_PER_WORD - 1) // BITS_PER_WORD)
            for pos, b in enumerate(bits):
                words[pos // BITS_PER_WORD] |= b << (pos % BITS_PER_WORD)
            assert list(back["data"]) == words


class TestTextRoundtrip:
    @settings(**_SETTINGS)
    @given(st.lists(st.lists(any_f32, min_size=1, max_size=16), min_size=1, max_size=8))
    def test_dense_format_parse_format(self, spark, vecs):
        """format -> parse -> format is a fixpoint, and parse(format(v))
        reproduces v bit-for-bit for finite values (Java Float.toString
        round-trip guarantee)."""
        df = _rows(spark, vecs)
        f1 = TF.format_vector("v")
        out = df.select(
            "id",
            f1.alias("s1"),
            TF.format_vector(TF.parse_vector(f1)).alias("s2"),
            TF.parse_vector(f1).alias("rt"),
        ).collect()
        for r in out:
            assert r["s1"] == r["s2"]
            v = vecs[r["id"]]
            for got, want in zip(r["rt"], v):
                if math.isnan(want):
                    assert math.isnan(got)
                elif want == 0.0:
                    # the integral branch of _fmt_f32 normalizes zero
                    # sign: -0.0 prints as "0" (reference cast.slt
                    # prints integral floats the same way)
                    assert got == 0.0
                else:
                    assert _f32bits(got) == _f32bits(want)


class TestLexicographic:
    @settings(**_SETTINGS)
    @given(
        st.integers(1, 8).flatmap(
            lambda d: st.lists(
                st.tuples(
                    st.lists(st.integers(-2, 2), min_size=d, max_size=d),
                    st.lists(st.integers(-2, 2), min_size=d, max_size=d),
                ),
                min_size=1,
                max_size=10,
            )
        )
    )
    def test_matches_tuple_compare(self, spark, pairs):
        # small-integer grids force frequent ties and shared prefixes —
        # the cases where a broken first-difference scan would misorder
        rows = [
            (i, [float(x) for x in a], [float(y) for y in b])
            for i, (a, b) in enumerate(pairs)
        ]
        df = spark.createDataFrame(rows, "id long, a array<float>, b array<float>")
        out = df.select(
            "id",
            VD.vector_lt("a", "b").alias("lt"),
            VD.vector_le("a", "b").alias("le"),
            VD.vector_gt("a", "b").alias("gt"),
            VD.vector_ge("a", "b").alias("ge"),
        ).collect()
        got = {r["id"]: r for r in out}
        for i, (a, b) in enumerate(pairs):
            r = got[i]
            assert r["lt"] == (a < b)
            assert r["le"] == (a <= b)
            assert r["gt"] == (a > b)
            assert r["ge"] == (a >= b)


class TestSlice:
    @settings(**_SETTINGS)
    @given(
        st.lists(
            st.tuples(
                st.lists(finite_f32, min_size=1, max_size=10),
                st.integers(-2, 12),
                st.integers(-2, 12),
            ),
            min_size=1,
            max_size=10,
        )
    )
    def test_matches_documented_null_rules(self, spark, cases):
        rows = [
            (i, [float(np.float32(x)) for x in v], a, b)
            for i, (v, a, b) in enumerate(cases)
        ]
        df = spark.createDataFrame(rows, "id long, v array<float>, a int, b int")
        out = df.select(
            "id", VD.vector_slice("v", F.col("a"), F.col("b")).alias("s")
        ).collect()
        got = {r["id"]: r["s"] for r in out}
        for i, (v, a, b) in enumerate(cases):
            n = len(v)
            if a < 0 or b < 0 or a > n or b > n or a >= b:
                assert got[i] is None, (v, a, b, got[i])
            else:
                assert [_f32bits(x) for x in got[i]] == [
                    _f32bits(x) for x in v[a:b]
                ], (v, a, b)


class TestSparseArithmetic:
    @settings(**_SETTINGS)
    @given(
        st.integers(1, 16).flatmap(
            lambda d: st.tuples(
                st.just(d),
                st.lists(
                    st.tuples(
                        st.lists(finite_f32, min_size=d, max_size=d),
                        st.lists(finite_f32, min_size=d, max_size=d),
                    ),
                    min_size=1,
                    max_size=6,
                ),
            )
        )
    )
    def test_add_sub_match_dense_f32(self, spark, spec):
        """svector add/sub over sparsified operands == dense float32
        arithmetic with exact zeros dropped (the reference's zero-drop
        invariant, svect.rs:228-302)."""
        dims, pairs = spec
        rows = []
        for i, (a, b) in enumerate(pairs):
            a32 = np.asarray(a, dtype=np.float32)
            b32 = np.asarray(b, dtype=np.float32)
            rows.append((i, dims, a32.tolist(), b32.tolist()))
        df = spark.createDataFrame(rows, "id long, dims int, a array<float>, b array<float>")

        def sparsify(col):
            # dense -> svector: indexes of nonzero entries
            idx = F.filter(
                F.sequence(F.lit(0), F.col("dims") - 1),
                lambda i: F.element_at(F.col(col), i + 1) != 0,
            )
            val = F.transform(idx, lambda i: F.element_at(F.col(col), i + 1))
            return VS.to_svector(F.col("dims"), idx, val)

        out = df.select(
            "id",
            VS.svector_add(sparsify("a"), sparsify("b")).alias("s"),
            VS.svector_sub(sparsify("a"), sparsify("b")).alias("d"),
        ).collect()
        got = {r["id"]: r for r in out}
        for i, (a, b) in enumerate(pairs):
            a32 = np.asarray(a, dtype=np.float32)
            b32 = np.asarray(b, dtype=np.float32)
            for field, expect in (("s", a32 + b32), ("d", a32 - b32)):
                r = got[i][field]
                dense = np.zeros(dims, dtype=np.float32)
                if r["indexes"]:
                    dense[np.asarray(r["indexes"])] = np.asarray(
                        r["values"], dtype=np.float32
                    )
                # stored entries are exactly the nonzero results
                assert all(np.float32(v) != 0 for v in r["values"])
                assert np.array_equal(dense, expect, equal_nan=True), (
                    a, b, field, dense, expect,
                )


class TestRepackPure:
    @settings(max_examples=50, deadline=None, derandomize=True)
    @given(st.lists(st.integers(0, 1), min_size=1, max_size=300))
    def test_bit_repack_roundtrip(self, bits):
        """64<->32-bit word repack of the bvector wire layout is a
        lossless involution for any dims (pure numpy, no Spark)."""
        dims = len(bits)
        padded = bits + [0] * (-dims % 64)
        words64 = np.zeros(len(padded) // 64, dtype=np.uint64)
        for w in range(len(words64)):
            acc = 0
            for j in range(64):
                acc |= padded[w * 64 + j] << j
            words64[w] = acc
        w32 = W._repack_64_to_32(words64.view(np.int64), dims)
        back = W._repack_32_to_64(np.asarray(w32, dtype=np.uint32), dims)
        assert np.array_equal(back.view(np.uint64), words64)


class TestDedupPassagesProperties:
    """Corpus-level invariants of curation.dedup_passages: on ANY corpus,
    every distinct passage string survives exactly once corpus-wide, in
    its first-occurrence document, and window accounting balances."""

    @given(
        st.lists(
            st.lists(
                st.sampled_from(["a", "b", "c", "dd"]), min_size=1, max_size=12
            ),
            min_size=1,
            max_size=8,
        ),
        st.integers(min_value=1, max_value=4),
    )
    @settings(**_SETTINGS)
    def test_each_distinct_passage_survives_exactly_once(self, spark, token_lists, w):
        from pgvecto_rs_spark.operators.curation import dedup_passages

        rows = [(i, " ".join(toks)) for i, toks in enumerate(token_lists)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["doc_id"]: r for r in dedup_passages(df, window_tokens=w).collect()}

        # python model: windows in (doc_id, win_idx) order, keep-first
        seen: set[str] = set()
        model_kept: dict[int, list[str]] = {}
        model_total: dict[int, int] = {}
        for i, toks in enumerate(rows):
            words = rows[i][1].split(" ")
            wins = [
                " ".join(words[j : j + w]) for j in range(0, len(words), w)
            ]
            model_total[i] = len(wins)
            model_kept[i] = []
            for win in wins:
                if win not in seen:
                    seen.add(win)
                    model_kept[i].append(win)

        assert set(out) == set(model_total)
        all_survivors: list[str] = []
        for i in out:
            assert out[i]["n_windows"] == model_total[i]
            assert out[i]["n_dup_windows"] == model_total[i] - len(model_kept[i])
            got_text = out[i]["dedup_text"]
            want_text = " ".join(model_kept[i])
            assert got_text == want_text
            all_survivors += model_kept[i]
        # global exactly-once property
        assert len(all_survivors) == len(set(all_survivors))


class TestGlobalRankProperties:
    """global_rank must equal the single-partition sort rank for ANY
    data distribution and partition count (RangePartitioner boundary
    sampling must never change the result)."""

    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=10_000),
                st.integers(min_value=-50, max_value=50),
            ),
            min_size=1,
            max_size=60,
            unique_by=lambda t: t[0],
        ),
        st.integers(min_value=1, max_value=9),
    )
    @settings(**_SETTINGS)
    def test_rank_is_exact_for_any_partitioning(self, spark, rows, parts):
        from pgvecto_rs_spark.operators.curation import global_rank

        df = spark.createDataFrame(rows, "id long, score long")
        got = {
            r["id"]: r["rank"]
            for r in global_rank(
                df, ["score", "id"], num_partitions=parts
            ).collect()
        }
        want = {
            rid: pos
            for pos, (rid, _) in enumerate(
                sorted(rows, key=lambda t: (t[1], t[0]))
            )
        }
        assert got == want


class TestProgressiveJpegProperty:
    """Random images, sizes, modes: decode(progressive) must equal
    decode(baseline) bit-for-bit (the scan script quantizes
    identically) — the hypothesis twin of the fixed-case codec tests."""

    @given(
        h=st.integers(1, 40),
        w=st.integers(1, 40),
        color=st.booleans(),
        sub=st.sampled_from(["444", "422", "420"]),
        ri=st.integers(0, 3),
        seed=st.integers(0, 2**31 - 1),
    )
    @settings(**{**_SETTINGS, "max_examples": 15})
    def test_progressive_equals_baseline(self, h, w, color, sub, ri, seed):
        from pgvecto_rs_spark.operators.jpeg import decode_jpeg, encode_jpeg

        rng = np.random.default_rng(seed)
        img = rng.integers(
            0, 256, (h, w, 3) if color else (h, w), dtype=np.uint8
        )
        kw = {"restart_interval": ri}
        if color:
            kw["subsample"] = sub
        base = decode_jpeg(encode_jpeg(img, **kw))
        prog = decode_jpeg(encode_jpeg(img, progressive=True, **kw))
        assert base.shape == (h, w)
        assert np.array_equal(base, prog)


class TestAdam7Property:
    @given(
        h=st.integers(1, 24),
        w=st.integers(1, 24),
        ctype=st.sampled_from([0, 2, 4, 6]),
        filt=st.integers(0, 1),
        seed=st.integers(0, 2**31 - 1),
    )
    @settings(**{**_SETTINGS, "max_examples": 15})
    def test_interlaced_equals_plain(self, h, w, ctype, filt, seed):
        from tests.test_pipeline_ops import TestAdam7PNG

        from pgvecto_rs_spark.operators.multimodal import _decode_png

        nch = {0: 1, 2: 3, 4: 2, 6: 4}[ctype]
        rng = np.random.default_rng(seed)
        px = rng.integers(
            0, 256, (h, w) if nch == 1 else (h, w, nch), dtype=np.uint8
        )
        a = _decode_png(TestAdam7PNG._make_png(px, ctype, 0, filt=filt))
        b = _decode_png(TestAdam7PNG._make_png(px, ctype, 1, filt=filt))
        assert np.array_equal(a, b)


class TestBatchedBpeProperty:
    """Random tiny corpora: bpe_train(batch=K) must match the pure-
    Python batched-schedule model for every (rounds, K)."""

    @given(
        seed=st.integers(0, 2**31 - 1),
        rounds=st.integers(1, 5),
        batch=st.integers(1, 4),
    )
    @settings(**{**_SETTINGS, "max_examples": 6})
    def test_matches_model(self, spark, seed, rounds, batch):
        import random as _random

        from tests.test_curation import TestBPETrain

        from pgvecto_rs_spark.operators.curation import bpe_train

        rng = _random.Random(seed)
        alphabet = "abcdxyz"
        words = [
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 6)))
            for _ in range(rng.randint(3, 25))
        ]
        docs = spark.createDataFrame(
            [(1, " ".join(words))], "doc_id long, text string"
        )
        got = bpe_train(docs, rounds=rounds, batch=batch)
        want, _trips = TestBPETrain._model_batched(words, rounds, batch)
        assert got == want


class TestGifProperty:
    @given(
        h=st.integers(1, 20),
        w=st.integers(1, 20),
        ncol=st.integers(2, 64),
        interlace=st.booleans(),
        seed=st.integers(0, 2**31 - 1),
    )
    @settings(**{**_SETTINGS, "max_examples": 15})
    def test_lzw_roundtrip(self, h, w, ncol, interlace, seed):
        from tests.test_pipeline_ops import TestGifDecode

        from pgvecto_rs_spark.operators.multimodal import _decode_gif

        rng = np.random.default_rng(seed)
        pal = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
        idxs = rng.integers(0, ncol, (h, w), dtype=np.uint8)
        want = pal[idxs].astype(np.float32).mean(axis=2) / 255.0
        got = _decode_gif(
            TestGifDecode._make_gif(idxs, pal, interlace=interlace)
        )
        assert got.shape == (h, w)
        assert np.allclose(got, want)


class TestBmpProperty:
    @given(
        h=st.integers(1, 16),
        w=st.integers(1, 16),
        bpp=st.sampled_from([1, 4, 8, 24, 32]),
        top_down=st.booleans(),
        seed=st.integers(0, 2**31 - 1),
    )
    @settings(**{**_SETTINGS, "max_examples": 15})
    def test_roundtrip(self, h, w, bpp, top_down, seed):
        from tests.test_pipeline_ops import TestBmpDecode

        from pgvecto_rs_spark.operators.multimodal import _decode_bmp

        rng = np.random.default_rng(seed)
        if bpp in (24, 32):
            px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            want = px.astype(np.float32).mean(axis=2) / 255.0
            got = _decode_bmp(
                TestBmpDecode._bmp(px_rgb=px, bpp=bpp, top_down=top_down)
            )
        else:
            ncol = 1 << bpp
            pal = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
            idxs = rng.integers(0, ncol, (h, w), dtype=np.uint8)
            want = pal[idxs].astype(np.float32).mean(axis=2) / 255.0
            got = _decode_bmp(
                TestBmpDecode._bmp(
                    idxs=idxs, palette=pal, bpp=bpp, top_down=top_down
                )
            )
        assert got.shape == (h, w)
        assert np.allclose(got, want)

    @given(
        h=st.integers(1, 12),
        w=st.integers(1, 20),
        top_down=st.booleans(),
        seed=st.integers(0, 2**31 - 1),
    )
    @settings(**{**_SETTINGS, "max_examples": 10})
    def test_rle8_roundtrip(self, h, w, top_down, seed):
        from tests.test_pipeline_ops import TestBmpDecode

        from pgvecto_rs_spark.operators.multimodal import _decode_bmp

        rng = np.random.default_rng(seed)
        pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
        idxs = rng.integers(0, 256, (h, w), dtype=np.uint8)
        want = pal[idxs].astype(np.float32).mean(axis=2) / 255.0
        got = _decode_bmp(
            TestBmpDecode._bmp(
                idxs=idxs, palette=pal, bpp=8, rle=True, top_down=top_down
            )
        )
        assert np.allclose(got, want)
