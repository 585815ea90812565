"""Dataset-curation operators: decontamination, PII redaction,
deterministic splits, vocabulary stats (operators/curation.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pgvecto_rs_spark.operators.curation import (
    decontaminate,
    dup_ngram_fraction,
    ngram_strings,
    pii_redact,
    top_terms,
    train_split,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestDecontaminate:
    def test_known_overlap_counts(self, spark):
        # benchmark holds "a b c d e"; doc 1 contains that exact window
        # twice (still ONE distinct 3-gram set hit per gram), doc 2 has
        # no overlap, doc 3 is too short for 3-grams
        bench = _docs(spark, [(100, "a b c d e")])
        docs = _docs(
            spark,
            [
                (1, "x a b c d e y a b c d e"),
                (2, "p q r s t u v"),
                (3, "a b"),
            ],
        )
        got = {r["doc_id"]: r for r in decontaminate(docs, bench, n=3).collect()}
        # benchmark 3-grams: {a b c, b c d, c d e} — doc 1 hits all 3
        assert got[1]["n_hit"] == 3 and got[1]["contaminated"]
        assert got[2]["n_hit"] == 0 and not got[2]["contaminated"]
        assert got[3]["n_hit"] == 0

    def test_hashed_equals_string_join(self, spark):
        bench = _docs(spark, [(100, "the quick brown fox jumps over the lazy dog")])
        docs = _docs(
            spark,
            [
                (1, "see the quick brown fox jumps away"),
                (2, "entirely different words here today friends"),
                (3, ""),
            ],
        )
        a = sorted(
            tuple(r) for r in decontaminate(docs, bench, n=4, hash_grams=True).collect()
        )
        b = sorted(
            tuple(r) for r in decontaminate(docs, bench, n=4, hash_grams=False).collect()
        )
        assert a == b
        assert dict((r[0], r[1]) for r in a)[1] == 2  # two overlapping 4-grams

    def test_ngram_strings_short_and_empty(self, spark):
        df = _docs(spark, [(1, "a b"), (2, ""), (3, "  "), (4, "a b c")])
        got = {
            r["doc_id"]: r["g"]
            for r in df.select("doc_id", ngram_strings(F.col("text"), 3).alias("g")).collect()
        }
        assert got[1] == [] and got[2] == [] and got[3] == []
        assert got[4] == ["a b c"]


class TestDupNgramFraction:
    def test_cross_doc_semantics(self, spark):
        # docs 1 and 2 share the window "a b c" (cross-doc dup); doc 1
        # repeats "x y z" twice INTRA-doc only (df=1 -> not duplicated);
        # doc 3 is too short for 3-grams
        docs = _docs(
            spark,
            [
                (1, "a b c q x y z q x y z"),
                (2, "a b c r s t"),
                (3, "a b"),
            ],
        )
        out = {
            r["doc_id"]: r
            for r in dup_ngram_fraction(docs, n=3).collect()
        }
        # doc 1: 9 gram instances, only "a b c" (1 instance) is cross-doc
        assert (out[1]["n_grams"], out[1]["n_dup"]) == (9, 1)
        # doc 2: 4 instances, "a b c" duplicated
        assert (out[2]["n_grams"], out[2]["n_dup"]) == (4, 1)
        assert out[2]["dup_frac"] == 0.25
        # short doc: zero grams, frac 0.0 (not NULL)
        assert (out[3]["n_grams"], out[3]["n_dup"], out[3]["dup_frac"]) == (
            0, 0, 0.0,
        )

    def test_hash_and_string_grams_agree(self, spark):
        docs = _docs(
            spark,
            [(i, f"w{i % 3} a b c d w{i % 5} a b c d") for i in range(12)],
        )
        a = sorted(map(tuple, dup_ngram_fraction(docs, n=4, hash_grams=True).collect()))
        b = sorted(map(tuple, dup_ngram_fraction(docs, n=4, hash_grams=False).collect()))
        assert a == b

    def test_materialize_false_equal(self, spark):
        docs = _docs(
            spark,
            [(i, f"w{i % 3} a b c d w{i % 5} a b c d") for i in range(12)],
        )
        a = sorted(map(tuple, dup_ngram_fraction(docs, n=4).collect()))
        b = sorted(map(tuple, dup_ngram_fraction(docs, n=4, materialize=False).collect()))
        assert a == b


class TestPiiRedact:
    def test_counts_and_redaction(self, spark):
        df = _docs(
            spark,
            [
                (1, "mail me at jane.doe+x@corp.example.org thanks"),
                (2, "call 555-123-4567 or 555.987.6543 now"),
                (3, "server at 192.168.10.1 is down"),
                (4, "clean text with no pii at all"),
            ],
        )
        got = {r["doc_id"]: r for r in pii_redact(df).collect()}
        assert got[1]["email_count"] == 1 and "[EMAIL]" in got[1]["redacted"]
        assert "jane" not in got[1]["redacted"]
        assert got[2]["phone_count"] == 2 and got[2]["redacted"].count("[PHONE]") == 2
        assert got[3]["ipv4_count"] == 1 and "[IPV4]" in got[3]["redacted"]
        assert got[4]["email_count"] == got[4]["phone_count"] == got[4]["ipv4_count"] == 0
        assert got[4]["redacted"] == "clean text with no pii at all"

    def test_email_not_double_counted_as_phone(self, spark):
        # phone-like digits inside an already-redacted email local part
        # must not count again — counts run on the rolling redacted text
        df = _docs(spark, [(1, "a555-123-4567@x.co and separately 555-000-1111")])
        r = pii_redact(df).collect()[0]
        assert r["email_count"] == 1
        assert r["phone_count"] == 1  # only the standalone phone
        assert r["redacted"] == "[EMAIL] and separately [PHONE]"


class TestTrainSplit:
    def test_deterministic_and_proportional(self, spark):
        df = spark.range(2000).withColumnRenamed("id", "doc_id")
        a = {r["doc_id"]: r["split"] for r in train_split(df).collect()}
        b = {r["doc_id"]: r["split"] for r in train_split(df).collect()}
        assert a == b  # reproducible
        n = len(a)
        frac_train = sum(1 for v in a.values() if v == "train") / n
        assert 0.85 < frac_train < 0.95
        assert set(a.values()) == {"train", "val", "test"}

    def test_seed_changes_assignment(self, spark):
        df = spark.range(500).withColumnRenamed("id", "doc_id")
        a = {r["doc_id"]: r["split"] for r in train_split(df, seed="s1").collect()}
        b = {r["doc_id"]: r["split"] for r in train_split(df, seed="s2").collect()}
        assert a != b

    def test_custom_weights(self, spark):
        df = spark.range(1000).withColumnRenamed("id", "doc_id")
        got = train_split(df, weights={"a": 1, "b": 1}).groupBy("split").count().collect()
        counts = {r["split"]: r["count"] for r in got}
        assert set(counts) == {"a", "b"}
        assert abs(counts["a"] - counts["b"]) < 200


class TestTopTerms:
    def test_counts_and_tiebreak(self, spark):
        df = _docs(
            spark,
            [(1, "b a b c"), (2, "  A  b\tc "), (3, "")],
        )
        got = [(r["term"], r["n"]) for r in top_terms(df, k=10).collect()]
        # b:3, a:2, c:2 — ties broken by term asc
        assert got == [("b", 3), ("a", 2), ("c", 2)]

    def test_limit_applies(self, spark):
        df = _docs(spark, [(1, "w1 w2 w3 w4 w5 w6")])
        assert len(top_terms(df, k=3).collect()) == 3


class TestStreamingComposition:
    def test_pii_redact_and_split_stream_stateless(self, spark, sf_dir, tmp_path):
        """Stateless curation ops compose with Structured Streaming for
        free: pii_redact + train_split over a file stream (append mode,
        no state store) produce exactly the batch-mode result."""
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
        stage = str(tmp_path / "stage")
        docs.repartition(4).write.mode("overwrite").parquet(stage)

        def transform(df):
            return train_split(pii_redact(df)).select(
                "doc_id", "email_count", "split", F.md5("redacted").alias("fp")
            )

        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stage)
        )
        q = (
            transform(stream)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("cur_stream")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

        got = sorted(tuple(r) for r in spark.sql("SELECT * FROM cur_stream").collect())
        want = sorted(tuple(r) for r in transform(docs).collect())
        assert got == want and len(got) > 0


class TestUnigramLmScore:
    def test_rare_tokens_score_lower(self, spark):
        from pgvecto_rs_spark.operators.curation import unigram_lm_score

        # "common" appears 8x in the corpus, "rareword" once: the doc of
        # rare tokens must score strictly below the all-common doc, and
        # a uniform corpus gives exactly ln(tf/total)
        df = _docs(
            spark,
            [
                (1, "common common common common"),
                (2, "common common common common"),
                (3, "rareword common unusualterm oddity"),
            ],
        )
        got = {r["doc_id"]: r for r in unigram_lm_score(df).collect()}
        import math

        assert got[1]["n_tokens"] == 4
        assert got[3]["lm_score"] < got[1]["lm_score"]
        # doc 1: every token has tf=9, total=12 -> mean ln(9/12)
        want = math.floor(math.log(9 / 12) * 1e6 + 0.5) / 1e6
        assert got[1]["lm_score"] == pytest.approx(want, abs=1e-9)

    def test_empty_docs_excluded(self, spark):
        from pgvecto_rs_spark.operators.curation import unigram_lm_score

        df = _docs(spark, [(1, "a b"), (2, ""), (3, "   ")])
        ids = {r["doc_id"] for r in unigram_lm_score(df).collect()}
        assert ids == {1}


class TestChunkDocuments:
    def test_boundaries_overlap_and_coverage(self, spark):
        from pgvecto_rs_spark.operators.curation import chunk_documents

        words = " ".join(f"t{i}" for i in range(57))
        df = _docs(spark, [(1, words), (2, "a b c"), (3, ""), (4, " ".join(f"x{i}" for i in range(40)))])
        got = {}
        for r in chunk_documents(df, chunk_tokens=32, overlap=8).collect():
            got.setdefault(r["doc_id"], []).append(r)
        for rows in got.values():
            rows.sort(key=lambda r: r["chunk_no"])

        # 57 tokens, step 24: chunks at 0,24,48 -> 3 chunks; last has 9
        assert [r["chunk_no"] for r in got[1]] == [0, 1, 2]
        assert [r["n_chunk_tokens"] for r in got[1]] == [32, 32, 9]
        assert got[1][1]["chunk_text"].split()[0] == "t24"  # overlap start
        # every token covered in order
        covered = got[1][0]["chunk_text"].split() + [
            t for r in got[1][1:] for t in r["chunk_text"].split()[8:]
        ]
        assert covered == [f"t{i}" for i in range(57)]

        # short doc -> one chunk, full text
        assert len(got[2]) == 1 and got[2][0]["chunk_text"] == "a b c"
        # blank doc -> no rows
        assert 3 not in got
        # 40 tokens -> chunks at 0 and 24 (last 16 tokens)
        assert [r["n_chunk_tokens"] for r in got[4]] == [32, 16]

    def test_overlap_validation(self, spark):
        from pgvecto_rs_spark.operators.curation import chunk_documents

        with pytest.raises(ValueError):
            chunk_documents(_docs(spark, [(1, "a")]), chunk_tokens=8, overlap=8)


class TestPackSequences:
    def test_conservation_and_straddling(self, spark):
        from pgvecto_rs_spark.operators.curation import pack_sequences

        # budget 10; docs of 4, 8, 3, 10 tokens -> offsets 0, 4, 12, 15
        docs = _docs(
            spark,
            [
                (1, " ".join("a" * 1 for _ in range(4))),
                (2, " ".join("b" for _ in range(8))),
                (3, "c c c"),
                (4, " ".join("d" for _ in range(10))),
                (5, ""),
            ],
        )
        rows = pack_sequences(docs, budget=10).collect()
        got = {}
        for r in rows:
            got.setdefault(r["doc_id"], []).append((r["bin_id"], r["n_tokens_in_bin"]))
        for v in got.values():
            v.sort()
        assert got[1] == [(0, 4)]
        assert got[2] == [(0, 6), (1, 2)]  # straddles the first boundary
        assert got[3] == [(1, 3)]
        assert got[4] == [(1, 5), (2, 5)]
        assert 5 not in got  # empty doc
        # token conservation: every token lands in exactly one bin
        assert sum(n for v in got.values() for _, n in v) == 4 + 8 + 3 + 10
        # bins fill to the budget except the last
        per_bin = {}
        for v in got.values():
            for b, n in v:
                per_bin[b] = per_bin.get(b, 0) + n
        assert per_bin == {0: 10, 1: 10, 2: 5}


class TestRepetitionSignals:
    def test_hand_computed_doc(self, spark):
        from pgvecto_rs_spark.operators.curation import repetition_signals

        # "a b a b a c" (norm chars = 11, tokens = 6)
        #   top word: 'a' x3           -> top_word_frac = 3/6
        #   top bigram: 'a b' x2 (len 3) -> 2*3/11
        #   top trigram: 'a b a' x2 (len 5) -> 2*5/11
        #   dup 5-grams: none (both 5-grams distinct) -> 0
        docs = _docs(spark, [(1, "a b a b a c")])
        r = repetition_signals(docs).collect()[0]
        assert r["n_tokens"] == 6 and r["n_chars"] == 11
        assert r["top_word_frac"] == pytest.approx(3 / 6)
        assert r["top2_char_frac"] == pytest.approx(6 / 11)
        assert r["top3_char_frac"] == pytest.approx(10 / 11)
        assert r["dup5_char_frac"] == 0.0

    def test_duplicated_5gram_and_ties(self, spark):
        from pgvecto_rs_spark.operators.curation import repetition_signals

        # doc 1: "x y z w v" repeated 3 times -> the 5-gram
        # "x y z w v" occurs 3 times (overlapping windows also repeat);
        # every 5-gram that occurs >= 2 times contributes count*len.
        text = "x y z w v x y z w v x y z w v"
        docs = _docs(spark, [(1, text), (2, "q")])
        got = {r["doc_id"]: r for r in repetition_signals(docs).collect()}
        r = got[1]
        n_chars = len(text)
        # 11 windows of 5 over 15 tokens; each of the 5 rotations of
        # (x y z w v) occurs >= 2 times; lengths are all 9 chars.
        # occurrences: "x y z w v" x3, the other 4 rotations x2 each
        assert r["dup5_char_frac"] == pytest.approx((3 * 9 + 4 * 2 * 9) / n_chars)
        # single-token doc: no bigrams -> 0.0, top word is itself
        q = got[2]
        assert q["top_word_frac"] == 1.0
        assert q["top2_char_frac"] == 0.0 and q["dup5_char_frac"] == 0.0

    def test_tie_breaks_lexicographic(self, spark):
        from pgvecto_rs_spark.operators.curation import repetition_signals

        # 'b' and 'a' both occur twice -> the reported top word must be
        # the lexicographically smallest ('a'); fractions equal either way
        docs = _docs(spark, [(1, "b a b a")])
        r = repetition_signals(docs).collect()[0]
        assert r["top_word_frac"] == pytest.approx(0.5)


class TestBPETrain:
    def test_classic_merge_sequence(self, spark):
        """Sennrich et al.'s worked example: low x5, lower x2,
        newest x6, widest x3 -> merges (e,s), (es,t), then (l,o) by
        lexicographic tie-break against (o,w)."""
        from pgvecto_rs_spark.operators.curation import bpe_train

        text = " ".join(
            ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
        )
        docs = _docs(spark, [(1, text)])
        merges = bpe_train(docs, rounds=3)
        assert merges == [(0, "e", "s", 9), (1, "es", "t", 9), (2, "l", "o", 7)]

    def test_greedy_nonoverlapping_merge(self, spark):
        """'aaaa' with pair (a,a) must merge to [aa, aa], not overlap."""
        from pgvecto_rs_spark.operators.curation import bpe_train

        docs = _docs(spark, [(1, "aaaa aaaa aaaa")])
        merges = bpe_train(docs, rounds=2)
        # round 0: (a,a) count 9; round 1 sequences are [aa, aa] -> pair
        # (aa,aa) count 3
        assert merges[0] == (0, "a", "a", 9)
        assert merges[1] == (1, "aa", "aa", 3)

    @staticmethod
    def _model_batched(words: list[str], rounds: int, batch: int, scan: int = 64):
        """Pure-Python replay of bpe_train's batched schedule."""
        from collections import Counter

        freq = Counter(words)
        seqs = {w: list(w) for w in freq}
        merges, trips = [], 0
        while len(merges) < rounds:
            counts: Counter = Counter()
            for w, f in freq.items():
                s = seqs[w]
                for i in range(len(s) - 1):
                    counts[(s[i], s[i + 1])] += f
            top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
            top = top[: scan if batch > 1 else 1]
            trips += 1
            if not top:
                break
            cap = min(batch, rounds - len(merges))
            accepted: list[tuple[str, str]] = []
            for (a, b), c in top:
                if len(accepted) == cap:
                    break
                if any(
                    a in (x, y, x + y) or b in (x, y, x + y)
                    for x, y in accepted
                ):
                    continue
                merges.append((len(merges), a, b, c))
                accepted.append((a, b))
            for a, b in accepted:
                for w in seqs:
                    s, out, i = seqs[w], [], 0
                    while i < len(s):
                        if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                            out.append(a + b)
                            i += 2
                        else:
                            out.append(s[i])
                            i += 1
                    seqs[w] = out
        return merges, trips

    def test_batched_schedule_and_round_trips(self, spark):
        """batch=K: ceil(rounds/K) driver round-trips, schedule matches
        the pure-Python replay — including a conflicting candidate
        being skipped (shared symbol with an accepted merge) and
        re-surfacing with a recomputed count in the next round."""
        from pgvecto_rs_spark.operators.curation import (
            LAST_BPE_TRAIN_STATS,
            bpe_train,
        )

        # (a,b) dominates; (b,c)/(b,d) conflict with it via 'b'
        words = ["abc"] * 10 + ["abd"] * 9 + ["xyz"] * 8 + ["uvw"] * 3
        docs = _docs(spark, [(1, " ".join(words))])
        for rounds, batch in ((4, 2), (3, 3), (5, 2)):
            got = bpe_train(docs, rounds=rounds, batch=batch)
            want, trips = self._model_batched(words, rounds, batch)
            assert got == want, (rounds, batch)
            assert LAST_BPE_TRAIN_STATS["round_trips"] == trips
            assert trips == -(-rounds // batch)  # ceil
            assert LAST_BPE_TRAIN_STATS["rules"] == rounds

    def test_batch_one_matches_batched_code_path(self, spark):
        """batch=1 through the unified loop == the classic sequence."""
        from pgvecto_rs_spark.operators.curation import (
            LAST_BPE_TRAIN_STATS,
            bpe_train,
        )

        text = " ".join(
            ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
        )
        docs = _docs(spark, [(1, text)])
        merges = bpe_train(docs, rounds=3, batch=1)
        assert merges == [(0, "e", "s", 9), (1, "es", "t", 9), (2, "l", "o", 7)]
        assert LAST_BPE_TRAIN_STATS["round_trips"] == 3

    def test_batch_validation(self, spark):
        from pgvecto_rs_spark.operators.curation import bpe_train

        docs = _docs(spark, [(1, "ab ab")])
        for bad in (0, 257, -1):
            with pytest.raises(ValueError):
                bpe_train(docs, rounds=1, batch=bad)

    def test_batch_64_round_trip_count(self, spark):
        """r8: the cap is 256 (lineage is truncated every 4 folds, so
        the per-projection tree is bounded regardless of K).  K=64 over
        a 64-rule vocabulary must learn the model-predicted schedule in
        the model-predicted number of driver round-trips — far fewer
        than 64 (compatibility, not the old cap of 16, is what bounds a
        round: each accepted merge consumes 2 fresh symbols)."""
        import random
        import string

        from pgvecto_rs_spark.operators.curation import (
            LAST_BPE_TRAIN_STATS,
            bpe_train,
        )

        rng = random.Random(8)
        vocab = [
            "".join(rng.choice(string.ascii_lowercase) for _ in range(6))
            for _ in range(60)
        ]
        words = [w for i, w in enumerate(vocab) for _ in range(60 - i)]
        docs = _docs(spark, [(1, " ".join(words))])
        got = bpe_train(docs, rounds=64, batch=64, scan=64)
        want, trips = self._model_batched(words, 64, 64)
        assert got == want
        assert trips == 5  # pinned: the model needs 5 rounds, not 64
        assert LAST_BPE_TRAIN_STATS["round_trips"] == trips
        assert LAST_BPE_TRAIN_STATS["rules"] == 64

    def test_underfilled_batch_runs_extra_round(self, spark):
        """Fewer compatible candidates than `batch` in the scan window:
        accept what's there, recount, finish in a later round — total
        rules still == rounds."""
        from pgvecto_rs_spark.operators.curation import (
            LAST_BPE_TRAIN_STATS,
            bpe_train,
        )

        # 'ab' dominates; every other candidate pair shares a symbol
        # with it, so round 1 of batch=3 accepts fewer than 3.
        words = ["ab"] * 20 + ["ba"] * 10 + ["abab"] * 5
        docs = _docs(spark, [(1, " ".join(words))])
        got = bpe_train(docs, rounds=3, batch=3)
        want, trips = self._model_batched(words, 3, 3)
        assert got == want
        assert LAST_BPE_TRAIN_STATS["rules"] == 3
        assert LAST_BPE_TRAIN_STATS["round_trips"] == trips
        assert trips > 1  # the batch really did under-fill


class TestBPEEncode:
    def test_counts_match_naive_encoder(self, spark):
        """bpe_encode_counts over the vocab table == a naive per-word
        sequential encoder applying the same rules in order."""
        from pgvecto_rs_spark.operators.curation import (
            bpe_encode_counts,
            bpe_train,
        )

        corpus = [
            (1, "low low low low low lower lower"),
            (2, "newest newest newest widest widest widest"),
            (3, "newest newest newest low aaaa"),
            (4, "   "),  # blank: no words, must drop out
        ]
        docs = _docs(spark, corpus)
        merges = bpe_train(docs, rounds=4)
        got = {
            r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
            for r in bpe_encode_counts(docs, merges).collect()
        }

        def naive(word: str) -> int:
            seq = list(word)
            for _r, a, b, _c in merges:
                out: list[str] = []
                i = 0
                while i < len(seq):
                    if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(seq[i])
                        i += 1
                seq = out
            return len(seq)

        expect = {}
        for doc_id, text in corpus:
            words = text.split()
            if words:
                expect[doc_id] = (len(words), sum(naive(w) for w in words))
        assert got == expect
        assert 4 not in got

    def test_empty_merges_is_char_count(self, spark):
        from pgvecto_rs_spark.operators.curation import bpe_encode_counts

        docs = _docs(spark, [(1, "ab cde ab")])
        got = bpe_encode_counts(docs, []).collect()
        assert [(r["doc_id"], r["n_words"], r["n_bpe_tokens"]) for r in got] == [
            (1, 3, 7)
        ]


class TestMixing:
    def test_temperature_quotas_rebalances_small_sources(self):
        from pgvecto_rs_spark.operators.curation import temperature_quotas

        counts = {"big": 900, "small": 100}
        q = temperature_quotas(counts, 100, temperature=0.7)
        assert sum(q.values()) == 100
        # τ<1 gives the small source more than its 10% proportional share
        assert q["small"] > 10
        assert q["big"] + q["small"] == 100
        # τ=1 is proportional sampling
        q1 = temperature_quotas(counts, 100, temperature=1.0)
        assert q1 == {"big": 90, "small": 10}

    def test_temperature_quotas_caps_at_source_size(self):
        from pgvecto_rs_spark.operators.curation import temperature_quotas

        # tiny source can't supply more than it has; leftover goes elsewhere
        q = temperature_quotas({"a": 3, "b": 100}, 50, temperature=0.1)
        assert q["a"] <= 3
        assert sum(q.values()) == 50
        # total above corpus size: spend everything, no infinite loop
        q = temperature_quotas({"a": 3, "b": 4}, 100)
        assert q == {"a": 3, "b": 4}

    def test_quota_sample_deterministic_and_exact(self, spark):
        import hashlib

        from pgvecto_rs_spark.operators.curation import quota_sample

        rows = [(i, f"s{i % 3}") for i in range(60)]
        df = spark.createDataFrame(rows, "doc_id long, source string")
        quotas = {"s0": 5, "s1": 0, "s2": 20}  # s2 has 20 members: all kept
        got = quota_sample(df, quotas, id_col="doc_id").collect()
        by_src: dict[str, list[int]] = {}
        for r in got:
            by_src.setdefault(r["source"], []).append(r["doc_id"])
        assert len(by_src.get("s0", [])) == 5
        assert "s1" not in by_src
        assert sorted(by_src["s2"]) == [i for i in range(60) if i % 3 == 2]
        # the kept s0 ids are exactly the 5 smallest md5 digests
        s0_ids = [i for i in range(60) if i % 3 == 0]
        expect = sorted(
            s0_ids, key=lambda i: hashlib.md5(str(i).encode()).hexdigest()
        )[:5]
        assert sorted(by_src["s0"]) == sorted(expect)
        # unknown source in quotas is harmless; missing source drops out
        got2 = quota_sample(df, {"s0": 5, "zzz": 9}, id_col="doc_id").collect()
        assert {r["source"] for r in got2} == {"s0"}


def test_dsir_importance_weights_semantics(spark):
    """Target-typical docs outweigh raw-typical ones; weights are
    deterministic scaled ints; n_feat counts trigrams."""
    from pgvecto_rs_spark.operators.curation import dsir_importance_weights

    target = spark.createDataFrame(
        [(100 + i, "alpha beta gamma alpha beta") for i in range(3)],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "zzz qqq xxx vvv"), (3, "alpha beta")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in dsir_importance_weights(raw, target).collect()}
    assert set(rows) == {1, 2, 3}
    # doc 1/3 share the target's trigrams -> higher weight than doc 2
    assert rows[1]["weight_u"] > rows[2]["weight_u"]
    assert rows[3]["weight_u"] > rows[2]["weight_u"]
    assert rows[1]["n_feat"] == len("alpha beta gamma") - 2
    # deterministic across repartitionings
    again = {
        r["doc_id"]: r["weight_u"]
        for r in dsir_importance_weights(raw.repartition(7), target.repartition(5)).collect()
    }
    assert again == {k: v["weight_u"] for k, v in rows.items()}
    # lazy variant (materialize=False) yields identical weights
    lazy = {
        r["doc_id"]: r["weight_u"]
        for r in dsir_importance_weights(raw, target, materialize=False).collect()
    }
    assert lazy == {k: v["weight_u"] for k, v in rows.items()}


class TestDedupPassages:
    def test_keep_first_and_reassembly(self, spark):
        from pgvecto_rs_spark.operators.curation import dedup_passages

        # window_tokens=3: doc 1 = [a b c][d e f]; doc 2 repeats doc 1's
        # first passage then adds a fresh one; doc 3 is entirely passages
        # seen before -> empty dedup_text
        docs = _docs(
            spark,
            [
                (1, "a b c d e f"),
                (2, "a b c x y z"),
                (3, "a b c d e f"),
                (4, ""),
            ],
        )
        got = {
            r["doc_id"]: r
            for r in dedup_passages(docs, window_tokens=3).collect()
        }
        assert got[1]["n_windows"] == 2 and got[1]["n_dup_windows"] == 0
        assert got[1]["dedup_text"] == "a b c d e f"
        assert got[2]["n_dup_windows"] == 1
        assert got[2]["dedup_text"] == "x y z"
        assert got[3]["n_dup_windows"] == 2 and got[3]["dedup_text"] == ""
        assert 4 not in got  # blank docs yield no rows

    def test_tail_window_and_within_doc_dup(self, spark):
        from pgvecto_rs_spark.operators.curation import dedup_passages

        # 7 tokens, w=3 -> windows [a b c][a b c][a]: the SECOND window
        # duplicates the first WITHIN the same doc; the 1-token tail is
        # its own passage
        docs = _docs(spark, [(1, "a b c a b c a")])
        row = dedup_passages(docs, window_tokens=3).collect()[0]
        assert row["n_windows"] == 3
        assert row["n_dup_windows"] == 1
        assert row["dedup_text"] == "a b c a"


class TestGlobalShuffle:
    def test_matches_single_partition_rank_and_determinism(self, spark):
        from pgvecto_rs_spark.operators.curation import global_shuffle

        docs = _docs(spark, [(i, f"doc {i}") for i in range(200)])
        got = {
            r["doc_id"]: r["shuffle_pos"]
            for r in global_shuffle(docs, seed=7, num_buckets=16).collect()
        }
        # truth: one-partition rank over the same md5 key
        import hashlib

        order = sorted(range(200), key=lambda i: (hashlib.md5(f"7{i}".encode()).hexdigest(), i))
        want = {doc: pos for pos, doc in enumerate(order)}
        assert got == want
        # a permutation of 0..n-1, stable across re-runs
        assert sorted(got.values()) == list(range(200))
        again = {
            r["doc_id"]: r["shuffle_pos"]
            for r in global_shuffle(docs, seed=7, num_buckets=16).collect()
        }
        assert again == got

    def test_seed_changes_order_but_not_set(self, spark):
        from pgvecto_rs_spark.operators.curation import global_shuffle

        docs = _docs(spark, [(i, "x") for i in range(50)])
        a = {r["doc_id"]: r["shuffle_pos"] for r in global_shuffle(docs, seed=1).collect()}
        b = {r["doc_id"]: r["shuffle_pos"] for r in global_shuffle(docs, seed=2).collect()}
        assert a != b
        assert sorted(a.values()) == sorted(b.values()) == list(range(50))


class TestGlobalRankAndNtile:
    def test_rank_matches_single_partition_sort(self, spark):
        from pgvecto_rs_spark.operators.curation import global_rank

        rows = [(i, (i * 37) % 100) for i in range(500)]
        df = spark.createDataFrame(rows, "doc_id long, score long")
        got = {
            r["doc_id"]: r["rank"]
            for r in global_rank(df, ["score", "doc_id"], num_partitions=8).collect()
        }
        want = {
            doc: pos
            for pos, (doc, _) in enumerate(sorted(rows, key=lambda t: (t[1], t[0])))
        }
        assert got == want

    def test_ntile_matches_sql_ntile(self, spark):
        from pgvecto_rs_spark.operators.curation import quality_ntile

        # total=10, n=4 -> bucket sizes 3,3,2,2 (NTILE rule)
        rows = [(i, float(10 - i)) for i in range(10)]
        df = spark.createDataFrame(rows, "doc_id long, score double")
        got = {
            r["doc_id"]: r["bucket"]
            for r in quality_ntile(df, "score", "doc_id", n=4).collect()
        }
        # ascending score order = doc_id 9,8,...,0
        order = [9, 8, 7, 6, 5, 4, 3, 2, 1, 0]
        sizes = [3, 3, 2, 2]
        want, i = {}, 0
        for b, sz in enumerate(sizes, start=1):
            for _ in range(sz):
                want[order[i]] = b
                i += 1
        assert got == want

    def test_ntile_fewer_rows_than_buckets(self, spark):
        from pgvecto_rs_spark.operators.curation import quality_ntile

        df = spark.createDataFrame([(1, 1.0), (2, 2.0)], "doc_id long, score double")
        got = {
            r["doc_id"]: r["bucket"]
            for r in quality_ntile(df, "score", "doc_id", n=4).collect()
        }
        assert got == {1: 1, 2: 2}
