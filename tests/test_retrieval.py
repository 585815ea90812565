"""BM25 lexical retrieval (operators/retrieval.py) vs a pure-Python
reference implementation."""

from __future__ import annotations

import math

from pgvecto_rs_spark.operators.retrieval import bm25_score, bm25_topk


def _ref_bm25(corpus: dict[int, str], terms: list[str], k1=1.2, b=0.75):
    toks = {i: t.lower().split() for i, t in corpus.items()}
    n = len(corpus)
    avgdl = sum(len(t) for t in toks.values()) / n
    out = {}
    for i, t in toks.items():
        dl = len(t)
        s = 0
        for q in terms:
            tf = t.count(q)
            df = sum(1 for tt in toks.values() if q in tt)
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            num = tf * (k1 + 1.0)
            denom = tf + k1 * ((1.0 - b) + b * (dl / avgdl))
            s += math.floor((idf * (num / denom)) * 1000000.0 + 0.5)
        out[i] = s
    return out


class TestBM25:
    CORPUS = {
        1: "a b a",
        2: "b c",
        3: "c c c c",
        4: "d d",
    }

    def _df(self, spark):
        return spark.createDataFrame(
            [(i, t) for i, t in self.CORPUS.items()], "doc_id long, text string"
        )

    def test_scores_match_reference(self, spark):
        terms = ["a", "c"]
        got = {
            r["doc_id"]: r["score_u"]
            for r in bm25_score(self._df(spark), terms).collect()
        }
        assert got == _ref_bm25(self.CORPUS, terms)

    def test_topk_order_and_ties(self, spark):
        terms = ["a", "c"]
        ref = _ref_bm25(self.CORPUS, terms)
        want = sorted(ref, key=lambda i: (-ref[i], i))[:3]
        rows = bm25_topk(self._df(spark), terms, k=3).collect()
        assert [r["doc_id"] for r in rows] == want

    def test_absent_term_scores_zero(self, spark):
        got = {
            r["doc_id"]: r["score_u"]
            for r in bm25_score(self._df(spark), ["zzz"]).collect()
        }
        assert set(got.values()) == {0}


class TestMMR:
    """mmr_topk vs a pure-Python greedy reference (λ=1/2 integer form)."""

    def _ref_mmr(self, vecs: dict[int, list[float]], q: list[float], k: int):
        qu = [math.floor(x * 1e6 + 0.5) for x in q]
        xu = {
            i: [math.floor(x * 1e6 + 0.5) for x in v] for i, v in vecs.items()
        }
        rel = {i: sum(a * b for a, b in zip(x, qu)) for i, x in xu.items()}
        sel: list[int] = []
        out = []
        while len(sel) < min(k, len(vecs)):
            best = None
            for i in sorted(xu):
                if i in sel:
                    continue
                ms = (
                    max(
                        sum(a * b for a, b in zip(xu[i], xu[s]))
                        for s in sel
                    )
                    if sel
                    else 0
                )
                score = rel[i] - ms if sel else rel[i]
                key = (-score, i)
                if best is None or key < best[0]:
                    best = (key, i, ms)
            out.append((len(sel) + 1, best[1], rel[best[1]], best[2]))
            sel.append(best[1])
        return out

    VECS = {
        1: [1.0, 0.0, 0.0],
        2: [0.99, 0.01, 0.0],   # near-dup of 1: relevance-adjacent, redundant
        3: [0.0, 1.0, 0.0],     # orthogonal, lower relevance
        4: [0.5, 0.5, 0.0],
        5: [-0.2, 0.3, 0.9],    # anti-correlated with the head
    }

    def _df(self, spark):
        from pyspark.sql import types as T

        schema = T.StructType(
            [
                T.StructField("vec_id", T.LongType()),
                T.StructField("embedding", T.ArrayType(T.FloatType())),
            ]
        )
        return spark.createDataFrame(
            [(i, v) for i, v in self.VECS.items()], schema
        )

    def test_matches_reference_and_diversifies(self, spark):
        from pgvecto_rs_spark.operators.retrieval import mmr_topk

        q = [1.0, 0.1, 0.0]
        got = [
            tuple(r)
            for r in mmr_topk(self._df(spark), q, k=4, pool=5)
            .orderBy("rnk")
            .collect()
        ]
        # float32 storage: quantize through float32 like the Spark side reads
        import numpy as np

        vecs32 = {
            i: [float(np.float32(x)) for x in v] for i, v in self.VECS.items()
        }
        assert got == self._ref_mmr(vecs32, q, 4)
        # diversification: plain relevance order would put near-dup 2
        # second; MMR must not
        assert got[0][1] == 1 and got[1][1] != 2

    def test_k_exceeds_corpus(self, spark):
        from pgvecto_rs_spark.operators.retrieval import mmr_topk

        rows = mmr_topk(self._df(spark), [1.0, 0.0, 0.0], k=50, pool=64).collect()
        assert len(rows) == len(self.VECS)
        assert {r["vec_id"] for r in rows} == set(self.VECS)
