#!/usr/bin/env python
"""Scale-up data generator for the sf1 scaling experiment (r9 advice
item 2): builds an sf-K dataset (default K=10, i.e. "sf1" from the
driver's sf0.1) that is distribution-identical to the source by
construction — K key-shifted copies — while deliberately BREAKING
cross-copy similarity so the quadratic operators (minhash/simhash/
semdedup/image-neardup) keep their per-cluster pair counts and scale
linearly in data like a real 10x corpus would:

- TPC-H tables: copy i shifts every key by i*N_table (orderkey,
  partkey, suppkey, custkey), so per-key group sizes, join fan-outs
  and selectivities are EXACTLY those of the source; dimension tables
  (nation, region) are shared, matching TPC-H's own scaling rules.
- documents: copy i applies a seeded word-level vocabulary permutation
  to the text.  Within a copy, exact/near-dup clusters are preserved
  verbatim (w==v  =>  perm(w)==perm(v)); across copies the shingle
  space is disjoint-ish, so dup clusters do NOT merge and pair counts
  grow x K, not x K^2.  n_chars is recomputed from the permuted text.
- embeddings: copy i applies a seeded random ORTHOGONAL rotation —
  within-copy distances/norms are bit-for-bit-geometry preserved
  (same near-dup pairs, same cluster radii), cross-copy cosine decays
  to noise.  labels kept.
- events: keys shifted (event_id, user_id), timestamps and props kept,
  so per-user session/window sizes are unchanged.

Run:  python scripts/make_scale_data.py [K] [src_dir] [out_dir]
Defaults: K=10, src=/root/testdata/sf0.1, out=<repo>/.scale/sf1
Deterministic (seed 42); never touches /root/testdata.
"""

from __future__ import annotations

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tpch(con, src: str, out: str, k: int) -> None:
    counts = {}
    for t in ("orders", "customer", "supplier", "part", "lineitem"):
        counts[t] = con.execute(
            f"SELECT count(*) FROM '{src}/{t}.parquet'"
        ).fetchone()[0]
    n_ord = counts["orders"] and con.execute(
        f"SELECT max(l_orderkey)+1 FROM '{src}/lineitem.parquet'"
    ).fetchone()[0]
    n_cust = con.execute(
        f"SELECT max(o_custkey)+1 FROM '{src}/orders.parquet'"
    ).fetchone()[0]
    n_part = con.execute(
        f"SELECT max(l_partkey)+1 FROM '{src}/lineitem.parquet'"
    ).fetchone()[0]
    n_supp = con.execute(
        f"SELECT max(l_suppkey)+1 FROM '{src}/lineitem.parquet'"
    ).fetchone()[0]

    shifted = {
        "lineitem": (
            "l_orderkey + i*{no} AS l_orderkey, l_partkey + i*{np} AS "
            "l_partkey, l_suppkey + i*{ns} AS l_suppkey, l_linenumber, "
            "l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag, "
            "l_linestatus, l_shipdate"
        ),
        "orders": (
            "o_orderkey + i*{no} AS o_orderkey, o_custkey + i*{nc} AS "
            "o_custkey, o_orderstatus, o_totalprice, o_orderdate, "
            "o_orderpriority"
        ),
        "customer": (
            "c_custkey + i*{nc} AS c_custkey, c_name, c_nationkey, "
            "c_acctbal, c_mktsegment"
        ),
        "supplier": (
            "s_suppkey + i*{ns} AS s_suppkey, s_name, s_nationkey, s_acctbal"
        ),
        "part": (
            "p_partkey + i*{np} AS p_partkey, p_name, p_brand, p_type, "
            "p_size, p_retailprice"
        ),
        "events": (
            "event_id + i*{ne} AS event_id, ts, user_id + i*{nu} AS "
            "user_id, event_type, value, props"
        ),
    }
    n_ev = con.execute(
        f"SELECT max(event_id)+1 FROM '{src}/events.parquet'"
    ).fetchone()[0]
    n_usr = con.execute(
        f"SELECT max(user_id)+1 FROM '{src}/events.parquet'"
    ).fetchone()[0]
    fmt = dict(no=n_ord, nc=n_cust, np=n_part, ns=n_supp, ne=n_ev, nu=n_usr)
    for t, sel in shifted.items():
        con.execute(
            f"COPY (SELECT {sel.format(**fmt)} FROM '{src}/{t}.parquet', "
            f"range({k}) r(i) ORDER BY i) TO '{out}/{t}.parquet' "
            "(FORMAT PARQUET)"
        )
        print(f"  {t}: x{k}")
    for t in ("nation", "region"):
        con.execute(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') TO "
            f"'{out}/{t}.parquet' (FORMAT PARQUET)"
        )


def _documents(src: str, out: str, k: int) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{src}/documents.parquet")
    n = tbl.num_rows
    texts = tbl.column("text").to_pylist()
    vocab = sorted({w for t in texts if t for w in t.split(" ") if w})
    rng = np.random.default_rng(42)
    parts = []
    for i in range(k):
        if i == 0:
            new_texts = texts
        else:
            perm = rng.permutation(len(vocab))
            m = {w: vocab[perm[j]] for j, w in enumerate(vocab)}
            new_texts = [
                " ".join(m.get(w, w) for w in t.split(" ")) if t else t
                for t in texts
            ]
        parts.append(
            pa.table(
                {
                    "doc_id": pa.array(
                        [d + i * n for d in tbl.column("doc_id").to_pylist()],
                        type=pa.int64(),
                    ),
                    "text": pa.array(new_texts, type=pa.string()),
                    "lang": tbl.column("lang"),
                    "source": tbl.column("source"),
                    "n_chars": pa.array(
                        [len(t) if t is not None else None for t in new_texts],
                        type=pa.int64(),
                    ),
                }
            )
        )
    pq.write_table(pa.concat_tables(parts), f"{out}/documents.parquet")
    print(f"  documents: x{k} (vocab-permuted copies)")


def _embeddings(src: str, out: str, k: int) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{src}/embeddings.parquet")
    n = tbl.num_rows
    vecs = np.asarray(tbl.column("embedding").to_pylist(), dtype=np.float64)
    ids = np.asarray(tbl.column("vec_id").to_pylist(), dtype=np.int64)
    labels = tbl.column("label")
    dims = vecs.shape[1]
    rng = np.random.default_rng(42)
    parts = []
    for i in range(k):
        if i == 0:
            rot = vecs
        else:
            q, r = np.linalg.qr(rng.standard_normal((dims, dims)))
            q *= np.sign(np.diag(r))  # deterministic orientation
            rot = vecs @ q.T
        parts.append(
            pa.table(
                {
                    "vec_id": pa.array(ids + i * n, type=pa.int64()),
                    "embedding": pa.array(
                        [row.astype(np.float32).tolist() for row in rot],
                        type=pa.list_(pa.float32()),
                    ),
                    "label": labels,
                }
            )
        )
    pq.write_table(pa.concat_tables(parts), f"{out}/embeddings.parquet")
    print(f"  embeddings: x{k} (orthogonally rotated copies)")


def main() -> None:
    import duckdb

    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = (
        sys.argv[3]
        if len(sys.argv) > 3
        else os.path.join(REPO, ".scale", "sf1")
    )
    os.makedirs(out, exist_ok=True)
    print(f"building x{k} of {src} -> {out}")
    con = duckdb.connect()
    _tpch(con, src, out, k)
    _documents(src, out, k)
    _embeddings(src, out, k)
    print("done")


if __name__ == "__main__":
    main()
