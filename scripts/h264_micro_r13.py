"""h264 microbenchmark: old vs new, interleaved, min-of-5.

To reproduce: snapshot the pre-change modules as a package
  mkdir -p /tmp/codec_ab/oldpkg && touch /tmp/codec_ab/oldpkg/__init__.py
  for m in h264 jpeg flac; do git show <old>:pgvecto_rs_spark/operators/$m.py \
      > /tmp/codec_ab/oldpkg/$m.py; done
then run this script (it compares oldpkg.* against the working tree).
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/tmp/codec_ab")
sys.path.insert(0, "/root/repo")

from oldpkg import h264 as OLD
from pgvecto_rs_spark.operators import h264 as NEW


def make_plans(ndocs):
    plans = []
    for did in range(ndocs):
        for s in range(2 + did % 3):
            v = 20 + (did * 7 + s * 13) % 200
            k = (did + s) % 9 - 4
            c1 = (did * 3 + s * 5) % 256
            c2 = (did * 11 + s * 2) % 256
            plans.append([
                {"type": "pcm", "y": np.full((16, 16), v),
                 "cb": np.full((8, 8), c1), "cr": np.full((8, 8), c2)},
                {"type": "i16", "pred": 1, "chroma_mode": 1,
                 "dc": [k] + [0] * 15},
                {"type": "i16", "pred": 0, "chroma_mode": 2,
                 "dc": [k] + [0] * 15},
                {"type": "i4", "modes": 2, "chroma_mode": 0},
            ])
    return plans


def main():
    ndocs = int(sys.argv[1]) if len(sys.argv) > 1 else 150
    plans = make_plans(ndocs)
    streams = [OLD.encode_idr_stream(p, 2, 2, qp=28) for p in plans]

    def t_enc(mod):
        t0 = time.perf_counter()
        for p in plans:
            mod.encode_idr_stream(p, 2, 2, qp=28)
        return time.perf_counter() - t0

    def t_dec(mod):
        t0 = time.perf_counter()
        for b in streams:
            mod.decode_idr_frame(b)
        return time.perf_counter() - t0

    # warm
    t_enc(OLD); t_enc(NEW); t_dec(OLD); t_dec(NEW)
    res = {k: [] for k in ("enc_old", "enc_new", "dec_old", "dec_new")}
    for _ in range(5):
        res["enc_old"].append(t_enc(OLD))
        res["enc_new"].append(t_enc(NEW))
        res["dec_old"].append(t_dec(OLD))
        res["dec_new"].append(t_dec(NEW))
    eo, en = min(res["enc_old"]), min(res["enc_new"])
    do, dn = min(res["dec_old"]), min(res["dec_new"])
    print(f"{len(plans)} frames ({ndocs} docs)")
    print(f"encode: old {eo*1000:7.1f} ms  new {en*1000:7.1f} ms  ({eo/en:.2f}x)")
    print(f"decode: old {do*1000:7.1f} ms  new {dn*1000:7.1f} ms  ({do/dn:.2f}x)")


if __name__ == "__main__":
    main()
