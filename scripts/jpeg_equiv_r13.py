"""jpeg old-vs-new equivalence: byte-identical encodes over the full
config grid, pixel-identical decodes, identical corruption outcomes.

To reproduce: snapshot the pre-change modules as a package
  mkdir -p /tmp/codec_ab/oldpkg && touch /tmp/codec_ab/oldpkg/__init__.py
  for m in h264 jpeg flac; do git show <old>:pgvecto_rs_spark/operators/$m.py \
      > /tmp/codec_ab/oldpkg/$m.py; done
then run this script (it compares oldpkg.* against the working tree).
"""
import sys

import numpy as np

sys.path.insert(0, "/tmp/codec_ab")
sys.path.insert(0, "/root/repo")

from oldpkg import jpeg as OLD
from pgvecto_rs_spark.operators import jpeg as NEW


def images():
    rng = np.random.default_rng(20260818)
    idx = np.arange(64)
    out = []
    for did in range(24):  # the bench image family
        v = ((did * 31 + idx * 7 + 13) % 256).astype(np.uint8).reshape(8, 8)
        out.append(v)
        out.append(np.stack([v, np.ascontiguousarray(v.T), 255 - v], axis=2))
    for _ in range(10):  # random sizes incl. non-multiples of 8/16
        h = int(rng.integers(1, 40))
        w = int(rng.integers(1, 40))
        out.append(rng.integers(0, 256, (h, w), dtype=np.uint8))
        out.append(rng.integers(0, 256, (h, w, 3), dtype=np.uint8))
    out.append(np.zeros((16, 16), dtype=np.uint8))
    out.append(np.full((17, 23, 3), 255, dtype=np.uint8))
    return out


def main():
    n_enc = n_dec = 0
    streams = []
    for img in images():
        for prog in (False, True):
            for ri in (0, 1, 2, 3):
                subs = ("444", "422", "420") if img.ndim == 3 else ("444",)
                for sub in subs:
                    kw = dict(restart_interval=ri, progressive=prog)
                    if img.ndim == 3:
                        kw["subsample"] = sub
                    b_old = OLD.encode_jpeg(img, **kw)
                    b_new = NEW.encode_jpeg(img, **kw)
                    assert b_old == b_new, (img.shape, prog, ri, sub)
                    n_enc += 1
                    d_old = OLD.decode_jpeg(b_old)
                    d_new = NEW.decode_jpeg(b_old)
                    assert np.array_equal(d_old, d_new), (img.shape, prog, ri, sub)
                    n_dec += 1
                    streams.append(b_old)

    rng = np.random.default_rng(7)
    n_corrupt = 0
    for b in streams[:: max(1, len(streams) // 60)]:
        ba = bytearray(b)
        for pos in range(2, len(ba), max(1, len(ba) // 10)):
            old_byte = ba[pos]
            ba[pos] ^= int(rng.integers(1, 256))
            bb = bytes(ba)
            ba[pos] = old_byte

            def run(mod):
                try:
                    return ("ok", mod.decode_jpeg(bb).tobytes())
                except Exception as e:  # noqa: BLE001
                    return ("err", type(e).__name__, str(e))

            ro, rn = run(OLD), run(NEW)
            assert ro == rn, f"corruption diverged at {pos}: {ro[:2]} vs {rn[:2]}"
            n_corrupt += 1

    print(f"JPEG EQUIV OK: {n_enc} encodes byte-identical, {n_dec} decodes "
          f"pixel-identical, {n_corrupt} corruption outcomes identical")


if __name__ == "__main__":
    main()
