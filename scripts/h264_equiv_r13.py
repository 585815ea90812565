"""h264 old-vs-new equivalence harness.

Byte-identical encodes, pixel-identical decodes, identical exception
outcomes on single-byte corruptions, across randomized plans (the
test-suite generator), bench-shaped plans, and edge plans.


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

from oldpkg import h264 as OLD
from pgvecto_rs_spark.operators import h264 as NEW


def _rand_block(rng, n, p, mag):
    return [int(rng.integers(-mag, mag + 1)) if rng.random() < p else 0
            for _ in range(n)]


def _rand_mb(rng, mbx, mby):
    t = rng.choice(["pcm", "i16", "i4"])
    if t == "pcm":
        return {"type": "pcm",
                "y": rng.integers(0, 256, (16, 16)),
                "cb": rng.integers(0, 256, (8, 8)),
                "cr": rng.integers(0, 256, (8, 8))}
    cm_ok = ([0] + ([1] if mbx > 0 else []) + ([2] if mby > 0 else [])
             + ([3] if mbx > 0 and mby > 0 else []))
    cm = int(rng.choice(cm_ok))
    chroma = {
        "cb_dc": _rand_block(rng, 4, 0.4, 8),
        "cr_dc": _rand_block(rng, 4, 0.4, 8),
        "cb_ac": [_rand_block(rng, 15, 0.2, 6) for _ in range(4)],
        "cr_ac": [_rand_block(rng, 15, 0.2, 6) for _ in range(4)],
    }
    if t == "i16":
        pm_ok = ([2] + ([1] if mbx > 0 else []) + ([0] if mby > 0 else [])
                 + ([3] if mbx > 0 and mby > 0 else []))
        return {"type": "i16", "pred": int(rng.choice(pm_ok)),
                "chroma_mode": cm, "dc": _rand_block(rng, 16, 0.4, 30),
                "ac": [_rand_block(rng, 15, 0.3, 10) for _ in range(16)],
                **chroma}
    # i4: mode availability depends on neighbors; mode 2 (DC) always legal
    modes = []
    for i in range(16):
        bx, by = OLD._BLK4[i]
        ok = [2]
        if mby * 4 + by > 0:
            ok += [0, 7]      # vertical, VL need top
        if mbx * 4 + bx > 0:
            ok += [1, 8]      # horizontal, HU need left
        if (mby * 4 + by > 0) and (mbx * 4 + bx > 0):
            ok += [4, 5, 6]
        if mby * 4 + by > 0 and not (bx == 3 and by in (1, 3)):
            ok += [3]
        modes.append(int(rng.choice(ok)))
    return {"type": "i4", "modes": modes, "chroma_mode": cm,
            "coeffs": [_rand_block(rng, 16, 0.25, 10) for _ in range(16)],
            **chroma}


def bench_plans():
    """The exact plans the mm_mp4_idr / video_idr bench queries build."""
    out = []
    for did in range(40):
        for s in range(2 + did % 3):
            v = 20 + (did * 7 + s * 13) % 200
            k = (did + s) % 9 - 4
            c1 = (did * 3 + s * 5) % 256
            c2 = (did * 11 + s * 2) % 256
            out.append(([
                {"type": "pcm", "y": np.full((16, 16), v),
                 "cb": np.full((8, 8), c1), "cr": np.full((8, 8), c2)},
                {"type": "i16", "pred": 1, "chroma_mode": 1,
                 "dc": [k] + [0] * 15},
                {"type": "i16", "pred": 0, "chroma_mode": 2,
                 "dc": [k] + [0] * 15},
                {"type": "i4", "modes": 2, "chroma_mode": 0},
            ], 2, 2, 28))
    return out


def main():
    rng = np.random.default_rng(20260818)
    cases = bench_plans()
    for _ in range(60):
        w, h = int(rng.integers(1, 5)), int(rng.integers(1, 4))
        qp = int(rng.integers(0, 52))
        cases.append(([_rand_mb(rng, x, y) for y in range(h)
                       for x in range(w)], w, h, qp))
    # level-escape and dense edge cases
    for lv in (1, 7, 14, 15, 16, 30, 31, 200, 1000, 2000):
        cases.append(([{"type": "i16", "pred": 2, "chroma_mode": 0,
                        "dc": [lv, -lv] + [0] * 14}], 1, 1, 20))
    cases.append(([{"type": "i4", "modes": 2, "chroma_mode": 0,
                    "coeffs": [[(-1) ** k * (k + 1) for k in range(16)]
                               for _ in range(16)]}], 1, 1, 30))
    cases.append(([{"type": "pcm", "y": np.zeros((16, 16), dtype=int),
                    "cb": np.full((8, 8), 1), "cr": np.full((8, 8), 2)}],
                  1, 1, 26))

    n_enc = n_dec = 0
    streams = []
    for plan, w, h, qp in cases:
        b_old = OLD.encode_idr_stream(plan, w, h, qp=qp)
        b_new = NEW.encode_idr_stream(plan, w, h, qp=qp)
        assert b_old == b_new, f"encode mismatch w={w} h={h} qp={qp}"
        n_enc += 1
        o = OLD.decode_idr_frame(b_old)
        n = NEW.decode_idr_frame(b_old)
        for k in ("y", "cb", "cr"):
            assert np.array_equal(o[k], n[k]), f"decode {k} mismatch"
        assert o["width"] == n["width"] and o["height"] == n["height"]
        n_dec += 1
        streams.append(b_old)

    # corruption contract: flip one byte at a stride of positions,
    # outcomes (exception type+message, or identical pixels) must match
    n_corrupt = 0
    rng2 = np.random.default_rng(7)
    for b in streams[:40]:
        ba = bytearray(b)
        for pos in range(5, len(ba), max(1, len(ba) // 12)):
            old_byte = ba[pos]
            ba[pos] ^= int(rng2.integers(1, 256))
            bb = bytes(ba)
            ba[pos] = old_byte

            def run(mod):
                try:
                    out = mod.decode_idr_frame(bb)
                    return ("ok", out["y"].tobytes(), out["cb"].tobytes(),
                            out["cr"].tobytes())
                except Exception as e:  # noqa: BLE001
                    return ("err", type(e).__name__, str(e))

            ro, rn = run(OLD), run(NEW)
            assert ro == rn, f"corruption outcome diverged at {pos}: {ro[:2]} vs {rn[:2]}"
            n_corrupt += 1

    print(f"EQUIV OK: {n_enc} encodes byte-identical, {n_dec} decodes "
          f"pixel-identical, {n_corrupt} corruption outcomes identical")


if __name__ == "__main__":
    main()
