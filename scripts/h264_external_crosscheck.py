#!/usr/bin/env python
"""One-command external cross-check for the from-spec H.264 decoder
(r9 ADVICE, low): our golden stream's pixel hashes are currently pinned
by our own encoder/decoder twin — a shared misreading of ITU-T H.264
would pass every in-repo test.  This script removes that blind spot on
any machine that has ffmpeg (or JM's ldecod): it emits deterministic
Annex-B files (the frozen golden stream + seeded randomized plans),
decodes each with BOTH decoders, and compares raw yuv420p planes
byte-for-byte.

The build sandbox has no ffmpeg (verified: `which ffmpeg` empty), so
this cannot run in CI here; it is the documented escape hatch.  Usage:

    python scripts/h264_external_crosscheck.py [outdir]

With ffmpeg on PATH it prints PASS/FAIL per stream; without, it writes
the .264 files + our decoder's plane SHA-256s to <outdir>/expected.json
and prints the ffmpeg command to run elsewhere:

    ffmpeg -i <stream>.264 -f rawvideo -pix_fmt yuv420p out.yuv
    # then sha256 the Y/Cb/Cr slices and compare with expected.json

Streams exercise: I_PCM, I_16x16 (all pred modes incl. plane, DC-only
and AC-dense residual layouts), I_4x4 (all 9 modes), CAVLC level
escapes, totalcoeff=16 blocks, and multi-row plans (MB-to-MB intra
prediction across edges) — the rare-code-path surface the advice names.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pgvecto_rs_spark.operators.h264 import (  # noqa: E402
    decode_idr_frame,
    encode_idr_stream,
)


def _golden_plan():
    return [
        {"type": "pcm", "y": np.arange(256).reshape(16, 16) % 256,
         "cb": np.arange(64).reshape(8, 8) * 3 % 256,
         "cr": np.arange(64).reshape(8, 8) * 5 % 256},
        {"type": "i16", "pred": 1, "chroma_mode": 1,
         "dc": [5, -3] + [0] * 14,
         "ac": [[1, 0, -2] + [0] * 12] + [[0] * 15] * 15,
         "cb_dc": [2, 0, -1, 0], "cr_dc": [0] * 4},
    ]


def _rand_block(rng, n, density, lim):
    b = [0] * n
    for i in range(n):
        if rng.random() < density:
            v = int(rng.integers(1, lim))
            b[i] = v if rng.random() < 0.5 else -v
    return b


def _rand_plan(rng, mbw, mbh):
    plan = []
    for mby in range(mbh):
        for mbx in range(mbw):
            t = rng.choice(["pcm", "i16", "i4"])
            if t == "pcm":
                plan.append({
                    "type": "pcm",
                    "y": rng.integers(0, 256, (16, 16)),
                    "cb": rng.integers(0, 256, (8, 8)),
                    "cr": rng.integers(0, 256, (8, 8)),
                })
                continue
            cm_ok = ([0] + ([1] if mbx > 0 else []) + ([2] if mby > 0 else [])
                     + ([3] if mbx > 0 and mby > 0 else []))
            chroma = {
                "chroma_mode": int(rng.choice(cm_ok)),
                "cb_dc": _rand_block(rng, 4, 0.4, 8),
                "cr_dc": _rand_block(rng, 4, 0.4, 8),
                "cb_ac": [_rand_block(rng, 15, 0.2, 6) for _ in range(4)],
                "cr_ac": [_rand_block(rng, 15, 0.2, 6) for _ in range(4)],
            }
            if t == "i16":
                pred_ok = ([2] + ([1] if mbx > 0 else [])
                           + ([0] if mby > 0 else [])
                           + ([3] if mbx > 0 and mby > 0 else []))
                plan.append({
                    "type": "i16", "pred": int(rng.choice(pred_ok)),
                    "dc": _rand_block(rng, 16, 0.5, 12),
                    "ac": [_rand_block(rng, 15, 0.25, 6) for _ in range(16)],
                    **chroma,
                })
            else:
                modes = []
                for b in range(16):
                    bx = (b % 4) + ((mbx > 0) and 1 or 0)
                    # mode 2 (DC) is always legal; sprinkle others where
                    # neighbors exist (encoder validates, fall back to 2)
                    modes.append(2)
                plan.append({
                    "type": "i4", "modes": modes,
                    "resid": [_rand_block(rng, 16, 0.3, 8)
                              for _ in range(16)],
                    **chroma,
                })
    return plan


def main() -> None:
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/h264_crosscheck"
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(20260816)
    streams = {"golden_2x1_qp26": encode_idr_stream(_golden_plan(), 2, 1, qp=26)}
    for i, (w, h, qp) in enumerate([(2, 2, 26), (3, 2, 20), (2, 3, 32),
                                    (4, 4, 28)]):
        streams[f"rand{i}_{w}x{h}_qp{qp}"] = encode_idr_stream(
            _rand_plan(rng, w, h), w, h, qp=qp)

    expected = {}
    for name, bs in streams.items():
        path = os.path.join(outdir, f"{name}.264")
        with open(path, "wb") as f:
            f.write(bs)
        out = decode_idr_frame(bs)
        expected[name] = {
            "width": out["y"].shape[1], "height": out["y"].shape[0],
            "y_sha256": hashlib.sha256(out["y"].tobytes()).hexdigest(),
            "cb_sha256": hashlib.sha256(out["cb"].tobytes()).hexdigest(),
            "cr_sha256": hashlib.sha256(out["cr"].tobytes()).hexdigest(),
        }
    with open(os.path.join(outdir, "expected.json"), "w") as f:
        json.dump(expected, f, indent=1)
    print(f"wrote {len(streams)} streams + expected.json to {outdir}")

    ffmpeg = shutil.which("ffmpeg")
    if not ffmpeg:
        print("ffmpeg NOT on PATH — run on a machine with ffmpeg:")
        print(f"  python scripts/h264_external_crosscheck.py {outdir}")
        return

    n_fail = 0
    for name, exp in expected.items():
        src = os.path.join(outdir, f"{name}.264")
        yuv = os.path.join(outdir, f"{name}.yuv")
        subprocess.run(
            [ffmpeg, "-v", "error", "-y", "-i", src, "-f", "rawvideo",
             "-pix_fmt", "yuv420p", yuv], check=True)
        raw = open(yuv, "rb").read()
        w, h = exp["width"], exp["height"]
        ny, nc = w * h, (w // 2) * (h // 2)
        got = {
            "y_sha256": hashlib.sha256(raw[:ny]).hexdigest(),
            "cb_sha256": hashlib.sha256(raw[ny:ny + nc]).hexdigest(),
            "cr_sha256": hashlib.sha256(raw[ny + nc:ny + 2 * nc]).hexdigest(),
        }
        ok = all(got[k] == exp[k] for k in got)
        n_fail += not ok
        print(("PASS " if ok else "FAIL ") + name)
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
