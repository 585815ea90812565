"""r13 codec hot-path rewrite pins: the lazy-drain JPEG _BitWriter vs a
per-byte reference (stuffing order, restart markers, flush padding) and
the manual edge pad vs np.pad.  Stream-level byte identity is separately
pinned by the round-trip property tests."""

from __future__ import annotations

import numpy as np


class TestR13JpegWriterRewrite:
    def test_bitwriter_matches_per_byte_reference(self):
        from pgvecto_rs_spark.operators.jpeg import _BitWriter

        class Ref:
            def __init__(self):
                self.out = bytearray()
                self._acc = 0
                self._nbits = 0

            def write(self, code, length):
                self._acc = (self._acc << length) | (code & ((1 << length) - 1))
                self._nbits += length
                while self._nbits >= 8:
                    byte = (self._acc >> (self._nbits - 8)) & 0xFF
                    self.out.append(byte)
                    if byte == 0xFF:  # byte stuffing
                        self.out.append(0x00)
                    self._nbits -= 8
                self._acc &= (1 << self._nbits) - 1

            def flush(self):
                if self._nbits:
                    pad = 8 - self._nbits
                    self.write((1 << pad) - 1, pad)

        rng = np.random.default_rng(123)
        for _ in range(50):
            w, r = _BitWriter(), Ref()
            for _k in range(int(rng.integers(1, 400))):
                length = int(rng.integers(1, 17))
                # bias toward all-ones codes so stuffed 0xFF bytes are
                # common, including across drain-chunk boundaries
                code = ((1 << length) - 1 if rng.random() < 0.5
                        else int(rng.integers(0, 1 << length)))
                w.write(code, length)
                r.write(code, length)
                if rng.random() < 0.05:  # restart-marker interleaving
                    w.flush()
                    r.flush()
                    marker = bytes([0xFF, 0xD0 + int(rng.integers(0, 8))])
                    w.out += marker
                    r.out += marker
            w.flush()
            r.flush()
            assert bytes(w.out) == bytes(r.out)

    def test_pad_edge_matches_np_pad(self):
        from pgvecto_rs_spark.operators.jpeg import _pad_edge

        rng = np.random.default_rng(7)
        for _ in range(40):
            h = int(rng.integers(1, 20))
            w = int(rng.integers(1, 20))
            p = rng.random((h, w))
            th = h + int(rng.integers(0, 9))
            tw = w + int(rng.integers(0, 9))
            ref = np.pad(p, ((0, th - h), (0, tw - w)), mode="edge")
            assert np.array_equal(_pad_edge(p, th, tw), ref)
