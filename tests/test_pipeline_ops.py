"""Multimodal plumbing, embedding source, planner decisions, vecs files."""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from pgvecto_rs_spark.queries import Q64, RANGE_RADIUS


class TestMultimodal:
    def _media(self, spark):
        rows = [
            (1, "image", bytes(range(64))),
            (2, "image", b"\xff\xd8\xff\xe0" + bytes(60)),
            (3, "image", None),
        ]
        return spark.createDataFrame(rows, "media_id long, kind string, payload binary")

    def test_metadata_sniffing(self, spark):
        from pgvecto_rs_spark.operators.multimodal import attach_media_metadata

        got = {r["media_id"]: r for r in attach_media_metadata(self._media(spark)).collect()}
        assert got[2]["sniffed_mime"] == "image/jpeg"
        assert got[1]["payload_bytes"] == 64

    def test_fake_decode_features(self, spark):
        from pgvecto_rs_spark.operators.multimodal import decode_image_features

        out = decode_image_features(self._media(spark), fake=True).collect()
        by_id = {r["media_id"]: r["feature"] for r in out}
        assert len(by_id[1]) == 64
        assert by_id[1][1] == pytest.approx(1 / 255.0)
        assert by_id[3] is None

    def test_real_decode_raises(self, spark):
        """Unrecognized formats and malformed payloads fail loudly under
        fake=False (row 1 is unknown magic, row 2 a truncated JPEG)."""
        from pgvecto_rs_spark.operators.multimodal import decode_image_features

        with pytest.raises(Exception) as ei:
            decode_image_features(self._media(spark), fake=False).collect()
        msg = str(ei.value)
        assert "NotImplementedError" in msg or "unrecognized" in msg or "jpeg" in msg

    @staticmethod
    def _ppm(w, h, value):
        import numpy as np

        header = f"P6\n{w} {h}\n255\n".encode()
        rgb = np.full((h, w, 3), value, dtype=np.uint8)
        return header + rgb.tobytes()

    def test_real_ppm_decode_and_resize(self, spark):
        """PPM (P6) is a REAL codec path: decode + nearest-neighbor
        resize in numpy, no fake needed."""
        from pgvecto_rs_spark.operators.multimodal import (
            decode_image_features,
            resize_images,
        )

        df = spark.createDataFrame(
            [(1, "image", self._ppm(16, 12, 100)), (2, "image", self._ppm(4, 4, 200))],
            "media_id long, kind string, payload binary",
        )
        feats = {r["media_id"]: r["feature"] for r in decode_image_features(df).collect()}
        assert len(feats[1]) == 64
        assert feats[1][0] == pytest.approx(100 / 255.0)
        assert feats[2][0] == pytest.approx(200 / 255.0)

        out = {r["media_id"]: r for r in resize_images(df, 6, 8).collect()}
        assert out[1]["height"] == 6 and out[1]["width"] == 8
        assert len(out[1]["pixels"]) == 48
        assert out[2]["pixels"][0] == pytest.approx(200 / 255.0)

    @staticmethod
    def _png(pixels, ctype, filters, palette=None):
        """Minimal PNG encoder (struct + zlib) for test payloads:
        ``pixels`` is (h, w, nch) uint8, ``filters[y]`` picks the
        scanline filter (0=None 1=Sub 2=Up 3=Average 4=Paeth) so the
        decoder's unfilter paths are all exercised."""
        import struct
        import zlib

        import numpy as np

        def chunk(typ, data):
            return (
                struct.pack(">I", len(data))
                + typ
                + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
            )

        h, w, nch = pixels.shape
        bpp = nch
        raw = b""
        prev = np.zeros(w * nch, dtype=np.int32)
        for y in range(h):
            line = pixels[y].reshape(-1).astype(np.int32)
            ft = filters[y % len(filters)]
            if ft == 0:
                enc = line
            elif ft == 1:
                enc = line.copy()
                enc[bpp:] = (line[bpp:] - line[:-bpp]) % 256
            elif ft == 2:
                enc = (line - prev) % 256
            elif ft == 3:
                enc = line.copy()
                for x in range(len(line)):
                    a = line[x - bpp] if x >= bpp else 0
                    enc[x] = (line[x] - ((a + prev[x]) >> 1)) % 256
            else:  # Paeth
                enc = line.copy()
                for x in range(len(line)):
                    a = int(line[x - bpp]) if x >= bpp else 0
                    b = int(prev[x])
                    c = int(prev[x - bpp]) if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    enc[x] = (line[x] - pr) % 256
            raw += bytes([ft]) + enc.astype(np.uint8).tobytes()
            prev = line
        ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
        out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        if palette is not None:
            out += chunk(b"PLTE", palette.astype(np.uint8).tobytes())
        out += chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
        return out

    def test_real_png_decode_all_filters(self, spark):
        """PNG is a REAL codec path (stdlib zlib + numpy unfiltering):
        RGB with every filter type, grayscale, RGBA, and palette images
        all round-trip through the pipeline operators."""
        import numpy as np

        from pgvecto_rs_spark.operators.multimodal import (
            _decode_png,
            decode_image_features,
            resize_images,
        )

        rng = np.random.default_rng(7)
        rgb = rng.integers(0, 256, size=(10, 9, 3), dtype=np.uint8)
        # every filter type across the scanlines
        png_rgb = self._png(rgb, 2, [0, 1, 2, 3, 4])
        got = _decode_png(png_rgb)
        expect = rgb.astype(np.float32).mean(axis=2) / 255.0
        assert got.shape == (10, 9)
        assert np.allclose(got, expect)

        gray = rng.integers(0, 256, size=(5, 7, 1), dtype=np.uint8)
        assert np.allclose(
            _decode_png(self._png(gray, 0, [4])), gray[:, :, 0] / 255.0
        )
        rgba = rng.integers(0, 256, size=(4, 4, 4), dtype=np.uint8)
        assert np.allclose(
            _decode_png(self._png(rgba, 6, [1, 2])),
            rgba[:, :, :3].astype(np.float32).mean(axis=2) / 255.0,
        )
        pal = rng.integers(0, 256, size=(8, 3), dtype=np.uint8)
        idxs = rng.integers(0, 8, size=(6, 5, 1), dtype=np.uint8)
        assert np.allclose(
            _decode_png(self._png(idxs, 3, [0, 2], palette=pal)),
            pal[idxs[:, :, 0]].astype(np.float32).mean(axis=2) / 255.0,
        )

        # through the Spark operators (real codec, no fake)
        df = spark.createDataFrame(
            [(1, "image", bytearray(png_rgb))],
            "media_id long, kind string, payload binary",
        )
        feats = decode_image_features(df).collect()
        assert len(feats) == 1 and len(feats[0]["feature"]) == 64
        out = resize_images(df, 5, 3).collect()
        assert out[0]["height"] == 5 and len(out[0]["pixels"]) == 15

    def test_real_jpeg_roundtrip_all_modes(self):
        """Baseline JPEG is a REAL codec path (pure numpy Huffman +
        IDCT, operators/jpeg.py): encoder->decoder round-trips gray and
        RGB across 4:4:4/4:2:2/4:2:0 sampling and restart intervals at
        >30 dB luma PSNR on a smooth test image."""
        import numpy as np

        from pgvecto_rs_spark.operators.jpeg import decode_jpeg, encode_jpeg

        rng = np.random.default_rng(7)
        yy, xx = np.mgrid[0:37, 0:53]
        img = (
            (128 + 80 * np.sin(xx / 6) * np.cos(yy / 5) + rng.normal(0, 4, (37, 53)))
            .clip(0, 255)
            .astype(np.uint8)
        )

        def psnr(dec, truth):
            return 10 * np.log10(255.0**2 / np.mean((dec * 255.0 - truth) ** 2))

        # grayscale, with and without restart markers
        for ri in (0, 1, 3):
            dec = decode_jpeg(encode_jpeg(img, restart_interval=ri))
            assert dec.shape == (37, 53)
            assert psnr(dec, img.astype(np.float64)) > 30.0

        # color: every subsampling mode x restart interval
        rgb = np.stack([img, 255 - img, np.roll(img, 5, axis=1)], axis=2)
        y_true = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
        sizes = {}
        for sub in ("444", "422", "420"):
            for ri in (0, 2):
                enc = encode_jpeg(rgb, subsample=sub, restart_interval=ri)
                dec = decode_jpeg(enc)
                assert dec.shape == (37, 53)
                assert psnr(dec, y_true) > 30.0
                sizes[(sub, ri)] = len(enc)
        # chroma subsampling actually shrinks the payload
        assert sizes[("420", 0)] < sizes[("444", 0)]

    def test_progressive_jpeg_decodes_identical_to_baseline(self):
        """SOF2 support (r6 verdict gap #2): the progressive scan
        script quantizes identically to baseline, so decode must be
        BIT-identical across gray/color, every subsampling mode,
        restart intervals, dense-AC (ZRL-in-refinement) and flat
        (multi-block EOB run) content."""
        import numpy as np

        from pgvecto_rs_spark.operators.jpeg import decode_jpeg, encode_jpeg

        rng = np.random.default_rng(7)
        yy, xx = np.mgrid[0:37, 0:53]
        img = (
            (128 + 80 * np.sin(xx / 6) * np.cos(yy / 5) + rng.normal(0, 4, (37, 53)))
            .clip(0, 255)
            .astype(np.uint8)
        )
        for ri in (0, 1, 3):
            base = decode_jpeg(encode_jpeg(img, restart_interval=ri))
            prog = decode_jpeg(encode_jpeg(img, restart_interval=ri, progressive=True))
            assert np.array_equal(base, prog), f"gray ri={ri}"
        rgb = np.stack([img, 255 - img, np.roll(img, 5, axis=1)], axis=2)
        for sub in ("444", "422", "420"):
            for ri in (0, 2):
                base = decode_jpeg(encode_jpeg(rgb, subsample=sub, restart_interval=ri))
                prog = decode_jpeg(
                    encode_jpeg(rgb, subsample=sub, restart_interval=ri, progressive=True)
                )
                assert np.array_equal(base, prog), (sub, ri)
        # dense random AC -> correction-bit + ZRL paths in refinement
        noisy = rng.integers(0, 256, (24, 40), dtype=np.uint8)
        assert np.array_equal(
            decode_jpeg(encode_jpeg(noisy)),
            decode_jpeg(encode_jpeg(noisy, progressive=True)),
        )
        # large flat region -> multi-block EOBn runs (t >= 1)
        big = np.full((128, 256), 200, dtype=np.uint8)
        assert np.array_equal(
            decode_jpeg(encode_jpeg(big)),
            decode_jpeg(encode_jpeg(big, progressive=True)),
        )

    def test_progressive_multiband_chained_refinement(self):
        """libjpeg-style scan script — DC(Al=1), split AC bands 1-5 /
        6-63 at Al=2, AC refine 2->1, DC refine, AC refine 1->0 —
        decodes bit-identically to baseline: chained successive
        approximation and multi-band spectral selection are what real
        web-crawl progressive JPEGs use."""
        import struct

        import numpy as np

        import pgvecto_rs_spark.operators.jpeg as J

        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, (29, 45), dtype=np.uint8)
        base = J.decode_jpeg(J.encode_jpeg(img))

        h, wd = img.shape
        out = bytearray(b"\xff\xd8")
        zz_l = J._QUANT_LUMA.reshape(-1)[J._ZIGZAG].astype(np.uint8).tobytes()
        out += J._seg(0xDB, b"\x00" + zz_l)
        out += J._seg(0xC2, struct.pack(">BHHB", 8, h, wd, 1) + bytes([1, 0x11, 0]))
        out += J._seg(0xC4, J._dht_body(0, 0, J._HUFF_DC_LUMA))
        out += J._seg(0xC4, J._dht_body(1, 2, J._HUFF_AC_PROGRESSIVE))
        mcux, mcuy = (wd + 7) // 8, (h + 7) // 8
        padded = [
            np.pad(
                img.astype(np.float64),
                ((0, mcuy * 8 - h), (0, mcux * 8 - wd)),
                mode="edge",
            )
        ]
        grids = J._quantized_coef_grids(padded, [J._QUANT_LUMA], [(1, 1)], mcux, mcuy)
        dc = J._build_codes(*J._HUFF_DC_LUMA)
        acp = J._build_codes(*J._HUFF_AC_PROGRESSIVE)
        bh_i, bw_i = J._nonintl_block_dims(h, wd, 1, 1, 1, 1)
        J._emit_dc_scan(out, grids, [(1, 1)], [dc], 1, 0, 0, mcux, mcuy, [1])
        J._emit_ac_first_scan(out, grids[0], acp, 1, (0, 2), 1, 5, 2, 0, bh_i, bw_i)
        J._emit_ac_first_scan(out, grids[0], acp, 1, (0, 2), 6, 63, 2, 0, bh_i, bw_i)
        J._emit_ac_refine_scan(out, grids[0], acp, 1, (0, 2), 1, 63, 2, 1, 0, bh_i, bw_i)
        J._emit_dc_scan(out, grids, [(1, 1)], [dc], 0, 1, 0, mcux, mcuy, [1])
        J._emit_ac_refine_scan(out, grids[0], acp, 1, (0, 2), 1, 63, 1, 0, 0, bh_i, bw_i)
        out += b"\xff\xd9"
        assert np.array_equal(base, J.decode_jpeg(bytes(out)))

    def test_unsupported_sof_still_rejected(self):
        """Lossless/hierarchical/arithmetic SOFs stay honest
        NotImplementedError boundaries (progressive no longer is)."""
        import numpy as np

        from pgvecto_rs_spark.operators.jpeg import decode_jpeg, encode_jpeg

        img = np.arange(64, dtype=np.uint8).reshape(8, 8)
        for sof in (0xC3, 0xC9, 0xCA):  # lossless, arith sequential/prog.
            enc = bytearray(encode_jpeg(img))
            enc[enc.find(b"\xff\xc0") + 1] = sof
            with pytest.raises(NotImplementedError):
                decode_jpeg(bytes(enc))

    def test_jpeg_fill_bytes_before_rst_markers(self):
        """T.81 B.1.1.2 permits 0xFF fill bytes before any marker
        (FF FF D0 == RST0).  The bulk unstuffing pass must skip them
        instead of treating the fill byte as end-of-entropy-data —
        the r6 advice found such streams silently decoding the
        remaining MCUs as zeros."""
        import numpy as np

        from pgvecto_rs_spark.operators.jpeg import decode_jpeg, encode_jpeg

        rng = np.random.default_rng(5)
        img = rng.integers(0, 256, (24, 40), dtype=np.uint8)
        enc = encode_jpeg(img, restart_interval=1)
        clean = decode_jpeg(enc)
        # inject one (and for D1 two) fill bytes before each RST marker;
        # entropy-coded FFs are always stuffed as FF 00, so a raw FF Dn
        # pair can only be a restart marker
        padded = bytearray()
        i = 0
        while i < len(enc):
            if enc[i] == 0xFF and i + 1 < len(enc) and 0xD0 <= enc[i + 1] <= 0xD7:
                padded += b"\xff" * (2 if enc[i + 1] == 0xD1 else 1)
            padded.append(enc[i])
            i += 1
        assert len(padded) > len(enc)  # fill bytes actually injected
        dec = decode_jpeg(bytes(padded))
        assert np.array_equal(dec, clean)

    def test_jpeg_lut_decode_matches_bit_serial(self):
        """The table-driven entropy decoder (_BitReader.decode over a
        16-bit-prefix LUT) yields the exact symbol sequence of the
        bit-serial canonical-code walk (_decode_huffman_symbol) on
        random canonical Huffman tables and random bitstreams —
        pinning the fast path the codec hot loop now uses."""
        import numpy as np

        from pgvecto_rs_spark.operators.jpeg import (
            _BitReader,
            _build_decode_table,
            _build_lut,
            _decode_huffman_symbol,
        )

        rng = np.random.default_rng(3)
        for trial in range(20):
            # random canonical table: n_k codes of length k with the
            # Kraft inequality kept strict so every 16-bit window is
            # decodable (complete codes would never leave length-0 gaps)
            bits = [0] * 16
            budget = 1.0
            nvals = 0
            for length in range(1, 17):
                cap = int(budget * (1 << length)) - 1
                take = int(rng.integers(0, min(cap, 4) + 1)) if cap > 0 else 0
                bits[length - 1] = take
                budget -= take / (1 << length)
                nvals += take
            if nvals == 0:
                bits[0] = 1
                nvals = 1
            values = list(rng.integers(0, 256, nvals))
            lut = _build_lut(bits, values)
            dict_table = _build_decode_table(bits, values)
            payload = rng.integers(0, 256, 256, dtype=np.uint8)
            payload[payload == 0xFF] = 0xFE  # keep the stream marker-free
            ra = _BitReader(bytes(payload), 0)
            rb = _BitReader(bytes(payload), 0)
            for _ in range(300):
                try:
                    a = ra.decode(lut)
                except ValueError:
                    a = "invalid"
                try:
                    b = _decode_huffman_symbol(rb, dict_table)
                except ValueError:
                    b = "invalid"
                assert a == b
                if a == "invalid":
                    break
                assert ra.bitpos == rb.bitpos

    def test_codec_fuzz_exception_contract(self):
        """Malformed media must raise ValueError / NotImplementedError
        (or decode to garbage), never leak stdlib internals (KeyError /
        IndexError / struct.error / zlib.error / wave.Error / EOFError /
        RuntimeError) — a 100 TB ingest hits corrupt payloads
        constantly and the mapInPandas operators catch exactly the
        documented types.  Deterministic corruption of valid payloads
        plus header-prefixed garbage, every codec."""
        import io
        import random
        import struct
        import wave
        import zlib

        import numpy as np

        from pgvecto_rs_spark.operators import multimodal as MM
        from pgvecto_rs_spark.operators.jpeg import decode_jpeg, encode_jpeg
        from pgvecto_rs_spark.operators.video import (
            decode_avi_frame_arrays,
            encode_mjpeg_avi,
        )

        img = np.arange(64, dtype=np.uint8).reshape(8, 8)
        jpg = encode_jpeg(np.tile(img, (4, 4)), restart_interval=2)

        def _chunk(typ, data):
            return (
                struct.pack(">I", len(data))
                + typ
                + data
                + struct.pack(">I", zlib.crc32(typ + data))
            )

        raw = b"".join(b"\x00" + bytes(img[y]) for y in range(8))
        png = (
            b"\x89PNG\r\n\x1a\n"
            + _chunk(b"IHDR", struct.pack(">IIBBBBB", 8, 8, 8, 0, 0, 0, 0))
            + _chunk(b"IDAT", zlib.compress(raw))
            + _chunk(b"IEND", b"")
        )
        buf = io.BytesIO()
        wf = wave.open(buf, "wb")
        wf.setnchannels(1)
        wf.setsampwidth(1)
        wf.setframerate(8000)
        wf.writeframes(bytes(range(200)))
        wf.close()
        wav = buf.getvalue()
        avi = encode_mjpeg_avi([img, 255 - img])

        pjpg = encode_jpeg(np.tile(img, (4, 4)), restart_interval=2, progressive=True)
        gif = TestGifDecode._make_gif(
            (img % 8).astype(np.uint8), np.arange(24, dtype=np.uint8).reshape(8, 3)
        )

        rng = random.Random(42)
        for decoder, valid in (
            (decode_jpeg, jpg),
            (decode_jpeg, pjpg),  # progressive path: same exception contract
            (MM._decode_png, png),
            (MM._decode_gif, gif),
            (MM._decode_bmp, TestBmpDecode._bmp(px_rgb=np.tile(img[:, :, None], (1, 1, 3)))),
            (MM._decode_wav, wav),
            (decode_avi_frame_arrays, avi),
        ):
            for trial in range(1200):
                mode = trial % 3
                if mode == 0:
                    data = valid[:8] + bytes(
                        rng.randrange(256) for _ in range(rng.randrange(150))
                    )
                elif mode == 1:
                    b = bytearray(valid)
                    for _ in range(rng.randrange(1, 8)):
                        b[rng.randrange(len(b))] = rng.randrange(256)
                    data = bytes(b)
                else:
                    data = valid[: rng.randrange(1, len(valid))]
                try:
                    decoder(data)
                except (ValueError, NotImplementedError):
                    pass  # the documented contract

    def test_decode_on_error_null_survives_corrupt_payloads(self, spark):
        """on_error='null' keeps the job alive through corrupt media:
        valid rows decode, malformed rows get NULL features (image) or
        drop (audio); the default on_error='raise' fails the task."""
        import io
        import wave

        import numpy as np
        import pytest
        from pyspark.errors.exceptions.captured import PythonException

        import pgvecto_rs_spark.operators.multimodal as MM

        img = np.arange(64, dtype=np.uint8).reshape(8, 8)
        good_img = b"P6\n8 8\n255\n" + bytes(np.repeat(img.reshape(-1), 3))
        bad_img = b"P6\n8 8\n255\nshort"
        media = spark.createDataFrame(
            [(1, bytearray(good_img)), (2, bytearray(bad_img))],
            "media_id long, payload binary",
        )
        out = MM.decode_image_features(media, on_error="null").collect()
        got = {r["media_id"]: r["feature"] for r in out}
        assert got[1] is not None and len(got[1]) == 64
        assert got[2] is None
        with pytest.raises(PythonException):
            MM.decode_image_features(media).collect()

        buf = io.BytesIO()
        wf = wave.open(buf, "wb")
        wf.setnchannels(1)
        wf.setsampwidth(1)
        wf.setframerate(8000)
        wf.writeframes(bytes(range(64)))
        wf.close()
        audio = spark.createDataFrame(
            [(1, bytearray(buf.getvalue())), (2, bytearray(b"RIFFgarbage"))],
            "media_id long, payload binary",
        )
        rows = MM.decode_audio_features(audio, on_error="null").collect()
        assert [r["media_id"] for r in rows] == [1]
        with pytest.raises(PythonException):
            MM.decode_audio_features(audio).collect()
        with pytest.raises(ValueError):
            MM.decode_image_features(media, on_error="bogus")

        # fingerprint ops honor the same policy (near-dup ingest path)
        sigs = MM.image_hashes_df(media, id_col="media_id", on_error="null").collect()
        assert [r["__id"] for r in sigs] == [1]
        asigs = MM.audio_hashes_df(audio, id_col="media_id", on_error="null").collect()
        assert [r["__id"] for r in asigs] == [1]
        with pytest.raises(PythonException):
            MM.image_hashes_df(media, id_col="media_id").collect()

    def test_real_jpeg_through_operators(self, spark):
        """JPEG payloads flow through decode_image_features /
        resize_images with fake=False — the codec boundary the module
        docstring promises."""
        import numpy as np

        from pgvecto_rs_spark.operators.jpeg import encode_jpeg
        from pgvecto_rs_spark.operators.multimodal import (
            decode_image_features,
            resize_images,
        )

        flat = np.full((16, 16), 100, dtype=np.uint8)
        grad = np.tile(np.arange(0, 240, 10, dtype=np.uint8), (24, 1))
        df = spark.createDataFrame(
            [
                (1, "image", bytearray(encode_jpeg(flat))),
                (2, "image", bytearray(encode_jpeg(grad, restart_interval=2))),
            ],
            "media_id long, kind string, payload binary",
        )
        feats = {r["media_id"]: r["feature"] for r in decode_image_features(df).collect()}
        assert len(feats[1]) == 64
        # flat image decodes to its value everywhere (within quant error)
        assert abs(feats[1][0] - 100 / 255.0) < 0.02
        out = {r["media_id"]: r for r in resize_images(df, 6, 8).collect()}
        assert out[2]["height"] == 6 and len(out[2]["pixels"]) == 48

    def test_real_mjpeg_avi_video_pipeline(self, spark):
        """MJPEG AVI is a REAL video path: RIFF walk -> per-frame JPEG
        payloads -> downstream image decode.  The full
        video -> sampled frames -> features pipeline runs with no fake."""
        import numpy as np

        from pgvecto_rs_spark.operators.multimodal import (
            decode_image_features,
            sample_video_frames,
        )
        from pgvecto_rs_spark.operators.video import (
            decode_avi_frame_arrays,
            encode_mjpeg_avi,
        )

        frames = []
        for i in range(6):
            yy, xx = np.mgrid[0:24, 0:32]
            frames.append(((xx * 4 + i * 30) % 256).astype(np.uint8))
        avi = encode_mjpeg_avi(frames, fps=5)
        # codec-level round trip
        arrs = decode_avi_frame_arrays(avi)
        assert len(arrs) == 6 and arrs[0].shape == (24, 32)
        assert np.abs(arrs[3] * 255 - frames[3]).mean() < 3.0

        df = spark.createDataFrame(
            [(7, "video", bytearray(avi))],
            "media_id long, kind string, payload binary",
        )
        sampled = sample_video_frames(df, every_n=2).collect()
        assert [r["frame_no"] for r in sampled] == [0, 2, 4]
        # sampled payloads are valid JPEGs the image stage can decode
        fdf = spark.createDataFrame(
            [(r["frame_no"], "image", r["frame_payload"]) for r in sampled],
            "media_id long, kind string, payload binary",
        )
        feats = decode_image_features(fdf).collect()
        assert len(feats) == 3 and all(len(r["feature"]) == 64 for r in feats)

        # non-AVI payloads still raise honestly without fake
        bad = spark.createDataFrame(
            [(1, "video", b"\x00" * 256)], "media_id long, kind string, payload binary"
        )
        with pytest.raises(Exception) as ei:
            sample_video_frames(bad).collect()
        assert "ffmpeg" in str(ei.value) or "NotImplementedError" in str(ei.value)

    def test_real_wav_decode_features(self, spark):
        """PCM WAV is a REAL codec path (stdlib wave + numpy spectral
        features): a 440 Hz tone concentrates energy in a low FFT band."""
        import io
        import wave as wavemod

        import numpy as np

        from pgvecto_rs_spark.operators.multimodal import decode_audio_features

        rate, secs = 8000, 1
        t = np.arange(rate * secs) / rate
        tone = (np.sin(2 * np.pi * 440 * t) * 20000).astype("<i2")
        buf = io.BytesIO()
        with wavemod.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(rate)
            w.writeframes(tone.tobytes())
        df = spark.createDataFrame(
            [(7, "audio", buf.getvalue())], "media_id long, kind string, payload binary"
        )
        row = decode_audio_features(df).collect()[0]
        assert row["sample_rate"] == rate
        assert row["duration_ms"] == 1000
        assert len(row["feature"]) == 16
        assert row["feature"][0] == pytest.approx(20000 / 32768 / np.sqrt(2), rel=1e-3)
        bands = row["feature"][2:]
        # 440 Hz of a 4 kHz band span lands in the second of 14 bands
        assert max(range(14), key=lambda i: bands[i]) == 1

    def test_audio_stats_exact_integers(self, spark):
        """decode_audio_stats recovers the exact integer samples for
        both 8-bit (s/128) and 16-bit (s/32768) PCM and reduces them to
        oracle-safe integer statistics."""
        import io
        import wave as wavemod

        import numpy as np

        from pgvecto_rs_spark.operators.multimodal import decode_audio_stats

        def wav(samples, width):
            buf = io.BytesIO()
            with wavemod.open(buf, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(width)
                w.setframerate(8000)
                if width == 1:
                    w.writeframes(bytes((np.asarray(samples) + 128).astype(np.uint8)))
                else:
                    w.writeframes(np.asarray(samples, dtype="<i2").tobytes())
            return buf.getvalue()

        s8 = [3, -5, 7, -2, 0, 4]
        s16 = [300, -500, 700, -200, 0, 400]
        df = spark.createDataFrame(
            [(1, wav(s8, 1)), (2, wav(s16, 2))], "media_id long, payload binary"
        )
        rows = {r["media_id"]: r for r in decode_audio_stats(df).collect()}
        for mid, s in ((1, s8), (2, s16)):
            a = np.asarray(s, dtype=np.int64)
            r = rows[mid]
            assert r["n_samples"] == len(s)
            assert r["sample_rate"] == 8000
            assert r["energy"] == int((a * a).sum())
            assert r["zero_crossings"] == int(((a[:-1] * a[1:]) < 0).sum())

    def test_audio_stats_scale_from_header_not_content(self, spark):
        """The PCM scale comes from the WAV header, never inferred from
        content: a quiet/quantized 16-bit clip whose samples are ALL
        multiples of 256 decodes to floats that also land on integers at
        the 8-bit scale — content inference would shrink its energy by
        2^16.  Multi-channel clips are rejected in the integer-exact
        path (the mean downmix need not be an integer)."""
        import io
        import wave as wavemod

        import numpy as np
        import pytest

        from pgvecto_rs_spark.operators.multimodal import decode_audio_stats

        s16 = np.array([256, -512, 0, 2560, -32768, 7680], dtype="<i2")
        buf = io.BytesIO()
        with wavemod.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(8000)
            w.writeframes(s16.tobytes())
        df = spark.createDataFrame([(1, buf.getvalue())], "media_id long, payload binary")
        r = decode_audio_stats(df).collect()[0]
        a = s16.astype(np.int64)
        assert r["energy"] == int((a * a).sum()), "must use the 16-bit header scale"
        assert r["zero_crossings"] == int(((a[:-1] * a[1:]) < 0).sum())

        stereo = io.BytesIO()
        with wavemod.open(stereo, "wb") as w:
            w.setnchannels(2)
            w.setsampwidth(2)
            w.setframerate(8000)
            w.writeframes(np.array([100, 101, -5, 3], dtype="<i2").tobytes())
        df2 = spark.createDataFrame([(2, stereo.getvalue())], "media_id long, payload binary")
        with pytest.raises(Exception) as ei:
            decode_audio_stats(df2).collect()
        assert "mono" in str(ei.value) or "NotImplementedError" in str(ei.value)

    def test_image_hashes_integer_exact(self, spark):
        """aHash/dHash from the real decode path match a pure-python
        integer model (strict mean compare / wraparound row gradient)."""
        import numpy as np

        from pgvecto_rs_spark.operators.multimodal import image_hashes_df

        def ppm(v):
            return b"P6\n8 8\n255\n" + bytes(np.repeat(v.astype(np.uint8), 3))

        rng = np.random.RandomState(7)
        imgs = {i: rng.randint(0, 256, 64) for i in range(5)}
        df = spark.createDataFrame(
            [(i, ppm(v)) for i, v in imgs.items()], "media_id long, payload binary"
        )

        def model(v, method):
            if method == "ahash":
                bits = (64 * v) > v.sum()
            else:
                m = v.reshape(8, 8)
                bits = (np.roll(m, -1, axis=1) > m).reshape(-1)
            sig = sum(int(b) << i for i, b in enumerate(bits))
            return sig - (1 << 64) if sig >= 1 << 63 else sig

        for method in ("ahash", "dhash"):
            got = {
                r["__id"]: r["__sig"]
                for r in image_hashes_df(df, method=method).collect()
            }
            assert got == {i: model(v, method) for i, v in imgs.items()}

    def test_image_neardup_pairs(self, spark):
        """Identical images pair at hamming 0, a one-pixel perturbation
        pairs at small hamming, an unrelated image does not pair."""
        import numpy as np

        from pgvecto_rs_spark.operators.multimodal import image_neardup_pairs

        def ppm(v):
            return b"P6\n8 8\n255\n" + bytes(np.repeat(v.astype(np.uint8), 3))

        base = (np.arange(64) * 7 + 13) % 256
        tweak = base.copy()
        tweak[0] = (tweak[0] + 128) % 256
        other = (np.arange(64) * 37 + 101) % 256
        df = spark.createDataFrame(
            [(1, ppm(base)), (2, ppm(base)), (3, ppm(tweak)), (4, ppm(other))],
            "media_id long, payload binary",
        )
        pairs = {
            (r["id_a"], r["id_b"]): r["hamming"]
            for r in image_neardup_pairs(df, max_hamming=3).collect()
        }
        assert pairs[(1, 2)] == 0
        assert (1, 3) in pairs and 1 <= pairs[(1, 3)] <= 3
        assert pairs[(1, 3)] == pairs[(2, 3)]
        assert not any(4 in p for p in pairs)

    def test_audio_hashes_integer_exact(self, spark):
        """Energy-envelope hash from the real WAV decode matches a pure
        python integer model (frame f = i*64//n, strict cross-multiplied
        mean compare)."""
        import struct

        import numpy as np

        from pgvecto_rs_spark.operators.multimodal import audio_hashes_df

        def wav(u):
            data = bytes(np.asarray(u, dtype=np.uint8))
            return (
                b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVEfmt "
                + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 8000, 1, 8)
                + b"data" + struct.pack("<I", len(data)) + data
            )

        rng = np.random.RandomState(3)
        clips = {i: rng.randint(0, 256, 64 + 7 * i) for i in range(1, 5)}
        df = spark.createDataFrame(
            [(i, wav(u)) for i, u in clips.items()], "media_id long, payload binary"
        )

        def model(u):
            s = np.asarray(u, dtype=np.int64) - 128
            n = s.size
            f = (np.arange(n) * 64) // n
            e = np.zeros(64, dtype=np.int64)
            np.add.at(e, f, s * s)
            bits = (64 * e) > e.sum()
            sig = sum(int(b) << i for i, b in enumerate(bits))
            return sig - (1 << 64) if sig >= 1 << 63 else sig

        got = {r["__id"]: r["__sig"] for r in audio_hashes_df(df).collect()}
        assert got == {i: model(u) for i, u in clips.items()}

    def test_audio_neardup_pairs(self, spark):
        """Identical clips pair at hamming 0; a one-sample perturbation
        pairs at small hamming; an unrelated clip does not pair."""
        import struct

        import numpy as np

        from pgvecto_rs_spark.operators.multimodal import audio_neardup_pairs

        def wav(u):
            data = bytes(np.asarray(u, dtype=np.uint8))
            return (
                b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVEfmt "
                + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 8000, 1, 8)
                + b"data" + struct.pack("<I", len(data)) + data
            )

        base = (np.arange(80) * 29 + 5) % 256
        tweak = base.copy()
        tweak[0] = (int(tweak[0]) + 16) % 256
        other = (np.arange(80) * 31 + 97) % 256
        df = spark.createDataFrame(
            [(1, wav(base)), (2, wav(base)), (3, wav(tweak)), (4, wav(other))],
            "media_id long, payload binary",
        )
        pairs = {
            (r["id_a"], r["id_b"]): r["hamming"]
            for r in audio_neardup_pairs(df, max_hamming=3).collect()
        }
        assert pairs[(1, 2)] == 0
        assert (1, 3) in pairs and 0 <= pairs[(1, 3)] <= 3
        assert pairs[(1, 3)] == pairs[(2, 3)]
        assert not any(4 in p for p in pairs)

    def test_video_frame_sampling(self, spark):
        from pgvecto_rs_spark.operators.multimodal import sample_video_frames

        df = spark.createDataFrame(
            [(1, "video", bytes(64 * 25))], "media_id long, kind string, payload binary"
        )
        frames = sample_video_frames(df, every_n=10, fake=True).collect()
        assert [r["frame_no"] for r in frames] == [0, 10, 20]
        assert all(len(r["frame_payload"]) == 64 for r in frames)


class TestEmbeddingSource:
    def test_hash_embedding_deterministic_and_normalized(self, spark):
        from pgvecto_rs_spark.sources.embedding import text2vec_hash

        df = spark.createDataFrame([("hello world",), ("hello world",), ("",)], "t string")
        out = [r["e"] for r in df.select(text2vec_hash("t", 32).alias("e")).collect()]
        assert out[0] == out[1]
        assert np.linalg.norm(out[0]) == pytest.approx(1.0, abs=1e-5)
        assert np.linalg.norm(out[2]) == 0.0  # empty text -> zero vector

    def test_provider_shape_validation(self, spark):
        from pgvecto_rs_spark.sources.embedding import text2vec

        bad = text2vec(lambda texts: np.zeros((len(texts), 3), np.float32), dims=4)
        df = spark.createDataFrame([("x",)], "t string")
        with pytest.raises(Exception):
            df.select(bad(F.col("t"))).collect()


class TestPlanner:
    def test_index_vs_seqscan_and_veto(self, spark, sf_dir, tmp_path):
        from pgvecto_rs_spark.indexes import FlatIndex
        from pgvecto_rs_spark.plans import IndexCatalog, Planner

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        cat = IndexCatalog()
        idx = FlatIndex.create(spark, emb, str(tmp_path / "flat"), metric="l2")
        cat.register("embeddings", "embedding", "l2", idx)

        p = Planner(cat)
        via_index = p.top_k("embeddings", emb, "embedding", Q64, 5, "l2").collect()
        assert p.last_decision["path"] == "index"

        p.enable_index = False  # vectors.enable_index = false veto
        via_scan = p.top_k("embeddings", emb, "embedding", Q64, 5, "l2").collect()
        assert p.last_decision["path"] == "seqscan"
        assert [r["id"] for r in via_index] == [r["vec_id"] for r in via_scan]

    def test_threshold_merge_same_column(self, spark, sf_dir):
        from pgvecto_rs_spark.plans import IndexCatalog, Planner
        from pgvecto_rs_spark.plans.rewrite import Sphere

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        p = Planner(IndexCatalog())
        out = p.top_k(
            "embeddings", emb, "embedding", Q64, 50, "l2",
            spheres=[
                Sphere("embedding", Q64, 99.0, "l2"),
                Sphere("embedding", Q64, RANGE_RADIUS, "l2"),
            ],
        ).collect()
        assert p.last_decision["threshold"] == RANGE_RADIUS  # min-merge
        assert all(r["distance"] < RANGE_RADIUS for r in out)

    def test_limitless_sphere_routes_to_index_range(self, spark, sf_dir, tmp_path):
        """A sphere with no LIMIT routes to the index's native
        range_search (IVF list pruning) and equals the seqscan sphere;
        the enable_index veto restores the seqscan path."""
        from pgvecto_rs_spark.indexes import IVFIndex
        from pgvecto_rs_spark.plans import IndexCatalog, Planner
        from pgvecto_rs_spark.plans.rewrite import Sphere

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        cat = IndexCatalog()
        idx = IVFIndex.create(spark, emb, str(tmp_path / "ivfr"), metric="l2", nlist=8)
        cat.register("embeddings", "embedding", "l2", idx)
        p = Planner(cat)
        sph = Sphere("embedding", Q64, RANGE_RADIUS, "l2")
        via_index = {
            r["id"] for r in p.range_search("embeddings", emb, sph).collect()
        }
        assert p.last_decision["path"] == "index-range"
        p.enable_index = False
        via_scan = {
            r["vec_id"] for r in p.range_search("embeddings", emb, sph).collect()
        }
        assert p.last_decision["path"] == "seqscan-range"
        assert via_index == via_scan and len(via_index) > 0

    def test_limitless_sphere_hnsw_needs_approx_opt_in(
        self, spark, sf_dir, tmp_path
    ):
        """HNSW range_search is reachability-approximate, so a bare
        sphere predicate (an EXACT set in SQL) must NOT silently route
        to it: default -> seqscan-range; approx=True -> index-range."""
        from pgvecto_rs_spark.indexes.hnsw import HNSWIndex
        from pgvecto_rs_spark.plans import IndexCatalog, Planner
        from pgvecto_rs_spark.plans.rewrite import Sphere

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        cat = IndexCatalog()
        idx = HNSWIndex.create(spark, emb, str(tmp_path / "hnswr"), metric="l2")
        cat.register("embeddings", "embedding", "l2", idx)
        p = Planner(cat)
        sph = Sphere("embedding", Q64, RANGE_RADIUS, "l2")

        exact = {r["vec_id"] for r in p.range_search("embeddings", emb, sph).collect()}
        assert p.last_decision["path"] == "seqscan-range"

        via_index = {
            r["id"]
            for r in p.range_search(
                "embeddings", emb, sph, approx=True, ef_search=64
            ).collect()
        }
        assert p.last_decision["path"] == "index-range"
        assert via_index <= exact and len(via_index) > 0

    def test_range_search_index_opts_filtered_to_signature(
        self, spark, sf_dir, tmp_path
    ):
        """Search-only knobs (nprobe/ef_search) passed at the planner
        call site must not TypeError against an index kind whose
        range_search doesn't take them."""
        from pgvecto_rs_spark.indexes import FlatIndex
        from pgvecto_rs_spark.plans import IndexCatalog, Planner
        from pgvecto_rs_spark.plans.rewrite import Sphere

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        cat = IndexCatalog()
        idx = FlatIndex.create(spark, emb, str(tmp_path / "flatr"), metric="l2")
        cat.register("embeddings", "embedding", "l2", idx)
        p = Planner(cat)
        sph = Sphere("embedding", Q64, RANGE_RADIUS, "l2")
        out = p.range_search(
            "embeddings", emb, sph, nprobe=4, ef_search=64
        ).collect()
        assert p.last_decision["path"] == "index-range" and len(out) > 0

    def test_multi_vector_order_by_rejected(self, spark, sf_dir):
        """scan_build (am_scan.rs:34-39): a second, *different* ORDER BY
        vector errors; a repeated identical one is tolerated."""
        from pgvecto_rs_spark.plans import IndexCatalog, Planner

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        p = Planner(IndexCatalog())
        # identical duplicate collapses
        out = p.top_k(
            "embeddings", emb, "embedding", Q64, 3, "l2", extra_queries=[Q64]
        )
        assert out.count() == 3
        other = [v + 1.0 for v in Q64]
        with pytest.raises(ValueError, match="multiple vectors"):
            p.top_k(
                "embeddings", emb, "embedding", Q64, 3, "l2", extra_queries=[other]
            )

    def test_decision_goldens(self, spark, sf_dir, tmp_path):
        """pushdown_plan.slt:24-134 decision-table goldens over
        last_decision + the physical plan: sphere on a different column
        becomes a recheck; the IVF index path's scan is partition-pruned
        to the probed lists (the EXPLAIN-visible pushdown)."""
        from pgvecto_rs_spark.indexes import IVFIndex
        from pgvecto_rs_spark.plans import IndexCatalog, Planner
        from pgvecto_rs_spark.plans.rewrite import Sphere

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        cat = IndexCatalog()
        idx = IVFIndex.create(spark, emb, str(tmp_path / "ivf"), metric="l2", nlist=8)
        cat.register("embeddings", "embedding", "l2", idx)
        p = Planner(cat)

        # different-column sphere -> recheck residual, index still wins
        p.top_k(
            "embeddings", emb.withColumn("other", F.col("embedding")), "embedding",
            Q64, 3, "l2", spheres=[Sphere("other", Q64, 1e9, "l2")],
        )
        assert p.last_decision == {
            "path": "index", "index_kind": "ivf", "threshold": None, "recheck": True,
        }

        # same-column sphere -> threshold rides the index, no recheck
        p.top_k(
            "embeddings", emb, "embedding", Q64, 3, "l2",
            spheres=[Sphere("embedding", Q64, 123.0, "l2")], nprobe=8,
        )
        assert p.last_decision == {
            "path": "index", "index_kind": "ivf", "threshold": 123.0, "recheck": False,
        }

        # EXPLAIN golden: the probed scan is partition-pruned on list_id
        plan = idx.search(Q64, k=3, nprobe=2)._jdf.queryExecution().executedPlan().toString()
        assert "list_id" in plan and ("PartitionFilters" in plan or "partition_filters" in plan)

        # range search through the index
        p.range_search("embeddings", emb, Sphere("embedding", Q64, RANGE_RADIUS, "l2"), k=50)
        assert p.last_decision == {"path": "index-range-limit"}
        p.enable_index = False
        p.range_search("embeddings", emb, Sphere("embedding", Q64, RANGE_RADIUS, "l2"), k=50)
        assert p.last_decision == {"path": "seqscan-range"}


class TestVecsFiles:
    def test_fvecs_round_trip(self, spark, tmp_path):
        from pgvecto_rs_spark.sources.vecs_files import read_fvecs

        mat = np.random.default_rng(1).normal(size=(7, 4)).astype(np.float32)
        path = str(tmp_path / "x.fvecs")
        with open(path, "wb") as f:
            for row in mat:
                np.int32(4).tofile(f)
                row.tofile(f)
        df = read_fvecs(spark, path)
        got = np.array([r["embedding"] for r in df.orderBy("vec_id").collect()], np.float32)
        assert np.array_equal(got, mat)

    def test_bvecs_round_trip(self, spark, tmp_path):
        from pgvecto_rs_spark.sources.vecs_files import read_bvecs

        mat = np.random.default_rng(2).integers(0, 256, size=(6, 5)).astype(np.uint8)
        path = str(tmp_path / "x.bvecs")
        with open(path, "wb") as f:
            for row in mat:
                np.int32(5).tofile(f)
                row.tofile(f)
        df = read_bvecs(spark, path)
        got = np.array(
            [r["embedding"] for r in df.orderBy("vec_id").collect()], np.float32
        )
        assert np.array_equal(got, mat.astype(np.float32))


class TestKnnJoinIVF:
    def test_recall_vs_brute(self, spark, sf_dir):
        """Bucketed knn-join recall >= 0.9 vs the exact broadcast join
        at a generous probe budget; exact when nprobe = nlist."""
        from pgvecto_rs_spark.operators.knn_ivf import knn_join_ivf
        from pgvecto_rs_spark.operators.search import knn_join

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        left = emb.where(F.col("vec_id") < 20).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
        )
        approx = knn_join_ivf(
            left, emb, "qid", "qv", "vec_id", "embedding",
            k=5, nlist=16, nprobe=8, replicas=2,
        ).collect()
        exact = knn_join(
            left, emb, "qv", "embedding", k=5,
            partition_keys=["qid"], tiebreaker="vec_id",
        ).collect()
        a = {}
        for r in approx:
            a.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        e = {}
        for r in exact:
            e.setdefault(r["qid"], set()).add(r["vec_id"])
        recs = [len(a.get(q, set()) & e[q]) / 5 for q in e]
        assert sum(recs) / len(recs) >= 0.9, recs

    def test_full_probe_exact(self, spark, sf_dir):
        from pgvecto_rs_spark.operators.knn_ivf import knn_join_ivf
        from pgvecto_rs_spark.operators.search import knn_join

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        left = emb.where(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
        )
        approx = knn_join_ivf(
            left, emb, "qid", "qv", "vec_id", "embedding",
            k=3, nlist=8, nprobe=8, replicas=1,
        ).collect()
        exact = knn_join(
            left, emb, "qv", "embedding", k=3,
            partition_keys=["qid"], tiebreaker="vec_id",
        ).collect()
        a = sorted((r["query_id"], r["neighbor_id"]) for r in approx)
        e = sorted((r["qid"], r["vec_id"]) for r in exact)
        assert a == e


class TestEmbeddingOptions:
    """Mirror of openai_options.slt: SET/SHOW of the provider GUCs."""

    def test_set_show_roundtrip(self):
        from pgvecto_rs_spark.sources import embedding as E

        E.set_option("openai_base_url", "https://api.moonshot.cn/v1")
        E.set_option("openai_api_key", "fake_key")
        assert E.get_option("openai_base_url") == "https://api.moonshot.cn/v1"
        assert E.get_option("openai_api_key") == "fake_key"
        assert E.embedding_options()["openai_api_key"] == "fake_key"

    def test_unknown_key_rejected(self):
        from pgvecto_rs_spark.sources import embedding as E

        import pytest as _pytest

        with _pytest.raises(KeyError):
            E.set_option("openai_timeout", "1")


class TestAdam7PNG:
    """Adam7-interlaced PNG decode (PNG spec 8.2): the 7 independently
    filtered passes must reconstruct the identical image the plain
    encoding decodes to — the web-crawl long-tail twin of progressive
    JPEG."""

    @staticmethod
    def _chunk(typ, data):
        import struct
        import zlib

        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    @classmethod
    def _make_png(cls, px, ctype, interlace, palette=None, filt=0):
        import struct
        import zlib

        import numpy as np

        from pgvecto_rs_spark.operators.multimodal import _ADAM7_PASSES

        h, w = px.shape[:2]
        nch = 1 if px.ndim == 2 else px.shape[2]
        px3 = px.reshape(h, w, nch)

        def rows(sub):
            out = bytearray()
            for y in range(sub.shape[0]):
                if filt == 0:
                    out += b"\x00" + sub[y].tobytes()
                else:  # Sub filter exercises the unfilter path per pass
                    row = sub[y].reshape(-1, nch).astype(np.int64)
                    d = np.diff(
                        row, axis=0, prepend=np.zeros((1, nch), np.int64)
                    ) & 0xFF
                    out += b"\x01" + d.astype(np.uint8).tobytes()
            return bytes(out)

        if interlace == 0:
            raw = rows(px3.reshape(h, w * nch))
        else:
            raw = b""
            for x0, y0, dx, dy in _ADAM7_PASSES:
                sub = px3[y0::dy, x0::dx]
                if sub.shape[0] == 0 or sub.shape[1] == 0:
                    continue
                raw += rows(sub.reshape(sub.shape[0], sub.shape[1] * nch))
        out = b"\x89PNG\r\n\x1a\n" + cls._chunk(
            b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, interlace)
        )
        if palette is not None:
            out += cls._chunk(b"PLTE", palette.tobytes())
        return out + cls._chunk(b"IDAT", zlib.compress(raw)) + cls._chunk(b"IEND", b"")

    def test_interlaced_equals_plain(self):
        import numpy as np

        from pgvecto_rs_spark.operators.multimodal import _decode_png

        rng = np.random.default_rng(5)
        cases = [((13, 17), 0), ((13, 17, 3), 2), ((8, 8, 4), 6),
                 ((5, 3), 0), ((1, 1), 0), ((16, 16, 2), 4)]
        for shape, ctype in cases:
            px = rng.integers(0, 256, shape, dtype=np.uint8)
            for filt in (0, 1):
                a = _decode_png(self._make_png(px, ctype, 0, filt=filt))
                b = _decode_png(self._make_png(px, ctype, 1, filt=filt))
                assert np.array_equal(a, b), (shape, ctype, filt)

    def test_interlaced_palette(self):
        import numpy as np

        from pgvecto_rs_spark.operators.multimodal import _decode_png

        rng = np.random.default_rng(6)
        pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
        idxs = rng.integers(0, 16, (9, 11), dtype=np.uint8)
        a = _decode_png(self._make_png(idxs, 3, 0, palette=pal))
        b = _decode_png(self._make_png(idxs, 3, 1, palette=pal))
        assert np.array_equal(a, b)

    def test_truncated_interlaced_rejected(self):
        import numpy as np
        import pytest

        from pgvecto_rs_spark.operators.multimodal import _decode_png

        px = np.arange(13 * 17, dtype=np.uint8).reshape(13, 17)
        good = self._make_png(px, 0, 1)
        # rebuild with one pass's bytes chopped inside the zlib stream
        import struct
        import zlib

        raw = zlib.compress(zlib.decompress(self._idat(good))[:-5])
        out = good[: good.find(b"IDAT") - 4]
        out += self._chunk(b"IDAT", raw) + self._chunk(b"IEND", b"")
        with pytest.raises(ValueError):
            _decode_png(bytes(out))

    @staticmethod
    def _idat(png):
        import struct

        pos = 8
        while pos + 8 <= len(png):
            ln, typ = struct.unpack(">I4s", png[pos : pos + 8])
            if typ == b"IDAT":
                return png[pos + 8 : pos + 8 + ln]
            pos += 8 + ln + 4
        raise AssertionError("no IDAT")


class TestGifDecode:
    """GIF87a/89a decode (operators/multimodal._decode_gif): real
    variable-width LZW, global/local palettes, 4-pass row interlace,
    extension skipping — built against a from-scratch LZW encoder so
    the round-trip is a genuine compression round-trip."""

    @classmethod
    def _make_gif(cls, idxs, palette, interlace=False, local=False,
                  with_ext=False, version=b"GIF89a"):
        """Wrap the library encoder (multimodal.encode_gif), optionally
        splicing a graphic-control extension before the image
        descriptor so the decoder's extension-skip path is covered."""
        from pgvecto_rs_spark.operators.multimodal import encode_gif

        out = encode_gif(
            idxs, palette, interlace=interlace, local_palette=local,
            version=version,
        )
        if with_ext:
            size_bits = 0
            while (2 << size_bits) < len(palette):
                size_bits += 1
            pos = 13 + (0 if local else 3 * (2 << size_bits))
            out = out[:pos] + b"\x21\xf9\x04\x00\x00\x00\x00\x00" + out[pos:]
        return out

    def test_roundtrip_plain_and_interlaced(self):
        import numpy as np

        from pgvecto_rs_spark.operators.multimodal import _decode_gif

        rng = np.random.default_rng(9)
        for shape in ((13, 17), (8, 8), (1, 1), (31, 5)):
            pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
            idxs = rng.integers(0, 16, shape, dtype=np.uint8)
            want = pal[idxs].astype(np.float32).mean(axis=2) / 255.0
            for interlace in (False, True):
                for local in (False, True):
                    got = _decode_gif(
                        self._make_gif(idxs, pal, interlace=interlace,
                                       local=local, with_ext=True)
                    )
                    assert got.shape == shape
                    assert np.allclose(got, want), (shape, interlace, local)

    def test_gif87a_and_long_runs(self):
        """GIF87a version tag + a constant image (maximal LZW run
        compression, multiple width growths on a 64x64)."""
        import numpy as np

        from pgvecto_rs_spark.operators.multimodal import _decode_gif

        pal = np.array([[0, 0, 0], [255, 255, 255], [8, 8, 8], [9, 9, 9]], np.uint8)
        idxs = np.ones((64, 64), dtype=np.uint8)
        got = _decode_gif(self._make_gif(idxs, pal, version=b"GIF87a"))
        assert np.allclose(got, 1.0)

    def test_through_spark_operators(self, spark):
        import numpy as np

        from pgvecto_rs_spark.operators.multimodal import (
            attach_media_metadata,
            decode_image_features,
        )

        rng = np.random.default_rng(4)
        pal = rng.integers(0, 256, (8, 3), dtype=np.uint8)
        idxs = rng.integers(0, 8, (8, 8), dtype=np.uint8)
        gif = self._make_gif(idxs, pal)
        df = spark.createDataFrame(
            [(1, "image", bytearray(gif))],
            "media_id long, kind string, payload binary",
        )
        meta = attach_media_metadata(df).collect()[0]
        assert meta["sniffed_mime"] == "image/gif"
        feats = decode_image_features(df).collect()
        assert len(feats[0]["feature"]) == 64
        want = pal[idxs].astype(np.float32).mean(axis=2) / 255.0
        assert feats[0]["feature"][0] == pytest.approx(float(want[0, 0]), abs=1e-6)

    def test_malformed_rejected(self):
        import numpy as np
        import pytest

        from pgvecto_rs_spark.operators.multimodal import _decode_gif

        pal = np.array([[1, 2, 3], [4, 5, 6]], np.uint8)
        idxs = np.zeros((4, 4), dtype=np.uint8)
        good = self._make_gif(idxs, pal)
        for bad in (
            b"GIF89a",                      # truncated header
            good[:20],                      # truncated mid-stream
            good[:6] + b"\x00" * (len(good) - 6),  # zeroed body
            good[:-10],                     # chopped data blocks
        ):
            with pytest.raises(ValueError):
                _decode_gif(bad)


class TestPngBitDepths:
    """PNG bit depths beyond 8 (spec table 11.1): gray 1/2/4/16,
    RGB/RGBA 16, palette 1/2/4 — unfilter runs on bytes with
    bpp = ceil(channels*depth/8), samples unpack MSB-first."""

    @staticmethod
    def _chunk(typ, data):
        import struct
        import zlib

        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    @classmethod
    def _make_png(cls, samples, ctype, depth, palette=None, filters=(0,)):
        """samples: (h, w, nch) ints < 2^depth; rows filtered with
        ``filters[y % len]`` (0=None, 1=Sub, 2=Up on raw bytes)."""
        import struct
        import zlib

        import numpy as np

        h, w, nch = samples.shape
        bpp = max(1, (nch * depth + 7) // 8)
        rows = []
        for y in range(h):
            flat = samples[y].reshape(-1).astype(np.uint16)
            if depth == 16:
                b = np.zeros(len(flat) * 2, dtype=np.uint8)
                b[0::2] = flat >> 8
                b[1::2] = flat & 0xFF
            elif depth == 8:
                b = flat.astype(np.uint8)
            else:
                bits = (
                    (flat[:, None] >> np.arange(depth - 1, -1, -1)[None, :]) & 1
                ).reshape(-1).astype(np.uint8)
                b = np.packbits(bits)
            rows.append(b)
        raw = bytearray()
        prev = np.zeros(len(rows[0]), dtype=np.int32)
        for y, b in enumerate(rows):
            ft = filters[y % len(filters)]
            line = b.astype(np.int32)
            if ft == 0:
                enc = line
            elif ft == 1:
                enc = line.copy()
                enc[bpp:] = (line[bpp:] - line[:-bpp]) % 256
            else:
                enc = (line - prev) % 256
            raw += bytes([ft]) + enc.astype(np.uint8).tobytes()
            prev = line
        out = b"\x89PNG\r\n\x1a\n" + cls._chunk(
            b"IHDR", struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, 0)
        )
        if palette is not None:
            out += cls._chunk(b"PLTE", palette.astype(np.uint8).tobytes())
        return out + cls._chunk(b"IDAT", zlib.compress(bytes(raw))) + cls._chunk(b"IEND", b"")

    def test_gray_subbyte_and_16bit(self):
        import numpy as np

        from pgvecto_rs_spark.operators.multimodal import _decode_png

        rng = np.random.default_rng(11)
        for depth in (1, 2, 4, 16):
            maxv = (1 << depth) - 1
            px = rng.integers(0, maxv + 1, (9, 13, 1)).astype(np.uint16)
            for filters in ((0,), (0, 2), (1, 2)) if depth == 16 else ((0,), (0, 2), (1,)):
                got = _decode_png(self._make_png(px, 0, depth, filters=filters))
                want = px[:, :, 0].astype(np.float32) / np.float32(maxv)
                assert got.shape == (9, 13)
                assert np.allclose(got, want), (depth, filters)

    def test_rgb_and_rgba_16bit(self):
        import numpy as np

        from pgvecto_rs_spark.operators.multimodal import _decode_png

        rng = np.random.default_rng(12)
        for ctype, nch in ((2, 3), (6, 4)):
            px = rng.integers(0, 65536, (7, 5, nch)).astype(np.uint16)
            got = _decode_png(self._make_png(px, ctype, 16, filters=(0, 1, 2)))
            want = px[:, :, :3].astype(np.float32).mean(axis=2) / np.float32(65535)
            assert np.allclose(got, want, atol=1e-6), ctype

    def test_palette_subbyte(self):
        import numpy as np

        from pgvecto_rs_spark.operators.multimodal import _decode_png

        rng = np.random.default_rng(13)
        for depth in (1, 2, 4):
            ncol = 1 << depth
            pal = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
            idxs = rng.integers(0, ncol, (6, 11, 1)).astype(np.uint16)
            got = _decode_png(self._make_png(idxs, 3, depth, palette=pal))
            want = pal[idxs[:, :, 0]].astype(np.float32).mean(axis=2) / 255.0
            assert np.allclose(got, want, atol=1e-6), depth

    def test_illegal_combination_rejected(self):
        import numpy as np
        import pytest

        from pgvecto_rs_spark.operators.multimodal import _decode_png

        px = np.zeros((4, 4, 3), dtype=np.uint16)
        with pytest.raises(ValueError, match="illegal depth"):
            _decode_png(self._make_png(px, 2, 4))  # RGB at depth 4

    def test_interlaced_subbyte_gray(self):
        """Adam7 x depth-4 gray: each pass's scanlines pack and pad to
        byte boundaries independently."""
        import struct
        import zlib

        import numpy as np

        from pgvecto_rs_spark.operators.multimodal import (
            _ADAM7_PASSES,
            _decode_png,
        )

        rng = np.random.default_rng(14)
        h, w, depth = 11, 13, 4
        px = rng.integers(0, 16, (h, w), dtype=np.uint8)
        raw = bytearray()
        for x0, y0, dx, dy in _ADAM7_PASSES:
            sub = px[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            for y in range(sub.shape[0]):
                bits = (
                    (sub[y][:, None] >> np.arange(depth - 1, -1, -1)[None, :]) & 1
                ).reshape(-1).astype(np.uint8)
                raw += b"\x00" + np.packbits(bits).tobytes()
        out = b"\x89PNG\r\n\x1a\n" + self._chunk(
            b"IHDR", struct.pack(">IIBBBBB", w, h, depth, 0, 0, 0, 1)
        )
        out += self._chunk(b"IDAT", zlib.compress(bytes(raw)))
        out += self._chunk(b"IEND", b"")
        got = _decode_png(out)
        assert np.allclose(got, px.astype(np.float32) / np.float32(15))


class TestWavFormats:
    """_decode_wav's own RIFF walk: integer PCM 8/16/24/32, IEEE float
    32/64, G.711 mu-law/A-law (vs stdlib audioop as the independent
    oracle), WAVE_FORMAT_EXTENSIBLE, word-aligned odd chunks."""

    @staticmethod
    def _wav(tag, channels, rate, bits, data, extensible=False):
        import struct

        if extensible:
            ext = struct.pack("<HHIIHH", 0xFFFE, channels, rate,
                              rate * channels * max(1, bits // 8),
                              channels * max(1, bits // 8), bits)
            # cbSize, wValidBitsPerSample, dwChannelMask, then the
            # SubFormat GUID whose first two bytes are the real tag
            ext += struct.pack("<HHIH", 22, bits, (1 << channels) - 1, tag)
            ext += b"\x00\x00\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"
            fmt = ext
        else:
            fmt = struct.pack("<HHIIHH", tag, channels, rate,
                              rate * channels * max(1, bits // 8),
                              channels * max(1, bits // 8), bits)
        chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
        if len(fmt) % 2:
            chunks += b"\x00"
        chunks += b"data" + struct.pack("<I", len(data)) + data
        if len(data) % 2:
            chunks += b"\x00"
        return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks

    def test_pcm_widths(self):
        import numpy as np

        from pgvecto_rs_spark.operators.multimodal import _decode_wav

        vals = [-32768, -256, -1, 0, 1, 255, 32767]
        x, rate, width, ch = _decode_wav(
            self._wav(1, 1, 8000, 16, np.array(vals, "<i2").tobytes())
        )
        assert (rate, width, ch) == (8000, 2, 1)
        assert np.allclose(x, np.array(vals) / 32768.0)

        v24 = [-(1 << 23), -1, 0, 1, (1 << 23) - 1]
        raw = b"".join(int(v).to_bytes(3, "little", signed=True) for v in v24)
        x, _r, width, _c = _decode_wav(self._wav(1, 1, 8000, 24, raw))
        assert width == 3
        assert np.allclose(x, np.array(v24) / float(1 << 23))

        v32 = [-(1 << 31), 0, (1 << 31) - 1]
        x, _r, width, _c = _decode_wav(
            self._wav(1, 1, 8000, 32, np.array(v32, "<i4").tobytes())
        )
        assert width == 4
        assert np.allclose(x, np.array(v32) / float(1 << 31))

    def test_ieee_float(self):
        import numpy as np

        from pgvecto_rs_spark.operators.multimodal import (
            _decode_wav,
            _pcm_int_samples,
        )

        vals = np.array([-1.5, -0.25, 0.0, 0.5, 2.0], dtype="<f4")
        x, _r, width, ch = _decode_wav(self._wav(3, 1, 16000, 32, vals.tobytes()))
        assert width == 0
        assert np.allclose(x, np.clip(vals.astype(np.float64), -1, 1))
        import pytest

        with pytest.raises(NotImplementedError, match="float WAV"):
            _pcm_int_samples(x, width, ch)
        x64, _r, w64, _c = _decode_wav(
            self._wav(3, 1, 16000, 64, vals.astype("<f8").tobytes())
        )
        assert w64 == 0 and np.allclose(x64, np.clip(vals, -1, 1))

    def test_g711_vs_audioop(self):
        """Every code point 0..255 of both laws against the stdlib
        audioop expansion (deprecated but present on 3.11)."""
        import numpy as np
        import pytest

        audioop = pytest.importorskip("audioop")

        from pgvecto_rs_spark.operators.multimodal import _decode_wav

        codes = bytes(range(256))
        for tag, fn in ((7, audioop.ulaw2lin), (6, audioop.alaw2lin)):
            x, _r, width, _c = _decode_wav(self._wav(tag, 1, 8000, 8, codes))
            assert width == 2
            want = np.frombuffer(fn(codes, 2), dtype="<i2").astype(np.float64)
            assert np.array_equal(x * 32768.0, want), tag

    def test_extensible_and_stereo(self):
        import numpy as np

        from pgvecto_rs_spark.operators.multimodal import _decode_wav

        vals = np.array([0, 16384, -16384, 32767], "<i2")  # L R L R
        x, _r, width, ch = _decode_wav(
            self._wav(1, 2, 44100, 16, vals.tobytes(), extensible=True)
        )
        assert (width, ch) == (2, 2)
        assert np.allclose(x, [(0 + 16384) / 32768.0 / 2, (-16384 + 32767) / 32768.0 / 2])

    def test_malformed_and_unsupported(self):
        import pytest

        from pgvecto_rs_spark.operators.multimodal import _decode_wav

        with pytest.raises(ValueError):
            _decode_wav(b"RIFFxxxxWAVE")  # no chunks
        with pytest.raises(ValueError):
            _decode_wav(b"OggS" + b"\x00" * 40)
        with pytest.raises(NotImplementedError, match="format tag"):
            _decode_wav(self._wav(2, 1, 8000, 4, b"\x00\x00"))  # ADPCM
        # truncated chunk body
        good = self._wav(1, 1, 8000, 16, b"\x00\x00\x01\x00")
        with pytest.raises(ValueError):
            _decode_wav(good[:-3])


class TestGifAnimation:
    """Animated GIF compositing (_gif_frames) vs an independent numpy
    model: disposal 0/1/2/3, transparency, sub-rectangle frames, and
    the sample_video_frames GIF route (sampled frames re-emitted as
    PPM payloads decode_image_features can consume)."""

    @staticmethod
    def _model(pal, screen_hw, bg, frames):
        """Reference compositor, written independently of _gif_frames."""
        import numpy as np

        sh, sw = screen_hw
        canvas = np.empty((sh, sw, 3), np.uint8)
        canvas[:] = pal[bg]
        out = []
        for fr in frames:
            idxs = np.asarray(fr["indices"])
            h, w = idxs.shape
            t, l = fr.get("top", 0), fr.get("left", 0)
            saved = canvas.copy()
            rgb = pal[idxs]
            tr = fr.get("transparent")
            if tr is None:
                canvas[t : t + h, l : l + w] = rgb
            else:
                m = idxs != tr
                canvas[t : t + h, l : l + w][m] = rgb[m]
            out.append(canvas.copy())
            d = fr.get("disposal", 0)
            if d == 2:
                canvas[t : t + h, l : l + w] = pal[bg]
            elif d == 3:
                canvas = saved
        return out

    def _anim(self, rng):
        import numpy as np

        pal = rng.integers(0, 256, (8, 3), dtype=np.uint8)
        frames = [
            {"indices": rng.integers(0, 8, (10, 12), dtype=np.uint8)},
            {  # sub-rectangle with transparency, restore-background after
                "indices": rng.integers(0, 8, (4, 5), dtype=np.uint8),
                "left": 3, "top": 2, "transparent": 1, "disposal": 2,
            },
            {  # restore-previous disposal
                "indices": rng.integers(0, 8, (6, 6), dtype=np.uint8),
                "left": 6, "top": 4, "disposal": 3,
            },
            {"indices": rng.integers(0, 8, (10, 12), dtype=np.uint8),
             "transparent": 0},
        ]
        return pal, frames

    def test_composited_frames_match_model(self):
        import numpy as np

        from pgvecto_rs_spark.operators.multimodal import (
            _gif_frames,
            encode_gif_animation,
        )

        rng = np.random.default_rng(21)
        pal, frames = self._anim(rng)
        gif = encode_gif_animation(frames, pal, (10, 12), bg_index=2)
        want = self._model(pal, (10, 12), 2, frames)
        got = list(_gif_frames(gif))
        assert [fno for fno, _ in got] == [0, 1, 2, 3]
        for (fno, canvas), exp in zip(got, want):
            assert np.array_equal(canvas, exp), fno

    def test_first_frame_via_decode_gif(self):
        import numpy as np

        from pgvecto_rs_spark.operators.multimodal import (
            _decode_gif,
            encode_gif_animation,
        )

        rng = np.random.default_rng(22)
        pal, frames = self._anim(rng)
        gif = encode_gif_animation(frames, pal, (10, 12), bg_index=2)
        want = self._model(pal, (10, 12), 2, frames)[0]
        got = _decode_gif(gif)
        assert np.allclose(got, want.astype(np.float32).mean(axis=2) / 255.0)

    def test_sampled_through_spark(self, spark):
        import numpy as np

        from pgvecto_rs_spark.operators.multimodal import (
            decode_image_features,
            encode_gif_animation,
            sample_video_frames,
        )

        rng = np.random.default_rng(23)
        pal, frames = self._anim(rng)
        gif = encode_gif_animation(frames, pal, (10, 12), bg_index=2)
        df = spark.createDataFrame(
            [(1, "video", bytearray(gif)), (2, "video", bytearray(b"GIF89abad")),
             (3, "video", None)],
            "media_id long, kind string, payload binary",
        )
        # on_error='null': the corrupt GIF drops wholesale
        out = sample_video_frames(
            df, every_n=2, on_error="null"
        ).collect()
        assert [(r["media_id"], r["frame_no"]) for r in out] == [(1, 0), (1, 2)]
        want = self._model(pal, (10, 12), 2, frames)
        feats = decode_image_features(
            sample_video_frames(df.where("media_id = 1"), every_n=2)
            .select("media_id", F.col("frame_payload").alias("payload")),
            id_col="media_id",
        ).collect()
        assert len(feats) == 2
        for r, exp in zip(feats, (want[0], want[2])):
            gray8 = exp.astype(np.float32).mean(axis=2) / 255.0
            # decode path resizes to 8x8; compare against the same resize
            from pgvecto_rs_spark.operators.multimodal import _resize_nn

            assert np.allclose(r["feature"], _resize_nn(gray8, 8, 8).reshape(-1),
                               atol=1e-6)


class TestBmpDecode:
    """BMP decode: BI_RGB 1/4/8/24/32 bpp (4-byte row padding,
    bottom-up and top-down), BI_RLE8 (runs, absolute runs, EOL/EOF
    escapes, deltas), BGRA palettes."""

    @staticmethod
    def _bmp(px_rgb=None, idxs=None, palette=None, bpp=24, top_down=False,
             rle=False):
        import struct

        import numpy as np

        if px_rgb is not None:
            h, w = px_rgb.shape[:2]
        else:
            h, w = idxs.shape
        pal_bytes = b""
        ncol = 0
        if palette is not None:
            ncol = len(palette)
            bgra = np.zeros((ncol, 4), np.uint8)
            bgra[:, :3] = palette[:, ::-1]  # RGB -> BGR
            pal_bytes = bgra.tobytes()
        if rle:
            # encode each storage row: pairs of (count, value) runs,
            # one absolute run in the middle rows, EOL per row, EOF
            body = bytearray()
            order = idxs if top_down else idxs[::-1]
            for y in range(h):
                row = order[y]
                if y % 2 == 1 and w >= 3:
                    body += bytes([1, int(row[0])])
                    nabs = min(w - 1, 4)
                    body += bytes([0, nabs]) + bytes(int(v) for v in row[1 : 1 + nabs])
                    if nabs & 1:
                        body += b"\x00"
                    x = 1 + nabs
                    while x < w:
                        run = 1
                        while x + run < w and row[x + run] == row[x] and run < 255:
                            run += 1
                        body += bytes([run, int(row[x])])
                        x += run
                else:
                    x = 0
                    while x < w:
                        run = 1
                        while x + run < w and row[x + run] == row[x] and run < 255:
                            run += 1
                        body += bytes([run, int(row[x])])
                        x += run
                body += b"\x00\x00"  # EOL
            body += b"\x00\x01"  # EOF
            data = bytes(body)
            comp = 1
        else:
            comp = 0
            stride = ((w * bpp + 31) // 32) * 4
            rows = []
            src = (px_rgb if px_rgb is not None else idxs)
            order = src if top_down else src[::-1]
            for y in range(h):
                if bpp == 24:
                    b = order[y][:, ::-1].astype(np.uint8).tobytes()
                elif bpp == 32:
                    r4 = np.zeros((w, 4), np.uint8)
                    r4[:, :3] = order[y][:, ::-1]
                    b = r4.tobytes()
                elif bpp == 8:
                    b = order[y].astype(np.uint8).tobytes()
                else:  # 1 / 4 bpp palette
                    bits = (
                        (order[y][:, None].astype(np.uint8)
                         >> np.arange(bpp - 1, -1, -1)[None, :]) & 1
                    ).reshape(-1).astype(np.uint8)
                    b = np.packbits(bits).tobytes()
                rows.append(b + b"\x00" * (stride - len(b)))
            data = b"".join(rows)
        dib = struct.pack(
            "<IiiHHIIiiII", 40, w, (-h if top_down else h), 1, bpp, comp,
            len(data), 2835, 2835, ncol, 0,
        )
        off = 14 + 40 + len(pal_bytes)
        head = b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
        return head + dib + pal_bytes + data

    def test_truecolor_24_32(self):
        import numpy as np

        from pgvecto_rs_spark.operators.multimodal import _decode_bmp

        rng = np.random.default_rng(31)
        px = rng.integers(0, 256, (9, 7, 3), dtype=np.uint8)
        want = px.astype(np.float32).mean(axis=2) / 255.0
        for bpp in (24, 32):
            for td in (False, True):
                got = _decode_bmp(self._bmp(px_rgb=px, bpp=bpp, top_down=td))
                assert np.allclose(got, want), (bpp, td)

    def test_palette_depths(self):
        import numpy as np

        from pgvecto_rs_spark.operators.multimodal import _decode_bmp

        rng = np.random.default_rng(32)
        for bpp in (1, 4, 8):
            ncol = 1 << bpp
            pal = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
            idxs = rng.integers(0, ncol, (6, 11), dtype=np.uint8)
            want = pal[idxs].astype(np.float32).mean(axis=2) / 255.0
            got = _decode_bmp(self._bmp(idxs=idxs, palette=pal, bpp=bpp))
            assert np.allclose(got, want), bpp

    def test_rle8(self):
        import numpy as np

        from pgvecto_rs_spark.operators.multimodal import _decode_bmp

        rng = np.random.default_rng(33)
        pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
        # runs + noise: exercises encoded runs, absolute runs, EOLs
        idxs = np.repeat(rng.integers(0, 256, (8, 4), dtype=np.uint8), 3, axis=1)
        idxs[3] = rng.integers(0, 256, 12, dtype=np.uint8)
        want = pal[idxs].astype(np.float32).mean(axis=2) / 255.0
        for td in (False, True):
            got = _decode_bmp(
                self._bmp(idxs=idxs, palette=pal, bpp=8, rle=True, top_down=td)
            )
            assert np.allclose(got, want), td

    def test_through_spark_and_sniffing(self, spark):
        import numpy as np

        from pgvecto_rs_spark.operators.multimodal import (
            attach_media_metadata,
            decode_image_features,
        )

        rng = np.random.default_rng(34)
        px = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
        df = spark.createDataFrame(
            [(1, "image", bytearray(self._bmp(px_rgb=px)))],
            "media_id long, kind string, payload binary",
        )
        assert attach_media_metadata(df).collect()[0]["sniffed_mime"] == "image/bmp"
        feats = decode_image_features(df).collect()
        want = px.astype(np.float32).mean(axis=2) / 255.0
        assert np.allclose(feats[0]["feature"], want.reshape(-1), atol=1e-6)

    def test_malformed_rejected(self):
        import numpy as np
        import pytest

        from pgvecto_rs_spark.operators.multimodal import _decode_bmp

        px = np.zeros((4, 4, 3), dtype=np.uint8)
        good = self._bmp(px_rgb=px)
        for bad in (b"BMshort", good[:30], good[:-10], b"XX" + good[2:]):
            with pytest.raises((ValueError, NotImplementedError)):
                _decode_bmp(bad)

    @staticmethod
    def _bmp_core(px_rgb=None, idxs=None, palette=None, bpp=24):
        """BITMAPCOREHEADER (dib=12) fixture: u16 dims, bottom-up,
        3-byte BGR palette triples."""
        import struct

        import numpy as np

        if px_rgb is not None:
            h, w = px_rgb.shape[:2]
        else:
            h, w = idxs.shape
        pal_bytes = b""
        if palette is not None:
            pal_bytes = palette[:, ::-1].astype(np.uint8).tobytes()  # RGB->BGR
        stride = ((w * bpp + 31) // 32) * 4
        rows = []
        src = px_rgb if px_rgb is not None else idxs
        for y in range(h - 1, -1, -1):  # bottom-up
            if bpp == 24:
                b = src[y][:, ::-1].astype(np.uint8).tobytes()
            elif bpp == 8:
                b = src[y].astype(np.uint8).tobytes()
            else:
                bits = (
                    (src[y][:, None].astype(np.uint8)
                     >> np.arange(bpp - 1, -1, -1)[None, :]) & 1
                ).reshape(-1).astype(np.uint8)
                b = np.packbits(bits).tobytes()
            rows.append(b + b"\x00" * (stride - len(b)))
        data = b"".join(rows)
        dib = struct.pack("<IHHHH", 12, w, h, 1, bpp)
        off = 14 + 12 + len(pal_bytes)
        head = b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
        return head + dib + pal_bytes + data

    def test_core_header(self):
        """OS/2 BITMAPCOREHEADER: 24 bpp truecolor and 8 bpp palette
        (3-byte palette entries) decode; previously rejected."""
        import numpy as np

        from pgvecto_rs_spark.operators.multimodal import _decode_bmp

        rng = np.random.default_rng(35)
        px = rng.integers(0, 256, (5, 9, 3), dtype=np.uint8)
        want = px.astype(np.float32).mean(axis=2) / 255.0
        assert np.allclose(_decode_bmp(self._bmp_core(px_rgb=px)), want)
        pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
        idxs = rng.integers(0, 256, (6, 7), dtype=np.uint8)
        want = pal[idxs].astype(np.float32).mean(axis=2) / 255.0
        got = _decode_bmp(self._bmp_core(idxs=idxs, palette=pal, bpp=8))
        assert np.allclose(got, want)

    @staticmethod
    def _bmp16(vals16, masks=None, bpp=16, top_down=False):
        """16/32bpp fixture: BI_RGB (masks None) or BI_BITFIELDS."""
        import struct

        import numpy as np

        h, w = vals16.shape
        comp = 0 if masks is None else 3
        nb = bpp // 8
        stride = ((w * bpp + 31) // 32) * 4
        rows = []
        order = vals16 if top_down else vals16[::-1]
        for y in range(h):
            b = order[y].astype("<u2" if nb == 2 else "<u4").tobytes()
            rows.append(b + b"\x00" * (stride - len(b)))
        data = b"".join(rows)
        mask_bytes = b"" if masks is None else struct.pack("<III", *masks)
        dib = struct.pack(
            "<IiiHHIIiiII", 40, w, (-h if top_down else h), 1, bpp, comp,
            len(data), 2835, 2835, 0, 0,
        )
        off = 14 + 40 + len(mask_bytes)
        head = b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
        return head + dib + mask_bytes + data

    def test_16bpp_rgb555(self):
        """BI_RGB 16 bpp is X1R5G5B5 by spec; previously rejected."""
        import numpy as np

        from pgvecto_rs_spark.operators.multimodal import _decode_bmp

        rng = np.random.default_rng(36)
        v = rng.integers(0, 1 << 15, (6, 5), dtype=np.uint16)
        r = ((v >> 10) & 31) * 255 // 31
        g = ((v >> 5) & 31) * 255 // 31
        b = (v & 31) * 255 // 31
        want = np.stack([r, g, b], axis=2).astype(np.float32).mean(axis=2) / 255.0
        for td in (False, True):
            got = _decode_bmp(self._bmp16(v, top_down=td))
            assert np.allclose(got, want), td

    def test_bitfields_565_and_32(self):
        """BI_BITFIELDS: the ubiquitous R5G6B5 and a 32bpp mask set."""
        import numpy as np

        from pgvecto_rs_spark.operators.multimodal import _decode_bmp

        rng = np.random.default_rng(37)
        v = rng.integers(0, 1 << 16, (4, 7), dtype=np.uint16)
        r = ((v >> 11) & 31) * 255 // 31
        g = ((v >> 5) & 63) * 255 // 63
        b = (v & 31) * 255 // 31
        want = np.stack([r, g, b], axis=2).astype(np.float32).mean(axis=2) / 255.0
        got = _decode_bmp(self._bmp16(v, masks=(0xF800, 0x07E0, 0x001F)))
        assert np.allclose(got, want)
        # 32 bpp 8-8-8 masks reproduce the pixels exactly
        v32 = rng.integers(0, 1 << 24, (4, 3), dtype=np.uint32)
        r = (v32 >> 16) & 255
        g = (v32 >> 8) & 255
        b = v32 & 255
        want = np.stack([r, g, b], axis=2).astype(np.float32).mean(axis=2) / 255.0
        got = _decode_bmp(
            self._bmp16(v32, masks=(0xFF0000, 0x00FF00, 0x0000FF), bpp=32)
        )
        assert np.allclose(got, want)

    def test_bitfields_bad_inputs_rejected(self):
        import numpy as np
        import pytest

        from pgvecto_rs_spark.operators.multimodal import _decode_bmp

        v = np.zeros((2, 2), dtype=np.uint16)
        good = self._bmp16(v, masks=(0xF800, 0x07E0, 0x001F))
        with pytest.raises(ValueError):
            _decode_bmp(good[:60])  # truncated masks/pixels
