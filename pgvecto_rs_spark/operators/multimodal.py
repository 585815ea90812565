"""Multimodal (image/audio/video) column handling for training-data
pipelines.

Design: media travels as an opaque ``binary`` payload column plus a
typed metadata struct; every transform is an Arrow-batched
``mapInPandas`` operator so bytes never round-trip through Python row
objects one at a time, and partition sizing (``target_batch_bytes``)
keeps executor memory bounded at 100 TB.

Codec layer: formats decodable without external libraries are REAL —
PPM (P6) images decode and resize in numpy; PNG decodes via stdlib
zlib + numpy scanline unfiltering (every legal color-type x bit-depth
pair, plain and Adam7-interlaced); GIF87a/89a decodes via a pure
variable-width LZW (global/local palettes, row interlace, animation
compositing); BMP decodes BI_RGB 1/4/8/24/32 bpp + BI_RLE8; JPEG —
baseline AND progressive (SOF2) — decodes via ``operators.jpeg``
(pure numpy Huffman + IDCT, 4:4:4/4:2:2/4:2:0, restart markers); WAV
audio decodes via an own RIFF walk (integer PCM 8/16/24/32, IEEE
float 32/64, G.711 mu-law/A-law, WAVE_FORMAT_EXTENSIBLE) with numpy
spectral features; and MJPEG AVI video frame-samples via a stdlib
RIFF walk (``operators.video``).  MP4 (ISO BMFF) is REAL at the
CONTAINER level (``operators.mp4``): the full ``moov/stbl`` sample
index — per-sample dts/pts, byte extents, keyframes, codec/geometry,
avcC parameter sets — parses exactly, so frame *sampling* slices
genuine AVC access units out of mdat (``index_video_samples`` /
``sample_video_frames``), and since r9 the KEYFRAME subset decodes to
real pixels too: ``decode_video_keyframes`` runs the from-spec
constrained-baseline H.264 IDR decoder (``operators.h264`` — CAVLC,
all intra modes, exact integer transforms) over each sync sample.
Only INTER-frame (P/B) pixel decode still needs ffmpeg — absent from
this runtime — and raises ``NotImplementedError`` unless a
deterministic fake is requested.  The Spark-side contract — schemas,
batching, UDF signatures, partitioning — is identical either way, so
swapping in a compiled codec later touches only the ``_decode_*``
functions.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_SCHEMA",
    "attach_media_metadata",
    "decode_image_features",
    "decode_audio_channel_stats",
    "decode_audio_features",
    "decode_audio_stats",
    "audio_hashes_df",
    "audio_neardup_pairs",
    "decode_video_keyframes",
    "extract_video_captions",
    "extract_audio_tags",
    "image_hashes_df",
    "image_neardup_pairs",
    "index_audio_frames",
    "index_audio_pages",
    "index_video_samples",
    "resize_images",
    "sample_video_frames",
    "video_keyframe_hashes",
    "video_neardup_pairs",
]

# media payload + typed metadata convention
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)


def _decode_ppm(payload: bytes) -> np.ndarray:
    """PPM (P6) decode, pure numpy: 'P6\\n<w> <h>\\n<maxval>\\n<rgb bytes>'.
    Returns float32 grayscale HxW in [0, 1]."""
    parts = payload.split(maxsplit=4)
    if len(parts) < 4 or parts[0] != b"P6":
        raise ValueError("not a P6 ppm")
    w, h, maxval = int(parts[1]), int(parts[2]), int(parts[3])
    raw = payload[-w * h * 3 :]
    rgb = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3).astype(np.float32)
    return rgb.mean(axis=2) / float(maxval)


# Adam7 interlace passes: (x_start, y_start, x_step, y_step) — PNG
# spec 8.2.  Each pass is an independently-filtered sub-image.
_ADAM7_PASSES = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_unfilter(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filtering: ``h`` rows of
    [filter_type | ``stride`` bytes], where ``bpp`` is the filter's
    byte distance to the pixel to the left (ceil(channels*depth/8),
    min 1 — PNG spec 9.2).  Returns the reconstructed (h, stride)
    uint8 byte array; sample unpacking (sub-byte depths, 16-bit) is
    the caller's job.

    None (0) / Up (2) are whole-row numpy ops (uint8 addition wraps
    mod 256 by definition); Sub (1) is a per-channel cumulative sum
    mod 256, exact in int64 then masked.  Average (3) / Paeth (4) are
    per-byte sequential by definition (each byte needs the
    reconstructed left neighbor through a >>1 / min — no prefix-sum
    form), so they run as Python-list loops: scalar list ops are ~15x
    faster than the numpy-scalar indexing this used previously."""
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    ftypes = arr[:, 0]
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ft = int(ftypes[y])
        raw_row = arr[y, 1:]
        if ft == 0:
            out[y] = raw_row
        elif ft == 1:  # Sub: cumsum over pixels within each byte lane
            ch = raw_row.astype(np.int64).reshape(-1, bpp)
            out[y] = (np.cumsum(ch, axis=0) & 0xFF).astype(np.uint8).reshape(stride)
        elif ft == 2:  # Up
            out[y] = raw_row + (out[y - 1] if y else 0)
        elif ft == 3:  # Average
            rec = raw_row.tolist()
            prev = out[y - 1].tolist() if y else [0] * stride
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                rec[x] = (rec[x] + ((a + prev[x]) >> 1)) & 0xFF
            out[y] = rec
        elif ft == 4:  # Paeth
            rec = raw_row.tolist()
            prev = out[y - 1].tolist() if y else [0] * stride
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (rec[x] + pr) & 0xFF
            out[y] = rec
        else:
            raise ValueError(f"png: bad filter type {ft}")
    return out


def _png_subimage(raw: bytes, h: int, w: int, nch: int, depth: int) -> np.ndarray:
    """Unfilter + unpack one (sub-)image: returns (h, w, nch) samples —
    uint8 for depths 1/2/4/8, uint16 for depth 16.  Scanlines are
    ceil(w*nch*depth/8) bytes; sub-byte rows pad to a byte boundary
    (PNG spec 7.2) and the pad bits are discarded here."""
    sl_bytes = (w * nch * depth + 7) // 8
    bpp = max(1, (nch * depth + 7) // 8)
    if len(raw) != h * (sl_bytes + 1):
        raise ValueError("png: IDAT length does not match dimensions")
    out = _png_unfilter(raw, h, sl_bytes, bpp)
    if depth == 8:
        return out.reshape(h, w, nch)
    if depth == 16:
        wide = (out[:, 0::2].astype(np.uint16) << 8) | out[:, 1::2]
        return wide.reshape(h, w, nch)
    # depths 1/2/4: MSB-first bit groups, row-padded to whole bytes
    bits = np.unpackbits(out, axis=1)[:, : w * nch * depth]
    groups = bits.reshape(h, w * nch, depth).astype(np.uint8)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    return (groups * weights[None, None, :]).sum(axis=2, dtype=np.uint8).reshape(
        h, w, nch
    )


# legal (color type -> bit depths) combinations, PNG spec table 11.1
_PNG_DEPTHS = {
    0: (1, 2, 4, 8, 16),
    2: (8, 16),
    3: (1, 2, 4, 8),
    4: (8, 16),
    6: (8, 16),
}


def _decode_png(payload: bytes) -> np.ndarray:
    """PNG decode, stdlib zlib + numpy — a REAL compressed-image codec
    (no external imaging library): chunk walk -> inflate IDAT ->
    per-scanline unfilter (types 0-4) -> float32 grayscale in [0, 1].
    Supports every legal (color type, bit depth) combination of the
    spec — gray 1/2/4/8/16, RGB 8/16, palette 1/2/4/8, gray+alpha and
    RGBA 8/16 — both non-interlaced and Adam7-interlaced (7
    independently-filtered passes scattered back; interlace and
    sub-byte depths are the web-crawl long tail, same rationale as
    progressive JPEG).  Sub/Average/Paeth unfiltering is per-pixel
    sequential by definition (each byte depends on the reconstructed
    left neighbor) — correctness over speed here; bulk image pipelines
    at scale would swap in a compiled codec at this function boundary
    exactly as the module docstring describes."""
    import struct
    import zlib

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a png")
    pos = 8
    idat = b""
    palette = None
    w = h = depth = ctype = interlace = None
    while pos + 8 <= len(payload):
        ln, typ = struct.unpack(">I4s", payload[pos : pos + 8])
        pos += 8
        data = payload[pos : pos + ln]
        pos += ln + 4  # skip CRC
        if typ == b"IHDR":
            if len(data) < 13:
                raise ValueError("png: truncated IHDR")
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data[:13]
            )
        elif typ == b"PLTE":
            palette = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
    if w is None:
        raise ValueError("png: missing IHDR")
    if interlace not in (0, 1):
        raise NotImplementedError(f"png: unknown interlace method {interlace}")
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if nch is None:
        raise ValueError(f"png: bad color type {ctype}")
    if depth not in _PNG_DEPTHS[ctype]:
        raise ValueError(f"png: illegal depth {depth} for color type {ctype}")
    try:
        raw = zlib.decompress(idat)
    except zlib.error as e:
        raise ValueError(f"png: corrupt IDAT stream ({e})") from e
    if interlace == 0:
        px = _png_subimage(raw, h, w, nch, depth)
    else:  # Adam7: 7 independently-filtered sub-images, scattered back
        px = np.zeros((h, w, nch), dtype=np.uint16 if depth == 16 else np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7_PASSES:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            need = ph * (((pw * nch * depth + 7) // 8) + 1)
            sub = raw[off : off + need]
            off += need
            px[y0::dy, x0::dx] = _png_subimage(sub, ph, pw, nch, depth)
        if off != len(raw):
            raise ValueError("png: IDAT length does not match dimensions")
    if ctype == 3:
        if palette is None:
            raise ValueError("png: palette image without PLTE")
        if px.size and int(px[:, :, 0].max()) >= len(palette):
            raise ValueError("png: palette index out of range")
        px = palette[px[:, :, 0]]  # palette entries are 8-bit RGB
        nch = 3
        maxv = 255.0
    else:
        maxv = float((1 << depth) - 1)
    if nch >= 3:
        return px[:, :, :3].astype(np.float32).mean(axis=2) / np.float32(maxv)
    return px[:, :, 0].astype(np.float32) / np.float32(maxv)


# GIF row-interlace passes (GIF89a spec appendix E): row starts/steps
_GIF_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _gif_lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> list[int]:
    """GIF variable-width LZW decompression (GIF89a appendix F).
    Returns exactly ``n_pixels`` palette indices or raises ValueError.
    Per-code Python loop — same correctness-over-speed stance as the
    PNG Paeth unfilter; the compiled-codec swap boundary is
    ``_decode_gif``."""
    if not 2 <= min_code_size <= 11:
        raise ValueError("gif: bad LZW minimum code size")
    clear = 1 << min_code_size
    eoi = clear + 1
    out: list[int] = []
    # bit reader over the concatenated sub-block data (LSB-first)
    acc = 0
    nbits = 0
    pos = 0
    width = min_code_size + 1
    table: list[list[int]] = [[i] for i in range(clear)] + [[], []]
    prev: list[int] | None = None
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                raise ValueError("gif: truncated LZW stream")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [[i] for i in range(clear)] + [[], []]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("gif: bad first LZW code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("gif: LZW code out of range")
        out.extend(entry)
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
        if len(out) >= n_pixels:
            break
    if len(out) < n_pixels:
        raise ValueError("gif: LZW stream ended short of the image")
    return out[:n_pixels]


def _gif_frames(payload: bytes):
    """Yield (frame_no, composited full-canvas RGB uint8 array) for a
    GIF87a/89a still or animation, stdlib-free pure Python + numpy:
    variable-width LZW per image block, optional 4-pass row
    de-interlace, graphic-control-extension transparency, and disposal
    methods 0/1 (leave), 2 (restore background), 3 (restore previous)
    — GIF89a spec 23.  The canvas starts as the background color (or
    black when the screen has no global color table), a documented
    deterministic choice where renderers differ."""
    import struct

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a gif")
    if len(payload) < 13:
        raise ValueError("gif: truncated header")
    sw, sh, packed, bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    if sw == 0 or sh == 0:
        raise ValueError("gif: empty logical screen")
    pos = 13
    gct = None
    if packed & 0x80:
        ncol = 2 << (packed & 0x07)
        end = pos + 3 * ncol
        if end > len(payload):
            raise ValueError("gif: truncated global color table")
        gct = np.frombuffer(payload[pos:end], dtype=np.uint8).reshape(ncol, 3)
        pos = end
    bg_rgb = (
        gct[bg] if gct is not None and bg < len(gct) else np.zeros(3, np.uint8)
    )
    canvas = np.empty((sh, sw, 3), dtype=np.uint8)
    canvas[:] = bg_rgb
    disposal = 0
    transparent: int | None = None
    frame_no = 0

    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            return
        if block == 0x21:  # extension: label + sub-blocks
            if pos >= len(payload):
                raise ValueError("gif: truncated extension")
            label = payload[pos]
            p = pos + 1
            first = True
            while True:
                if p >= len(payload):
                    raise ValueError("gif: truncated sub-blocks")
                ln = payload[p]
                p += 1
                if ln == 0:
                    break
                if label == 0xF9 and first and ln >= 4:
                    gpacked = payload[p]
                    disposal = (gpacked >> 2) & 0x7
                    transparent = payload[p + 3] if gpacked & 1 else None
                first = False
                p += ln
            pos = p
            continue
        if block != 0x2C:
            raise ValueError(f"gif: unexpected block 0x{block:02x}")
        if pos + 9 > len(payload):
            raise ValueError("gif: truncated image descriptor")
        left, top, w, h, ipacked = struct.unpack("<HHHHB", payload[pos : pos + 9])
        pos += 9
        if w == 0 or h == 0:
            raise ValueError("gif: empty image")
        if left + w > sw or top + h > sh:
            raise ValueError("gif: image escapes the logical screen")
        pal = gct
        if ipacked & 0x80:  # local color table
            ncol = 2 << (ipacked & 0x07)
            end = pos + 3 * ncol
            if end > len(payload):
                raise ValueError("gif: truncated local color table")
            pal = np.frombuffer(payload[pos:end], dtype=np.uint8).reshape(ncol, 3)
            pos = end
        if pal is None:
            raise ValueError("gif: image without a color table")
        if pos >= len(payload):
            raise ValueError("gif: missing LZW code size")
        min_code = payload[pos]
        pos += 1
        chunks = []
        while True:
            if pos >= len(payload):
                raise ValueError("gif: truncated image data")
            ln = payload[pos]
            pos += 1
            if ln == 0:
                break
            chunks.append(payload[pos : pos + ln])
            pos += ln
        idx = np.asarray(
            _gif_lzw_decode(min_code, b"".join(chunks), w * h), dtype=np.int64
        )
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("gif: palette index out of range")
        rows = idx.reshape(h, w)
        if ipacked & 0x40:  # 4-pass row interlace
            out_rows = np.zeros_like(rows)
            r = 0
            for start, step in _GIF_INTERLACE:
                for y in range(start, h, step):
                    out_rows[y] = rows[r]
                    r += 1
            rows = out_rows
        prev_canvas = canvas.copy() if disposal == 3 else None
        region = canvas[top : top + h, left : left + w]
        rgb = pal[rows]
        if transparent is not None:
            mask = rows != transparent
            region[mask] = rgb[mask]
        else:
            region[:] = rgb
        yield frame_no, canvas.copy()
        frame_no += 1
        if disposal == 2:
            canvas[top : top + h, left : left + w] = bg_rgb
        elif disposal == 3 and prev_canvas is not None:
            canvas = prev_canvas
        disposal = 0
        transparent = None
    raise ValueError("gif: missing trailer")


def _decode_gif(payload: bytes) -> np.ndarray:
    """GIF87a/89a decode (first composited frame) -> float32 grayscale
    in [0, 1].  Later frames of an animation are sampling territory
    (``sample_video_frames`` handles GIF payloads), like MJPEG."""
    for _no, canvas in _gif_frames(payload):
        return canvas.astype(np.float32).mean(axis=2) / 255.0
    raise ValueError("gif: no image block")


def _gif_lzw_encode(min_code_size: int, indices) -> bytes:
    """GIF variable-width LZW compression — the encoder twin of
    ``_gif_lzw_decode``, used to synthesize real GIF fixtures without
    an imaging library (same role as ``jpeg.encode_jpeg``).  The
    decoder completes each table entry one code later than the encoder
    creates it, so the width grows at next_code == (1<<width)+1."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    res = bytearray()
    acc = nbits = 0
    width = min_code_size + 1

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            res.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear)
    prev: tuple = ()
    for px in indices:
        cand = prev + (int(px),)
        if cand in table:
            prev = cand
            continue
        emit(table[prev])
        table[cand] = next_code
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code == 4096:  # table full: reset mid-stream
            emit(clear)
            table = {(i,): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        prev = (int(px),)
    if prev:
        emit(table[prev])
    emit(eoi)
    if nbits:
        res.append(acc & 0xFF)
    return bytes(res)


def encode_gif(
    indices: np.ndarray,
    palette: np.ndarray,
    interlace: bool = False,
    local_palette: bool = False,
    version: bytes = b"GIF89a",
) -> bytes:
    """Encode an (h, w) palette-index image + (n, 3) palette to a real
    single-frame GIF (variable-width LZW, optional 4-pass row
    interlace, global or local color table)."""
    import struct

    idxs = np.asarray(indices, dtype=np.uint8)
    palette = np.asarray(palette, dtype=np.uint8).reshape(-1, 3)
    h, w = idxs.shape
    ncol = len(palette)
    size_bits = 0
    while (2 << size_bits) < ncol:
        size_bits += 1
    pal = np.zeros((2 << size_bits, 3), dtype=np.uint8)
    pal[:ncol] = palette
    out = bytearray(version)
    out += struct.pack(
        "<HHBBB", w, h, 0 if local_palette else (0x80 | size_bits), 0, 0
    )
    if not local_palette:
        out += pal.tobytes()
    ipacked = (0x40 if interlace else 0) | (
        (0x80 | size_bits) if local_palette else 0
    )
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, ipacked)
    if local_palette:
        out += pal.tobytes()
    rows = idxs
    if interlace:
        order: list[int] = []
        for start, step in _GIF_INTERLACE:
            order.extend(range(start, h, step))
        rows = idxs[order]
    min_code = max(2, size_bits + 1)
    data = _gif_lzw_encode(min_code, rows.reshape(-1).tolist())
    out.append(min_code)
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def encode_gif_animation(
    frames: "list[dict]",
    palette: np.ndarray,
    screen_hw: tuple[int, int],
    bg_index: int = 0,
) -> bytes:
    """Encode a multi-frame GIF89a animation for fixtures.  Each frame
    is a dict: ``indices`` (h, w) palette indices, optional ``left`` /
    ``top`` placement (default 0), ``disposal`` (0/1/2/3, default 0),
    ``transparent`` index (default None), ``delay_cs`` (default 4).
    One global color table; every frame gets a graphic control
    extension."""
    import struct

    palette = np.asarray(palette, dtype=np.uint8).reshape(-1, 3)
    ncol = len(palette)
    size_bits = 0
    while (2 << size_bits) < ncol:
        size_bits += 1
    pal = np.zeros((2 << size_bits, 3), dtype=np.uint8)
    pal[:ncol] = palette
    sh, sw = screen_hw
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", sw, sh, 0x80 | size_bits, bg_index, 0)
    out += pal.tobytes()
    min_code = max(2, size_bits + 1)
    for fr in frames:
        idxs = np.asarray(fr["indices"], dtype=np.uint8)
        h, w = idxs.shape
        transparent = fr.get("transparent")
        gpacked = ((fr.get("disposal", 0) & 0x7) << 2) | (
            1 if transparent is not None else 0
        )
        out += b"\x21\xf9\x04" + struct.pack(
            "<BHB", gpacked, fr.get("delay_cs", 4),
            transparent if transparent is not None else 0,
        ) + b"\x00"
        out += b"\x2c" + struct.pack(
            "<HHHHB", fr.get("left", 0), fr.get("top", 0), w, h, 0
        )
        data = _gif_lzw_encode(min_code, idxs.reshape(-1).tolist())
        out.append(min_code)
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def _decode_bmp(payload: bytes) -> np.ndarray:
    """BMP decode (pure numpy): BITMAPINFOHEADER-family DIBs (40/52/
    56/108/124-byte headers share the first 40 bytes) plus the OS/2
    BITMAPCOREHEADER (dib=12, u16 dims, 3-byte palette triples);
    BI_RGB at 1/4/8/16(X1R5G5B5)/24/32 bpp with 4-byte row padding,
    BI_RLE8, BI_BITFIELDS (arbitrary 16/32 bpp masks — 565 is the wild
    norm), bottom-up and top-down rows, BGRA palettes.  Returns
    float32 grayscale in [0, 1]."""
    # 26 = file header + BITMAPCOREHEADER, the smallest legal DIB
    if payload[:2] != b"BM" or len(payload) < 26:
        raise ValueError("not a bmp")
    (data_off,) = struct.unpack("<I", payload[10:14])
    (dib,) = struct.unpack("<I", payload[14:18])
    if dib < 40:
        if dib != 12:
            raise ValueError(f"bmp: unknown DIB header size {dib}")
        # BITMAPCOREHEADER (OS/2 1.x): u16 dims, always bottom-up,
        # BI_RGB only, 3-byte RGB palette triples
        w, h, _planes, bpp = struct.unpack("<HHHH", payload[18:26])
        comp, clr_used, top_down, core = 0, 0, False, True
        w, h = int(w), int(h)
    else:
        if len(payload) < 54:
            raise ValueError("bmp: truncated BITMAPINFOHEADER")
        w, h, _planes, bpp, comp, _imgsz = struct.unpack("<iiHHII", payload[18:38])
        (clr_used,) = struct.unpack("<I", payload[46:50])
        top_down = h < 0
        h = abs(h)
        core = False
    if w <= 0 or h == 0:
        raise ValueError("bmp: bad dimensions")
    palette = None
    if bpp <= 8:
        entry = 3 if core else 4  # core palettes are BGR, later BGRA
        ncol = clr_used or (1 << bpp)
        pal_off = 14 + dib
        raw_pal = payload[pal_off : pal_off + entry * ncol]
        if len(raw_pal) < entry * ncol:
            raise ValueError("bmp: truncated palette")
        bgrx = np.frombuffer(raw_pal, dtype=np.uint8).reshape(ncol, entry)
        palette = bgrx[:, [2, 1, 0]].copy()  # BGR(A|void) -> RGB
    data = payload[data_off:]
    if comp == 0:  # BI_RGB
        stride = ((w * bpp + 31) // 32) * 4
        if len(data) < stride * h:
            raise ValueError("bmp: truncated pixel data")
        rows = np.frombuffer(data[: stride * h], dtype=np.uint8).reshape(h, stride)
        if not top_down:
            rows = rows[::-1]
        if bpp == 24:
            px = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR->RGB
        elif bpp == 32:
            px = rows[:, : w * 4].reshape(h, w, 4)[:, :, [2, 1, 0]]
        elif bpp == 16:
            # BI_RGB 16 bpp is X1R5G5B5 little-endian by spec
            pair = rows[:, : w * 2].reshape(h, w, 2).astype(np.uint16)
            v = pair[:, :, 0] | (pair[:, :, 1] << 8)
            px = np.stack(
                [
                    (((v >> 10) & 31) * 255 // 31),
                    (((v >> 5) & 31) * 255 // 31),
                    ((v & 31) * 255 // 31),
                ],
                axis=2,
            ).astype(np.uint8)
        elif bpp == 8:
            px = palette[rows[:, :w]]
        elif bpp in (1, 4):
            bits = np.unpackbits(rows, axis=1)[:, : w * bpp]
            groups = bits.reshape(h, w, bpp).astype(np.uint8)
            weights = (1 << np.arange(bpp - 1, -1, -1)).astype(np.uint8)
            idx = (groups * weights[None, None, :]).sum(axis=2, dtype=np.uint8)
            if int(idx.max(initial=0)) >= len(palette):
                raise ValueError("bmp: palette index out of range")
            px = palette[idx]
        else:
            raise NotImplementedError(f"bmp: {bpp} bpp BI_RGB not supported")
    elif comp == 1:  # BI_RLE8
        if bpp != 8:
            raise ValueError("bmp: BI_RLE8 requires 8 bpp")
        idx = np.zeros((h, w), dtype=np.uint8)
        x = y = p = 0
        n = len(data)
        while True:
            if p + 2 > n:
                raise ValueError("bmp: truncated RLE stream")
            cnt, val = data[p], data[p + 1]
            p += 2
            if cnt:  # encoded run
                if x + cnt > w or y >= h:
                    raise ValueError("bmp: RLE run escapes row")
                idx[y, x : x + cnt] = val
                x += cnt
            elif val == 0:  # end of line
                x, y = 0, y + 1
            elif val == 1:  # end of bitmap
                break
            elif val == 2:  # delta
                if p + 2 > n:
                    raise ValueError("bmp: truncated RLE delta")
                x += data[p]
                y += data[p + 1]
                p += 2
                if x > w or y > h:
                    raise ValueError("bmp: RLE delta escapes image")
            else:  # absolute run, word-aligned
                if x + val > w or y >= h:
                    raise ValueError("bmp: RLE absolute run escapes row")
                if p + val > n:
                    raise ValueError("bmp: truncated RLE absolute run")
                idx[y, x : x + val] = np.frombuffer(
                    data[p : p + val], dtype=np.uint8
                )
                x += val
                p += val + (val & 1)
        if int(idx.max(initial=0)) >= len(palette):
            raise ValueError("bmp: palette index out of range")
        # RLE rows are encoded in storage order: bottom-up unless the
        # height was negative
        px = palette[idx if top_down else idx[::-1]]
    elif comp == 3:  # BI_BITFIELDS — arbitrary RGB masks (565 is the wild norm)
        if bpp not in (16, 32):
            raise ValueError("bmp: BI_BITFIELDS requires 16 or 32 bpp")
        # dib 40: the three masks FOLLOW the header; dib >= 52/56/108/124
        # carries them at the same byte positions inside the header
        if len(payload) < 14 + 40 + 12:
            raise ValueError("bmp: truncated bitfields masks")
        masks = struct.unpack("<III", payload[54:66])
        stride = ((w * bpp + 31) // 32) * 4
        if len(data) < stride * h:
            raise ValueError("bmp: truncated pixel data")
        rows = np.frombuffer(data[: stride * h], dtype=np.uint8).reshape(h, stride)
        if not top_down:
            rows = rows[::-1]
        nb = bpp // 8
        b0 = rows[:, : w * nb].reshape(h, w, nb).astype(np.uint32)
        v = b0[:, :, 0]
        for k in range(1, nb):
            v = v | (b0[:, :, k] << (8 * k))
        chans = []
        for m in masks:
            if m == 0:
                chans.append(np.zeros((h, w), dtype=np.uint8))
                continue
            shift = (m & -m).bit_length() - 1
            top = m >> shift
            if top == 0 or top > 0xFFFF:
                raise ValueError("bmp: bad bitfields mask")
            chans.append((((v >> shift) & top) * 255 // top).astype(np.uint8))
        px = np.stack(chans, axis=2)
    else:
        raise NotImplementedError(f"bmp: compression {comp} not supported")
    return px[:, :, :3].astype(np.float32).mean(axis=2) / 255.0


def _resize_nn(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize, pure numpy."""
    ys = (np.arange(out_h) * img.shape[0] // out_h).clip(0, img.shape[0] - 1)
    xs = (np.arange(out_w) * img.shape[1] // out_w).clip(0, img.shape[1] - 1)
    return img[ys[:, None], xs[None, :]]


def _decode_image_bytes(payload: bytes, fake: bool) -> np.ndarray:
    """Codec boundary.  PPM (P6), PNG (plain + Adam7), GIF, and JPEG
    (baseline + progressive) decode for real (numpy + stdlib — see
    ``operators.jpeg``); anything else raises unless ``fake=True``
    derives a deterministic 8x8 gray image from the payload bytes
    (pipelines stay testable end-to-end)."""
    try:
        if payload[:2] == b"P6":
            return _resize_nn(_decode_ppm(payload), 8, 8)
        if payload[:8] == b"\x89PNG\r\n\x1a\n":
            return _resize_nn(_decode_png(payload), 8, 8)
        if payload[:6] in (b"GIF87a", b"GIF89a"):
            return _resize_nn(_decode_gif(payload), 8, 8)
        if payload[:2] == b"BM":
            return _resize_nn(_decode_bmp(payload), 8, 8)
        if payload[:2] == b"\xff\xd8":
            from .jpeg import decode_jpeg

            return _resize_nn(decode_jpeg(payload), 8, 8)
    except Exception:
        if not fake:
            raise
    else:
        if not fake:
            raise NotImplementedError(
                "unrecognized image format: supply PPM (P6), PNG, GIF, BMP, "
                "or JPEG payloads, or use fake=True"
            )
    h = np.frombuffer(payload[:64].ljust(64, b"\0"), dtype=np.uint8).astype(np.float32)
    return h.reshape(8, 8) / 255.0


def _g711_luts() -> tuple[np.ndarray, np.ndarray]:
    """(mu-law, A-law) 256-entry decode tables to linear int16 —
    canonical CCITT G.711 expansion."""
    mu = np.empty(256, dtype=np.int64)
    al = np.empty(256, dtype=np.int64)
    for i in range(256):
        u = ~i & 0xFF
        t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
        mu[i] = (0x84 - t) if (u & 0x80) else (t - 0x84)
        a = i ^ 0x55
        s = (a & 0x0F) << 4
        seg = (a & 0x70) >> 4
        if seg == 0:
            s += 8
        elif seg == 1:
            s += 0x108
        else:
            s = (s + 0x108) << (seg - 1)
        al[i] = s if (a & 0x80) else -s
    return mu, al


_MULAW_LUT, _ALAW_LUT = _g711_luts()


def _decode_wav(payload: bytes) -> tuple[np.ndarray, int, int, int]:
    """WAV decode (own RIFF walk, numpy): returns (mono float64
    waveform in [-1, 1], sample_rate, sample_width_bytes, n_channels).

    Formats: PCM (tag 1; 8/16/24/32-bit), IEEE float (tag 3; 32/64),
    G.711 mu-law / A-law (tags 7/6), and WAVE_FORMAT_EXTENSIBLE
    (tag 0xFFFE) wrapping any of those — the real-corpus audio
    container zoo; anything else raises NotImplementedError.

    The returned width drives integer-exact consumers
    (``_pcm_int_samples``): bytes-per-sample for PCM, 2 for the G.711
    codecs (they expand to exact int16), and 0 for float formats
    (samples are not exact at any integer scale).  A 16-bit clip whose
    samples all happen to be multiples of 256 (quiet/quantized audio,
    including -32768) would be mis-scaled by any content-based
    inference — the header decides."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("wav: not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (ln,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + ln]
        if len(body) < ln:
            raise ValueError("wav: truncated chunk")
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + ln + (ln & 1)  # RIFF chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("wav: missing fmt/data chunk")
    if len(fmt) < 16:
        raise ValueError("wav: truncated fmt chunk")
    tag, channels, rate, _br, _ba, bits = struct.unpack("<HHIIHH", fmt[:16])
    if tag == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE: real tag leads the GUID
        if len(fmt) < 26:
            raise ValueError("wav: truncated extensible fmt chunk")
        (tag,) = struct.unpack("<H", fmt[24:26])
    if channels < 1 or rate < 1:
        raise ValueError("wav: bad fmt fields")
    if tag == 1:  # integer PCM
        width = bits // 8
        if bits == 8:
            x = (np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
        elif bits == 16:
            n = len(data) // 2
            x = np.frombuffer(data[: 2 * n], dtype="<i2").astype(np.float64) / 32768.0
        elif bits == 24:
            n = len(data) // 3
            b = np.frombuffer(data[: 3 * n], dtype=np.uint8).reshape(n, 3).astype(np.int64)
            v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
            v -= (v >> 23) << 24  # sign-extend
            x = v.astype(np.float64) / float(1 << 23)
        elif bits == 32:
            n = len(data) // 4
            x = np.frombuffer(data[: 4 * n], dtype="<i4").astype(np.float64) / float(1 << 31)
        else:
            raise NotImplementedError(f"{bits}-bit PCM WAV not supported")
    elif tag == 3:  # IEEE float
        width = 0  # not integer-exact at any scale
        if bits == 32:
            n = len(data) // 4
            x = np.frombuffer(data[: 4 * n], dtype="<f4").astype(np.float64)
        elif bits == 64:
            n = len(data) // 8
            x = np.frombuffer(data[: 8 * n], dtype="<f8").astype(np.float64)
        else:
            raise NotImplementedError(f"{bits}-bit float WAV not supported")
        x = np.clip(x, -1.0, 1.0)
    elif tag in (6, 7):  # G.711 A-law / mu-law
        if bits not in (0, 8):
            raise ValueError("wav: G.711 requires 8-bit samples")
        lut = _ALAW_LUT if tag == 6 else _MULAW_LUT
        x = lut[np.frombuffer(data, dtype=np.uint8)].astype(np.float64) / 32768.0
        width = 2  # expands to exact int16
    else:
        raise NotImplementedError(f"wav: format tag {tag} not supported")
    if channels > 1:
        frames = len(x) // channels
        x = x[: frames * channels].reshape(-1, channels).mean(axis=1)
    return x, rate, width, channels


def _pcm_int_samples(x: np.ndarray, width: int, channels: int) -> np.ndarray:
    """Exact integer PCM samples from the [-1, 1] float waveform, scale
    chosen by the HEADER sample width (width==1 -> s/128, else
    s/2^(8*width-1); G.711 decodes report width 2 and are exact at
    32768).  Float WAVs report width 0 and are rejected — their samples
    are not exact at any integer scale.  Multi-channel clips are
    rejected: the mean downmix of integer channel samples need not be
    an integer at that scale, which would silently break the
    integer-exact oracle contract."""
    if channels > 1:
        raise NotImplementedError(
            "integer-exact audio stats require mono PCM; "
            f"got {channels} channels (downmixed means are not integers)"
        )
    if width < 1:
        raise NotImplementedError(
            "integer-exact audio stats require integer PCM (float WAV given)"
        )
    scale = 128.0 if width == 1 else float(1 << (8 * width - 1))
    s = x * scale
    return np.rint(s).astype(np.int64)


def _decode_audio_bytes(payload: bytes) -> tuple[np.ndarray, int, int, int]:
    """Audio codec boundary: WAV (RIFF zoo, ``_decode_wav``) or FLAC
    (``operators.flac`` — lossless, bit-exact PCM).  Same return
    contract as ``_decode_wav``: (mono float64 in [-1, 1], rate,
    header_width_bytes, channels).  For byte-aligned FLAC bps
    (8/16/24/32 — the wild norm) the reported width makes
    ``_pcm_int_samples``' scale 2^(bps-1), recovering the decoded
    integers exactly; odd bps (12/20) reports width 0 — not exact at
    any byte-width scale, same policy as float WAVs."""
    if payload[:4] == b"fLaC":
        from .flac import decode_flac

        s, rate, bps = decode_flac(payload)
        nch = s.shape[1] if s.ndim == 2 else 1
        x = s.astype(np.float64).mean(axis=1) / float(1 << (bps - 1))
        width = bps // 8 if bps % 8 == 0 else 0
        return x, rate, width, nch
    return _decode_wav(payload)


def attach_media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Cheap metadata pass: payload size + magic-byte sniffing, fully
    native (no decode)."""
    p = F.col(payload_col)
    magic = F.hex(F.substring(p, 1, 4))
    mime = (
        F.when(magic.startswith("FFD8"), F.lit("image/jpeg"))
        .when(magic.startswith("89504E47"), F.lit("image/png"))
        .when(magic.startswith("47494638"), F.lit("image/gif"))
        .when(magic.startswith("424D"), F.lit("image/bmp"))
        .when(magic.startswith("52494646"), F.lit("audio/wav"))
        .when(magic.startswith("664C6143"), F.lit("audio/flac"))
        .when(
            F.hex(F.substring(p, 5, 4)) == "66747970", F.lit("video/mp4")
        )  # ISO BMFF: 'ftyp' at byte 5
        .otherwise(F.lit("application/octet-stream"))
    )
    return df.withColumn("payload_bytes", F.length(p)).withColumn("sniffed_mime", mime)


def decode_image_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    fake: bool = False,
    on_error: str = "raise",
) -> DataFrame:
    """(id, feature vector) per image: decode -> 8x8 gray -> 64-dim
    feature (flattened), as a mapInPandas batch operator.  Output
    feature column is ``array<float>`` — directly indexable by the ANN
    layer (the batch-embedding north star).

    ``on_error``: "raise" (default) propagates decode errors and fails
    the task — right for curated corpora where corruption means a bug;
    "null" emits a NULL feature for malformed payloads (the codecs'
    documented ValueError / NotImplementedError only) so web-scale
    ingest survives the corrupt rows every real crawl contains —
    filter ``feature IS NOT NULL`` downstream."""
    return df.mapInPandas(*decode_image_features_op(payload_col, id_col, fake, on_error))


def decode_image_features_op(
    payload_col: str = "payload",
    id_col: str = "media_id",
    fake: bool = False,
    on_error: str = "raise",
) -> tuple:
    """(batch_fn, schema) behind :func:`decode_image_features` —
    exposed (r13, guide §4) so fused synth+decode stages can run the
    identical batch function in the task that built the payload."""
    if on_error not in ("raise", "null"):
        raise ValueError(f"on_error must be 'raise' or 'null', got {on_error!r}")
    out_schema = f"{id_col} bigint, feature array<float>"
    skip = on_error == "null"

    def op(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(b):
            if b is None:
                return None
            if skip:
                try:
                    return _decode_image_bytes(bytes(b), fake).reshape(-1).tolist()
                except (ValueError, NotImplementedError):
                    return None
            return _decode_image_bytes(bytes(b), fake).reshape(-1).tolist()

        for pdf in it:
            feats = [one(b) for b in pdf[payload_col]]
            yield pd.DataFrame({id_col: pdf[id_col].astype("int64"), "feature": feats})

    return op, out_schema


def decode_audio_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    on_error: str = "raise",
) -> DataFrame:
    """(id, duration_ms, sample_rate, feature): REAL PCM WAV decode
    (stdlib wave + numpy) producing a 16-dim spectral feature — rms,
    zero-crossing rate, and 14 log-energy FFT bands — as a mapInPandas
    batch operator.  The feature column is array<float>, directly
    indexable by the ANN layer.  ``on_error``: "raise" (default) fails
    the task on a malformed payload; "null" drops the row (same
    semantics as a NULL payload), so web-scale ingest survives corrupt
    clips."""
    if on_error not in ("raise", "null"):
        raise ValueError(f"on_error must be 'raise' or 'null', got {on_error!r}")
    out_schema = f"{id_col} bigint, duration_ms int, sample_rate int, feature array<float>"
    skip = on_error == "null"

    def op(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, durs, rates, feats = [], [], [], []
            for mid, b in zip(pdf[id_col], pdf[payload_col]):
                if b is None:
                    continue
                try:
                    x, rate, _w, _c = _decode_audio_bytes(bytes(b))
                except (ValueError, NotImplementedError):
                    if skip:
                        continue
                    raise
                n = len(x)
                rms = float(np.sqrt(np.mean(x**2))) if n else 0.0
                zcr = float(np.mean(np.abs(np.diff(np.sign(x))) > 0)) if n > 1 else 0.0
                spec = np.abs(np.fft.rfft(x, n=max(n, 2)))
                bands = np.array_split(spec, 14)
                band_e = [float(np.log1p(np.sum(band**2))) for band in bands]
                ids.append(int(mid))
                durs.append(int(1000 * n / rate) if rate else 0)
                rates.append(int(rate))
                feats.append([rms, zcr] + band_e)
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "duration_ms": pd.Series(durs, dtype="int32"),
                    "sample_rate": pd.Series(rates, dtype="int32"),
                    # dtype=object: an all-dropped batch would otherwise
                    # type the empty column float64, which Arrow cannot
                    # convert to array<float>
                    "feature": pd.Series(feats, dtype="object"),
                }
            )

    return df.mapInPandas(op, out_schema)


def decode_audio_stats(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """(id, sample_rate, n_samples, duration_ms, energy, zero_crossings):
    REAL PCM WAV decode reduced to *exact integer* statistics, so the
    whole decode path is verifiable against a SQL oracle with no
    floating-point tolerance.  For 8/16-bit PCM the waveform values are
    dyadic rationals (``s / 128`` or ``s / 32768``), so the integer
    sample ``s`` is recovered exactly by rounding and ``energy``
    (sum of s^2) and ``zero_crossings`` (strict sign flips,
    s[i]*s[i+1] < 0) are order-independent integer reductions — the
    multimodal analogue of the repo's scaled-integer aggregation
    discipline.  mapInPandas batch operator, same contract as
    decode_audio_features."""
    return df.mapInPandas(*decode_audio_stats_op(payload_col, id_col))


def decode_audio_stats_op(
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> tuple:
    """(batch_fn, schema) behind :func:`decode_audio_stats` — exposed
    (r13, guide §4) so fused synth+decode stages can run the identical
    batch function in the task that built the payload."""
    out_schema = (
        f"{id_col} bigint, sample_rate int, n_samples bigint, "
        "duration_ms int, energy bigint, zero_crossings bigint"
    )

    def op(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, rates, ns, durs, es, zcs = [], [], [], [], [], []
            for mid, b in zip(pdf[id_col], pdf[payload_col]):
                if b is None:
                    continue
                x, rate, width, channels = _decode_audio_bytes(bytes(b))
                # exact integer reconstruction with the scale read from
                # the WAV header (8-bit: s/128, 16-bit: s/32768) — never
                # inferred from content, which mis-scales quiet 16-bit
                # clips whose samples are all multiples of 256
                s = _pcm_int_samples(x, width, channels)
                ids.append(int(mid))
                rates.append(int(rate))
                ns.append(int(x.size))
                durs.append(int(1000 * x.size / rate) if rate else 0)
                es.append(int(np.dot(s, s)))
                zcs.append(int(np.count_nonzero(s[:-1] * s[1:] < 0)))
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "sample_rate": pd.Series(rates, dtype="int32"),
                    "n_samples": pd.Series(ns, dtype="int64"),
                    "duration_ms": pd.Series(durs, dtype="int32"),
                    "energy": pd.Series(es, dtype="int64"),
                    "zero_crossings": pd.Series(zcs, dtype="int64"),
                }
            )

    return op, out_schema


def decode_audio_channel_stats(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Per-CHANNEL exact integer stats for lossless audio payloads:
    (id, channel, sample_rate, n_samples, energy, zero_crossings).

    FLAC only (for now): ``decode_flac`` yields the decoded integers
    directly, so per-channel energy (sum s^2) and strict sign-flip
    zero crossings are exact with no float round-trip — unlike
    :func:`decode_audio_stats`, which downmixes to mono through the
    shared WAV float contract.  This is the oracle surface for the
    stereo-decorrelation + LPC decode paths (left/side, right/side,
    mid/side frames reconstruct L and R bit-exactly).  Non-FLAC
    payloads raise ValueError (same codec-boundary contract as the
    decoders); NULL payloads are skipped.  mapInPandas Arrow batches,
    one output row per (clip, channel)."""
    return df.mapInPandas(*decode_audio_channel_stats_op(payload_col, id_col))


def decode_audio_channel_stats_op(
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> tuple:
    """(batch_fn, schema) behind :func:`decode_audio_channel_stats` —
    exposed (r13, guide §4) so fused synth+decode stages can run the
    identical batch function in the task that built the payload."""
    from .flac import decode_flac, is_flac

    out_schema = (
        f"{id_col} bigint, channel int, sample_rate int, n_samples bigint, "
        "energy bigint, zero_crossings bigint"
    )

    def op(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, chs, rates, ns, es, zcs = [], [], [], [], [], []
            for mid, b in zip(pdf[id_col], pdf[payload_col]):
                if b is None:
                    continue
                b = bytes(b)
                if not is_flac(b):
                    raise ValueError(
                        "decode_audio_channel_stats: FLAC payload required"
                    )
                s, rate, _bps = decode_flac(b)
                for c in range(s.shape[1]):
                    col = s[:, c].astype(np.int64)
                    ids.append(int(mid))
                    chs.append(c)
                    rates.append(int(rate))
                    ns.append(int(col.size))
                    # exact Python-int sum: int64 np.dot wraps for
                    # 24/32-bit samples (2^62 per term)
                    es.append(sum(v * v for v in col.tolist()))
                    zcs.append(int(np.count_nonzero(col[:-1] * col[1:] < 0)))
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "channel": pd.Series(chs, dtype="int32"),
                    "sample_rate": pd.Series(rates, dtype="int32"),
                    "n_samples": pd.Series(ns, dtype="int64"),
                    "energy": pd.Series(es, dtype="int64"),
                    "zero_crossings": pd.Series(zcs, dtype="int64"),
                }
            )

    return op, out_schema


def image_hashes_df(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    method: str = "ahash",
    fake: bool = False,
    on_error: str = "raise",
) -> DataFrame:
    """(__id, __sig): 64-bit perceptual hash per image, decoded through
    the REAL codec path (PPM/PNG/baseline JPEG -> 8x8 gray).  Both
    hashes are *integer-exact*: the integer gray level v in 0..255 is
    recovered exactly from the float32 feature (representation error
    < 1/510, under the rounding radius), and every bit is a strict
    integer comparison — so the whole fingerprint is replayable by a
    SQL oracle with no floating-point tolerance.

    - ``ahash`` (average hash): bit_i = 64*v_i > sum(v) — strict
      greater-than against the mean, cross-multiplied to stay integer.
    - ``dhash`` (difference hash, wraparound variant): bit[r,c] =
      v[r, (c+1) % 8] > v[r, c] over the 8x8 grid.  Classic dHash uses
      a 9-column resize; the decode contract is fixed at 8x8, so the
      row wraps instead — same gradient-sign idea, still 64 bits.

    Output feeds ``dedup.hamming_candidate_pairs`` (same banded
    pigeonhole join as SimHash text near-dup) — signatures are a
    per-row map, NO shuffle here.  ``on_error``: "raise" (default)
    fails on malformed payloads; "null" drops them (no signature, like
    a NULL payload) so web-scale near-dup ingest survives corrupt
    media."""
    return df.mapInPandas(*image_hashes_op(payload_col, id_col, method, fake, on_error))


def image_hashes_op(
    payload_col: str = "payload",
    id_col: str = "media_id",
    method: str = "ahash",
    fake: bool = False,
    on_error: str = "raise",
) -> tuple:
    """(batch_fn, schema) behind :func:`image_hashes_df` — exposed
    (r13, guide §4) so fused synth+hash stages can run the identical
    batch function in the task that built the payload."""
    if method not in ("ahash", "dhash"):
        raise ValueError(f"unknown image hash method: {method!r}")
    if on_error not in ("raise", "null"):
        raise ValueError(f"on_error must be 'raise' or 'null', got {on_error!r}")
    use_ahash = method == "ahash"
    skip = on_error == "null"
    weights = 1 << np.arange(64, dtype=np.uint64)

    def op(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, sigs = [], []
            for mid, b in zip(pdf[id_col], pdf[payload_col]):
                if b is None:
                    continue
                try:
                    g = _decode_image_bytes(bytes(b), fake)
                except (ValueError, NotImplementedError):
                    if skip:
                        continue
                    raise
                v = np.rint(g.astype(np.float64) * 255.0).astype(np.int64)
                if use_ahash:
                    bits = (64 * v.reshape(-1)) > v.sum()
                else:
                    bits = (np.roll(v, -1, axis=1) > v).reshape(-1)
                sig = int((bits.astype(np.uint64) * weights).sum(dtype=np.uint64))
                if sig >= 1 << 63:  # two's-complement into Spark's long
                    sig -= 1 << 64
                ids.append(int(mid))
                sigs.append(sig)
            yield pd.DataFrame(
                {
                    "__id": pd.Series(ids, dtype="int64"),
                    "__sig": pd.Series(sigs, dtype="int64"),
                }
            )

    return op, "__id bigint, __sig bigint"


def image_neardup_pairs(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    max_hamming: int = 3,
    method: str = "ahash",
    max_bucket: int = 1000,
    fake: bool = False,
    on_error: str = "raise",
) -> DataFrame:
    """(id_a, id_b, hamming): near-duplicate image pairs by perceptual
    hash — decode through the real codec path, 64-bit integer-exact
    aHash/dHash, then the shared banded-pigeonhole Hamming join
    (``dedup.hamming_candidate_pairs``: complete within ``max_hamming``,
    candidates confined to (band, key) buckets, exact verify inside the
    bucket).  The image analogue of SimHash text near-dup: at 100 TB the
    only shuffle is the band-key exchange on 64-bit signatures, never
    on pixels."""
    from .dedup import hamming_candidate_pairs

    sig = image_hashes_df(
        df,
        payload_col=payload_col,
        id_col=id_col,
        method=method,
        fake=fake,
        on_error=on_error,
    )
    return hamming_candidate_pairs(
        sig, max_hamming=max_hamming, max_bucket=max_bucket
    )


def audio_hashes_df(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    on_error: str = "raise",
) -> DataFrame:
    """(__id, __sig): 64-bit energy-profile fingerprint per audio clip,
    decoded through the REAL PCM WAV path.  The clip's integer samples
    (exactly recovered from the dyadic 8/16-bit PCM floats, same
    reconstruction as ``decode_audio_stats``) are partitioned into 64
    frames by ``frame(i) = i*64 // n``; bit_f is the strict integer
    comparison ``64 * energy_f > total_energy`` (cross-multiplied
    mean compare, the aHash discipline applied to the energy envelope).
    Every step is integer arithmetic, so the fingerprint is replayable
    by a SQL oracle with no floating-point tolerance.

    Output feeds ``dedup.hamming_candidate_pairs`` — the same banded
    pigeonhole join as SimHash text near-dup and perceptual-image
    near-dup; signatures are a per-row map, NO shuffle here.
    ``on_error``: "raise" (default) fails on malformed payloads;
    "null" drops them (no signature, like a NULL payload)."""
    return df.mapInPandas(*audio_hashes_op(payload_col, id_col, on_error))


def audio_hashes_op(
    payload_col: str = "payload",
    id_col: str = "media_id",
    on_error: str = "raise",
) -> tuple:
    """(batch_fn, schema) behind :func:`audio_hashes_df` — exposed
    (r13, guide §4) so fused synth+hash stages can run the identical
    batch function in the task that built the payload."""
    if on_error not in ("raise", "null"):
        raise ValueError(f"on_error must be 'raise' or 'null', got {on_error!r}")
    skip = on_error == "null"
    weights = 1 << np.arange(64, dtype=np.uint64)

    def op(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, sigs = [], []
            for mid, b in zip(pdf[id_col], pdf[payload_col]):
                if b is None:
                    continue
                try:
                    x, _rate, width, channels = _decode_audio_bytes(bytes(b))
                except (ValueError, NotImplementedError):
                    if skip:
                        continue
                    raise
                if x.size == 0:
                    continue
                s = _pcm_int_samples(x, width, channels)
                n = s.size
                f = (np.arange(n, dtype=np.int64) * 64) // n
                e = np.zeros(64, dtype=np.int64)
                np.add.at(e, f, s * s)
                bits = (64 * e) > e.sum()
                sig = int((bits.astype(np.uint64) * weights).sum(dtype=np.uint64))
                if sig >= 1 << 63:  # two's-complement into Spark's long
                    sig -= 1 << 64
                ids.append(int(mid))
                sigs.append(sig)
            yield pd.DataFrame(
                {
                    "__id": pd.Series(ids, dtype="int64"),
                    "__sig": pd.Series(sigs, dtype="int64"),
                }
            )

    return op, "__id bigint, __sig bigint"


def audio_neardup_pairs(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    max_hamming: int = 3,
    max_bucket: int = 1000,
    on_error: str = "raise",
) -> DataFrame:
    """(id_a, id_b, hamming): near-duplicate audio pairs by
    energy-envelope fingerprint — real WAV decode, integer-exact
    64-frame energy hash, then the shared banded-pigeonhole Hamming
    join (complete within ``max_hamming``, candidates confined to
    (band, key) buckets).  At 100 TB the only shuffle is the band-key
    exchange on 64-bit signatures, never on samples."""
    from .dedup import hamming_candidate_pairs

    sig = audio_hashes_df(df, payload_col=payload_col, id_col=id_col, on_error=on_error)
    return hamming_candidate_pairs(sig, max_hamming=max_hamming, max_bucket=max_bucket)


def resize_images(
    df: DataFrame,
    out_h: int,
    out_w: int,
    payload_col: str = "payload",
    id_col: str = "media_id",
    on_error: str = "raise",
) -> DataFrame:
    """(id, height, width, pixels): REAL PPM (P6) / PNG / baseline-JPEG
    decode + nearest-neighbor resize in numpy, emitting the resized
    grayscale raster as array<float> — the resize stage of a
    vision-training pipeline.  ``on_error``: "raise" (default) or
    "null" (drop malformed payloads, like NULL payloads)."""
    if on_error not in ("raise", "null"):
        raise ValueError(f"on_error must be 'raise' or 'null', got {on_error!r}")
    skip = on_error == "null"
    out_schema = f"{id_col} bigint, height int, width int, pixels array<float>"

    def op(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .jpeg import decode_jpeg

        for pdf in it:
            ids, pix = [], []
            for mid, b in zip(pdf[id_col], pdf[payload_col]):
                if b is None:
                    continue
                raw = bytes(b)
                try:
                    if raw[:8] == b"\x89PNG\r\n\x1a\n":
                        dec = _decode_png(raw)
                    elif raw[:2] == b"\xff\xd8":
                        dec = decode_jpeg(raw)
                    else:
                        dec = _decode_ppm(raw)
                except (ValueError, NotImplementedError):
                    if skip:
                        continue
                    raise
                img = _resize_nn(dec, out_h, out_w)
                ids.append(int(mid))
                pix.append(img.reshape(-1).astype(np.float32).tolist())
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "height": pd.Series([out_h] * len(ids), dtype="int32"),
                    "width": pd.Series([out_w] * len(ids), dtype="int32"),
                    "pixels": pix,
                }
            )

    return df.mapInPandas(op, out_schema)


def sample_video_frames(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    every_n: int = 10,
    fake: bool = False,
    on_error: str = "raise",
) -> DataFrame:
    """(id, frame_no, frame_payload): frame sampling.  MJPEG AVI
    payloads decode for REAL (stdlib RIFF walk, ``operators.video``) —
    each emitted frame_payload is an independent baseline JPEG — and so
    do animated GIFs: frames composite through disposal/transparency
    (``_gif_frames``) and each sampled full-canvas frame is emitted as
    a P6 PPM payload; either way ``decode_image_features`` consumes the
    output downstream.  MP4 (ISO BMFF) payloads frame-sample for REAL
    at the CONTAINER level (``operators.mp4`` sample tables): every
    ``every_n``-th sample's bytes are sliced out of mdat at its exact
    (offset, size) — each emitted frame_payload is a genuine AVC access
    unit, whose PIXEL decode (not extraction) is what still needs a
    compiled codec downstream.  Other containers raise unless
    ``fake=True`` treats the payload as concatenated 64-byte 'frames'.
    One input row fans out to n_frames/every_n rows; mapInPandas keeps
    the fan-out inside Arrow batches.  ``on_error``: "raise" (default)
    or "null" (drop malformed/unsupported payloads, like NULL
    payloads)."""
    return df.mapInPandas(
        *sample_video_frames_op(payload_col, id_col, every_n, fake, on_error)
    )


def sample_video_frames_op(
    payload_col: str = "payload",
    id_col: str = "media_id",
    every_n: int = 10,
    fake: bool = False,
    on_error: str = "raise",
) -> tuple:
    """(batch_fn, schema) behind :func:`sample_video_frames` — exposed
    (r13, guide §4) so fused synth+sample stages can run the identical
    batch function in the task that built the payload."""
    if on_error not in ("raise", "null"):
        raise ValueError(f"on_error must be 'raise' or 'null', got {on_error!r}")
    skip = on_error == "null"
    out_schema = f"{id_col} bigint, frame_no int, frame_payload binary"

    def op(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .mp4 import index_mp4_samples, is_mp4
        from .video import decode_avi_frames, is_avi

        for pdf in it:
            ids, frames, payloads = [], [], []
            for mid, b in zip(pdf[id_col], pdf[payload_col]):
                if b is None:
                    continue
                raw = bytes(b)
                if is_mp4(raw):
                    try:
                        samples = index_mp4_samples(raw)["samples"]
                    except (ValueError, NotImplementedError):
                        if skip:
                            continue
                        raise
                    for no, _dts, _pts, off, size, _kf in samples:
                        fno = no - 1
                        if fno % every_n == 0:
                            ids.append(int(mid))
                            frames.append(fno)
                            payloads.append(raw[off : off + size])
                    continue
                if is_avi(raw):
                    try:
                        avi_frames = decode_avi_frames(raw)
                    except (ValueError, NotImplementedError):
                        if skip:
                            continue
                        raise
                    for fno, jpeg in enumerate(avi_frames):
                        if fno % every_n == 0:
                            ids.append(int(mid))
                            frames.append(fno)
                            payloads.append(jpeg)
                    continue
                if raw[:6] in (b"GIF87a", b"GIF89a"):
                    got: list[tuple[int, bytes]] = []
                    try:
                        for fno, canvas in _gif_frames(raw):
                            if fno % every_n == 0:
                                fh, fw = canvas.shape[:2]
                                got.append((
                                    fno,
                                    f"P6\n{fw} {fh}\n255\n".encode()
                                    + canvas.tobytes(),
                                ))
                    except (ValueError, NotImplementedError):
                        if skip:
                            continue  # drop the whole payload, not half
                        raise
                    for fno, ppm in got:
                        ids.append(int(mid))
                        frames.append(fno)
                        payloads.append(ppm)
                    continue
                if not fake:
                    if skip:
                        continue
                    raise NotImplementedError(
                        "only MJPEG AVI, animated GIF and MP4 (container "
                        "level) sample without ffmpeg; use fake=True for "
                        "other containers"
                    )
                n_frames = max(1, len(raw) // 64)
                for fno in range(0, n_frames, every_n):
                    ids.append(int(mid))
                    frames.append(fno)
                    payloads.append(raw[fno * 64 : (fno + 1) * 64])
            yield pd.DataFrame(
                {id_col: pd.Series(ids, dtype="int64"), "frame_no": pd.Series(frames, dtype="int32"), "frame_payload": payloads}
            )

    return op, out_schema


def decode_video_keyframes(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    on_error: str = "raise",
) -> DataFrame:
    """REAL H.264 keyframe pixel decode for MP4 payloads: one row per
    IDR/sync sample with exact integer plane statistics.

    Completes the r8 container work end-to-end for the keyframe subset:
    ``operators.mp4`` resolves the sample tables AND the avcC record
    (out-of-band SPS/PPS + NAL length-prefix size, mp4.py
    ``_resolve_stbl``); each sync sample's bytes are sliced at their
    exact (offset, size) and decoded by ``operators.h264`` — CAVLC
    constrained-baseline I slices (I_4x4 / I_16x16 / I_PCM, all intra
    prediction modes, exact integer transforms).  Output: (id,
    sample_no, width, height, luma_sum, luma_min, luma_max, cb_sum,
    cr_sum) — all exact integers over the decoded planes, so oracles
    compare with zero tolerance.  Out-of-scope coding tools (CABAC,
    inter slices, deblocking-enabled streams, non-AVC codecs, missing
    avcC) raise NotImplementedError; structural corruption raises
    ValueError; ``on_error='null'`` drops those payloads whole — the
    uniform codec ingest policy.  mapInPandas Arrow batches; only the
    ~60-byte stat rows shuffle, never pixels."""
    if on_error not in ("raise", "null"):
        raise ValueError(f"on_error must be 'raise' or 'null', got {on_error!r}")
    skip = on_error == "null"
    out_schema = (
        f"{id_col} bigint, sample_no int, width int, height int, "
        "luma_sum bigint, luma_min int, luma_max int, "
        "cb_sum bigint, cr_sum bigint"
    )

    def op(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .h264 import decode_idr_frame
        from .mp4 import index_mp4_samples

        for pdf in it:
            rows: list[tuple] = []
            for mid, b in zip(pdf[id_col], pdf[payload_col]):
                if b is None:
                    continue
                raw = bytes(b)
                try:
                    idx = index_mp4_samples(raw)
                    if idx["avcc"] is None:
                        raise NotImplementedError(
                            "decode_video_keyframes: no avcC record "
                            f"(codec {idx['codec']!r})"
                        )
                    avcc = idx["avcc"]
                    if not avcc["sps"] or not avcc["pps"]:
                        raise ValueError("decode_video_keyframes: avcC "
                                         "carries no parameter sets")
                    got: list[tuple] = []
                    for no, _dts, _pts, off, size, kf in idx["samples"]:
                        if not kf:
                            continue
                        out = decode_idr_frame(
                            raw[off : off + size],
                            sps_bytes=avcc["sps"][0],
                            pps_bytes=avcc["pps"][0],
                            nal_length_size=avcc["nal_length_size"],
                        )
                        y, cb, cr = out["y"], out["cb"], out["cr"]
                        got.append((
                            int(mid), no, out["width"], out["height"],
                            int(y.astype(np.int64).sum()),
                            int(y.min()), int(y.max()),
                            int(cb.astype(np.int64).sum()),
                            int(cr.astype(np.int64).sum()),
                        ))
                except (ValueError, NotImplementedError):
                    if skip:
                        continue  # drop the whole payload, not half
                    raise
                rows.extend(got)
            cols = list(zip(*rows)) if rows else [[] for _ in range(9)]
            yield pd.DataFrame(
                {
                    id_col: pd.Series(cols[0], dtype="int64"),
                    "sample_no": pd.Series(cols[1], dtype="int32"),
                    "width": pd.Series(cols[2], dtype="int32"),
                    "height": pd.Series(cols[3], dtype="int32"),
                    "luma_sum": pd.Series(cols[4], dtype="int64"),
                    "luma_min": pd.Series(cols[5], dtype="int32"),
                    "luma_max": pd.Series(cols[6], dtype="int32"),
                    "cb_sum": pd.Series(cols[7], dtype="int64"),
                    "cr_sum": pd.Series(cols[8], dtype="int64"),
                }
            )

    return df.mapInPandas(op, out_schema)


def extract_video_captions(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    on_error: str = "raise",
) -> DataFrame:
    """(id, sample_no, dts, dur, text): 3GPP timed-text (tx3g) caption
    extraction from MP4 payloads — aligned text supervision is a
    first-class training-data source for video corpora, and it lives
    entirely at the container level (``operators.mp4``), no pixel
    decode involved.  dts/dur stay in the track's timescale units
    (exact integers); text is decoded UTF-8.  Payloads without a text
    track, or with a non-tx3g text entry, follow the uniform codec
    ``on_error`` policy (ValueError / NotImplementedError)."""
    return df.mapInPandas(*extract_video_captions_op(payload_col, id_col, on_error))


def extract_video_captions_op(
    payload_col: str = "payload",
    id_col: str = "media_id",
    on_error: str = "raise",
) -> tuple:
    """(batch_fn, schema) behind :func:`extract_video_captions` —
    exposed (r13, guide §4) so fused synth+extract stages can run the
    identical batch function in the task that built the payload."""
    if on_error not in ("raise", "null"):
        raise ValueError(f"on_error must be 'raise' or 'null', got {on_error!r}")
    skip = on_error == "null"
    out_schema = (
        f"{id_col} bigint, sample_no int, dts bigint, dur bigint, text string"
    )

    def op(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .mp4 import extract_mp4_text_samples

        for pdf in it:
            rows: list[tuple] = []
            for mid, b in zip(pdf[id_col], pdf[payload_col]):
                if b is None:
                    continue
                try:
                    txt = extract_mp4_text_samples(bytes(b))
                except (ValueError, NotImplementedError):
                    if skip:
                        continue
                    raise
                rows.extend(
                    (int(mid), no, dts, dur, text)
                    for no, dts, dur, text in txt["samples"]
                )
            cols = list(zip(*rows)) if rows else [[] for _ in range(5)]
            yield pd.DataFrame(
                {
                    id_col: pd.Series(cols[0], dtype="int64"),
                    "sample_no": pd.Series(cols[1], dtype="int32"),
                    "dts": pd.Series(cols[2], dtype="int64"),
                    "dur": pd.Series(cols[3], dtype="int64"),
                    "text": pd.Series(cols[4], dtype="object"),
                }
            )

    return op, out_schema


def index_audio_frames(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    on_error: str = "raise",
) -> DataFrame:
    """MP3 container-level frame index (``operators.mp3``): one row per
    MPEG Layer III frame with its exact byte extent and header-derived
    properties — (id, frame_no, offset, size, samples, bitrate_kbps,
    sample_rate, channels).  The audio analogue of
    ``index_video_samples``: segmentation, byte-range planning and
    quality filtering for a 100 TB audio corpus need exactly this and
    no PCM decode; only ~50-byte index rows shuffle.  ``on_error``
    follows the uniform codec ingest policy."""
    return df.mapInPandas(*index_audio_frames_op(payload_col, id_col, on_error))


def index_audio_frames_op(
    payload_col: str = "payload",
    id_col: str = "media_id",
    on_error: str = "raise",
) -> tuple:
    """(batch_fn, schema) behind :func:`index_audio_frames` — exposed
    (r13, guide §4) so fused synth+index stages can run the identical
    batch function in the task that built the payload."""
    if on_error not in ("raise", "null"):
        raise ValueError(f"on_error must be 'raise' or 'null', got {on_error!r}")
    skip = on_error == "null"
    out_schema = (
        f"{id_col} bigint, frame_no int, offset bigint, size bigint, "
        "samples int, bitrate_kbps int, sample_rate int, channels int"
    )

    def op(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .mp3 import index_mp3_frames

        for pdf in it:
            rows: list[tuple] = []
            for mid, b in zip(pdf[id_col], pdf[payload_col]):
                if b is None:
                    continue
                try:
                    idx = index_mp3_frames(bytes(b))
                except (ValueError, NotImplementedError):
                    if skip:
                        continue
                    raise
                rows.extend((int(mid),) + f for f in idx["frames"])
            cols = list(zip(*rows)) if rows else [[] for _ in range(8)]
            yield pd.DataFrame(
                {
                    id_col: pd.Series(cols[0], dtype="int64"),
                    "frame_no": pd.Series(cols[1], dtype="int32"),
                    "offset": pd.Series(cols[2], dtype="int64"),
                    "size": pd.Series(cols[3], dtype="int64"),
                    "samples": pd.Series(cols[4], dtype="int32"),
                    "bitrate_kbps": pd.Series(cols[5], dtype="int32"),
                    "sample_rate": pd.Series(cols[6], dtype="int32"),
                    "channels": pd.Series(cols[7], dtype="int32"),
                }
            )

    return op, out_schema


def index_audio_pages(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    on_error: str = "raise",
) -> DataFrame:
    """Ogg container page index (``operators.ogg``): one row per page
    with its exact byte extent, stream serial, granule position and
    BOS/EOS flags — (id, page_no, offset, size, serial, granule,
    n_packets, bos, eos).  Page CRCs are verified during the walk, so
    a green row set certifies byte-exact container integrity too.
    Same ~50-byte-rows-only shuffle shape as the MP3/MP4 indexes."""
    return df.mapInPandas(*index_audio_pages_op(payload_col, id_col, on_error))


def index_audio_pages_op(
    payload_col: str = "payload",
    id_col: str = "media_id",
    on_error: str = "raise",
) -> tuple:
    """(batch_fn, schema) behind :func:`index_audio_pages` — exposed
    (r13, guide §4) so fused synth+index stages can run the identical
    batch function in the task that built the payload."""
    if on_error not in ("raise", "null"):
        raise ValueError(f"on_error must be 'raise' or 'null', got {on_error!r}")
    skip = on_error == "null"
    out_schema = (
        f"{id_col} bigint, page_no int, offset bigint, size bigint, "
        "serial bigint, granule bigint, n_packets int, bos boolean, "
        "eos boolean"
    )

    def op(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .ogg import index_ogg_pages

        for pdf in it:
            rows: list[tuple] = []
            for mid, b in zip(pdf[id_col], pdf[payload_col]):
                if b is None:
                    continue
                try:
                    idx = index_ogg_pages(bytes(b))
                except (ValueError, NotImplementedError):
                    if skip:
                        continue
                    raise
                rows.extend((int(mid),) + p for p in idx["pages"])
            cols = list(zip(*rows)) if rows else [[] for _ in range(9)]
            yield pd.DataFrame(
                {
                    id_col: pd.Series(cols[0], dtype="int64"),
                    "page_no": pd.Series(cols[1], dtype="int32"),
                    "offset": pd.Series(cols[2], dtype="int64"),
                    "size": pd.Series(cols[3], dtype="int64"),
                    "serial": pd.Series(cols[4], dtype="int64"),
                    "granule": pd.Series(cols[5], dtype="int64"),
                    "n_packets": pd.Series(cols[6], dtype="int32"),
                    "bos": pd.Series(cols[7], dtype="bool"),
                    "eos": pd.Series(cols[8], dtype="bool"),
                }
            )

    return op, out_schema


def extract_audio_tags(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    on_error: str = "raise",
) -> DataFrame:
    """(id, tag, value): audio metadata straight from the container —
    ID3v2 text frames for MP3 payloads, OpusTags/VorbisComment entries
    (keys uppercased) for Ogg payloads — the title/artist/album/
    language metadata a curation pipeline mines for licensing filters,
    language routing and dedup keys.  ``on_error`` follows the uniform
    codec ingest policy; files whose container carries no tags yield
    no rows (absence is not an error)."""
    return df.mapInPandas(*extract_audio_tags_op(payload_col, id_col, on_error))


def extract_audio_tags_op(
    payload_col: str = "payload",
    id_col: str = "media_id",
    on_error: str = "raise",
) -> tuple:
    """(batch_fn, schema) behind :func:`extract_audio_tags` — exposed
    (r13, guide §4) so fused synth+extract stages can run the identical
    batch function in the task that built the payload."""
    if on_error not in ("raise", "null"):
        raise ValueError(f"on_error must be 'raise' or 'null', got {on_error!r}")
    skip = on_error == "null"
    out_schema = f"{id_col} bigint, tag string, value string"

    def op(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .mp3 import index_mp3_frames
        from .ogg import extract_opus_tags, is_ogg

        for pdf in it:
            rows: list[tuple] = []
            for mid, b in zip(pdf[id_col], pdf[payload_col]):
                if b is None:
                    continue
                raw = bytes(b)
                try:
                    if is_ogg(raw):
                        tags = extract_opus_tags(raw)["comments"]
                    else:
                        tags = index_mp3_frames(raw)["tags"]
                except (ValueError, NotImplementedError):
                    if skip:
                        continue
                    raise
                rows.extend((int(mid), k, v) for k, v in tags.items())
            cols = list(zip(*rows)) if rows else [[] for _ in range(3)]
            yield pd.DataFrame(
                {
                    id_col: pd.Series(cols[0], dtype="int64"),
                    "tag": pd.Series(cols[1], dtype="object"),
                    "value": pd.Series(cols[2], dtype="object"),
                }
            )

    return op, out_schema


def video_keyframe_hashes(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    on_error: str = "raise",
) -> DataFrame:
    """(id, sample_no, sig): 64-bit perceptual aHash per decoded H.264
    keyframe — the video leg of the shared fingerprint convention.

    Pipeline per MP4 payload: sample-table walk + avcC (operators.mp4)
    -> IDR pixel decode (operators.h264) -> luma plane nearest-neighbor
    resized to 8x8 -> the SAME aHash bit rule as ``image_hashes_df``
    (bit = 64*v > sum(v), row-major bit order, two's-complement into
    Spark's long), so video-frame signatures live in the same Hamming
    space as image signatures and reuse the same banded join engine.
    ``on_error`` follows the uniform codec ingest policy."""
    if on_error not in ("raise", "null"):
        raise ValueError(f"on_error must be 'raise' or 'null', got {on_error!r}")
    skip = on_error == "null"
    out_schema = f"{id_col} bigint, sample_no int, sig bigint"
    weights = 1 << np.arange(64, dtype=np.uint64)

    def op(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .h264 import decode_idr_frame
        from .mp4 import index_mp4_samples

        for pdf in it:
            ids, nos, sigs = [], [], []
            for mid, b in zip(pdf[id_col], pdf[payload_col]):
                if b is None:
                    continue
                raw = bytes(b)
                try:
                    idx = index_mp4_samples(raw)
                    avcc = idx["avcc"]
                    if avcc is None or not avcc["sps"] or not avcc["pps"]:
                        raise NotImplementedError(
                            "video_keyframe_hashes: no decodable avcC record"
                        )
                    got = []
                    for no, _dts, _pts, off, size, kf in idx["samples"]:
                        if not kf:
                            continue
                        out = decode_idr_frame(
                            raw[off : off + size],
                            sps_bytes=avcc["sps"][0],
                            pps_bytes=avcc["pps"][0],
                            nal_length_size=avcc["nal_length_size"],
                        )
                        v = _resize_nn(out["y"], 8, 8).astype(np.int64)
                        bits = (64 * v.reshape(-1)) > v.sum()
                        sig = int((bits.astype(np.uint64) * weights)
                                  .sum(dtype=np.uint64))
                        if sig >= 1 << 63:
                            sig -= 1 << 64
                        got.append((int(mid), no, sig))
                except (ValueError, NotImplementedError):
                    if skip:
                        continue
                    raise
                for mid_, no_, sig_ in got:
                    ids.append(mid_)
                    nos.append(no_)
                    sigs.append(sig_)
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "sample_no": pd.Series(nos, dtype="int32"),
                    "sig": pd.Series(sigs, dtype="int64"),
                }
            )

    return df.mapInPandas(op, out_schema)


def video_neardup_pairs(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    max_hamming: int = 2,
    min_matching_frames: int = 2,
    max_bucket: int = 1000,
    on_error: str = "raise",
) -> DataFrame:
    """Near-duplicate VIDEO pairs by keyframe perceptual hashes:
    (id_a, id_b, n_frames) where n_frames counts keyframe pairs within
    ``max_hamming`` of each other; pairs need at least
    ``min_matching_frames`` such matches.

    Scale shape (the 100 TB story): per-keyframe 64-bit signatures are
    the ONLY thing that leaves the decode stage (~16 bytes/frame — the
    video bytes never shuffle); frame pairs come from the shared
    banded-pigeonhole Hamming join (``dedup.hamming_candidate_pairs``,
    exact within the radius, bucket-confined — never all-pairs), and
    the video-level rollup is one tiny aggregation over frame-pair
    rows.  Frame identity is packed as ``id * 2^20 + sample_no``;
    sample_no >= 2^20 (a million keyframes in one file) raises rather
    than risking pair corruption."""
    hashes = video_keyframe_hashes(
        df, payload_col=payload_col, id_col=id_col, on_error=on_error
    )
    return video_pairs_from_keyframe_hashes(
        hashes,
        id_col=id_col,
        max_hamming=max_hamming,
        min_matching_frames=min_matching_frames,
        max_bucket=max_bucket,
    )


def video_pairs_from_keyframe_hashes(
    hashes: DataFrame,
    id_col: str = "media_id",
    max_hamming: int = 2,
    min_matching_frames: int = 2,
    max_bucket: int = 1000,
) -> DataFrame:
    """The signature-space tail of :func:`video_neardup_pairs`: takes
    (id, sample_no, sig) keyframe-hash rows — from
    :func:`video_keyframe_hashes` or a fused synth+decode+hash stage —
    and runs the identical banded-pigeonhole Hamming join + video-level
    rollup.  Split out (r13) so pipelines that already hold per-frame
    signatures skip a redundant decode stage without duplicating the
    pairing logic."""
    from .dedup import hamming_candidate_pairs

    cap = 1 << 20
    guarded = hashes.select(
        F.when(F.col("sample_no") < cap, F.col(id_col) * cap + F.col("sample_no"))
        .otherwise(F.raise_error("video_neardup_pairs: sample_no >= 2^20"))
        .alias("__id"),
        F.col("sig").alias("__sig"),
    )
    pairs = hamming_candidate_pairs(
        guarded, max_hamming=max_hamming, max_bucket=max_bucket
    )
    # integer division (float '/' loses exactness past 2^53)
    va = F.expr(f"id_a div {cap}")
    vb = F.expr(f"id_b div {cap}")
    return (
        pairs.select(
            F.least(va, vb).alias("id_a"), F.greatest(va, vb).alias("id_b")
        )
        .where(F.col("id_a") != F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_frames"))
        .where(F.col("n_frames") >= min_matching_frames)
    )


def index_video_samples(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    on_error: str = "raise",
) -> DataFrame:
    """Container-level MP4 sample index: one row per video sample with
    its exact decode/presentation timestamps, byte extent, and sync
    flag, straight from the ``moov/stbl`` tables (``operators.mp4``).

    Output: (id, sample_no, dts, pts, offset, size, keyframe, codec,
    width, height, timescale, duration) — dts/pts/duration in
    ``timescale`` units, offset/size in bytes into the payload.  All
    integers, so oracles compare value-exactly.

    This is the honest scale path for real web-video corpora: frame
    SELECTION (keyframes only, every Nth, time-range) and byte-range
    fetch planning need exactly this index and no pixel decode; the
    pixel step stays behind the documented ffmpeg seam.  Arrow-batched
    ``mapInPandas``, bytes never row-trip Python; the ~100-byte index
    rows are what shuffles, never the media.  ``on_error``: "raise"
    (default) or "null" (drop malformed payloads, like NULL payloads —
    the uniform ingest policy of every codec here)."""
    return df.mapInPandas(*index_video_samples_op(payload_col, id_col, on_error))


def index_video_samples_op(
    payload_col: str = "payload",
    id_col: str = "media_id",
    on_error: str = "raise",
) -> tuple:
    """(batch_fn, schema) behind :func:`index_video_samples` — exposed
    (r13, guide §4) so fused synth+index stages can run the identical
    batch function in the task that built the payload."""
    if on_error not in ("raise", "null"):
        raise ValueError(f"on_error must be 'raise' or 'null', got {on_error!r}")
    skip = on_error == "null"
    out_schema = (
        f"{id_col} bigint, sample_no int, dts bigint, pts bigint, "
        "offset bigint, size bigint, keyframe boolean, codec string, "
        "width int, height int, timescale bigint, duration bigint"
    )

    def op(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .mp4 import index_mp4_samples

        for pdf in it:
            rows: list[tuple] = []
            for mid, b in zip(pdf[id_col], pdf[payload_col]):
                if b is None:
                    continue
                try:
                    idx = index_mp4_samples(bytes(b))
                except (ValueError, NotImplementedError):
                    if skip:
                        continue
                    raise
                meta = (
                    idx["codec"], idx["width"], idx["height"],
                    idx["timescale"], idx["duration"],
                )
                rows.extend(
                    (int(mid), no, dts, pts, off, size, kf) + meta
                    for no, dts, pts, off, size, kf in idx["samples"]
                )
            cols = list(zip(*rows)) if rows else [[] for _ in range(12)]
            yield pd.DataFrame(
                {
                    id_col: pd.Series(cols[0], dtype="int64"),
                    "sample_no": pd.Series(cols[1], dtype="int32"),
                    "dts": pd.Series(cols[2], dtype="int64"),
                    "pts": pd.Series(cols[3], dtype="int64"),
                    "offset": pd.Series(cols[4], dtype="int64"),
                    "size": pd.Series(cols[5], dtype="int64"),
                    "keyframe": pd.Series(cols[6], dtype="bool"),
                    "codec": pd.Series(cols[7], dtype="object"),
                    "width": pd.Series(cols[8], dtype="int32"),
                    "height": pd.Series(cols[9], dtype="int32"),
                    "timescale": pd.Series(cols[10], dtype="int64"),
                    "duration": pd.Series(cols[11], dtype="int64"),
                }
            )

    return op, out_schema
