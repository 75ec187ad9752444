"""Pure-stdlib image codecs (PNG via zlib, BMP, PPM) + numpy resize.

The reference's stage-one runs a real model over real decoded bytes
(``ocr/paddle_extractor.py:21-34``); this container has no PIL/ffmpeg,
so these hand-rolled codecs make the image leg of the multimodal
pipeline genuinely end-to-end: real encoded payloads in the media
fixture, real header parse + pixel decode in ``MediaDecoder``, real
pixel resampling in ``ImageResizer``.  All arrays are ``uint8`` RGB
``(h, w, 3)``.

Format support (deliberately minimal but real):
- PNG: 8-bit, color types 0 (gray), 2 (RGB), 6 (RGBA, alpha dropped),
  non-interlaced, all five scanline filters on decode; encode emits
  filter 0 (None) scanlines.
- BMP: 24-bit uncompressed BI_RGB, bottom-up, 4-byte row padding.
- PPM: binary P6, maxval 255.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


# ---------------------------------------------------------------------------
# Sniffing + header-only size parse (cheap path for metadata stages)
# ---------------------------------------------------------------------------


def sniff(data: bytes) -> str | None:
    """'png' | 'bmp' | 'ppm' | None (not a supported real image)."""
    if data[:8] == _PNG_MAGIC:
        return "png"
    if data[:2] == b"BM":
        return "bmp"
    if data[:2] == b"P6":
        return "ppm"
    return None


def image_size(data: bytes) -> tuple[int, int]:
    """(width, height) from the header alone — no pixel decode."""
    fmt = sniff(data)
    if fmt == "png":
        if data[12:16] != b"IHDR":
            raise ValueError("PNG: missing IHDR")
        w, h = struct.unpack(">II", data[16:24])
        return int(w), int(h)
    if fmt == "bmp":
        w, h = struct.unpack("<ii", data[18:26])
        return int(w), int(abs(h))
    if fmt == "ppm":
        _, (w, h, _maxval), _ = _ppm_header(data)
        return w, h
    raise ValueError("not a supported image payload")


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """uint8 RGB (h, w, 3) → PNG bytes (filter 0 scanlines)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w, c = arr.shape
    if c != 3:
        raise ValueError("encode_png expects (h, w, 3) RGB")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    # one 0-filter byte per scanline, then raw RGB
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), arr.reshape(h, w * 3)], axis=1
    ).tobytes()
    return (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def _png_unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filtering.  ``raw`` is (h, 1 + stride) with
    the filter byte in column 0.  Sequential per scanline (the format's
    data dependency), vectorized within each line where possible."""
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ftype = int(raw[y, 0])
        line = raw[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y > 0 else np.zeros(stride, np.int32)
        if ftype == 0:  # None
            cur = line
        elif ftype == 1:  # Sub
            cur = line.copy()
            for x in range(bpp, stride):
                cur[x] = (cur[x] + cur[x - bpp]) & 0xFF
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype == 3:  # Average
            cur = line.copy()
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line.copy()
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                cc = prev[x - bpp] if x >= bpp else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                cur[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"PNG: unknown filter {ftype}")
        out[y] = cur.astype(np.uint8)
    return out


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 RGB (h, w, 3)."""
    if data[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG")
    pos, w = 8, 0
    h = bit_depth = color_type = interlace = 0
    idat = b""
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", body
            )
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if bit_depth != 8 or interlace != 0:
        raise ValueError("PNG: only 8-bit non-interlaced supported")
    channels = {0: 1, 2: 3, 6: 4}.get(color_type)
    if channels is None:
        raise ValueError(f"PNG: unsupported color type {color_type}")
    stride = w * channels
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG: bad IDAT length")
    px = _png_unfilter(raw.reshape(h, stride + 1), h, stride, channels)
    px = px.reshape(h, w, channels)
    if channels == 1:
        return np.repeat(px, 3, axis=2)
    return np.ascontiguousarray(px[:, :, :3])


# ---------------------------------------------------------------------------
# BMP (24-bit BI_RGB)
# ---------------------------------------------------------------------------


def encode_bmp(arr: np.ndarray) -> bytes:
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w, c = arr.shape
    if c != 3:
        raise ValueError("encode_bmp expects (h, w, 3) RGB")
    pad = (-(w * 3)) % 4
    row_bytes = w * 3 + pad
    img_size = row_bytes * h
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    # bottom-up rows, BGR order, padded to 4 bytes
    bgr = arr[::-1, :, ::-1]
    rows = np.concatenate(
        [bgr.reshape(h, w * 3), np.zeros((h, pad), dtype=np.uint8)], axis=1
    )
    return header + info + rows.tobytes()


def decode_bmp(data: bytes) -> np.ndarray:
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (offset,) = struct.unpack("<I", data[10:14])
    header_size, w, h = struct.unpack("<Iii", data[14:26])
    planes, bpp = struct.unpack("<HH", data[26:30])
    (compression,) = struct.unpack("<I", data[30:34])
    if bpp != 24 or compression != 0:
        raise ValueError("BMP: only 24-bit BI_RGB supported")
    flip = h > 0
    h = abs(h)
    pad = (-(w * 3)) % 4
    rows = np.frombuffer(
        data, dtype=np.uint8, count=h * (w * 3 + pad), offset=offset
    ).reshape(h, w * 3 + pad)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    rgb = bgr[:, :, ::-1]
    return np.ascontiguousarray(rgb[::-1] if flip else rgb)


# ---------------------------------------------------------------------------
# PPM (binary P6)
# ---------------------------------------------------------------------------


def _ppm_header(data: bytes):
    """Returns (magic, (w, h, maxval), pixel_offset), skipping comments."""
    pos = 2
    vals: list[int] = []
    while len(vals) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        vals.append(int(data[start:pos]))
    return data[:2], tuple(vals), pos + 1  # one whitespace after maxval


def encode_ppm(arr: np.ndarray) -> bytes:
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w, c = arr.shape
    if c != 3:
        raise ValueError("encode_ppm expects (h, w, 3) RGB")
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    if data[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    _, (w, h, maxval), off = _ppm_header(data)
    if maxval != 255:
        raise ValueError("PPM: only maxval 255 supported")
    px = np.frombuffer(data, dtype=np.uint8, count=h * w * 3, offset=off)
    return px.reshape(h, w, 3).copy()


# ---------------------------------------------------------------------------
# Dispatch + resize
# ---------------------------------------------------------------------------

_DECODERS = {"png": decode_png, "bmp": decode_bmp, "ppm": decode_ppm}


def decode_image(data: bytes) -> np.ndarray:
    fmt = sniff(data)
    if fmt is None:
        raise ValueError("not a supported image payload")
    return _DECODERS[fmt](data)


def resize_nn(arr: np.ndarray, new_w: int, new_h: int) -> np.ndarray:
    """Nearest-neighbor resample (vectorized index gather)."""
    h, w = arr.shape[:2]
    ys = (np.arange(new_h) * h // new_h).clip(0, h - 1)
    xs = (np.arange(new_w) * w // new_w).clip(0, w - 1)
    return np.ascontiguousarray(arr[ys[:, None], xs[None, :]])
