"""Stdlib image codecs (PNG/BMP/PPM) + the real multimodal image leg."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pandas as pd
import pytest

from ocr_poc_ray.functions import imagecodec as ic


@pytest.fixture(scope="module")
def rgb():
    return np.random.RandomState(0).randint(0, 256, size=(48, 64, 3), dtype=np.uint8)


@pytest.mark.parametrize("fmt", ["png", "bmp", "ppm"])
def test_roundtrip(rgb, fmt):
    enc = {"png": ic.encode_png, "bmp": ic.encode_bmp, "ppm": ic.encode_ppm}[fmt]
    dec = {"png": ic.decode_png, "bmp": ic.decode_bmp, "ppm": ic.decode_ppm}[fmt]
    data = enc(rgb)
    assert ic.sniff(data) == fmt
    assert ic.image_size(data) == (64, 48)
    out = dec(data)
    assert out.shape == rgb.shape and (out == rgb).all()
    assert (ic.decode_image(data) == rgb).all()


def test_resize_nn(rgb):
    r = ic.resize_nn(rgb, 32, 24)
    assert r.shape == (24, 32, 3)
    assert (r == rgb[::2, ::2]).all()  # exact 2x downsample = stride view
    assert ic.resize_nn(rgb, 13, 7).shape == (7, 13, 3)
    up = ic.resize_nn(rgb, 128, 96)
    assert up.shape == (96, 128, 3) and (up[::2, ::2] == rgb).all()


def test_png_up_filter_decode():
    """Decode a hand-crafted filter-2 (Up) PNG — encoders in the wild
    emit filtered scanlines; ours must reverse them."""
    h, w = 4, 5
    img = np.arange(h * w * 3, dtype=np.uint8).reshape(h, w * 3)
    lines = [np.concatenate(([0], img[0]))]
    for y in range(1, h):
        lines.append(
            np.concatenate(
                ([2], (img[y].astype(int) - img[y - 1].astype(int)) % 256)
            )
        )
    raw = np.concatenate(lines).astype(np.uint8).tobytes()

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert (ic.decode_png(png).reshape(h, w * 3) == img).all()


def test_png_gray_and_rgba():
    """Gray expands to RGB; RGBA drops alpha."""
    h, w = 6, 7

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    gray = np.arange(h * w, dtype=np.uint8).reshape(h, w)
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), gray], axis=1
    ).tobytes()
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    out = ic.decode_png(png)
    assert out.shape == (h, w, 3) and (out[:, :, 0] == gray).all()
    assert (out[:, :, 0] == out[:, :, 1]).all()

    rgba = np.random.RandomState(1).randint(0, 256, size=(h, w, 4), dtype=np.uint8)
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), rgba.reshape(h, w * 4)], axis=1
    ).tobytes()
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    out = ic.decode_png(png)
    assert out.shape == (h, w, 3) and (out == rgba[:, :, :3]).all()


def test_corrupt_payloads_rejected():
    for blob in (b"corrupt", b"", b"\x89PNGxxxx", b"BMxx"):
        with pytest.raises(Exception):
            ic.decode_image(blob)


def test_real_decode_resize_end_to_end(ray_session):
    """decode→resize over REAL encoded payloads through the actor-pool
    stages: dimensions come from the actual pixel arrays and the
    resized payload is a decodable PNG at the new size."""
    import ray.data as rd

    from ocr_poc_ray.functions.multimodal import (
        decode_media,
        make_image_payload,
        resize_images,
    )

    rows = []
    for i, fmt in enumerate(["png", "bmp", "ppm"] * 4):
        w, h = 64 + 16 * (i % 5), 48 + 8 * (i % 3)
        rows.append(
            {
                "media_id": f"m-{i}",
                "kind": "image",
                "payload": make_image_payload(f"m-{i}", w, h, fmt=fmt),
                "content_type": f"image/{fmt}",
                "width": w,
                "height": h,
                "duration_ms": 0,
            }
        )
    ds = rd.from_pandas(pd.DataFrame(rows))

    dec = decode_media(ds).to_pandas().sort_values("media_id")
    assert dec["decode_ok"].all()
    exp = pd.DataFrame(rows).sort_values("media_id")
    assert (dec["width"].to_numpy() == exp["width"].to_numpy()).all()
    assert (dec["height"].to_numpy() == exp["height"].to_numpy()).all()
    # pixel features are real: a gradient image has nonzero spread
    assert all(f[1] > 0 for f in dec["features"])

    res = resize_images(ds, box=32).to_pandas().sort_values("media_id")
    assert len(res) == len(rows)
    for _, r in res.iterrows():
        px = ic.decode_image(bytes(r["payload"]))
        assert px.shape == (r["new_height"], r["new_width"], 3)
        assert max(r["new_width"], r["new_height"]) == 32
