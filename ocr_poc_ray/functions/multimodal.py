"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The reference's ingress is an opaque image blob per request
(``api_server.py:26,48,240``).  At corpus scale that becomes a
``binary`` column with typed metadata, processed by actor-pool
``map_batches`` stages.

The IMAGE leg is genuinely end-to-end on real encoded bytes: payloads
are real PNG/BMP/PPM files and decode/feature/resize run the
pure-stdlib codecs in ``functions/imagecodec.py`` (real header parse,
real pixel decode, real nearest-neighbor resample) — the analog of the
reference's stage-one running a real model over real bytes
(``ocr/paddle_extractor.py:21-34``).  AUDIO/VIDEO decode kernels stay
STUBBED (no ffmpeg/soundfile in this container) behind the
``FAKEMEDIA`` header — clearly marked, with the Ray-side schema /
actor / batch plumbing real and tested.  Replace the stub with
ffmpeg in ``MediaDecoder.__init__`` (import once per actor) and the
pipeline shape is unchanged.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("kind", pa.string()),  # "image" | "audio" | "video"
        ("payload", pa.binary()),
        ("content_type", pa.string()),
        ("width", pa.int32()),  # -1 when unknown / not applicable
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)

#: Large binary payloads → small batches so batch × concurrency fits a
#: worker heap (the engine-wide rule for multimodal stages).
MEDIA_BATCH_SIZE = 32

_MAGIC = b"FAKEMEDIA"


def make_fake_payload(media_id: str, kind: str, w: int = 64, h: int = 48, dur: int = 0) -> bytes:
    """Deterministic fake media blob with a parseable header (the
    audio/video stub format; images should use make_image_payload)."""
    body = hashlib.blake2b(media_id.encode(), digest_size=32).digest() * 4
    return _MAGIC + struct.pack("<III", w, h, dur) + kind.encode()[:1] + body


def make_image_payload(media_id: str, w: int, h: int, fmt: str = "png") -> bytes:
    """REAL encoded image payload: a deterministic RGB gradient seeded
    by ``media_id``, encoded with the stdlib codecs (PNG/BMP/PPM)."""
    from ocr_poc_ray.functions import imagecodec as ic

    seed = int.from_bytes(
        hashlib.blake2b(media_id.encode(), digest_size=4).digest(), "little"
    )
    x = np.arange(w, dtype=np.int64)[None, :] + np.zeros((h, 1), dtype=np.int64)
    y = np.arange(h, dtype=np.int64)[:, None] + np.zeros((1, w), dtype=np.int64)
    arr = np.stack(
        [
            ((x * 3 + seed) % 256).astype(np.uint8),
            ((y * 5 + seed // 7) % 256).astype(np.uint8),
            ((x + y + seed // 13) % 256).astype(np.uint8),
        ],
        axis=2,
    )
    enc = {"png": ic.encode_png, "bmp": ic.encode_bmp, "ppm": ic.encode_ppm}[fmt]
    return enc(arr)


def _fake_decode(payload: bytes) -> dict:
    """STUB decode for the audio/video fake-header format."""
    if not payload.startswith(_MAGIC):
        raise ValueError("undecodable payload")
    w, h, dur = struct.unpack("<III", payload[len(_MAGIC) : len(_MAGIC) + 12])
    return {"width": w, "height": h, "duration_ms": dur, "n_bytes": len(payload)}


def _decode_meta(payload: bytes) -> dict:
    """Metadata decode: REAL header parse for PNG/BMP/PPM payloads,
    fake-header parse for the audio/video stub format."""
    from ocr_poc_ray.functions import imagecodec as ic

    if ic.sniff(payload) is not None:
        w, h = ic.image_size(payload)
        return {"width": w, "height": h, "duration_ms": 0, "n_bytes": len(payload)}
    return _fake_decode(payload)


class MediaDecoder:
    """Actor-pool decode/feature stage over a binary media column.

    Images (PNG/BMP/PPM) decode for REAL — stdlib codecs, loaded once
    per actor here in ``__init__`` exactly like a model would be — and
    the feature vector is computed from the decoded PIXELS.  Audio and
    video parse the ``FAKEMEDIA`` stub header (no ffmpeg in this
    container); their feature vector is byte-histogram moments.
    Failures become ``decode_ok=False`` rows — per-row failure
    containment, as everywhere in this engine.  ``use_real_codecs=True``
    requires real codecs for EVERY kind and raises until an
    audio/video codec is wired in.
    """

    def __init__(self, *, use_real_codecs: bool = False):
        if use_real_codecs:
            raise NotImplementedError(
                "real audio/video codecs are not available in this environment; "
                "install ffmpeg/soundfile and wire them here (images already "
                "decode for real via functions/imagecodec.py)"
            )
        # codec dispatch set up once per actor (the model-load slot)
        from ocr_poc_ray.functions import imagecodec as ic

        self._ic = ic

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ic = self._ic
        ok, widths, heights, durs, feats = [], [], [], [], []
        for payload in batch["payload"]:
            try:
                payload = bytes(payload)
                if ic.sniff(payload) is not None:
                    # real image decode: pixel-level features
                    px = ic.decode_image(payload)
                    h, w = px.shape[:2]
                    meta = {"width": w, "height": h, "duration_ms": 0}
                    pf = px.astype(np.float64)
                    feat = [float(pf.mean()), float(pf.std()), float(px.size)]
                else:
                    meta = _fake_decode(payload)
                    arr = np.frombuffer(payload, dtype=np.uint8)
                    feat = [float(arr.mean()), float(arr.std()), float(len(arr))]
                ok.append(True)
                widths.append(meta["width"])
                heights.append(meta["height"])
                durs.append(meta["duration_ms"])
                feats.append(feat)
            except Exception:
                ok.append(False)
                widths.append(-1)
                heights.append(-1)
                durs.append(-1)
                feats.append([0.0, 0.0, 0.0])
        return pd.DataFrame(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "decode_ok": ok,
                "width": pd.array(widths, dtype="int32"),
                "height": pd.array(heights, dtype="int32"),
                "duration_ms": pd.array(durs, dtype="int32"),
                "features": feats,
            }
        )


def decode_media(ds: Dataset, *, concurrency: int | tuple[int, int] = (1, 4)) -> Dataset:
    """Media table → decoded metadata + stub features (actor pool)."""
    return ds.map_batches(
        MediaDecoder,
        batch_format="pandas",
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=concurrency,
    )


def _decoded_rows(batch: pd.DataFrame, kind: str):
    """Yield (media_id, duration_ms) for every decodable row of ``kind``
    — the shared kind-filter / decode-failure-skip protocol of the
    timeline stages (FrameSampler, AudioWindower).  A duration of 0
    yields no timeline positions downstream (``range(0, 0, step)``),
    matching the SQL mirrors' ``range(0, dur, step)`` exactly."""
    for media_id, k, payload in zip(
        batch["media_id"], batch["kind"], batch["payload"]
    ):
        if k != kind:
            continue
        try:
            meta = _decode_meta(bytes(payload))
        except Exception:
            continue
        yield media_id, meta["duration_ms"]


class FrameSampler:
    """STUB frame-sample stage for video rows: emits one row per sampled
    frame index (real build: ffmpeg seek + decode per index)."""

    def __init__(self, every_ms: int = 1000):
        self.every_ms = every_ms

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out_id, out_idx, out_ts = [], [], []
        for media_id, dur in _decoded_rows(batch, "video"):
            for i, ts in enumerate(range(0, dur, self.every_ms)):
                out_id.append(media_id)
                out_idx.append(i)
                out_ts.append(ts)
        return pd.DataFrame(
            {
                "media_id": out_id,
                "frame_idx": pd.array(out_idx, dtype="int32"),
                "ts_ms": pd.array(out_ts, dtype="int32"),
            }
        )


def sample_frames(ds: Dataset, *, every_ms: int = 1000) -> Dataset:
    return ds.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"every_ms": every_ms},
        batch_format="pandas",
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=(1, 4),
    )


class AudioWindower:
    """STUB audio-segmentation stage for audio rows: emits one row per
    overlapping analysis window (real build: decode + resample the
    window's samples per row — soundfile/ffmpeg slot, loaded once per
    actor in __init__ exactly like MediaDecoder's codec slot)."""

    def __init__(self, window_ms: int = 1000, hop_ms: int = 500):
        self.window_ms = window_ms
        self.hop_ms = hop_ms

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out_id, out_idx, out_s, out_e = [], [], [], []
        for media_id, dur in _decoded_rows(batch, "audio"):
            for i, start in enumerate(range(0, dur, self.hop_ms)):
                out_id.append(media_id)
                out_idx.append(i)
                out_s.append(start)
                out_e.append(min(start + self.window_ms, dur))
        return pd.DataFrame(
            {
                "media_id": out_id,
                "window_idx": pd.array(out_idx, dtype="int32"),
                "start_ms": pd.array(out_s, dtype="int32"),
                "end_ms": pd.array(out_e, dtype="int32"),
            }
        )


def window_audio(ds: Dataset, *, window_ms: int = 1000, hop_ms: int = 500) -> Dataset:
    return ds.map_batches(
        AudioWindower,
        fn_constructor_kwargs={"window_ms": window_ms, "hop_ms": hop_ms},
        batch_format="pandas",
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=(1, 4),
    )


class ImageResizer:
    """REAL image-resize stage for image rows: decodes the payload with
    the stdlib codecs (loaded once per actor — the MediaDecoder
    codec-slot pattern), computes the aspect-preserving target
    dimensions with INTEGER math (exact on any engine), resamples the
    pixels nearest-neighbor, and re-encodes as PNG.  FAKEMEDIA image
    payloads (legacy stub fixtures) keep the header-math fallback.
    Corrupt payloads are skipped (failure rows belong to the decode
    stage's envelope)."""

    def __init__(self, box: int = 64):
        from ocr_poc_ray.functions import imagecodec as ic

        self._ic = ic
        self.box = box

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ic = self._ic
        out_id, out_w, out_h, out_p = [], [], [], []
        for media_id, kind, payload in zip(
            batch["media_id"], batch["kind"], batch["payload"]
        ):
            if kind != "image":
                continue
            payload = bytes(payload)
            try:
                real = ic.sniff(payload) is not None
                if real:
                    px = ic.decode_image(payload)
                    h, w = px.shape[:2]
                else:
                    meta = _fake_decode(payload)
                    w, h = meta["width"], meta["height"]
            except Exception:
                continue
            m = max(w, h, 1)
            nw, nh = max(w * self.box // m, 1), max(h * self.box // m, 1)
            out_id.append(media_id)
            out_w.append(nw)
            out_h.append(nh)
            if real:
                out_p.append(ic.encode_png(ic.resize_nn(px, nw, nh)))
            else:
                out_p.append(make_fake_payload(media_id, "image", w=nw, h=nh))
        return pd.DataFrame(
            {
                "media_id": out_id,
                "new_width": pd.array(out_w, dtype="int32"),
                "new_height": pd.array(out_h, dtype="int32"),
                "payload": pd.Series(out_p, dtype=object),
            }
        )


def resize_images(ds: Dataset, *, box: int = 64) -> Dataset:
    return ds.map_batches(
        ImageResizer,
        fn_constructor_kwargs={"box": box},
        batch_format="pandas",
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=(1, 4),
    )
