"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The reference's ingress is an opaque image blob per request
(``api_server.py:26,48,240``).  At corpus scale that becomes a
``binary`` column with typed metadata, processed by actor-pool
``map_batches`` stages.  The image/audio codec libraries are not in
this container, so the DECODE KERNELS ARE STUBBED — a clearly-marked
deterministic fake (or ``NotImplementedError`` when strictness is
requested) — while everything Ray-side is real and tested: schema,
batch sizing for large payloads, actor signature, output layout.

Real-codec slot: replace ``_fake_decode`` with PIL/ffmpeg in
``MediaDecoder.__init__`` (import once per actor) and the pipeline
shape is unchanged.
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
    """Deterministic fake media blob with a parseable header (for tests)."""
    body = hashlib.blake2b(media_id.encode(), digest_size=32).digest() * 4
    return _MAGIC + struct.pack("<III", w, h, dur) + kind.encode()[:1] + body


def _fake_decode(payload: bytes) -> dict:
    """STUB decode: parses the fake header; a real build uses PIL/ffmpeg."""
    if not payload.startswith(_MAGIC):
        raise ValueError("undecodable payload")
    w, h, dur = struct.unpack("<III", payload[len(_MAGIC) : len(_MAGIC) + 12])
    return {"width": w, "height": h, "duration_ms": dur, "n_bytes": len(payload)}


class MediaDecoder:
    """Actor-pool decode/feature stage over a binary media column.

    ``strict=False`` (default): failures become ``decode_ok=False``
    rows — per-row failure containment, as everywhere in this engine.
    ``use_real_codecs=True``: raises NotImplementedError — the slot
    where PIL/ffmpeg would load (once per actor, in ``__init__``).
    """

    def __init__(self, *, use_real_codecs: bool = False):
        if use_real_codecs:
            raise NotImplementedError(
                "real image/audio codecs are not available in this environment; "
                "install PIL/ffmpeg and wire them here"
            )
        self._decode = _fake_decode

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ok, widths, heights, durs, feats = [], [], [], [], []
        for payload in batch["payload"]:
            try:
                meta = self._decode(bytes(payload))
                ok.append(True)
                widths.append(meta["width"])
                heights.append(meta["height"])
                durs.append(meta["duration_ms"])
                # STUB feature vector: byte-histogram moments (deterministic)
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                feats.append([float(arr.mean()), float(arr.std()), float(len(arr))])
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
            meta = _fake_decode(bytes(payload))
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
    """STUB image-resize stage for image rows: computes the
    aspect-preserving target dimensions with INTEGER math (exact on any
    engine) and re-emits a deterministic fake payload at the new size
    (real build: PIL/cv2 decode-resize-encode per row — loaded once per
    actor, the MediaDecoder codec-slot pattern).  Corrupt payloads are
    skipped (failure rows belong to the decode stage's envelope)."""

    def __init__(self, box: int = 64):
        self.box = box

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out_id, out_w, out_h, out_p = [], [], [], []
        for media_id, kind, payload in zip(
            batch["media_id"], batch["kind"], batch["payload"]
        ):
            if kind != "image":
                continue
            try:
                meta = _fake_decode(bytes(payload))
            except Exception:
                continue
            w, h = meta["width"], meta["height"]
            m = max(w, h, 1)
            nw, nh = max(w * self.box // m, 1), max(h * self.box // m, 1)
            out_id.append(media_id)
            out_w.append(nw)
            out_h.append(nh)
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
