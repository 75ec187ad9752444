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


# ---------------------------------------------------------------------------
# Perceptual near-dup: 64-bit difference hash (dHash) + banded pair gen
# ---------------------------------------------------------------------------

DHASH_COLS, DHASH_ROWS = 9, 8  # -> 8x8 gradient-sign bits = 64


class ImageDHasher:
    """Actor-pool stage: REAL pixel decode -> integer luma -> 9x8
    nearest-neighbor downsample -> horizontal gradient-sign bits (the
    public dHash algorithm).  Emits one int64 ``dhash`` per decodable
    image row (the uint64 bit pattern viewed as int64 — sign is
    irrelevant, the value is only ever grouped/XORed).  Luma is the
    integer BT.601 form ``(77R + 150G + 29B) >> 8`` — exact on any
    engine, and identity on grayscale pixels (77+150+29 = 256)."""

    def __init__(self):
        from ocr_poc_ray.functions import imagecodec as ic

        self._ic = ic

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ic = self._ic
        out_id, out_h = [], []
        for media_id, payload in zip(batch["media_id"], batch["payload"]):
            payload = bytes(payload)
            try:
                if ic.sniff(payload) is None:
                    continue
                px = ic.decode_image(payload)
            except Exception:
                continue
            small = ic.resize_nn(px, DHASH_COLS, DHASH_ROWS).astype(np.uint32)
            luma = (77 * small[:, :, 0] + 150 * small[:, :, 1] + 29 * small[:, :, 2]) >> 8
            bits = (luma[:, 1:] > luma[:, :-1]).astype(np.uint8)  # (8, 8)
            dh = np.frombuffer(np.packbits(bits.ravel()).tobytes(), dtype="<u8")[0]
            out_id.append(media_id)
            out_h.append(np.uint64(dh).astype(np.int64))
        return pd.DataFrame(
            {"media_id": out_id, "dhash": pd.array(out_h, dtype="int64")}
        )


def image_dhash(ds: Dataset) -> Dataset:
    return ds.map_batches(
        ImageDHasher,
        batch_format="pandas",
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=(1, 4),
    )


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Per-element popcount of an int64/uint64 array (bit_count needs
    numpy>=2; unpackbits on the byte view is vectorized and exact)."""
    b = np.ascontiguousarray(x).view(np.uint8).reshape(len(x), 8)
    return np.unpackbits(b, axis=1).sum(axis=1).astype(np.int64)


def dhash_near_dup_pairs(
    hashes: Dataset,
    *,
    max_hamming: int = 7,
    id_col: str = "media_id",
) -> Dataset:
    """(id_a, id_b, hamming) pairs with XOR-popcount ≤ ``max_hamming``.

    EXACT under banding by pigeonhole: the 64-bit hash splits into 8
    8-bit bands; ≤7 differing bits touch ≤7 bands, so every qualifying
    pair shares at least one untouched band and is generated by that
    band's bucket.  Pair generation rides the shared LSH machinery
    (``functions/dedup.py``): singleton buckets are pre-filtered by the
    bounded hot-bucket combine, OVERSIZED buckets — e.g. millions of
    near-uniform crawl images sharing a band value — are salted into
    k×k chunk grids so no single (band, value) bucket is quadratic in
    one task, and bucket keys hash into O(data/64 MB) meta-groups with
    ONE vectorized kernel per group (never one Ray group per bucket,
    the measured many-group cliff).  Duplicate pairs from multiple
    shared bands are removed by the bounded-bucket distinct; hamming is
    recomputed from the pair rows themselves (hashes ride along — no
    verify join)."""
    from ocr_poc_ray.functions.dedup import (
        _distinct_pairs,
        _filter_hot_buckets,
        _grid_pair_indices,
        _pair_meta_buckets,
        _salt_oversized,
        _salted_row_count,
        _PAIR_CHUNK,
    )

    def band_rows(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[id_col].to_numpy()
        h = batch["dhash"].to_numpy().astype(np.int64).view(np.uint64)
        n = len(ids)
        bands = np.arange(8, dtype=np.uint64)
        band_val = ((h[:, None] >> (bands * np.uint64(8))) & np.uint64(0xFF)).astype(
            np.int64
        )  # (n, 8)
        band_id = np.broadcast_to(np.arange(8, dtype=np.int64), (n, 8))
        return pd.DataFrame(
            {
                "doc_id": np.repeat(ids, 8),
                "_h": np.repeat(h.view(np.int64), 8),
                "band_id": band_id.ravel(),
                "band_hash": band_val.ravel(),
            }
        )

    # materialized: the hot-bucket count branch and the pair branch both read it
    exploded = hashes.map_batches(band_rows, batch_format="pandas").materialize()
    exploded_hot, hot_sizes = _filter_hot_buckets(exploded, ["band_id", "band_hash"])
    if exploded_hot is None:
        import ray

        sch = hashes.schema()
        id_type = sch.types[sch.names.index(id_col)]
        if not isinstance(id_type, pa.DataType):  # pandas-backed block schema
            id_type = pa.from_numpy_dtype(id_type) if id_type != object else pa.string()
        return ray.data.from_arrow(
            pa.table({"id_a": pa.array([], id_type), "id_b": pa.array([], id_type),
                      "hamming": pa.array([], pa.int64())})
        )
    # oversized band buckets → k×k chunk grid (the text-LSH shape):
    # every pair still found exactly once, per-task pair volume bounded
    exploded_hot = _salt_oversized(exploded_hot, ["band_id", "band_hash"], hot_sizes)

    _empty_pairs = pd.DataFrame(
        {"doc_a": pd.array([], dtype=object), "doc_b": pd.array([], dtype=object),
         "_ha": pd.Series([], dtype="int64"), "_hb": pd.Series([], dtype="int64")}
    )

    def grouped_pairs(group: pd.DataFrame) -> pd.DataFrame:
        """All pairs of EVERY (band, value, grid-cell) bucket in this
        meta-group: one sort, one segment-index build, one chunked
        popcount pass — no per-bucket Ray group."""
        if len(group) < 2:
            return _empty_pairs
        g = group.sort_values(
            ["band_id", "band_hash", "_ci", "_cj"], kind="mergesort"
        )
        iu, ju = _grid_pair_indices(
            [g["band_id"].to_numpy(), g["band_hash"].to_numpy()],
            g["_ci"].to_numpy(), g["_cj"].to_numpy(), g["_chunk"].to_numpy(),
        )
        if not len(iu):
            return _empty_pairs
        ids = g["doc_id"].to_numpy()
        hs = g["_h"].to_numpy()
        out_a, out_b, out_ha, out_hb = [], [], [], []
        for s in range(0, len(iu), _PAIR_CHUNK):
            i, j = iu[s : s + _PAIR_CHUNK], ju[s : s + _PAIR_CHUNK]
            ha, hb = hs[i], hs[j]
            keep = _popcount64(ha ^ hb) <= max_hamming
            a, b = ids[i[keep]], ids[j[keep]]
            ha, hb = ha[keep], hb[keep]
            swap = a > b
            out_a.append(np.where(swap, b, a))
            out_b.append(np.where(swap, a, b))
            out_ha.append(np.where(swap, hb, ha))
            out_hb.append(np.where(swap, ha, hb))
        if not out_a:
            return _empty_pairs
        return pd.DataFrame(
            {"doc_a": np.concatenate(out_a), "doc_b": np.concatenate(out_b),
             "_ha": np.concatenate(out_ha), "_hb": np.concatenate(out_hb)}
        )

    meta = _pair_meta_buckets(
        exploded_hot, ["band_id", "band_hash"], _salted_row_count(hot_sizes), 64
    )
    pairs = meta.groupby("_pb").map_groups(grouped_pairs, batch_format="pandas")
    distinct = _distinct_pairs(pairs, ["doc_a", "doc_b", "_ha", "_hb"])

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return pd.DataFrame(
                {"id_a": pd.array([], dtype=object), "id_b": pd.array([], dtype=object),
                 "hamming": pd.array([], dtype="int64")}
            )
        ham = _popcount64(
            batch["_ha"].to_numpy().astype(np.int64)
            ^ batch["_hb"].to_numpy().astype(np.int64)
        )
        return pd.DataFrame(
            {"id_a": batch["doc_a"], "id_b": batch["doc_b"], "hamming": ham}
        )

    return distinct.map_batches(finish, batch_format="pandas")
