"""WebDataset-style sharded tar sink — the training-consumption format
for multimodal corpora (one tar per shard, one file per sample per
column, ``{key}.{ext}`` member names), plus the matching reader.

Why tars: sequential reads at training time (no per-sample seeks), a
format every dataloader stack consumes, and shards as the unit of
resume/retry.  The reference's result sink is per-request JSON
(`api_server.py` responses); this is the batch-corpus analog of
"hand results to the next consumer in its native format".

The 100-TB shape:

- **Deterministic shard assignment** — ``shard_id = hash(key) %
  n_shards`` (``pd.util.hash_array``, fixed key), NOT "whatever rows
  landed in a task": re-runs and retries produce byte-identical shards
  regardless of block boundaries, and a failed run can skip shards
  that already committed (the parquet sink's resume rule).
- **One exchange by design**: a sharded sink IS an all-to-all (samples
  must co-locate with their shard).  ``n_shards`` is sized from a
  byte hint (``target_shard_bytes``) so shards land near the
  WebDataset-conventional size instead of scaling with CPU count.
- **Bounded groups**: each shard is one ``map_groups`` call writing one
  tar sequentially (sorted by key — deterministic member order), so a
  shard never holds more than ``total_bytes / n_shards`` plus skew.
- **Atomic commit**: tars write to ``<name>.tmp`` and rename; a crash
  never leaves a half shard under the final name.  A JSON manifest row
  per shard (samples, bytes, key digest) lands next to the tars.

Members are stored with zeroed mtime/uid/gid so shard bytes are a pure
function of content (golden-testable, cache-friendly).
"""

from __future__ import annotations

import hashlib
import io
import json
import os
import tarfile

import numpy as np
import pandas as pd

from ray.data import Dataset

#: WebDataset convention is 100 MB–1 GB; small default so tests and
#: sf-scale fixtures still produce several shards.
DEFAULT_TARGET_SHARD_BYTES = 64 * 1024 * 1024


def _tar_bytes(keys: np.ndarray, cols: dict[str, np.ndarray]) -> bytes:
    """Serialize samples into one deterministic tar blob."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for i, key in enumerate(keys):
            for ext, vals in cols.items():
                payload = vals[i]
                if payload is None:
                    continue
                if isinstance(payload, str):
                    payload = payload.encode("utf-8")
                info = tarfile.TarInfo(name=f"{key}.{ext}")
                info.size = len(payload)
                info.mtime = 0
                info.uid = info.gid = 0
                info.uname = info.gname = ""
                tf.addfile(info, io.BytesIO(payload))
    return buf.getvalue()


def write_tar_shards(
    ds: Dataset,
    out_dir: str,
    *,
    key_col: str,
    payload_cols: dict[str, str],
    n_shards: int | None = None,
    bytes_hint: int | None = None,
    target_shard_bytes: int = DEFAULT_TARGET_SHARD_BYTES,
    overwrite: bool = False,
) -> pd.DataFrame:
    """Write ``ds`` as ``shard-%05d.tar`` files under ``out_dir``.

    ``payload_cols`` maps column name → member extension (e.g.
    ``{"text": "txt", "png": "png"}``).  Returns the manifest frame
    (also written to ``out_dir/_shards.jsonl``): one row per shard with
    ``shard_id, path, n_samples, n_bytes, keys_digest``.

    ``n_shards`` defaults to ``bytes_hint / target_shard_bytes``
    (floor 2) — pass the input's file bytes as the hint rather than
    materializing the dataset to count (the `_scaled_buckets` rule).
    """
    os.makedirs(out_dir, exist_ok=True)
    if n_shards is None:
        hint = bytes_hint if bytes_hint is not None else 0
        n_shards = max(2, int(hint // target_shard_bytes))
    n_shards = int(n_shards)
    exts = dict(payload_cols)
    cols_needed = [key_col, *exts.keys()]

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        b = b[cols_needed].copy()
        b["_shard"] = (
            pd.util.hash_array(b[key_col].to_numpy()) % np.uint64(n_shards)
        ).astype(np.int64)
        return b

    def write_shard(g: pd.DataFrame) -> pd.DataFrame:
        shard_id = int(g["_shard"].iloc[0])
        g = g.sort_values(key_col, kind="mergesort")
        keys = g[key_col].to_numpy()
        name = f"shard-{shard_id:05d}.tar"
        path = os.path.join(out_dir, name)
        if os.path.exists(path) and not overwrite:
            # atomic rename means an existing final file is complete —
            # a resumed run skips the serialize + write entirely
            n_bytes = os.path.getsize(path)
        else:
            blob = _tar_bytes(
                keys, {ext: g[col].to_numpy() for col, ext in exts.items()}
            )
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                f.write(blob)
            os.replace(tmp, path)
            n_bytes = len(blob)
        digest = hashlib.blake2b(
            "\n".join(str(k) for k in keys).encode(), digest_size=8
        ).hexdigest()
        return pd.DataFrame(
            {"shard_id": [shard_id], "path": [name],
             "n_samples": [len(keys)], "n_bytes": [n_bytes],
             "keys_digest": [digest]}
        )

    manifest = (
        ds.map_batches(assign, batch_format="pandas")
        .groupby("_shard")
        .map_groups(write_shard, batch_format="pandas")
        .to_pandas()
    )
    if manifest.empty or "shard_id" not in manifest.columns:
        manifest = pd.DataFrame(
            {"shard_id": pd.Series([], dtype="int64"),
             "path": pd.Series([], dtype=object),
             "n_samples": pd.Series([], dtype="int64"),
             "n_bytes": pd.Series([], dtype="int64"),
             "keys_digest": pd.Series([], dtype=object)}
        )
    manifest = (
        manifest.sort_values("shard_id", kind="mergesort")
        .reset_index(drop=True)
        .astype({"shard_id": "int64", "path": object,
                 "n_samples": "int64", "n_bytes": "int64",
                 "keys_digest": object})
    )
    mpath = os.path.join(out_dir, "_shards.jsonl")
    tmp = mpath + ".tmp"
    with open(tmp, "w") as f:
        for row in manifest.to_dict("records"):
            f.write(json.dumps(row) + "\n")
    os.replace(tmp, mpath)
    return manifest


def iter_tar_samples(out_dir: str):
    """Read back every sample from a shard directory in (shard_id, key)
    order: yields ``(key, {ext: bytes})`` — the dataloader-side contract."""
    mpath = os.path.join(out_dir, "_shards.jsonl")
    with open(mpath) as f:
        manifest = [json.loads(line) for line in f]
    for row in sorted(manifest, key=lambda r: r["shard_id"]):
        with tarfile.open(os.path.join(out_dir, row["path"])) as tf:
            current_key, files = None, {}
            for member in tf:
                key, ext = member.name.rsplit(".", 1)
                if current_key is not None and key != current_key:
                    yield current_key, files
                    files = {}
                current_key = key
                files[ext] = tf.extractfile(member).read()
            if current_key is not None:
                yield current_key, files
