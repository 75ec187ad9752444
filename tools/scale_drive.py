"""Committed form of the round-4 /tmp dedup scale drives.

Synthesizes a many-file document corpus with PLANTED exact duplicates
and near-duplicate perturbations, drives ``exact_dedup`` and
``minhash_lsh_pairs`` over it, and ASSERTS the winner/pair structure —
the drive that exposed (and now regression-guards) the Ray 2.49
streaming-executor livelock fixed by splitting the LSH plan at the
bloom-join boundary (``functions/dedup.py::_filter_hot_buckets``,
commit 527f8f6).

Usage::

    python tools/scale_drive.py --docs 100000            # CI-time drive
    python tools/scale_drive.py --docs 1000000           # the r4 drive
    python tools/scale_drive.py --docs 100000 --force-distributed
        # exercise the crawl-scale bloom branch regardless of corpus size

Deterministic for a fixed seed; scratch under /tmp.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_WORDS = np.array(
    [f"tok{i:04d}" for i in range(4096)], dtype=object
)


def synth_corpus(
    out_dir: str,
    n_docs: int,
    *,
    dup_frac: float = 0.2,
    near_frac: float = 0.05,
    n_files: int = 64,
    doc_words: int = 40,
    seed: int = 7,
) -> dict:
    """Write ``n_files`` parquet files of (doc_id, text) rows.

    Layout: the first ``n_base`` docs are unique texts; the next
    ``n_dup`` are EXACT copies of uniformly-chosen base docs; the last
    ``n_near`` are near-duplicates (one token replaced) of base docs.
    Returns the plant map {doc_id -> source_id} for both classes."""
    rng = np.random.RandomState(seed)
    n_dup = int(n_docs * dup_frac)
    n_near = int(n_docs * near_frac)
    n_base = n_docs - n_dup - n_near
    assert n_base > 0

    base_tok = rng.randint(0, len(_WORDS), size=(n_base, doc_words))
    texts = np.array(
        [" ".join(_WORDS[row]) for row in base_tok], dtype=object
    )

    dup_src = rng.randint(0, n_base, size=n_dup)
    near_src = rng.randint(0, n_base, size=n_near)
    near_texts = []
    for k, s in enumerate(near_src):
        words = list(_WORDS[base_tok[s]])
        # replacement token unique per near doc: never an accidental
        # exact copy, never a near-near collision
        words[rng.randint(0, doc_words)] = f"near{k:06d}"
        near_texts.append(" ".join(words))

    all_texts = np.concatenate([texts, texts[dup_src], np.array(near_texts, object)])
    doc_ids = np.arange(n_docs, dtype=np.int64)
    # shuffle so duplicates are spread across files (as in a real crawl)
    perm = rng.permutation(n_docs)
    all_texts = all_texts[perm]  # row i holds pre-shuffle element perm[i]
    shuffled_ids = doc_ids  # ids stay 0..n-1; position is what shuffles
    # pre-shuffle element j lands at the row i with perm[i] == j, and
    # that row's doc_id is i  ->  id_of_pre is perm's inverse
    id_of_pre = np.empty(n_docs, dtype=np.int64)
    id_of_pre[perm] = doc_ids

    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)
    per = -(-n_docs // n_files)
    for f in range(n_files):
        lo, hi = f * per, min((f + 1) * per, n_docs)
        if lo >= hi:
            break
        pq.write_table(
            pa.table(
                {"doc_id": pa.array(shuffled_ids[lo:hi]),
                 "text": pa.array(all_texts[lo:hi], pa.string())}
            ),
            os.path.join(out_dir, f"part-{f:04d}.parquet"),
        )

    # plant maps in POST-shuffle doc_id space: exact-dup pre-shuffle
    # index j in [n_base, n_base+n_dup) copies base doc dup_src[j-n_base]
    exact_map = {
        int(id_of_pre[n_base + k]): int(id_of_pre[dup_src[k]])
        for k in range(n_dup)
    }
    near_map = {
        int(id_of_pre[n_base + n_dup + k]): int(id_of_pre[near_src[k]])
        for k in range(n_near)
    }
    return {"exact": exact_map, "near": near_map, "n_base": n_base}


def drive(args: argparse.Namespace) -> int:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=args.cpus, include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from ocr_poc_ray.functions import dedup as dd

    corpus = os.path.join(args.scratch, f"scale_corpus_{args.docs}")
    print(f"synthesizing {args.docs} docs ({args.files} files) ...", flush=True)
    t0 = time.perf_counter()
    plants = synth_corpus(
        corpus, args.docs, dup_frac=args.dup_frac, near_frac=args.near_frac,
        n_files=args.files, seed=args.seed,
    )
    print(f"  synth: {time.perf_counter() - t0:.1f}s", flush=True)

    if args.force_distributed:
        # exercise the crawl-scale bloom branch (the livelock fix's
        # code path) regardless of corpus size
        dd.BROADCAST_KEY_LIMIT = 10

    # ---- exact dedup: winners must be exactly base + near docs -------
    n_expected_kept = args.docs - len(plants["exact"])
    ds = ray.data.read_parquet(corpus, columns=["doc_id", "text"])
    t0 = time.perf_counter()
    kept = dd.exact_dedup(ds, id_col="doc_id", text_col="text")
    n_kept = kept.count()
    dt = time.perf_counter() - t0
    print(
        f"exact_dedup: {args.docs} docs in {dt:.1f}s "
        f"({args.docs / dt:,.0f} docs/s), kept {n_kept}",
        flush=True,
    )
    assert n_kept == n_expected_kept, (n_kept, n_expected_kept)
    # every exact-dup group's winner is its min doc_id
    import pandas as pd

    kept_ids = set(
        kept.select_columns(["doc_id"]).to_pandas()["doc_id"].tolist()
    )
    groups: dict[int, list[int]] = {}
    for copy_id, src_id in plants["exact"].items():
        groups.setdefault(src_id, [src_id]).append(copy_id)
    bad = sum(
        1 for g in groups.values() if min(g) not in kept_ids
        or any(m in kept_ids for m in g if m != min(g))
    )
    assert bad == 0, f"{bad} dup groups with wrong winner"
    print("  winners: exact min-id per group (verified)", flush=True)

    # ---- minhash LSH: candidate pairs must cover the plants ----------
    ds = ray.data.read_parquet(corpus, columns=["doc_id", "text"])
    t0 = time.perf_counter()
    pairs = dd.minhash_lsh_pairs(
        ds, id_col="doc_id", text_col="text", threshold=0.5
    ).to_pandas()
    dt = time.perf_counter() - t0
    print(
        f"minhash_lsh_pairs: {len(pairs)} candidate pairs in {dt:.1f}s "
        f"({args.docs / dt:,.0f} docs/s)",
        flush=True,
    )
    got = set(zip(pairs["doc_a"], pairs["doc_b"]))
    # exact copies have jaccard 1.0 -> every (src, copy) pair must appear
    miss_exact = sum(
        1 for c, s in plants["exact"].items()
        if (min(c, s), max(c, s)) not in got
    )
    assert miss_exact == 0, f"{miss_exact} exact-dup pairs missed by LSH"
    # near dups (1 of ~40 tokens replaced, shingle jaccard ~0.85):
    # banded LSH is probabilistic — require high but not perfect recall
    near_hit = sum(
        1 for c, s in plants["near"].items()
        if (min(c, s), max(c, s)) in got
    )
    recall = near_hit / max(len(plants["near"]), 1)
    print(f"  near-dup recall: {recall:.3f} ({near_hit}/{len(plants['near'])})",
          flush=True)
    assert recall >= 0.9, recall
    print("SCALE DRIVE OK", flush=True)
    return 0


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--docs", type=int, default=100_000)
    p.add_argument("--dup-frac", type=float, default=0.2)
    p.add_argument("--near-frac", type=float, default=0.05)
    p.add_argument("--files", type=int, default=64)
    p.add_argument("--cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", 32)))
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--scratch", default="/tmp")
    p.add_argument("--force-distributed", action="store_true")
    args = p.parse_args()
    try:
        return drive(args)
    finally:
        import ray

        if ray.is_initialized():
            ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
