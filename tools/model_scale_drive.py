"""100 MB+-checkpoint regime drive for the model seats (r5 verdict #7).

The round-4 model seats proved load-once with ~2 MB toy weights; this
drive exercises the REAL economics of a large checkpoint: a ~200 MB
versioned ``.npz`` embedding table (the registry's normal artifact
path, just bigger), an actor pool at ``concurrency=(m, n)``, a
2 GB-capped object store (the spill regime), and an amortization curve
— rows/s at increasing corpus sizes, showing per-actor init cost
(file read + 200 MB residency) vanish into the batched forward.

Usage::

    python tools/model_scale_drive.py                    # 200 MB, (4, 8) actors
    python tools/model_scale_drive.py --mb 400 --actors 4
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--mb", type=int, default=200)
    p.add_argument("--dim", type=int, default=128)
    p.add_argument("--actors", type=int, default=8)
    p.add_argument("--cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", 32)))
    p.add_argument("--object-store-gb", type=float, default=2.0)
    p.add_argument("--batch-size", type=int, default=256)
    args = p.parse_args()

    import ray

    ray.init(
        address="local", num_cpus=args.cpus, include_dashboard=False,
        logging_level="ERROR",
        object_store_memory=int(args.object_store_gb * (1 << 30)),
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from ocr_poc_ray.models import hashed_embedding_path
    from ocr_poc_ray.stages.embed import embed_text

    buckets = (args.mb << 20) // (args.dim * 4)
    t0 = time.perf_counter()
    path = hashed_embedding_path(buckets=buckets, dim=args.dim)
    t_mat = time.perf_counter() - t0
    size_mb = os.path.getsize(path) / (1 << 20)
    t0 = time.perf_counter()
    E = np.load(path)["E"]
    t_load = time.perf_counter() - t0
    print(
        f"artifact: {size_mb:.0f} MB ({buckets}x{args.dim} f32) "
        f"materialize {t_mat:.1f}s, single np.load {t_load:.2f}s",
        flush=True,
    )
    del E

    words = [f"w{i:05d}" for i in range(20_000)]
    rng = np.random.RandomState(11)

    def make_corpus(n_rows: int):
        import pandas as pd

        import ray.data as rd

        texts = [
            " ".join(words[j] for j in rng.randint(0, len(words), 30))
            for _ in range(min(n_rows, 10_000))
        ]
        reps = -(-n_rows // len(texts))
        df = pd.DataFrame(
            {"doc_id": np.arange(n_rows, dtype=np.int64),
             "text": (texts * reps)[:n_rows]}
        )
        return rd.from_pandas(df).repartition(max(args.actors * 2, 8))

    log_root = f"/tmp/model_drive_inits_{os.getpid()}"
    print(
        f"amortization curve (actors={args.actors}, batch={args.batch_size}, "
        f"object store {args.object_store_gb:g} GB):",
        flush=True,
    )
    for n_rows in (2_000, 20_000, 100_000):
        log_dir = f"{log_root}_{n_rows}"
        shutil.rmtree(log_dir, ignore_errors=True)
        corpus = make_corpus(n_rows).materialize()
        t0 = time.perf_counter()
        out = embed_text(
            corpus, use_real_model=True, dim=args.dim, buckets=buckets,
            batch_size=args.batch_size,
            concurrency=(args.actors, args.actors),
            init_log_dir=log_dir,
        )
        n_out = out.count()
        dt = time.perf_counter() - t0
        inits = len(os.listdir(log_dir)) if os.path.isdir(log_dir) else 0
        n_batches = -(-n_rows // args.batch_size)
        assert n_out == n_rows
        assert inits <= args.actors + 2, (  # +2 tolerance for restarts
            f"{inits} inits for {args.actors} actors — weights reloading per batch?"
        )
        print(
            f"  {n_rows:>7} rows: {dt:6.1f}s  {n_rows/dt:>9,.0f} rows/s  "
            f"(actor inits: {inits} for {n_batches} batches)",
            flush=True,
        )
        shutil.rmtree(log_dir, ignore_errors=True)
    print("MODEL SCALE DRIVE OK", flush=True)
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
