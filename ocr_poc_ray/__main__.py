"""CLI entry points — the batch analog of the reference's service
entry (``start_services.py`` / ``api_server.py``), submitted via
``ray job submit -- python -m ocr_poc_ray <cmd> ...`` on a cluster or
run directly on one node.

Commands
--------
extract     resumable checkpointed extraction over a transcript corpus
fixture     write a deterministic synthetic transcript corpus
fields      typed-field extraction over a span-docs parquet
pack        stream training packs (the data-loader exit) as JSONL
bench-info  print the engine's operator registry (name → oracle kind)
query       run one registered query over an sf_dir (print or parquet)

This is the ONLY module in the package that may own a Ray session
(guarded — the driver/bench/tests own their own).
"""

from __future__ import annotations

import argparse
import json
import sys


def _ensure_ray(num_cpus: int | None) -> None:
    """Own (or join) the Ray session for a CLI command.

    ``RAY_ADDRESS`` makes this the ``ray job submit`` entrypoint: when
    it names a running cluster (anything but "local"), we CONNECT —
    cluster shape is the cluster's, so per-process ``num_cpus`` is not
    forwarded.  Unset or "local" starts a single-node session (the
    sandbox/bench default)."""
    import os

    import ray

    if not ray.is_initialized():
        address = os.environ.get("RAY_ADDRESS") or "local"
        kwargs = {"include_dashboard": False, "logging_level": "ERROR"}
        if address == "local" and num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(address=address, **kwargs)


def cmd_extract(args: argparse.Namespace) -> int:
    _ensure_ray(args.num_cpus)
    from ocr_poc_ray.pipelines.extraction import resumable_extract

    if args.config:
        from ocr_poc_ray.config import EngineConfig

        cfg = EngineConfig.from_json(args.config)
        num_partitions, shard_rows = cfg.num_partitions, cfg.shard_rows
        concurrency, batch_size = cfg.extract_concurrency, cfg.batch_size
    else:
        num_partitions, shard_rows = args.num_partitions, args.shard_rows
        concurrency = (1, args.actors) if args.actors else None
        batch_size = None

    result = resumable_extract(
        args.input,
        args.output,
        num_partitions=num_partitions,
        shard_rows=shard_rows,
        batch_size=batch_size,
        concurrency=concurrency,
    )
    print(json.dumps(result))
    return 0


def cmd_fixture(args: argparse.Namespace) -> int:
    from ocr_poc_ray.synth import write_fixtures

    paths = write_fixtures(
        args.output, n_turns=args.turns, n_convs=args.convs, seed=args.seed,
        n_files=args.files,
    )
    print(json.dumps(paths))
    return 0


def cmd_fields(args: argparse.Namespace) -> int:
    _ensure_ray(args.num_cpus)
    import ray.data

    from ocr_poc_ray.stages.fields import extract_fields_ds

    ds = ray.data.read_parquet(args.input)
    out = extract_fields_ds(ds, concurrency=(1, args.actors) if args.actors else None)
    out.write_parquet(args.output)
    print(json.dumps({"output": args.output}))
    return 0


def cmd_pack(args: argparse.Namespace) -> int:
    """Stream training packs (the data-loader exit) to JSONL or stdout —
    the CLI face of ``pipelines.loader.iter_training_packs``."""
    _ensure_ray(args.num_cpus)
    import ray.data

    from ocr_poc_ray.pipelines.loader import iter_training_packs

    cols = [args.id_col, args.text_col] + ([args.lang_col] if args.lang_col else [])
    ds = ray.data.read_parquet(args.input, columns=cols)
    packs = iter_training_packs(
        ds,
        id_col=args.id_col,
        text_col=args.text_col,
        lang_col=args.lang_col or None,
        budget=args.budget,
    )
    sink = open(args.output, "w") if args.output else sys.stdout
    n = 0
    try:
        for p in packs:
            sink.write(json.dumps(
                {"pack_id": p["pack_id"], "doc_ids": p["doc_ids"].tolist(),
                 "n_tokens": p["n_tokens"],
                 **({"tokens": p["tokens"]} if args.tokens else {})}
            ) + "\n")
            n += 1
    finally:
        if args.output:
            sink.close()
    print(json.dumps({"packs": n, "output": args.output or "-"}), file=sys.stderr)
    return 0


def cmd_shard(args: argparse.Namespace) -> int:
    """Write a parquet corpus as WebDataset-style tar shards."""
    _ensure_ray(args.num_cpus)
    import os

    import ray.data

    from ocr_poc_ray.pipelines.shards import write_tar_shards

    payload_cols = {}
    for spec in args.col:
        col, _, ext = spec.partition(":")
        payload_cols[col] = ext or col
    ds = ray.data.read_parquet(
        args.input, columns=[args.key_col, *payload_cols.keys()]
    )
    hint = None
    if args.shards == 0:
        hint = sum(
            os.path.getsize(os.path.join(r, f))
            for r, _d, fs in os.walk(args.input)
            for f in fs
        ) if os.path.isdir(args.input) else os.path.getsize(args.input)
    man = write_tar_shards(
        ds, args.output, key_col=args.key_col, payload_cols=payload_cols,
        n_shards=args.shards or None, bytes_hint=hint,
        overwrite=args.overwrite,
    )
    print(json.dumps({"shards": len(man),
                      "samples": int(man["n_samples"].sum()),
                      "bytes": int(man["n_bytes"].sum()),
                      "output": args.output}))
    return 0


def cmd_bench_info(args: argparse.Namespace) -> int:
    """Cluster shape (from the live Ray session — identical under
    ``ray job submit`` on a real cluster and in the sandbox) followed
    by the operator registry."""
    import ray

    _ensure_ray(getattr(args, "num_cpus", None))
    res = ray.cluster_resources()
    nodes = [n for n in ray.nodes() if n.get("Alive")]
    print(json.dumps({
        "nodes": len(nodes),
        "cpus": res.get("CPU", 0),
        "gpus": res.get("GPU", 0),
        "memory_gb": round(res.get("memory", 0) / (1 << 30), 1),
        "object_store_gb": round(
            res.get("object_store_memory", 0) / (1 << 30), 1
        ),
    }))
    from ocr_poc_ray.queries import REGISTRY

    for name, (_fn, sql) in sorted(REGISTRY.items()):
        print(f"{name}\t{'sql-oracle' if sql else 'rows-only'}")
    return 0


def cmd_query(args: argparse.Namespace) -> int:
    _ensure_ray(args.num_cpus)
    from ocr_poc_ray.queries import REGISTRY

    if args.name not in REGISTRY:
        print(f"unknown query {args.name!r}; see `bench-info`", file=sys.stderr)
        return 2
    fn, _sql = REGISTRY[args.name]
    out = fn(args.sf_dir)
    try:  # Dataset / pyarrow results → pandas for uniform output
        import pyarrow as pa
        from ray.data import Dataset

        if isinstance(out, Dataset):
            out = out.to_pandas()
        elif isinstance(out, pa.Table):
            out = out.to_pandas()
    except ImportError:
        pass
    if args.output:
        out.to_parquet(args.output, index=False)
        print(json.dumps({"query": args.name, "rows": len(out),
                          "output": args.output}))
    else:
        print(out.to_string(max_rows=args.max_rows))
    return 0


def cmd_compact(args: argparse.Namespace) -> int:
    _ensure_ray(args.num_cpus)
    from ocr_poc_ray.state.compaction import compact_output

    rep = compact_output(args.output, target_bytes=args.target_mb << 20)
    print(
        json.dumps(
            {
                "partitions": len(rep.partitions),
                "files_before": rep.files_before,
                "files_after": rep.files_after,
            }
        )
    )
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="ocr_poc_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    ex = sub.add_parser("extract", help="resumable checkpointed extraction")
    ex.add_argument("--input", required=True)
    ex.add_argument("--output", required=True)
    ex.add_argument("--num-partitions", type=int, default=16)
    ex.add_argument("--shard-rows", type=int, default=250_000)
    ex.add_argument("--actors", type=int, default=0)
    ex.add_argument("--num-cpus", type=int, default=0)
    ex.add_argument("--config", default="", help="EngineConfig JSON (file path or inline)")
    ex.set_defaults(fn=cmd_extract)

    fx = sub.add_parser("fixture", help="write a synthetic transcript corpus")
    fx.add_argument("--output", required=True)
    fx.add_argument("--turns", type=int, default=10_000)
    fx.add_argument("--convs", type=int, default=200)
    fx.add_argument("--seed", type=int, default=42)
    fx.add_argument("--files", type=int, default=8)
    fx.set_defaults(fn=cmd_fixture)

    fd = sub.add_parser("fields", help="typed-field extraction over span docs")
    fd.add_argument("--input", required=True)
    fd.add_argument("--output", required=True)
    fd.add_argument("--actors", type=int, default=0)
    fd.add_argument("--num-cpus", type=int, default=0)
    fd.set_defaults(fn=cmd_fields)

    pk = sub.add_parser("pack", help="stream training packs (data-loader exit)")
    pk.add_argument("--input", required=True, help="documents parquet")
    pk.add_argument("--output", default="", help="JSONL path (default stdout)")
    pk.add_argument("--id-col", default="doc_id")
    pk.add_argument("--text-col", default="text")
    pk.add_argument("--lang-col", default="lang", help="'' disables interleaving")
    pk.add_argument("--budget", type=int, default=512)
    pk.add_argument("--tokens", action="store_true", help="include token lists")
    pk.add_argument("--num-cpus", type=int, default=0)
    pk.set_defaults(fn=cmd_pack)

    cp = sub.add_parser("compact", help="compact small output files per partition")
    cp.add_argument("output")
    cp.add_argument("--target-mb", type=int, default=128)
    cp.add_argument("--num-cpus", type=int, default=None)
    cp.set_defaults(fn=cmd_compact)

    sh = sub.add_parser("shard", help="write WebDataset-style tar shards")
    sh.add_argument("--input", required=True, help="parquet file or dir")
    sh.add_argument("--output", required=True, help="shard directory")
    sh.add_argument("--key-col", default="doc_id")
    sh.add_argument("--col", action="append", required=True,
                    help="payload column, optionally col:ext (repeatable)")
    sh.add_argument("--shards", type=int, default=0,
                    help="0 = size from input bytes")
    sh.add_argument("--overwrite", action="store_true")
    sh.add_argument("--num-cpus", type=int, default=0)
    sh.set_defaults(fn=cmd_shard)

    bi = sub.add_parser("bench-info", help="list the operator registry")
    bi.set_defaults(fn=cmd_bench_info)

    q = sub.add_parser("query", help="run one registered query over an sf_dir")
    q.add_argument("name")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    q.add_argument("--output", default="", help="write result parquet here "
                   "instead of printing")
    q.add_argument("--max-rows", type=int, default=50)
    q.add_argument("--num-cpus", type=int, default=0)
    q.set_defaults(fn=cmd_query)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
