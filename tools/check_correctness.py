"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry at a given sf_dir, runs the matching
``oracle_sql()`` in DuckDB over the same parquet tables, and compares
row count + schema + order-insensitive value hash (columns sorted by
name, rows sorted by all columns, values stringified).  Usage:

    python tools/check_correctness.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    try:
        from ray.data import Dataset

        if isinstance(res, Dataset):
            return res.to_pandas()
    except ImportError:
        pass
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    import hashlib

    h = hashlib.md5()
    for c in df.columns:
        col = df[c]
        if col.dtype.kind == "f":
            vals = ["%.9g" % v for v in col]
        else:
            vals = [str(v) for v in col]
        h.update(("\x1f".join(vals) + "\x1e" + c).encode())
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR", log_to_driver=False)

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, sqls = e.queries(), e.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        print(f"FAIL unknown query names (not registered): {sorted(unknown)}")
        return 2
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            mine = canon(to_pandas(fn(sf_dir)))
        except Exception as ex:
            print(f"FAIL {name}: pipeline raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        dt = time.perf_counter() - t0
        if name not in sqls:
            print(f"ok   {name}: rows-only {len(mine)} rows ({dt:.1f}s)")
            continue
        try:
            oracle = canon(con.execute(sqls[name]).fetchdf())
        except Exception as ex:
            print(f"FAIL {name}: oracle raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        problems = []
        if len(mine) != len(oracle):
            problems.append(f"rows {len(mine)} vs {len(oracle)}")
        if list(mine.columns) != list(oracle.columns):
            problems.append(f"cols {list(mine.columns)} vs {list(oracle.columns)}")
        else:
            # The driver hashes stringified values, so int64 47 vs float64
            # 47.0 is a FAIL there even though both round to the same float
            # — flag dtype-family mismatches (DuckDB sum(<int>) → HUGEINT →
            # fetchdf float64 is the classic cause; cast ::BIGINT in SQL).
            fam = lambda k: {"i": "int", "u": "int", "b": "bool", "f": "float"}.get(k, "obj")
            for c in mine.columns:
                fa, fb = fam(mine[c].dtype.kind), fam(oracle[c].dtype.kind)
                if fa != fb:
                    problems.append(f"dtype {c}: {mine[c].dtype} vs {oracle[c].dtype}")
        if (
            not problems
            and len(mine) == len(oracle)
            and value_hash(mine) != value_hash(oracle)
        ):
            diff_cols = []
            for c in mine.columns:
                a, b = mine[c], oracle[c]
                if a.dtype.kind == "f" or b.dtype.kind == "f":
                    eq = (pd.Series(a).astype(float).round(9)
                          == pd.Series(b).astype(float).round(9)) | (a.isna() & b.isna())
                else:
                    eq = a.astype(str).values == b.astype(str).values
                if not bool(pd.Series(eq).all()):
                    idx = int(pd.Series(eq).idxmin())
                    diff_cols.append(f"{c}[{idx}]: {a.iloc[idx]!r} vs {b.iloc[idx]!r}")
            if diff_cols:
                problems.append("values: " + "; ".join(diff_cols[:4]))
        if problems:
            print(f"FAIL {name}: " + " | ".join(problems))
            failures += 1
        else:
            print(f"PASS {name}: {len(mine)} rows ({dt:.1f}s)")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
