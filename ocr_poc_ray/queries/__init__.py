"""Query registry: every implemented operator exposed as a named
pipeline callable (sf_dir -> result) with, where SQL-expressible, the
ANSI-SQL oracle DuckDB runs on the same parquet tables.

This is the engine's public correctness surface (driver contract in
``__ray_entry__.py``): one entry per operator family from SURVEY.md §2
plus the large-scale training-data operations.  Keys with a ``None``
oracle are genuinely non-SQL-expressible (MinHash/SimHash/LSH, the
synthetic-transcript extraction pipelines) and get rows-only checks.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from ocr_poc_ray.queries import documents as _docs
from ocr_poc_ray.queries import relational as _rel
from ocr_poc_ray.queries import transcripts as _xs
from ocr_poc_ray.queries import vectors as _vec

#: name -> (pipeline callable, oracle SQL or None)
REGISTRY: dict[str, tuple[Callable[[str], Any], str | None]] = {}
REGISTRY.update(_docs.REGISTRY)
REGISTRY.update(_vec.REGISTRY)
REGISTRY.update(_rel.REGISTRY)
REGISTRY.update(_xs.REGISTRY)


def queries() -> dict[str, Callable[[str], Any]]:
    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None}
