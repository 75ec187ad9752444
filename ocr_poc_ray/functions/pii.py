"""PII / sensitive-token scrubbing over text columns.

A standard stage of a web-scale training-data pipeline (cf. C4 /
RefinedWeb curation: strip emails, IP addresses, long numeric
identifiers before training).  The kernel is a pure row-local Arrow
projection — ``pyarrow.compute.replace_substring_regex`` /
``count_substring_regex`` (RE2, global replace) — so the stage
pipelines with zero exchange at any scale.

Oracle parity: DuckDB's ``regexp_replace(..., 'g')`` and
``regexp_extract_all`` are the same RE2 engine; the queries in
``queries/documents.py`` / ``queries/relational.py`` keep the pattern
strings byte-identical in both engines (CLAUDE.md RE2 convention).

Reference anchor: the reference scrubs noise tokens from OCR'd text
per-line (ocr/id_card_data_extractor.py:44 noise filter); this is the
same "remove non-content spans" semantics generalized to a vectorized
corpus-scale transform.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

#: (category, RE2 pattern, replacement) — order matters: emails first
#: (they contain digits/dots), then dotted quads, then bare digit runs.
#: Keep pattern strings BYTE-IDENTICAL to the SQL mirrors.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    ("id_digits", r"\d{6,}", "[ID]"),
)


def scrub_arrays(
    texts: pa.ChunkedArray | pa.Array,
    patterns: tuple[tuple[str, str, str], ...] = PII_PATTERNS,
) -> tuple[pa.ChunkedArray | pa.Array, dict[str, pa.ChunkedArray | pa.Array]]:
    """Return (redacted_texts, {category: match_count}) for one batch.

    Counts are computed against the ORIGINAL text (so categories do not
    interact); redaction applies the patterns sequentially in declared
    order — both choices are mirrored in the SQL oracles.
    """
    counts: dict[str, pa.ChunkedArray | pa.Array] = {}
    for name, pattern, _repl in patterns:
        counts[name] = pc.cast(
            pc.count_substring_regex(texts, pattern), pa.int64()
        )
    redacted = texts
    for _name, pattern, repl in patterns:
        redacted = pc.replace_substring_regex(redacted, pattern, repl)
    return redacted, counts


def pii_scrub(
    ds: ray.data.Dataset,
    text_col: str,
    *,
    keep_cols: list[str],
    out_text_col: str = "clean_text",
    patterns: tuple[tuple[str, str, str], ...] = PII_PATTERNS,
) -> ray.data.Dataset:
    """Dataset → Dataset with ``out_text_col`` (redacted) and one
    ``n_<category>`` int64 column per pattern.  Pure map_batches over
    zero-copy Arrow; no shuffle."""

    def kernel(batch: pa.Table) -> pa.Table:
        redacted, counts = scrub_arrays(batch[text_col], patterns)
        cols: dict[str, pa.ChunkedArray | pa.Array] = {
            c: batch[c] for c in keep_cols
        }
        cols[out_text_col] = redacted
        for name, arr in counts.items():
            cols[f"n_{name}"] = arr
        return pa.table(cols)

    return ds.map_batches(kernel, batch_format="pyarrow")


def sql_scrub_expr(
    col: str, patterns: tuple[tuple[str, str, str], ...] = PII_PATTERNS
) -> str:
    """The DuckDB expression mirroring the sequential redaction."""
    expr = col
    for _name, pattern, repl in patterns:
        expr = f"regexp_replace({expr}, '{pattern}', '{repl}', 'g')"
    return expr


def sql_count_exprs(
    col: str, patterns: tuple[tuple[str, str, str], ...] = PII_PATTERNS
) -> str:
    """DuckDB select-list fragment: one match count per category,
    computed on the original text, named ``n_<category>``."""
    return ", ".join(
        f"len(regexp_extract_all({col}, '{pattern}'))::BIGINT as n_{name}"
        for name, pattern, _repl in patterns
    )
