"""Arrow schema constants — the engine's data dictionary.

The reference declares its field schemas out-of-band in
``data_dictionary.json`` and hard-codes them in each extractor
(``cni_extractor_18_f.py:493-501``).  We declare them once here as
`pyarrow.Schema` constants and validate at stage boundaries.
"""

from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------------------
# Input: the transcript table (BASELINE.json `input_hint`, verbatim shape).
# One row per turn; the analog of "one image document per request"
# (api_server.py:177-254).
# ---------------------------------------------------------------------------
TRANSCRIPTS_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),  # "user" | "assistant" | "tool"
        ("text", pa.string()),
        ("tool", pa.string()),  # payload type: "" | "html" | "pdf"
        ("ts", pa.timestamp("us")),
    ]
)

#: Values the `tool` dispatch column may take — analog of
#: (CardVersion, CardSide) enums (ocr/card_version.py:3-5, card_side.py:2-7).
KNOWN_TOOLS = ("", "html", "pdf")

#: Values the `role` column may take (request validator analog,
#: api_server.py:220-236).
KNOWN_ROLES = ("user", "assistant", "tool", "system")

# ---------------------------------------------------------------------------
# Output: one extraction envelope per turn — analog of the reference's
# result envelope {success, quality_score, confidence, data}
# (cni_extractor_18_f.py:514-520).  Flat columns (not a struct) so the
# equality join and Parquet predicate pushdown stay trivial.
# ---------------------------------------------------------------------------
EXTRACTION_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("tool", pa.string()),
        ("extracted_text", pa.string()),  # byte-equality comparison target
        ("success", pa.bool_()),
        ("quality_score", pa.float32()),  # P1 analog (cni_extractor_18_f.py:74-77)
        ("confidence", pa.float32()),  # P10 analog (cni_extractor_18_f.py:504-506)
        ("n_blocks", pa.int32()),  # blocks/spans seen before filtering
        ("n_kept", pa.int32()),  # blocks/spans kept as content
        ("error", pa.string()),  # failure reason, "" when success
        ("spans", pa.string()),  # kept-block char ranges in extracted_text ("s:e;s:e")
    ]
)

# Golden expected table emitted by the generator (FIXTURES.md §2).
EXPECTED_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("extracted_text", pa.string()),
        ("success", pa.bool_()),
    ]
)

# Per-conversation consolidated document (order-sensitive P5 analog:
# concatenation only correct under stable turn ordering).
CONVERSATION_DOC_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("n_turns", pa.int64()),
        ("doc_text", pa.string()),
    ]
)

# Row-local span fixture (reference OCR-record analog — parallel arrays
# rec_texts/rec_scores/rec_polys, cni_extractor_18_f.py:465-467).
SPANS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("layout", pa.string()),  # dispatch key into FIELD_LAYOUTS (M2 analog)
        ("texts", pa.list_(pa.string())),
        ("scores", pa.list_(pa.float32())),
        ("polys", pa.list_(pa.list_(pa.list_(pa.float32())))),
    ]
)

# Typed-field extraction output (extractors/fields.py): flat nullable
# string fields + envelope — the reference's extracted-fields record
# (cni_extractor_18_f.py:493-520) as columns; the union of every
# layout's field set (a row fills only its own layout's columns), the
# columnar form of the reference's per-(version,side) output dicts.
FIELDS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("layout", pa.string()),
        ("success", pa.bool_()),
        # front (cni_extractor_18_f.py:493-501)
        ("nom", pa.string()),
        ("prenom", pa.string()),
        ("date_naissance", pa.string()),
        ("lieu_naissance", pa.string()),
        ("sexe", pa.string()),
        ("taille", pa.string()),
        ("profession", pa.string()),
        # back (cni_extractor_18_b.py:430-440)
        ("identifiant_unique", pa.string()),
        ("numero_carte", pa.string()),
        ("code_postal", pa.string()),
        ("date_delivrance", pa.string()),
        ("date_expiration", pa.string()),
        ("autorite", pa.string()),
        ("adresse", pa.string()),
        ("quality_score", pa.float32()),
        ("confidence", pa.float32()),
        ("n_anchors", pa.int32()),
        ("error", pa.string()),
    ]
)


def validate_table(table: pa.Table, schema: pa.Schema, *, where: str = "") -> pa.Table:
    """Assert `table` matches `schema` by name and type; cast if needed.

    The analog of the reference's request validators
    (api_server.py:193-248) at a batch boundary.  Raises ValueError with
    the offending column instead of silently mis-typing.
    """
    names = list(schema.names)
    if set(table.column_names) != set(names):
        missing = set(names) - set(table.column_names)
        extra = set(table.column_names) - set(names)
        raise ValueError(
            f"schema mismatch{' at ' + where if where else ''}: "
            f"missing={sorted(missing)} extra={sorted(extra)}"
        )
    table = table.select(names)
    if table.schema != schema:
        table = table.cast(schema)
    return table
