"""Golden equality for the typed-field extraction pipeline: the
expected table is generated FORWARD with the spans (synth.py), the
pipeline must recover every field exactly, at any parallelism."""

from __future__ import annotations

import pandas as pd
import pytest

from ocr_poc_ray.extractors.fields import (
    extract_fields,
    fuzzy_similarity,
    normalize_height,
    validate_date,
    validate_height,
)
from ocr_poc_ray.synth import generate_span_docs

FIELDS = ("nom", "prenom", "date_naissance", "lieu_naissance", "sexe", "taille", "profession")


# ---------------------------------------------------------------------------
# Unit: P3 / P11 / validators
# ---------------------------------------------------------------------------

def test_fuzzy_similarity_fixed_points():
    assert fuzzy_similarity("NOM", "NOM") == 1.0
    assert fuzzy_similarity("N0M", "NOM") >= 0.6  # OCR-error variant
    assert fuzzy_similarity("", "NOM") == 0.0
    assert fuzzy_similarity("XYZQW", "NOM") < 0.4


def test_normalize_height():
    assert normalize_height("1.75") == "1,75"
    assert normalize_height("175") == "1,75"
    assert normalize_height("1,80m") == "1,80"


def test_validators():
    assert validate_date("01.02.1985")
    assert not validate_date("45.13.1985")
    assert not validate_date("01.02.2500")
    assert validate_height("1.75")
    assert not validate_height("9.75")


def test_quality_gate_failure():
    r = extract_fields(["A"], [0.4], [[[0, 0], [10, 0], [10, 10], [0, 10]]])
    assert not r.success
    assert r.error == "quality_gate_failed"
    assert all(v is None for v in r.fields.values())


# ---------------------------------------------------------------------------
# Golden E2E through the Ray stage
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def golden():
    spans, expected = generate_span_docs(n_docs=300, seed=99)
    return spans, expected.to_pandas()


def test_fields_golden_local(golden):
    """Single-process oracle path: extractor applied row by row."""
    spans, expected = golden
    from ocr_poc_ray.stages.fields import extract_fields_batch

    got = extract_fields_batch(spans).to_pandas()
    merged = expected.merge(got, on="doc_id", suffixes=("_exp", "_got"))
    assert len(merged) == len(expected)
    assert (merged["success_exp"] == merged["success_got"]).all()
    for f in FIELDS:
        a = merged[f"{f}_exp"].fillna("∅")
        b = merged[f"{f}_got"].fillna("∅")
        bad = merged[a != b]
        assert bad.empty, f"{f}: {bad[['doc_id', f + '_exp', f + '_got']].head(5).to_dict('records')}"


def test_fields_golden_distributed(ray_session, golden):
    """Same equality through map_batches at parallelism (block-split)."""
    import ray.data

    from ocr_poc_ray.stages.fields import extract_fields_ds

    spans, expected = golden
    ds = ray.data.from_arrow(spans).repartition(8)
    got = extract_fields_ds(ds, concurrency=(1, 4)).to_pandas()
    merged = expected.merge(got, on="doc_id", suffixes=("_exp", "_got"))
    assert len(merged) == len(expected)
    for f in FIELDS:
        assert (merged[f"{f}_exp"].fillna("∅") == merged[f"{f}_got"].fillna("∅")).all(), f
