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

FIELDS = (
    "nom", "prenom", "date_naissance", "lieu_naissance", "sexe", "taille", "profession",
    "identifiant_unique", "numero_carte", "code_postal",
    "date_delivrance", "date_expiration", "autorite", "adresse",
)


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


# ---------------------------------------------------------------------------
# N3 deskew + M4 post-processor slot
# ---------------------------------------------------------------------------

def test_deskew_restores_geometry():
    import math

    from ocr_poc_ray.extractors.fields import deskew_polys

    base = [[[60.0, 100.0], [140.0, 100.0], [140.0, 112.0], [60.0, 112.0]],
            [[60.0, 200.0], [300.0, 200.0], [300.0, 212.0], [60.0, 212.0]]]
    angle = 0.1
    c, s = math.cos(angle), math.sin(angle)
    rot = [[[306 + (x - 306) * c - (y - 396) * s, 396 + (x - 306) * s + (y - 396) * c]
            for x, y in p] for p in base]
    fixed, est = deskew_polys(rot)
    assert abs(est - angle) < 1e-6
    for p_fixed, p_base in zip(fixed, base):
        for (xf, yf), (xb, yb) in zip(p_fixed, p_base):
            assert abs(xf - xb) < 1e-6 and abs(yf - yb) < 1e-6


def test_deskew_identity_when_straight():
    from ocr_poc_ray.extractors.fields import deskew_polys

    base = [[[0.0, 0.0], [10.0, 0.0], [10.0, 5.0], [0.0, 5.0]]]
    fixed, est = deskew_polys(base)
    assert est == 0.0 and fixed is base


def test_postprocessor_stub(ray_session):
    import numpy as np
    import ray.data

    from ocr_poc_ray.stages.fields import extract_fields_ds
    from ocr_poc_ray.stages.postprocess import postprocess_fields
    from ocr_poc_ray.synth import generate_span_docs

    spans, _ = generate_span_docs(n_docs=40, seed=5)
    ds = extract_fields_ds(ray.data.from_arrow(spans))
    out = postprocess_fields(ds).to_pandas()
    assert out["postprocessed"].all()
    assert "post_conf" not in out.columns  # default path: no model column
    names = out.loc[out["success"] & out["nom"].notna(), "nom"]
    assert len(names) > 0 and all(v == v.title() for v in names)

    # real-model seat: on-disk logistic weights load once per actor and
    # add a deterministic confidence column; cleaning is unchanged
    real = postprocess_fields(ds, use_real_model=True).to_pandas()
    real2 = postprocess_fields(ds, use_real_model=True).to_pandas()
    key = ["doc_id"] if "doc_id" in real.columns else list(real.columns[:1])
    real = real.sort_values(key).reset_index(drop=True)
    real2 = real2.sort_values(key).reset_index(drop=True)
    assert real["post_conf"].between(0, 1).all()
    assert np.allclose(real["post_conf"], real2["post_conf"])
    base = out.sort_values(key).reset_index(drop=True)
    assert real["nom"].equals(base["nom"])


def test_back_layout_two_date_order_rule():
    """TRUE P5 (cni_extractor_18_b.py:206-210): the FIRST date in line
    order is the delivery date, the second the expiry — swapping the
    line order swaps the assignment."""
    from ocr_poc_ray.extractors.fields import BACK_LAYOUT, extract_fields

    def doc(date_first, date_second):
        texts = ["12345678901234567", date_first, date_second, "AB12", "987654321"]
        scores = [0.95] * 5
        polys = [[[60, 80 + 60 * i], [160, 80 + 60 * i], [160, 92 + 60 * i], [60, 92 + 60 * i]]
                 for i in range(5)]
        return extract_fields(texts, scores, polys, layout=BACK_LAYOUT)

    r = doc("01.02.2018", "01.02.2028")
    assert r.success
    assert r.fields["date_delivrance"] == "01.02.2018"
    assert r.fields["date_expiration"] == "01.02.2028"
    assert r.fields["identifiant_unique"] == "12345678901234567"
    assert r.fields["numero_carte"] == "987654321"
    assert r.fields["code_postal"] == "AB12"

    swapped = doc("01.02.2028", "01.02.2018")
    assert swapped.fields["date_delivrance"] == "01.02.2028"
    assert swapped.fields["date_expiration"] == "01.02.2018"


def test_unknown_layout_is_failure_row(ray_session):
    import ray.data as rd

    from ocr_poc_ray.stages.fields import extract_fields_ds
    from ocr_poc_ray.synth import generate_span_docs

    spans, _ = generate_span_docs(n_docs=5, seed=3)
    import pyarrow as pa

    bad = spans.set_column(
        spans.schema.get_field_index("layout"),
        "layout",
        pa.array(["mystery"] * spans.num_rows, pa.string()),
    )
    out = extract_fields_ds(rd.from_arrow(bad)).to_pandas()
    assert (~out["success"]).all()
    assert (out["error"] == "unknown_layout:mystery").all()


# ---------------------------------------------------------------------------
# Per-layout P1 gates + 25-series noise filters (reference parity:
# cni_extractor_{18_f,18_b,25_f,25_b}.py)
# ---------------------------------------------------------------------------

def _poly(i):
    y = 80 + 60 * i
    return [[60, y], [220, y], [220, y + 12], [60, y + 12]]


def test_per_layout_quality_gates():
    """Seven 0.95-score lines pass the 18B/25F/25B gates but FAIL the
    18F gate (≥8 valid / ≥5 good); five lines pass only the B gates."""
    from ocr_poc_ray.extractors.fields import (
        BACK_25_LAYOUT, BACK_LAYOUT, FRONT_25_LAYOUT, FRONT_LAYOUT,
    )

    def run(n, layout):
        texts = [f"word{i}" for i in range(n)]
        return extract_fields(texts, [0.95] * n, [_poly(i) for i in range(n)], layout=layout)

    assert run(7, FRONT_LAYOUT).error == "quality_gate_failed"      # 18F: 7 < 8
    assert run(8, FRONT_LAYOUT).error != "quality_gate_failed"
    assert run(7, BACK_LAYOUT).error != "quality_gate_failed"       # 18B: 7 ≥ 5
    assert run(7, FRONT_25_LAYOUT).error != "quality_gate_failed"   # 25F: 7 ≥ 6
    assert run(5, FRONT_25_LAYOUT).error == "quality_gate_failed"   # 25F: 5 < 6
    assert run(5, BACK_25_LAYOUT).error != "quality_gate_failed"    # 25B: 5 ≥ 5


def test_front_25_watermark_vocabulary():
    """25F noise filter: watermark words and bare country codes are
    dropped before fallback assignment — a TRAVAIL/CAMEROUN/CMR line
    must never land in a field (cni_extractor_25_f.py:120-138); the
    18F layout keeps them (its preprocess has no ignore_words)."""
    from ocr_poc_ray.extractors.fields import FRONT_25_LAYOUT, FRONT_LAYOUT

    texts = ["TRAVAIL", "CAMEROUN", "CMR", "DUPONT", "MARIE", "DOUALA",
             "pad0", "pad1", "pad2"]
    n = len(texts)
    scores = [0.95] * n
    polys = [_poly(i) for i in range(n)]

    r25 = extract_fields(texts, scores, polys, layout=FRONT_25_LAYOUT)
    assert r25.success
    assert r25.fields["nom"] == "DUPONT"
    assert r25.fields["prenom"] == "MARIE"
    assert r25.fields["lieu_naissance"] == "DOUALA"

    r18 = extract_fields(texts, scores, polys, layout=FRONT_LAYOUT)
    assert r18.fields["nom"] == "TRAVAIL"  # 18F keeps watermark lines


def test_back_25_mrz_drop():
    """25B preprocess drops MRZ lines (I< / <<<) and bare CMR before
    fallback assignment (cni_extractor_25_b.py:121-129)."""
    from ocr_poc_ray.extractors.fields import BACK_25_LAYOUT

    texts = ["I<CMR0000000<<<<<", "CMR", "PREFECTURE", "RUE 12", "pad0", "pad1"]
    n = len(texts)
    r = extract_fields(texts, [0.95] * n, [_poly(i) for i in range(n)],
                       layout=BACK_25_LAYOUT)
    assert r.success
    assert r.fields["autorite"] == "PREFECTURE"
    assert r.fields["adresse"] == "RUE 12"


def test_layout_registry_is_two_by_two():
    from ocr_poc_ray.extractors.fields import FIELD_LAYOUTS

    assert {"front_18", "back_18", "front_25", "back_25"} <= set(FIELD_LAYOUTS)
    # aliases keep the synth corpus's layout keys working
    assert FIELD_LAYOUTS["front"] is FIELD_LAYOUTS["front_18"]
    assert FIELD_LAYOUTS["back"] is FIELD_LAYOUTS["back_18"]


# -- N3 template-matching fallback (main.ipynb cell 2 port) ------------------


def _rotated_front_doc(angle: float):
    """Anchored front doc whose span POSITIONS are rotated while the
    boxes stay axis-aligned — the deskew-blind case (every baseline
    reads horizontal, so deskew_polys is an identity)."""
    import math

    def span(text, x, y, score=0.95):
        w = 8.0 * len(text)
        return text, score, [[x, y], [x + w, y], [x + w, y + 12.0], [x, y + 12.0]]

    rows = {"nom": 80.0, "prenom": 180.0, "lieu_naissance": 280.0,
            "profession": 380.0}
    labels = {"nom": "Nom / Name", "prenom": "Prenom / Given name",
              "lieu_naissance": "Lieu de naissance / Place of birth",
              "profession": "Profession / Occupation"}
    vals = {"nom": "MAPLEWOOD", "prenom": "KESTREL",
            "lieu_naissance": "RIVERDALE", "profession": "ENGINEER"}
    spans = []
    for f, y in rows.items():
        lab = labels[f]
        spans.append(span(lab, 60.0, y))
        spans.append(span(vals[f], 60.0 + 8.0 * len(lab) + 25.0, y))
    spans.append(span("M", 60.0, 560.0))
    spans.append(span("1.75", 60.0, 520.0))
    spans.append(span("14.03.1988", 60.0, 480.0))
    spans.append(span("pad0", 550.0, 760.0))
    spans.append(span("pad1", 300.0, 700.0))
    cx, cy = 306.0, 396.0
    cos_a, sin_a = math.cos(angle), math.sin(angle)
    out = []
    for t, sc, p in spans:
        x0, y0 = p[0]
        w = 8.0 * len(t)
        ncx = cx + (x0 + w / 2 - cx) * cos_a - (y0 + 6 - cy) * sin_a
        ncy = cy + (x0 + w / 2 - cx) * sin_a + (y0 + 6 - cy) * cos_a
        out.append(span(t, ncx - w / 2, ncy - 6, sc))
    return out, vals


@pytest.mark.parametrize("angle", [0.0, 0.12, 0.2, -0.15])
def test_template_matching_recovers_position_rotation(angle):
    """Deskew-only misassigns fields on position-rotated docs (axis-
    aligned boxes); the template-zone strategy must recover them all."""
    from ocr_poc_ray.extractors.fields import FRONT_LAYOUT, extract_fields

    spans, vals = _rotated_front_doc(angle)
    texts = [s[0] for s in spans]
    scores = [s[1] for s in spans]
    polys = [s[2] for s in spans]
    r = extract_fields(texts, scores, polys, layout=FRONT_LAYOUT)
    assert r.success
    for f, v in vals.items():
        assert r.fields[f] == v, (angle, f, r.fields[f])
    assert r.fields["sexe"] == "M"
    assert r.fields["taille"] == "1,75"
    assert r.fields["date_naissance"] == "14.03.1988"


def test_template_strategy_inert_when_straight():
    """A straight document estimates ~0 rotation and must not take the
    template path at all (P8 output byte-identical with zones removed)."""
    from dataclasses import replace

    from ocr_poc_ray.extractors.fields import FRONT_LAYOUT, extract_fields

    spans, _ = _rotated_front_doc(0.0)
    texts = [s[0] for s in spans]
    scores = [s[1] for s in spans]
    polys = [s[2] for s in spans]
    with_tpl = extract_fields(texts, scores, polys, layout=FRONT_LAYOUT)
    bare = replace(FRONT_LAYOUT, template_zones=(), alignment_anchors=())
    without = extract_fields(texts, scores, polys, layout=bare)
    assert with_tpl.fields == without.fields
