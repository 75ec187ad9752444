"""Property-based robustness (SURVEY.md §5.4 + §7.4.4): extraction is
total — ANY input yields a well-formed envelope, never an exception —
and the frozen whitespace normalization is idempotent and stable."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_poc_ray.extractors.base import normalize_ws
from ocr_poc_ray.extractors.fields import extract_fields
from ocr_poc_ray.extractors.registry import extract_turn

_tools = st.sampled_from(["", "html", "pdf", "img", "weird", "HTML"])


@settings(max_examples=300, deadline=None)
@given(text=st.text(max_size=2000), tool=_tools)
def test_extract_turn_is_total(text, tool):
    r = extract_turn(text, tool)
    assert isinstance(r.extracted_text, str)
    assert isinstance(r.success, bool)
    assert 0.0 <= r.confidence <= 1.0 or r.quality_score >= 0.0
    if not r.success:
        assert r.error  # failures always carry a reason
    # the envelope's text is always fully normalized
    assert r.extracted_text == normalize_ws(r.extracted_text)


@settings(max_examples=200, deadline=None)
@given(text=st.text(max_size=500))
def test_normalize_ws_idempotent(text):
    once = normalize_ws(text)
    assert normalize_ws(once) == once
    assert once == once.strip()


@settings(max_examples=100, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.text(max_size=40),
            st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
            st.floats(min_value=-1000, max_value=1000, allow_nan=False),
            st.floats(min_value=-1000, max_value=1000, allow_nan=False),
        ),
        max_size=20,
    )
)
def test_extract_fields_is_total(rows):
    texts = [r[0] for r in rows]
    scores = [r[1] for r in rows]
    polys = [
        [[r[2], r[3]], [r[2] + 10, r[3]], [r[2] + 10, r[3] + 5], [r[2], r[3] + 5]]
        for r in rows
    ]
    res = extract_fields(texts, scores, polys)
    assert isinstance(res.success, bool)
    assert set(res.fields) == {
        "nom", "prenom", "date_naissance", "lieu_naissance", "sexe", "taille", "profession",
    }
