"""Typed-field extraction over span records — the reference's full
8-stage heuristic pipeline (SURVEY.md §2.3) re-expressed as a pure
per-record function the actor-pool stage maps over Arrow batches.

Input is one document's parallel arrays (texts, scores, polys) — the
OCR-record analog (``cni_extractor_18_f.py:465-467``); output is a flat
dict of nullable string fields + envelope, exactly the reference's
result shape (``:493-520``).

Stage map (citations into /root/reference):
  P1 quality gate          cni_extractor_18_f.py:50-91
  P2 noise filter          cni_extractor_18_f.py:93-132
  P3 fuzzy similarity      cni_extractor_18_f.py:134-156
  P4 regex parse+consume   cni_extractor_18_f.py:158-212
  P5 date disambiguation   cni_extractor_18_b.py:206-210 (order-dependent)
  P6 anchor detection      cni_extractor_18_f.py:214-249 (vocab :26-33)
  P7 label classifier      cni_extractor_18_f.py:251-291
  P8 spatial proximity     cni_extractor_18_f.py:293-351
  P9 positional fallback   cni_extractor_18_f.py:359-440
  P10 consolidation        cni_extractor_18_f.py:492-520
  P11 normalizers          cni_extractor_18_f.py:195-203
plus N1/N2 typed validators (main.ipynb cells 0-1: date-range, height
range 1.0–2.5 m, alpha names).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field, replace as _dc_replace
from difflib import SequenceMatcher

from ocr_poc_ray.extractors.base import WATERMARK_WORDS

# ---------------------------------------------------------------------------
# P3: fuzzy similarity — SequenceMatcher ratio with a prefix bonus
# (cni_extractor_18_f.py:134-156: min(base + prefix*0.1*(1-base), 1)).
# ---------------------------------------------------------------------------


def fuzzy_similarity(a: str, b: str) -> float:
    a, b = a.upper().strip(), b.upper().strip()
    if not a or not b:
        return 0.0
    base = SequenceMatcher(None, a, b).ratio()
    prefix = 0
    for ca, cb in zip(a, b):
        if ca != cb:
            break
        prefix += 1
    prefix = min(prefix, 4)
    return min(base + prefix * 0.1 * (1.0 - base), 1.0)


# ---------------------------------------------------------------------------
# Field model: fixed per-"layout" field lists + anchor vocabularies,
# declared as data (the reference hard-codes them per extractor class
# :26-33 and documents them in data_dictionary.json).
# ---------------------------------------------------------------------------

#: regex-typed fields (P4) — first match wins, matched lines are
#: consumed (cni_extractor_18_f.py:209-211).
DATE_RE = re.compile(r"^\d{1,2}[./]\d{1,2}[./]\d{4}$")
HEIGHT_RE = re.compile(r"^[12][,.]?\d{2}m?$")
SEX_RE = re.compile(r"^(M|F)$")
# back-layout regexes (cni_extractor_18_b.py:171-173)
UNIQUE_ID_RE = re.compile(r"^\d{15,20}$")
CARD_NO_RE = re.compile(r"^\d{9}$")
POST_CODE_RE = re.compile(r"^[A-Z]{2}\d{2}$")

ANCHOR_VOCAB: dict[str, tuple[str, ...]] = {
    "nom": ("NOM", "NAME", "NOM / NAME", "N0M", "SURNAME"),
    "prenom": ("PRENOM", "PRENOMS", "GIVEN NAME", "PRENOM / GIVEN NAME", "PREN0M"),
    "lieu_naissance": (
        "LIEU DE NAISSANCE", "PLACE OF BIRTH", "LIEU DE NAISSANCE / PLACE OF BIRTH",
    ),
    "profession": ("PROFESSION", "OCCUPATION", "PROFESSION / OCCUPATION"),
}

BACK_ANCHOR_VOCAB: dict[str, tuple[str, ...]] = {
    "autorite": ("AUTORITE", "AUTHORITY", "AUTORITE / AUTHORITY", "AUT0RITE"),
    "adresse": ("ADRESSE", "ADDRESS", "ADRESSE / ADDRESS"),
}

#: fallback order for unfilled text fields (P9: y-sorted assignment,
#: cni_extractor_18_f.py:417-438).
FALLBACK_FIELDS = ("nom", "prenom", "lieu_naissance")

ALL_FIELDS = (
    "nom", "prenom", "date_naissance", "lieu_naissance", "sexe", "taille", "profession",
)

BACK_FIELDS = (
    "identifiant_unique", "numero_carte", "code_postal",
    "date_delivrance", "date_expiration", "autorite", "adresse",
)

SIMILARITY_THRESHOLD = 0.70  # P6 (constructor default, :12-23)
LABEL_SIMILARITY = 0.75  # P7 (:251-291)


@dataclass(frozen=True)
class FieldExtractorConfig:
    """Tunable thresholds — the analog of the reference's constructor
    parameters ``quality_threshold`` / ``similarity_threshold`` / etc.
    (``cni_extractor_18_f.py:12-23``) and ``config.yaml`` keys."""

    similarity_threshold: float = SIMILARITY_THRESHOLD
    label_similarity: float = LABEL_SIMILARITY
    min_positive_lines: int = 5  # P1 gate (:84-87 analog)
    min_mean_score: float = 0.5
    min_good_lines: int = 3
    good_score: float = 0.7
    min_line_score: float = 0.3  # P2 (:93-132)


DEFAULT_CONFIG = FieldExtractorConfig()

# The reference's four per-extractor P1 gates — each (version, side)
# variant hard-codes its own can_proceed counts:
#   18F: ≥8 valid, mean ≥ 0.5, ≥5 good   (cni_extractor_18_f.py:84-87)
#   18B: ≥5 valid, mean ≥ 0.5, ≥3 good   (cni_extractor_18_b.py:91-93)
#   25F: ≥6 valid, mean ≥ 0.5, ≥4 good   (cni_extractor_25_f.py:96-98)
#   25B: ≥5 valid, mean ≥ 0.5, ≥3 good   (cni_extractor_25_b.py:93-95)
GATE_18F = FieldExtractorConfig(min_positive_lines=8, min_good_lines=5)
GATE_18B = FieldExtractorConfig(min_positive_lines=5, min_good_lines=3)
GATE_25F = FieldExtractorConfig(min_positive_lines=6, min_good_lines=4)
GATE_25B = FieldExtractorConfig(min_positive_lines=5, min_good_lines=3)


@dataclass(frozen=True)
class FieldLayout:
    """One extraction program — the unit of the reference's 2×2 registry
    (``ocr/id_card_data_extractor.py:25-35``: one extractor per
    (version, side)).  A layout bundles its field list, regex specs,
    ordered-date rule, anchor vocabulary, and fallback order; the
    8-stage pipeline below is shared by every layout."""

    name: str
    all_fields: tuple[str, ...]
    #: (field, regex, validator|None, normalizer|None) tried in order per line
    regex_specs: tuple
    #: fields assigned from the ordered date list (P5: first date → first
    #: field, second → second — cni_extractor_18_b.py:206-210)
    date_fields: tuple[str, ...]
    anchor_vocab: dict
    fallback_fields: tuple[str, ...]
    #: fields cleared when a label leaked into them (N2 repair)
    repair_fields: tuple[str, ...]
    #: per-layout P1 gate — the reference hard-codes a different
    #: can_proceed triple in each extractor class (GATE_18F/18B/25F/25B)
    config: FieldExtractorConfig = DEFAULT_CONFIG
    #: 25F watermark vocabulary (cni_extractor_25_f.py:130-133): lines
    #: whose upper() is in this set are dropped by the P2 preprocess
    noise_words: frozenset = frozenset()
    #: 25F country-code drop (:135-138): bare 3-letter uppercase words
    drop_country_codes: bool = False
    #: 25B MRZ drop (cni_extractor_25_b.py:121-124): I< / <<< lines
    drop_mrz: bool = False
    #: N3 template-matching fallback (main.ipynb cell 2,
    #: CNIExtractorTemplateMatching.template_zones): relative-coordinate
    #: zones tried for fields STILL EMPTY after the P8 proximity pass —
    #: ((field, x, y, width, height, (anchor_words, ...)), ...).  Empty
    #: tuple disables the strategy for the layout.
    template_zones: tuple = ()
    #: alignment anchors with their canonical relative centroids
    #: ((text, rel_x, rel_y), ...) — cell 2's alignment_anchors, plus
    #: the template position each anchor is expected at (the reference
    #: assumes a horizontal anchor pair; carrying the expected position
    #: generalizes its arctan2 rotation estimate to any pair)
    alignment_anchors: tuple = ()

    @property
    def anchor_strings(self) -> tuple[str, ...]:
        return tuple(s for syns in self.anchor_vocab.values() for s in syns)


#: N3 template for the canonical front document (main.ipynb cell 2's
#: ``template_zones`` — relative (x, y, w, h) of each VALUE zone in the
#: golden layout, with the anchor words excluded from extraction).
#: Like the reference's zones are tuned to the CNI card geometry, these
#: are tuned to the canonical golden-fixture layout (synth.py
#: _FIELD_ROWS / _ANCHOR_LABELS); zones sit to the right of each label
#: row, so fallback-variant documents (values at the left margin) never
#: produce zone candidates.
FRONT_TEMPLATE_ZONES = (
    ("nom", 0.16, 0.00, 0.17, 0.06, ("NOM", "NAME")),
    ("prenom", 0.31, 0.12, 0.17, 0.06, ("PRENOM", "GIVEN")),
    ("lieu_naissance", 0.55, 0.26, 0.17, 0.07, ("LIEU", "NAISSANCE", "PLACE", "BIRTH")),
    ("profession", 0.37, 0.41, 0.17, 0.06, ("PROFESSION", "OCCUPATION")),
)

#: alignment anchors = the label lines, with their canonical relative
#: centroids (cell 2's ``alignment_anchors``, plus expected positions —
#: see _estimate_template_transform)
FRONT_ALIGNMENT_ANCHORS = (
    ("NOM / NAME", 0.075, 0.009),
    ("PRENOM / GIVEN NAME", 0.143, 0.151),
    ("LIEU DE NAISSANCE / PLACE OF BIRTH", 0.257, 0.294),
    ("PROFESSION / OCCUPATION", 0.174, 0.437),
)

FRONT_LAYOUT = FieldLayout(
    name="front_18",
    all_fields=ALL_FIELDS,
    regex_specs=(
        ("taille", HEIGHT_RE, "validate_height", "normalize_height"),
        ("sexe", SEX_RE, None, None),
    ),
    date_fields=("date_naissance",),
    anchor_vocab=ANCHOR_VOCAB,
    fallback_fields=FALLBACK_FIELDS,
    repair_fields=("nom", "prenom"),
    config=GATE_18F,
    template_zones=FRONT_TEMPLATE_ZONES,
    alignment_anchors=FRONT_ALIGNMENT_ANCHORS,
)

BACK_LAYOUT = FieldLayout(
    name="back_18",
    all_fields=BACK_FIELDS,
    regex_specs=(
        ("identifiant_unique", UNIQUE_ID_RE, None, None),
        ("numero_carte", CARD_NO_RE, None, None),
        ("code_postal", POST_CODE_RE, None, None),
    ),
    date_fields=("date_delivrance", "date_expiration"),
    anchor_vocab=BACK_ANCHOR_VOCAB,
    fallback_fields=("autorite", "adresse"),
    repair_fields=("autorite",),
    config=GATE_18B,
)

#: 2025-version variants: same field programs, the 25-series gates and
#: noise filters (watermark vocabulary + country-code drop on the
#: front, MRZ drop + bare CMR on the back).
FRONT_25_LAYOUT = _dc_replace(
    FRONT_LAYOUT,
    name="front_25",
    config=GATE_25F,
    noise_words=WATERMARK_WORDS,
    drop_country_codes=True,
)

BACK_25_LAYOUT = _dc_replace(
    BACK_LAYOUT,
    name="back_25",
    config=GATE_25B,
    noise_words=frozenset({"CMR"}),
    drop_mrz=True,
)

#: the layout registry — add an entry to support a new document side /
#: version, exactly how the reference grows its 2×2 dict
#: (``ocr/id_card_data_extractor.py:25-35``).  "front"/"back" alias the
#: 2018 variants (the synth corpus's default layouts).
FIELD_LAYOUTS: dict[str, FieldLayout] = {
    "front": FRONT_LAYOUT,
    "back": BACK_LAYOUT,
    "front_18": FRONT_LAYOUT,
    "back_18": BACK_LAYOUT,
    "front_25": FRONT_25_LAYOUT,
    "back_25": BACK_25_LAYOUT,
}

_ALL_ANCHOR_STRINGS = tuple(s for syns in ANCHOR_VOCAB.values() for s in syns)

_BILINGUAL_RE = re.compile(r"^[^/]{1,30}/[^/]{1,30}:?$")


@dataclass
class _Line:
    idx: int
    text: str
    score: float
    cx: float
    cy: float
    x1: float  # right edge
    consumed: bool = False
    is_label: bool = field(default=False)


def _centroid(poly: list[list[float]]) -> tuple[float, float, float]:
    xs = [p[0] for p in poly]
    ys = [p[1] for p in poly]
    return sum(xs) / len(xs), sum(ys) / len(ys), max(xs)


# ---------------------------------------------------------------------------
# N3: geometric normalization (template-matching strategy, main.ipynb
# cell 2): the reference estimates document rotation from two anchor
# centroids via arctan2 and maps template zones through the transform.
# We estimate skew from every span's own baseline edge (p0→p1 of the
# box) — more robust than two anchors — and derotate all coordinates
# about the page center before any proximity geometry runs.
# ---------------------------------------------------------------------------

import math

_DESKEW_MIN_ANGLE = 0.01  # rad; below this the doc is already straight


def _estimate_skew(polys) -> float:
    angles = []
    for p in polys:
        if len(p) >= 2:
            dx, dy = p[1][0] - p[0][0], p[1][1] - p[0][1]
            if abs(dx) > 1e-6 or abs(dy) > 1e-6:
                angles.append(math.atan2(dy, dx))
    if not angles:
        return 0.0
    angles.sort()
    return angles[len(angles) // 2]  # median


def deskew_polys(polys, *, cx: float = 306.0, cy: float = 396.0):
    """Rotate all polygons about the page center so text baselines are
    horizontal.  Returns (polys, angle); identity when |angle| is tiny."""
    angle = _estimate_skew(polys)
    if abs(angle) < _DESKEW_MIN_ANGLE:
        return polys, 0.0
    cos_a, sin_a = math.cos(-angle), math.sin(-angle)
    out = []
    for p in polys:
        q = []
        for x, y in p:
            dx, dy = x - cx, y - cy
            q.append([cx + dx * cos_a - dy * sin_a, cy + dx * sin_a + dy * cos_a])
        out.append(q)
    return out, angle


# ---------------------------------------------------------------------------
# N3 (full): template-matching fallback strategy — the port of
# main.ipynb cell 2 (CNIExtractorTemplateMatching):
#   find_document_bounds  → min/max over every polygon point
#   detect_anchor_points  → substring / word-set-Jaccard(>0.8) match of
#                           alignment anchors, centroid recorded
#   estimate_transformation → rotation from the FIRST TWO detected
#                           anchor centroids via arctan2, folded into
#                           (-π/4, π/4] (cell 2 normalizes "proche de 0
#                           ou 90 degrés"); the reference assumes a
#                           horizontal anchor pair — carrying each
#                           anchor's expected template position
#                           generalizes the estimate to any pair
#   transform_point(inverse) → denormalize zone corners by the document
#                           bounds, rotate about the bounds center
#   extract_from_zone     → candidates whose centroid falls in the
#                           20%-margin-expanded zone, scored
#                           ocr_score × proximity-to-zone-center,
#                           anchor words excluded
#   validate_extraction   → typed per-field validation
# Runs for fields STILL EMPTY after P8 — the recovery path when the
# baseline deskew is blind (e.g. axis-aligned OCR boxes on a rotated
# document: every baseline reads horizontal, yet positions are rotated).
# ---------------------------------------------------------------------------


def _word_jaccard(a: str, b: str) -> float:
    """cell 2 ``similarity``: word-set Jaccard."""
    s1, s2 = set(a.split()), set(b.split())
    union = s1 | s2
    return len(s1 & s2) / len(union) if union else 0.0


def _document_bounds(polys) -> tuple[float, float, float, float]:
    """cell 2 ``find_document_bounds`` (same 2000×1600 fallback)."""
    pts = [pt for poly in polys for pt in poly]
    if not pts:
        return 0.0, 0.0, 2000.0, 1600.0
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    return min(xs), min(ys), max(xs), max(ys)


def _estimate_template_transform(lines, polys, layout: "FieldLayout") -> dict:
    """cell 2 ``estimate_transformation``, generalized: an affine fit
    (template unit square → image) from the detected alignment anchors.

    - ≥3 anchors: least-squares 2×3 affine — rotation, anisotropic
      scale, and translation all from the anchors themselves (the
      rotation-distorted document bounds drop out entirely).
    - 2 anchors: the reference's own shape — bounds denormalization
      composed with the arctan2 pair rotation about the bounds center
      (cell 2's ``if len(anchors) >= 2`` branch).
    - <2 anchors: pure bounds denormalization (cell 2's defaults).
    ``rotation`` (the image angle of the template x-axis) is reported
    for the deskew-blindness trigger in ``extract_fields``.
    """
    import numpy as np

    min_x, min_y, max_x, max_y = _document_bounds(polys)
    W = max(max_x - min_x, 1e-6)
    H = max(max_y - min_y, 1e-6)

    detected = []
    for text, rx, ry in layout.alignment_anchors:
        up_a = text.upper()
        for ln in lines:
            up = ln.text.strip().upper()
            if up_a in up or _word_jaccard(up, up_a) > 0.8:
                detected.append((rx, ry, ln.cx, ln.cy))
                break

    if len(detected) >= 3:
        src = np.array([[rx, ry, 1.0] for rx, ry, _, _ in detected])
        dst = np.array([[ox, oy] for _, _, ox, oy in detected])
        A, *_ = np.linalg.lstsq(src, dst, rcond=None)  # (3, 2)
        mat = A.T  # (2, 3): (rx, ry, 1) → (x, y)
        # the affine x-column is (W*cos, W*sin): both components share
        # the W scale, so no per-axis normalization — dividing the sine
        # term by H would skew the angle by the document aspect ratio
        rotation = math.atan2(mat[1, 0], mat[0, 0])
        return {"matrix": mat, "rotation": rotation}

    rotation = 0.0
    if len(detected) == 2:
        rx1, ry1, x1, y1 = detected[0]
        rx2, ry2, x2, y2 = detected[1]
        ang_obs = math.atan2(y2 - y1, x2 - x1)
        ang_exp = math.atan2((ry2 - ry1) * H, (rx2 - rx1) * W)
        rot = ang_obs - ang_exp
        while rot > math.pi:
            rot -= 2 * math.pi
        while rot <= -math.pi:
            rot += 2 * math.pi
        # cell 2 normalization: accept near-0 rotations, fold near-90°
        if abs(rot) < math.pi / 4:
            rotation = rot
        elif abs(rot - math.pi / 2) < math.pi / 4:
            rotation = rot - math.pi / 2
        elif abs(rot + math.pi / 2) < math.pi / 4:
            rotation = rot + math.pi / 2

    # bounds denormalization + rotation about the bounds center, as one
    # affine matrix (cell 2 transform_point(inverse=True))
    cx, cy = min_x + W / 2, min_y + H / 2
    cos_r, sin_r = math.cos(rotation), math.sin(rotation)
    # (rx, ry) → abs → rotate about (cx, cy)
    mat = np.array(
        [
            [cos_r * W, -sin_r * H,
             cos_r * (min_x - cx) - sin_r * (min_y - cy) + cx],
            [sin_r * W, cos_r * H,
             sin_r * (min_x - cx) + cos_r * (min_y - cy) + cy],
        ]
    )
    return {"matrix": mat, "rotation": rotation}


def _zone_to_image(x: float, y: float, tr: dict) -> tuple[float, float]:
    """Template (relative) point → image point through the fitted affine."""
    m = tr["matrix"]
    return (
        m[0, 0] * x + m[0, 1] * y + m[0, 2],
        m[1, 0] * x + m[1, 1] * y + m[1, 2],
    )


def _validate_template_value(field: str, value: str) -> bool:
    """cell 2 ``validate_extraction`` (typed per-field checks)."""
    if not value:
        return False
    if field in ("date_naissance", "date_delivrance", "date_expiration"):
        return bool(re.match(r"^\d{1,2}[./]\d{1,2}[./]\d{4}", value))
    if field == "sexe":
        return value.upper() in ("M", "F")
    if field == "taille":
        return bool(re.match(r"^[12][,.]?\d{2}", value))
    return len(value) >= 2 and any(c.isalpha() for c in value)


def _apply_template_fallback(
    fields: dict, lines, polys, layout: "FieldLayout", tr: dict | None = None
):
    """Fill still-empty fields from their template zones (cell 2
    ``extract_from_zone`` + ``extract``); assigned lines are consumed so
    P8/P9 never reuse them."""
    if tr is None:
        tr = _estimate_template_transform(lines, polys, layout)
    for fname, zx, zy, zw, zh, anchor_words in layout.template_zones:
        if fields.get(fname) is not None:
            continue
        x1, y1 = _zone_to_image(zx, zy, tr)
        x2, y2 = _zone_to_image(zx + zw, zy + zh, tr)
        x1, x2 = min(x1, x2), max(x1, x2)
        y1, y2 = min(y1, y2), max(y1, y2)
        mx, my = (x2 - x1) * 0.2, (y2 - y1) * 0.2  # cell 2's 20% margin
        x1, x2, y1, y2 = x1 - mx, x2 + mx, y1 - my, y2 + my
        zcx, zcy = (x1 + x2) / 2, (y1 + y2) / 2
        max_dist = math.hypot(x2 - x1, y2 - y1)
        best_score, best_line = 0.0, None
        for ln in lines:
            if ln.consumed or ln.is_label or not ln.text.strip():
                continue
            if not (x1 <= ln.cx <= x2 and y1 <= ln.cy <= y2):
                continue
            up = ln.text.upper()
            if any(a in up for a in anchor_words):
                continue  # cell 2: anchor words never extract as values
            proximity = (
                1.0 - math.hypot(ln.cx - zcx, ln.cy - zcy) / max_dist
                if max_dist > 0
                else 1.0
            )
            score = ln.score * proximity
            if score > best_score:
                best_score, best_line = score, ln
        if best_line is not None and _validate_template_value(
            fname, best_line.text.strip()
        ):
            fields[fname] = best_line.text.strip()
            best_line.consumed = True


# ---------------------------------------------------------------------------
# P11 + N1/N2: normalizers and typed validators
# ---------------------------------------------------------------------------


def normalize_height(s: str) -> str:
    """'1.75' / '175' / '1,75m' → '1,75' (cni_extractor_18_f.py:195-203;
    'm' suffix strip cni_extractor_25_b.py:187-190)."""
    s = s.strip().rstrip("mM")
    s = s.replace(".", ",")
    if "," not in s and len(s) == 3:
        s = s[0] + "," + s[1:]
    return s


def validate_date(s: str) -> bool:
    """1900 ≤ year ≤ 2100 and plausible day/month (main.ipynb cell 1)."""
    m = re.match(r"^(\d{1,2})[./](\d{1,2})[./](\d{4})$", s)
    if not m:
        return False
    d, mo, y = int(m.group(1)), int(m.group(2)), int(m.group(3))
    return 1 <= d <= 31 and 1 <= mo <= 12 and 1900 <= y <= 2100


def validate_height(s: str) -> bool:
    try:
        v = float(normalize_height(s).replace(",", "."))
    except ValueError:
        return False
    return 1.0 <= v <= 2.5  # main.ipynb cell 0 validate_field


# ---------------------------------------------------------------------------
# The pipeline
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class FieldResult:
    fields: dict
    success: bool
    quality_score: float
    confidence: float
    anchors_detected: dict
    error: str = ""


def _preprocess(
    texts, scores, polys, cfg: FieldExtractorConfig, layout: "FieldLayout" = None
) -> list[_Line]:
    """P2: drop low-score / empty / short-non-latin lines
    (cni_extractor_18_f.py:93-132), plus the layout's own noise rules —
    25F watermark vocabulary and bare country codes
    (cni_extractor_25_f.py:120-138), 25B MRZ lines
    (cni_extractor_25_b.py:121-129)."""
    lines: list[_Line] = []
    for i, (t, s, p) in enumerate(zip(texts, scores, polys)):
        if s < cfg.min_line_score:
            continue
        t = (t or "").strip()
        if not t:
            continue
        if len(t) <= 2 and any(ord(c) > 127 for c in t):
            continue
        if layout is not None:
            if layout.drop_mrz and (t.startswith("I<") or "<<<" in t):
                continue
            if layout.noise_words and t.upper() in layout.noise_words:
                continue
            if layout.drop_country_codes and len(t) == 3 and t.isupper() and t.isalpha():
                continue
        cx, cy, x1 = _centroid(p)
        lines.append(_Line(idx=i, text=t, score=float(s), cx=cx, cy=cy, x1=x1))
    return lines


def _quality_gate(scores, cfg: FieldExtractorConfig) -> tuple[bool, float]:
    """P1 (cni_extractor_18_f.py:50-91): mean positive score + counts."""
    positive = [s for s in scores if s > 0]
    if not positive:
        return False, 0.0
    mean = sum(positive) / len(positive)
    good = sum(1 for s in positive if s > cfg.good_score)
    ok = (
        len(positive) >= cfg.min_positive_lines
        and mean >= cfg.min_mean_score
        and good >= cfg.min_good_lines
    )
    return ok, mean


def _is_label(
    text: str,
    label_similarity: float = LABEL_SIMILARITY,
    anchor_strings: tuple[str, ...] = _ALL_ANCHOR_STRINGS,
) -> bool:
    """P7 (cni_extractor_18_f.py:251-291): bilingual slash test,
    similarity-to-known-label test, exact keyword test."""
    t = text.strip()
    if _BILINGUAL_RE.match(t):
        return True
    up = t.upper().rstrip(":")
    if up in anchor_strings:
        return True
    return any(fuzzy_similarity(up, a) >= label_similarity for a in anchor_strings)


_VALIDATORS = {"validate_height": lambda s: validate_height(s)}
_NORMALIZERS = {"normalize_height": lambda s: normalize_height(s)}


def extract_fields(
    texts,
    scores,
    polys,
    config: FieldExtractorConfig | None = None,
    layout: FieldLayout = FRONT_LAYOUT,
) -> FieldResult:
    # explicit config overrides; otherwise each layout carries its own
    # gate (the reference's per-extractor can_proceed thresholds)
    if config is None:
        config = layout.config
    ok, quality = _quality_gate(scores, config)
    if not ok:
        return FieldResult(
            fields={f: None for f in layout.all_fields},
            success=False,
            quality_score=quality,
            confidence=0.0,
            anchors_detected={f: False for f in layout.anchor_vocab},
            error="quality_gate_failed",
        )

    polys, _skew = deskew_polys(polys)  # N3 geometric normalization
    lines = _preprocess(texts, scores, polys, config, layout)
    fields: dict = {f: None for f in layout.all_fields}
    anchor_strings = layout.anchor_strings

    # ---- P4 regex pass with consumption; P5 ordered date rule --------
    dates: list[str] = []
    for ln in lines:
        if ln.consumed:
            continue
        if DATE_RE.match(ln.text) and validate_date(ln.text):
            dates.append(ln.text)
            ln.consumed = True
            continue
        for fname, rex, validator, normalizer in layout.regex_specs:
            if rex.match(ln.text) and (
                validator is None or _VALIDATORS[validator](ln.text)
            ):
                if fields[fname] is None:
                    v = ln.text
                    if normalizer is not None:
                        v = _NORMALIZERS[normalizer](v)
                    fields[fname] = v
                ln.consumed = True
                break
    # P5: the i-th date in LINE ORDER fills the i-th date field (the
    # reference's first/second-occurrence rule — first date is the
    # birth/delivery date, second the expiry; cni_extractor_18_b.py:206-210).
    for fname, dt in zip(layout.date_fields, dates):
        fields[fname] = dt

    # ---- P7 label classification ------------------------------------
    for ln in lines:
        if not ln.consumed and _is_label(ln.text, config.label_similarity, anchor_strings):
            ln.is_label = True

    # ---- P6 anchor detection (fuzzy semi-join vs vocab) --------------
    anchors: dict[str, _Line] = {}
    anchors_detected = {}
    for fname, syns in layout.anchor_vocab.items():
        best: tuple[float, _Line] | None = None
        for ln in lines:
            if not ln.is_label:
                continue
            sim = max(fuzzy_similarity(ln.text.rstrip(":"), s) for s in syns)
            if sim >= config.similarity_threshold and (best is None or sim > best[0]):
                best = (sim, ln)
        anchors_detected[fname] = best is not None
        if best:
            anchors[fname] = best[1]

    # ---- N3 template-matching strategy (main.ipynb cell 2) ----------
    # The anchor-pair rotation estimate doubles as the DETECTOR for
    # rotation the baseline deskew is blind to (axis-aligned OCR boxes
    # on a rotated document: every baseline reads horizontal, so
    # deskew_polys is an identity while positions are rotated).  When
    # the residual rotation is significant, P8's right/below proximity
    # thresholds are geometrically wrong — the template zones (mapped
    # through the estimated transform) take precedence for their
    # fields; a straight document estimates ~0 and skips this path.
    tpl_tr = (
        _estimate_template_transform(lines, polys, layout)
        if layout.template_zones
        else None
    )
    if tpl_tr is not None and abs(tpl_tr["rotation"]) >= 0.05:
        _apply_template_fallback(fields, lines, polys, layout, tr=tpl_tr)

    # ---- P8 spatial proximity lookup ---------------------------------
    for fname, anchor in anchors.items():
        if fields.get(fname) is not None:
            continue
        best_score, best_line = 0.0, None
        for ln in lines:
            if ln.consumed or ln.is_label:
                continue
            right = ln.cx > anchor.x1 and abs(ln.cy - anchor.cy) < 15.0
            below = ln.cy > anchor.cy and abs(ln.cx - anchor.cx) < 120.0
            if not (right or below):
                continue
            dist = ((ln.cx - anchor.cx) ** 2 + (ln.cy - anchor.cy) ** 2) ** 0.5
            score = ln.score * (1.0 / (1.0 + dist / 100.0))  # :333
            if right:
                score *= 1.5  # same-line boost (main.ipynb N1)
            if score > best_score:
                best_score, best_line = score, ln
        if best_line is not None:
            fields[fname] = best_line.text
            best_line.consumed = True

    # ---- N3 template-matching fallback (main.ipynb cell 2) ----------
    # Only fields P8 could not fill; recovers geometry the baseline
    # deskew cannot see (axis-aligned boxes on a rotated document).
    if layout.template_zones and any(
        fields[f] is None for f, *_ in layout.template_zones
    ):
        # reuse the transform estimated above — the anchor scan +
        # affine fit is the expensive part of the fallback
        _apply_template_fallback(fields, lines, polys, layout, tr=tpl_tr)

    # ---- P9 positional fallback (y-sorted, used-value dedup) ---------
    used = {v for v in fields.values() if v}
    leftovers = sorted(
        (ln for ln in lines if not ln.consumed and not ln.is_label and ln.text not in used),
        key=lambda ln: (ln.cy, ln.cx),
    )
    for fname in layout.fallback_fields:
        if fields[fname] is not None:
            continue
        while leftovers:
            cand = leftovers.pop(0)
            if cand.text in used:
                continue
            fields[fname] = cand.text
            used.add(cand.text)
            break

    # ---- N2 cross-validation repair: label words leaked into a field --
    for fname in layout.repair_fields:
        v = fields[fname]
        if v and _is_label(v, config.label_similarity, anchor_strings):
            fields[fname] = None

    # ---- P10 consolidation + confidence ------------------------------
    filled = sum(1 for f in layout.all_fields if fields[f])
    return FieldResult(
        fields=fields,
        success=True,
        quality_score=quality,
        confidence=filled / len(layout.all_fields),
        anchors_detected=anchors_detected,
    )
