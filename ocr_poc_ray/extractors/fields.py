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

    @property
    def anchor_strings(self) -> tuple[str, ...]:
        return tuple(s for syns in self.anchor_vocab.values() for s in syns)


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
