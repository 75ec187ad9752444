"""Deterministic synthetic transcript generator (FIXTURES.md §1–2).

Builds clean prose FIRST, then wraps it in noise (HTML boilerplate /
scrambled PDF span layout / whitespace + MRZ junk), so the expected
extraction is known exactly by construction — the golden table is
generated forward with the inputs, never re-derived (FIXTURES.md §2).

Conventions (seed-stable):
- conversation lengths are Zipfian (a few conversations hold ~10% of
  turns) and the file row order is globally shuffled, so the ordering
  shuffle in the pipeline has real work to do;
- ~60% plain turns, ~30% html, ~10% pdf, ~2% pathological rows that
  must produce ``success=false`` envelopes (empty, MRZ-only, all-
  boilerplate html, malformed pdf spans, unknown tool, oversized).

No external data; everything derives from the word list below.
"""

from __future__ import annotations

import json
import os
import random

import pyarrow as pa
import pyarrow.parquet as pq

from ocr_poc_ray.extractors.base import MAX_TEXT_CHARS
from ocr_poc_ray.extractors.pdf import MARGIN_TOP_Y, PAGE_MID
from ocr_poc_ray.schemas import EXPECTED_SCHEMA, TRANSCRIPTS_SCHEMA

_WORDS = (
    "the quick brown river flows past ancient stone bridges while merchants "
    "carry woven baskets toward crowded market squares where travelers trade "
    "copper coins for fresh bread salted fish ripe olives sweet honey local "
    "wine painted pottery silk ribbons iron tools carved figures rare spices "
    "mountain herbs and stories about distant harbors stormy crossings lost "
    "maps patient scholars quiet libraries burning candles careful letters "
    "written during long winters beside warm hearths under heavy snow"
).split()

_LABELS = (
    "Nom / Name",
    "Prénom / Given name",
    "Date de naissance / Birth date",
    "Lieu de naissance / Birth place",
    "Sexe / Sex",
    "Taille / Height",
    "Profession / Occupation",
)

_MRZ_SAMPLES = (
    "I<CMR0123456789<<<<<<<<<<<<<<<",
    "<<<<<<<<<<<<<<<<<<<<",
    "I<CMRDOE<<JOHN<<<<<<<<<<<<<<",
)

BASE_TS_US = 1_735_689_600_000_000  # 2025-01-01T00:00:00Z in microseconds

#: bump when generator OUTPUT changes for the same (n, seed) — cache
#: keys (bench fixtures) include it so stale corpora are regenerated.
FIXTURE_VERSION = "6"  # 6: JSON tool-envelope turns (tool="json") join the mix


def _sentence(rng: random.Random, min_chars: int = 30) -> str:
    while True:
        n = rng.randint(5, 11)
        words = [rng.choice(_WORDS) for _ in range(n)]
        s = " ".join(words)
        s = s[0].upper() + s[1:] + "."
        if len(s) >= min_chars:
            return s


def _paragraph(rng: random.Random) -> str:
    return " ".join(_sentence(rng) for _ in range(rng.randint(1, 3)))


def _clean_paragraphs(rng: random.Random) -> list[str]:
    return [_paragraph(rng) for _ in range(rng.randint(1, 3))]


# ---------------------------------------------------------------------------
# Payload wrappers: clean text -> noisy payload whose extraction is clean text.
# ---------------------------------------------------------------------------

def _wrap_plain(rng: random.Random, paragraphs: list[str]) -> str:
    """Inject whitespace noise + MRZ junk lines; extraction renormalizes."""
    chunks: list[str] = []
    for p in paragraphs:
        words = p.split(" ")
        noisy: list[str] = []
        for w in words:
            noisy.append(w)
            r = rng.random()
            if r < 0.08:
                noisy.append(" ")  # double space
            elif r < 0.12:
                noisy.append("\t")
        chunks.append(" ".join(noisy))
    sep = ["\n\n", "\n", "  \n"]
    text = rng.choice(sep).join(chunks)
    if rng.random() < 0.3:
        text = rng.choice(_MRZ_SAMPLES) + "\n" + text
    if rng.random() < 0.3:
        text = text + "\n" + rng.choice(_MRZ_SAMPLES)
    return text


def _nav_list(rng: random.Random, n: int) -> str:
    items = "".join(
        f'<li><a href="/{rng.choice(_WORDS)}">{rng.choice(_WORDS).title()}</a></li>'
        for _ in range(n)
    )
    return f"<ul>{items}</ul>"


def _wrap_html(rng: random.Random, paragraphs: list[str]) -> str:
    """Clean paragraphs wrapped in boilerplate the extractor must strip."""
    title = rng.choice(_WORDS).title()
    nav = f"<nav>{_nav_list(rng, rng.randint(3, 8))}</nav>"
    header = f"<header><h1>{title} Site</h1>{nav}</header>"
    aside = f"<aside><h3>Related</h3>{_nav_list(rng, rng.randint(2, 6))}</aside>"
    labels = "".join(
        f'<div class="field-label">{rng.choice(_LABELS)}:</div>' for _ in range(rng.randint(0, 3))
    )
    menu = f'<div class="menu">{_nav_list(rng, rng.randint(2, 5))}</div>'
    promo = f"<div class=\"promo\">{rng.choice(_WORDS).title()} now!</div>"
    content = "".join(f"<p>{p}</p>" for p in paragraphs)
    footer = (
        f"<footer>{_nav_list(rng, 3)}<p>© 2025 {title} Corp. All rights reserved.</p></footer>"
    )
    script = "<script>var x = 1; function f() { return x; }</script>"
    style = "<style>.menu { display: none; } p { margin: 0; }</style>"
    return (
        f"<html><head><title>{title}</title>{style}{script}</head>"
        f"<body>{header}{menu}{aside}{labels}"
        f'<article class="content">{content}</article>'
        f"{promo}{footer}</body></html>"
    )


def _wrap_markdown(rng: random.Random, paragraphs: list[str]) -> str:
    """Clean paragraphs as markdown prose with inline markup the
    extractor strips exactly, framed by heading/nav/fence/rule
    furniture lines it drops (extractors/markdown.py)."""
    title = rng.choice(_WORDS).title()
    lines: list[str] = [f"# {title} Site"]
    lines += [
        f"- [{rng.choice(_WORDS).title()}](/{rng.choice(_WORDS)})"
        for _ in range(rng.randint(2, 5))
    ]
    if rng.random() < 0.5:
        lines.append(f"![badge](http://img.example/{rng.choice(_WORDS)}.png)")
    lines.append("---")
    for p in paragraphs:
        words = p.split(" ")
        marked: list[str] = []
        for w in words:
            r = rng.random()
            if r < 0.05:
                marked.append(f"**{w}**")
            elif r < 0.09:
                marked.append(f"*{w}*")
            elif r < 0.13:
                marked.append(f"[{w}](http://site.example/{rng.choice(_WORDS)})")
            elif r < 0.16:
                marked.append(f"`{w}`")
            else:
                marked.append(w)
        lines.append(" ".join(marked))
        if rng.random() < 0.3:
            lines.append("")
    if rng.random() < 0.6:
        junk = rng.choice(_WORDS)
        lines.append(f"```python\n{junk} = {rng.randint(0, 9)}\nreturn {junk}\n```")
    lines.append("## Footer")
    lines.append(f"- [Terms](/terms) - [About](/{rng.choice(_WORDS)})")
    return "\n".join(lines)


def _wrap_json(rng: random.Random, paragraphs: list[str]) -> str:
    """Clean paragraphs as long string leaves of a JSON tool envelope,
    surrounded by short structural noise (ids, scores, cursors — all
    strings < extractors/json_tool.MIN_CONTENT_CHARS, or non-strings).
    DFS document order of the leaves == paragraph order, so extraction
    reproduces the clean join exactly."""

    def _nid() -> str:
        return "".join(rng.choice("abcdef0123456789") for _ in range(rng.randint(4, 8)))

    def _noisy(p: str) -> str:
        # whitespace noise the normalizer collapses
        if rng.random() < 0.4:
            p = p.replace(" ", "  ", 1)
        if rng.random() < 0.3:
            p = " " + p + "\t"
        return p

    items = []
    for p in paragraphs:
        item = {"id": _nid(), "snippet": _noisy(p), "score": round(rng.random(), 3)}
        if rng.random() < 0.3:
            item["tags"] = [rng.choice(("web", "news", "doc"))]
        items.append(item)
    doc = {
        "status": rng.choice(("ok", "partial")),
        "took_ms": rng.randint(1, 500),
        "result": {"items": items, "cursor": _nid()},
        "meta": {"node": f"w{rng.randint(0, 9)}", "cached": rng.random() < 0.5},
    }
    return json.dumps(doc)


def _wrap_pdf(rng: random.Random, paragraphs: list[str]) -> str:
    """Serialize clean text as scrambled x0,y0,x1,y1|text span lines
    laid out in 1–3 columns (the extractor detects columns by gap
    clustering of left edges; per-line x jitter stays well under the
    gutter width)."""
    words = " ".join(paragraphs).split(" ")
    runs: list[str] = []
    i = 0
    while i < len(words):
        k = rng.randint(4, 8)
        runs.append(" ".join(words[i : i + k]))
        i += k
    n_pages = 2 if len(runs) >= 8 and rng.random() < 0.2 else 1
    spans: list[str] = []
    y_step = 14.0

    def emit(col_runs: list[str], x_base: float, page: int) -> None:
        y = MARGIN_TOP_Y + 10.0
        for run in col_runs:
            x0 = x_base + rng.randint(0, 18)
            x1 = x0 + 8.0 * len(run)
            prefix = f"{page}," if n_pages > 1 else ""
            spans.append(f"{prefix}{x0:.1f},{y:.1f},{x1:.1f},{y + 11:.1f}|{run}")
            y += y_step

    per_page = (len(runs) + n_pages - 1) // n_pages
    for page in range(n_pages):
        page_runs = runs[page * per_page : (page + 1) * per_page]
        if not page_runs:
            continue
        if len(page_runs) >= 9 and rng.random() < 0.25:
            n_cols = 3
        elif len(page_runs) >= 6 and rng.random() < 0.5:
            n_cols = 2
        else:
            n_cols = 1
        col_bases = ([72.0], [72.0, PAGE_MID + 20.0], [72.0, 250.0, 428.0])[n_cols - 1]
        per = (len(page_runs) + n_cols - 1) // n_cols
        for ci, base in enumerate(col_bases):
            chunk = page_runs[ci * per : (ci + 1) * per]
            if chunk:
                emit(chunk, base, page)
    # Margin furniture + MRZ noise the extractor must drop.
    spans.append(f"72.0,30.0,300.0,41.0|{rng.choice(_WORDS).title()} Quarterly Report")
    spans.append(f"290.0,742.0,322.0,753.0|Page {rng.randint(1, 99)}")
    if rng.random() < 0.4:
        spans.append(f"72.0,{MARGIN_TOP_Y + 12.0:.1f},300.0,300.0|{rng.choice(_MRZ_SAMPLES)}")
    rng.shuffle(spans)
    return "\n".join(spans)


_PATHOLOGICAL_KINDS = (
    "empty", "whitespace", "mrz_only", "html_boilerplate_only",
    "pdf_malformed", "pdf_furniture_only", "unknown_tool", "oversized",
    "md_furniture_only", "json_malformed", "json_noise_only",
)


def _pathological(rng: random.Random) -> tuple[str, str, str]:
    """Return (text, tool, expected_error_class). Always success=False."""
    kind = rng.choice(_PATHOLOGICAL_KINDS)
    if kind == "empty":
        return "", "", "empty_after_filter"
    if kind == "whitespace":
        return "  \n\t  \n ", "", "empty_after_filter"
    if kind == "mrz_only":
        return "\n".join(rng.choice(_MRZ_SAMPLES) for _ in range(3)), "", "empty_after_filter"
    if kind == "html_boilerplate_only":
        nav = f"<nav>{_nav_list(rng, 5)}</nav>"
        menu = f'<div class="m">{_nav_list(rng, 4)}</div>'
        label = f'<div>{rng.choice(_LABELS)}:</div>'
        return f"<html><body>{nav}{menu}{label}</body></html>", "html", "no_content_blocks"
    if kind == "pdf_malformed":
        lines = [f"{rng.choice(_WORDS)} garbled line {i}" for i in range(4)]
        lines += [f"1,2,3|missing coord {i}" for i in range(2)]
        return "\n".join(lines), "pdf", "no_valid_spans"
    if kind == "pdf_furniture_only":
        return "72.0,30.0,200.0,41.0|Running Head\n300.0,745.0,330.0,756.0|Page 9", "pdf", "no_content_spans"
    if kind == "unknown_tool":
        return _paragraph(rng), "img", "unknown_tool:img"
    if kind == "md_furniture_only":
        nav = "\n".join(
            f"- [{rng.choice(_WORDS).title()}](/{rng.choice(_WORDS)})" for _ in range(4)
        )
        fence = "```python\nx = 1\nreturn x\n```"
        return (
            f"# {rng.choice(_WORDS).title()} Site\n{nav}\n---\n{fence}",
            "md",
            "no_content_lines",
        )
    if kind == "json_malformed":
        return '{"status": "ok", "result": [1, 2', "json", "json_parse"
    if kind == "json_noise_only":
        doc = {"status": "ok", "took_ms": rng.randint(1, 99),
               "result": {"items": [], "cursor": "ab12"},
               "meta": {"node": f"w{rng.randint(0, 9)}"}}
        return json.dumps(doc), "json", "no_content_strings"
    # oversized: exceeds the request-size validator (P12 analog)
    return "x" * (MAX_TEXT_CHARS + 1), "", "oversized"


def _conv_weights(n_convs: int) -> list[float]:
    # Zipf(1.1): head conversations hold a large share of turns.
    return [1.0 / (i + 1) ** 1.1 for i in range(n_convs)]


def generate_transcripts(
    n_turns: int = 1_000, n_convs: int = 50, seed: int = 42
) -> tuple[pa.Table, pa.Table]:
    """Return (transcripts, expected) Arrow tables, row order shuffled."""
    rng = random.Random(seed)
    convs = [f"conv-{i:06d}" for i in range(n_convs)]
    # cumulative weights precomputed ONCE: random.choices(weights=...)
    # re-accumulates per call, turning generation O(n_turns * n_convs)
    from itertools import accumulate

    cum_weights = list(accumulate(_conv_weights(n_convs)))
    turn_counters = [0] * n_convs

    rows: list[tuple] = []
    expected: list[tuple] = []
    for _ in range(n_turns):
        ci = rng.choices(range(n_convs), cum_weights=cum_weights, k=1)[0]
        turn_idx = turn_counters[ci]
        turn_counters[ci] += 1
        ts = BASE_TS_US + ci * 86_400_000_000 + turn_idx * 7_000_000

        r = rng.random()
        if r < 0.02:
            text, tool, _err = _pathological(rng)
            role = "tool" if tool else ("user" if turn_idx % 2 == 0 else "assistant")
            rows.append((convs[ci], turn_idx, role, text, tool, ts))
            expected.append((convs[ci], turn_idx, "", False))
            continue

        paragraphs = _clean_paragraphs(rng)
        clean = " ".join(paragraphs)
        if r < 0.57:
            text, tool = _wrap_plain(rng, paragraphs), ""
            role = "user" if turn_idx % 2 == 0 else "assistant"
        elif r < 0.85:
            text, tool = _wrap_html(rng, paragraphs), "html"
            role = "tool"
        elif r < 0.91:
            text, tool = _wrap_markdown(rng, paragraphs), "md"
            role = "assistant"
        elif r < 0.95:
            text, tool = _wrap_json(rng, paragraphs), "json"
            role = "tool"
        else:
            text, tool = _wrap_pdf(rng, paragraphs), "pdf"
            role = "tool"
        rows.append((convs[ci], turn_idx, role, text, tool, ts))
        expected.append((convs[ci], turn_idx, clean, True))

    order = list(range(len(rows)))
    rng.shuffle(order)  # force the ordering shuffle to do real work
    rows = [rows[i] for i in order]
    expected_sorted = sorted(expected)  # golden table in canonical order

    transcripts = pa.Table.from_arrays(
        [pa.array([r[j] for r in rows], type=TRANSCRIPTS_SCHEMA.types[j]) for j in range(6)],
        schema=TRANSCRIPTS_SCHEMA,
    )
    expected_tbl = pa.Table.from_arrays(
        [
            pa.array([e[j] for e in expected_sorted], type=EXPECTED_SCHEMA.types[j])
            for j in range(4)
        ],
        schema=EXPECTED_SCHEMA,
    )
    return transcripts, expected_tbl


# ---------------------------------------------------------------------------
# Span-document fixtures for the typed-field extraction pipeline
# (extractors/fields.py).  Golden-forward: fields are chosen first, then
# laid out as spans with geometry; the expected table is the chosen
# fields — never re-derived from the extractor.
# ---------------------------------------------------------------------------

_VALUE_WORDS = (
    "RIVERDALE", "BRIDGETON", "HARBORVIEW", "STONEFIELD", "WINTERHALL",
    "MAPLEWOOD", "CRESTFALL", "IRONGATE", "SILVERBROOK", "THORNBURY",
    "EASTMERE", "WOLFORD", "LANGFORD", "DUNBARTON", "KESTREL",
    "MARLOWE", "VANCE", "HOLLIS", "BERTRAND", "CALLOWAY",
)

_PROFESSIONS = ("ENGINEER", "TEACHER", "FARMER", "MERCHANT", "STUDENT", "NURSE")

_FIELD_ROWS = {  # y-coordinate per anchored field row (far apart so the
    "nom": 80.0,  # proximity argmax is unambiguous — see fields.py P8)
    "prenom": 180.0,
    "lieu_naissance": 280.0,
    "profession": 380.0,
}
_ANCHOR_LABELS = {
    "nom": "Nom / Name",
    "prenom": "Prenom / Given name",
    "lieu_naissance": "Lieu de naissance / Place of birth",
    "profession": "Profession / Occupation",
}
_CONTENT_SCORE = 0.95


def _span(text: str, x: float, y: float, score: float) -> tuple[str, float, list]:
    w = 8.0 * len(text)
    poly = [[x, y], [x + w, y], [x + w, y + 12.0], [x, y + 12.0]]
    return (text, score, poly)


def _skew_spans(rng: random.Random, spans: list) -> list:
    """Rotate all span polys by a small random angle about page center
    (N3: the extractor must deskew; expected fields are unchanged)."""
    import math

    angle = rng.choice((-1, 1)) * rng.uniform(0.03, 0.15)
    cos_a, sin_a = math.cos(angle), math.sin(angle)
    cx, cy = 306.0, 396.0
    return [
        (
            t,
            sc,
            [
                [cx + (x - cx) * cos_a - (y - cy) * sin_a,
                 cy + (x - cx) * sin_a + (y - cy) * cos_a]
                for x, y in p
            ],
        )
        for t, sc, p in spans
    ]


_BACK_ANCHOR_LABELS = {
    "autorite": "Autorite / Authority",
    "adresse": "Adresse / Address",
}
_BACK_ROWS = {"autorite": 80.0, "adresse": 180.0}
_AUTHORITIES = ("PREFECTURE RIVERDALE", "PREFECTURE WOLFORD", "MAIRIE DUNBARTON")
_STREETS = ("14 RIVER ROAD", "7 MILL LANE", "22 HARBOR WAY", "3 STONE COURT")

_FRONT_FIELDS = ("nom", "prenom", "date_naissance", "lieu_naissance", "sexe", "taille", "profession")
_BACK_FIELDS = ("identifiant_unique", "numero_carte", "code_postal",
                "date_delivrance", "date_expiration", "autorite", "adresse")
_EXP_FIELDS = _FRONT_FIELDS + _BACK_FIELDS


def generate_span_docs(n_docs: int = 200, seed: int = 99):
    """Return (spans_table, expected_table) for field extraction.

    Layouts mirror the reference's registry: ~70% "front" docs
    (anchored / fallback / gate-fail variants) and ~30% "back" docs
    (regex-typed ids + the TRUE P5 two-date order rule: first date in
    SHUFFLED line order → date_delivrance, second → date_expiration).
    Golden-forward: fields chosen first, geometry laid out, expected
    recorded — never re-derived.  ~25% of docs are skew-rotated.
    """
    import pyarrow as pa

    rng = random.Random(seed)
    doc_ids, layouts_col, texts_col, scores_col, polys_col = [], [], [], [], []
    expected_rows = []

    def emit(doc_id, layout, spans, exp_success, exp):
        doc_ids.append(doc_id)
        layouts_col.append(layout)
        texts_col.append([sp[0] for sp in spans])
        scores_col.append([sp[1] for sp in spans])
        polys_col.append([sp[2] for sp in spans])
        row = {"doc_id": doc_id, "layout": layout, "success": exp_success}
        row.update({f: exp.get(f) for f in _EXP_FIELDS})
        expected_rows.append(row)

    for d in range(n_docs):
        doc_id = f"doc-{d:06d}"
        variant = rng.random()
        spans: list[tuple[str, float, list]] = []

        if variant < 0.08:  # gate-fail: <5 positive-score lines
            layout = rng.choice(("front", "back"))
            for i in range(rng.randint(1, 4)):
                spans.append(_span(rng.choice(_VALUE_WORDS), 60.0, 80.0 + 40 * i, 0.4))
            rng.shuffle(spans)
            emit(doc_id, layout, spans, False, {})
            continue

        if variant < 0.38:  # ---- back layout ----
            exp: dict = {}
            exp["autorite"] = rng.choice(_AUTHORITIES)
            exp["adresse"] = rng.choice(_STREETS)
            for fname in ("autorite", "adresse"):
                y = _BACK_ROWS[fname]
                label = _BACK_ANCHOR_LABELS[fname]
                spans.append(_span(label, 60.0, y, _CONTENT_SCORE))
                ax1 = 60.0 + 8.0 * len(label)
                spans.append(_span(exp[fname], ax1 + 25.0, y, _CONTENT_SCORE))
            exp["identifiant_unique"] = "".join(str(rng.randint(0, 9)) for _ in range(rng.randint(15, 20)))
            spans.append(_span(exp["identifiant_unique"], 60.0, 320.0, _CONTENT_SCORE))
            exp["numero_carte"] = "".join(str(rng.randint(0, 9)) for _ in range(9))
            spans.append(_span(exp["numero_carte"], 60.0, 380.0, _CONTENT_SCORE))
            exp["code_postal"] = (
                chr(rng.randint(65, 90)) + chr(rng.randint(65, 90)) + f"{rng.randint(0, 99):02d}"
            )
            spans.append(_span(exp["code_postal"], 60.0, 440.0, _CONTENT_SCORE))
            date_texts = [
                f"{rng.randint(1, 28):02d}.{rng.randint(1, 12):02d}.{rng.randint(2015, 2020)}",
                f"{rng.randint(1, 28):02d}.{rng.randint(1, 12):02d}.{rng.randint(2021, 2030)}",
            ]
            spans.append(_span(date_texts[0], 60.0, 500.0, _CONTENT_SCORE))
            spans.append(_span(date_texts[1], 240.0, 500.0, _CONTENT_SCORE))
            if rng.random() < 0.5:
                spans.append(_span(rng.choice(_MRZ_SAMPLES), 60.0, 600.0, _CONTENT_SCORE))
            for _ in range(rng.randint(0, 3)):
                spans.append(_span(rng.choice(_WORDS), 300.0, 640.0, 0.2))
            if rng.random() < 0.25:
                spans = _skew_spans(rng, spans)
            rng.shuffle(spans)
            # TRUE P5: first date in final line order is the delivery date
            ordered_dates = [t for t, _s, _p in spans if t in date_texts]
            exp["date_delivrance"], exp["date_expiration"] = ordered_dates[0], ordered_dates[1]
            emit(doc_id, "back", spans, True, exp)
            continue

        # ---- front layout ----
        exp = {}
        use_anchors = variant >= 0.55  # else: fallback layout, no labels
        exp["nom"] = rng.choice(_VALUE_WORDS)
        exp["prenom"] = rng.choice([w for w in _VALUE_WORDS if w != exp["nom"]])
        exp["lieu_naissance"] = rng.choice(
            [w for w in _VALUE_WORDS if w not in (exp["nom"], exp["prenom"])]
        )
        if use_anchors:
            exp["profession"] = rng.choice(_PROFESSIONS)
            for fname in ("nom", "prenom", "lieu_naissance", "profession"):
                y = _FIELD_ROWS[fname]
                label = _ANCHOR_LABELS[fname]
                anchor = _span(label, 60.0, y, _CONTENT_SCORE)
                ax1 = 60.0 + 8.0 * len(label)
                spans.append(anchor)
                spans.append(_span(exp[fname], ax1 + 25.0, y, _CONTENT_SCORE))
        else:
            # fallback: bare values in y order nom → prenom → lieu
            # (P9: y-sorted assignment to the fixed fallback order)
            for fname in ("nom", "prenom", "lieu_naissance"):
                spans.append(_span(exp[fname], 60.0, _FIELD_ROWS[fname], _CONTENT_SCORE))

        # regex-typed standalone lines (P4)
        sexe = rng.choice(("M", "F"))
        exp["sexe"] = sexe
        spans.append(_span(sexe, 60.0, 560.0, _CONTENT_SCORE))
        h_int = rng.randint(150, 199)
        raw_height = rng.choice((f"1.{h_int % 100:02d}", f"1,{h_int % 100:02d}", f"{h_int}", f"1.{h_int % 100:02d}m"))
        exp["taille"] = f"1,{h_int % 100:02d}"
        spans.append(_span(raw_height, 60.0, 520.0, _CONTENT_SCORE))

        n_dates = 2 if rng.random() < 0.3 else 1
        date_texts = []
        for i in range(n_dates):
            date_texts.append(
                f"{rng.randint(1, 28):02d}.{rng.randint(1, 12):02d}.{rng.randint(1950, 2005)}"
            )
        for i, dt in enumerate(date_texts):
            spans.append(_span(dt, 60.0 + 120.0 * i, 480.0, _CONTENT_SCORE))

        # noise: MRZ + low-score junk (dropped by P2)
        if rng.random() < 0.5:
            spans.append(_span(rng.choice(_MRZ_SAMPLES), 60.0, 600.0, _CONTENT_SCORE))
        for _ in range(rng.randint(0, 3)):
            spans.append(_span(rng.choice(_WORDS), 300.0, 640.0, 0.2))

        # pad to the 18F gate (≥8 positive / ≥5 good): inert high-score
        # filler below every field row — unconsumed, never fallback-
        # assigned (P9 takes the first three unconsumed lines in y order)
        n_good = sum(1 for sp in spans if sp[1] > 0.7)
        for k in range(max(0, 8 - n_good)):
            spans.append(_span(f"pad{k}", 300.0, 700.0 + 40.0 * k, _CONTENT_SCORE))

        if rng.random() < 0.25:
            spans = _skew_spans(rng, spans)

        rng.shuffle(spans)
        # P5: expected birth date = first valid date in final line order
        exp["date_naissance"] = next(t for t, _s, _p in spans if t in date_texts)
        emit(doc_id, "front", spans, True, exp)

    spans_tbl = pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.string()),
            "layout": pa.array(layouts_col, pa.string()),
            "texts": pa.array(texts_col, pa.list_(pa.string())),
            "scores": pa.array(scores_col, pa.list_(pa.float32())),
            "polys": pa.array(
                polys_col, pa.list_(pa.list_(pa.list_(pa.float32())))
            ),
        }
    )
    cols = ["doc_id", "layout", "success"] + list(_EXP_FIELDS)
    expected_tbl = pa.table(
        {
            c: pa.array([r[c] for r in expected_rows],
                        pa.bool_() if c == "success" else pa.string())
            for c in cols
        }
    )
    return spans_tbl, expected_tbl


def write_fixtures(
    out_dir: str, n_turns: int = 1_000, n_convs: int = 50, seed: int = 42,
    row_group_size: int | None = None, n_files: int = 1,
) -> dict[str, str]:
    """Write transcripts + expected parquet under `out_dir`.

    `row_group_size` controls Parquet fragment granularity so Ray can
    parallelize the read (defaults to ~32 row groups).  `n_files > 1`
    writes ``transcripts.parquet/`` as a DIRECTORY of that many files —
    the realistic many-shard layout (one read task per file, no
    single-reader bottleneck); readers take the directory path.
    """
    os.makedirs(out_dir, exist_ok=True)
    transcripts, expected = generate_transcripts(n_turns, n_convs, seed)
    rgs = row_group_size or max(1_000, n_turns // 32)
    t_path = os.path.join(out_dir, "transcripts.parquet")
    e_path = os.path.join(out_dir, "expected.parquet")
    if n_files > 1:
        os.makedirs(t_path, exist_ok=True)
        n = transcripts.num_rows
        for i in range(n_files):
            lo, hi = i * n // n_files, (i + 1) * n // n_files
            pq.write_table(
                transcripts.slice(lo, hi - lo),
                os.path.join(t_path, f"part-{i:05d}.parquet"),
                row_group_size=rgs,
            )
    else:
        pq.write_table(transcripts, t_path, row_group_size=rgs)
    pq.write_table(expected, e_path, row_group_size=rgs)
    return {"transcripts": t_path, "expected": e_path}
