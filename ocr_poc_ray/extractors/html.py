"""HTML main-content extractor (Readability/trafilatura-style heuristics).

Re-targets the reference's per-document heuristic pipeline at DOM
blocks (SURVEY.md §7.2 step 3):

- subtree pruning of chrome (``script``/``style``/``nav``/``header``/
  ``footer``/``aside``/``form``) — the tag-whitelist pruning / noise
  filter (P2 analog, ``cni_extractor_18_f.py:93-132``);
- per-block link-density + text-length scoring — the label-vs-value /
  boilerplate-block classifier (P7 analog, ``:251-291``), including the
  bilingual-slash label test (``Nom / Name:``) the reference applies to
  card labels;
- quality gate: ≥1 content block or a structured failure envelope
  (P1 analog, ``:84-87``);
- consolidation: content blocks joined in document order with the
  frozen whitespace rule (P10 analog, ``:492-520``).

Pure function per row; built once per actor (the compiled regexes and
parser class live at module level — cheap — while the stage class in
``stages/extract.py`` owns per-actor state).
"""

from __future__ import annotations

import re
from html import unescape

from ocr_poc_ray.extractors.base import (
    ExtractionResult,
    is_noise_line,
    normalize_ws,
    spans_of,
)

# Subtrees that are never content (chrome / invisible).
_DROP_SUBTREES = frozenset(
    {"script", "style", "noscript", "template", "nav", "header", "footer", "aside", "form", "iframe", "svg", "button"}
)

# Elements that open a new text block.
_BLOCK_TAGS = frozenset(
    {
        "p", "div", "li", "h1", "h2", "h3", "h4", "h5", "h6",
        "td", "th", "section", "article", "main", "blockquote", "pre",
        "ul", "ol", "table", "tr", "body", "figcaption", "dd", "dt",
    }
)

# Bilingual label test (P7 analog: the reference's bilingual-slash
# label detector, cni_extractor_18_f.py:251-291), e.g. "Nom / Name:".
_BILINGUAL_LABEL_RE = re.compile(r"^[^/]{1,30}/[^/]{1,30}:?$")

_MIN_CONTENT_CHARS = 25
_MAX_LINK_DENSITY = 0.30


class _Block:
    __slots__ = ("chars", "link_chars", "total_chars")

    def __init__(self) -> None:
        self.chars: list[str] = []
        self.link_chars = 0
        self.total_chars = 0


# One compiled scan: a tag, a comment/declaration, or a text run.
# (html.parser.HTMLParser is ~5x slower for this access pattern — it
# tokenizes attributes we never read; this scanner keeps its CDATA
# behavior for script/style and its leniency on malformed markup.)
_TOKEN_RE = re.compile(
    r"<!--.*?-->"  # comment
    r"|<!\[CDATA\[.*?\]\]>"  # cdata
    r"|<![^>]*>"  # doctype / declaration
    r"|<\s*(/?)\s*([a-zA-Z][a-zA-Z0-9:-]*)((?:\"[^\"]*\"|'[^']*'|[^>\"'])*)>"  # tag
    r"|[^<]+",  # text run
    re.S,
)
#: raw-text elements: content is CDATA until the matching close tag.
_RAWTEXT = ("script", "style")
_RAW_CLOSE = {t: re.compile(rf"</\s*{t}\s*>", re.I) for t in _RAWTEXT}


class _BlockCollector:
    """Streams the markup into flat text blocks with link-char accounting."""

    __slots__ = ("blocks", "_current", "_drop_depth", "_link_depth")

    def __init__(self) -> None:
        self.blocks: list[_Block] = []
        self._current: _Block | None = None
        self._drop_depth = 0
        self._link_depth = 0

    def _finalize(self) -> None:
        if self._current is not None and self._current.total_chars:
            self.blocks.append(self._current)
        self._current = None

    def handle_starttag(self, tag: str) -> None:
        if tag in _DROP_SUBTREES:
            self._drop_depth += 1
            return
        if self._drop_depth:
            return
        if tag == "a":
            self._link_depth += 1
        if tag in _BLOCK_TAGS:
            self._finalize()
            self._current = _Block()

    def handle_endtag(self, tag: str) -> None:
        if tag in _DROP_SUBTREES:
            self._drop_depth = max(0, self._drop_depth - 1)
            return
        if self._drop_depth:
            return
        if tag == "a":
            self._link_depth = max(0, self._link_depth - 1)
        if tag in _BLOCK_TAGS:
            self._finalize()

    def handle_data(self, data: str) -> None:
        if self._drop_depth or not data:
            return
        if self._current is None:
            self._current = _Block()
        self._current.chars.append(data)
        n = len(data.strip())
        self._current.total_chars += n
        if self._link_depth:
            self._current.link_chars += n

    def feed(self, text: str) -> None:
        # Hot loop (~85 % of extraction CPU is HTML): dispatch on
        # ``lastindex`` (None ⇔ comment/doctype/text — no group objects
        # built), slice text runs instead of group(0), check the
        # self-closing '/' via group SPANS (no attrs string allocated
        # per tag), and bind hot callables locally.  Semantics are
        # byte-identical to the readable form (golden tests).
        pos = 0
        n = len(text)
        match = _TOKEN_RE.match
        handle_data = self.handle_data
        handle_start = self.handle_starttag
        handle_end = self.handle_endtag
        ws = " \t\r\n"
        while pos < n:
            m = match(text, pos)
            if m is None:  # stray '<' — treat as text, like HTMLParser
                handle_data(text[pos])
                pos += 1
                continue
            start = pos
            pos = m.end()
            if m.lastindex is None:  # text run, comment, or declaration
                if text[start] != "<":
                    tok = text[start:pos]
                    handle_data(unescape(tok) if "&" in tok else tok)
                continue
            tag = m.group(2)
            if not tag.islower():
                tag = tag.lower()
            if m.start(1) != m.end(1):  # closing tag
                handle_end(tag)
                continue
            handle_start(tag)
            # self-closing only when the '/' is its own token (preceded
            # by whitespace/quote or alone) — a '/' ending an unquoted
            # attribute value (<a href=http://x.com/>) is part of the
            # value, matching html.parser/HTML5
            a_start, a_end = m.span(3)
            e = a_end - 1
            while e >= a_start and text[e] in ws:
                e -= 1
            if (
                e >= a_start
                and text[e] == "/"
                and (e == a_start or text[e - 1] in " \t\r\n\"'")
            ):
                handle_end(tag)  # self-closing <x/>
            elif tag in _RAWTEXT:
                # CDATA: swallow everything to the matching close tag
                mc = _RAW_CLOSE[tag].search(text, pos)
                if mc is None:
                    pos = n
                    handle_end(tag)
                else:
                    pos = mc.end()
                    handle_end(tag)

    def close(self) -> None:  # finalize trailing block
        self._finalize()


def _classify(text: str, link_density: float) -> bool:
    """True if the block is main content (P7 boilerplate classifier analog)."""
    if len(text) < _MIN_CONTENT_CHARS:
        return False
    if link_density > _MAX_LINK_DENSITY:
        return False
    if _BILINGUAL_LABEL_RE.match(text):
        return False
    if text.endswith(":") and len(text) < 40:
        return False
    return True


def extract_html(text: str) -> ExtractionResult:
    parser = _BlockCollector()
    try:
        parser.feed(text)
        parser.close()
    except Exception as exc:  # malformed markup is data, not an error
        return ExtractionResult.failure(f"html_parse_error:{type(exc).__name__}")

    kept: list[str] = []
    scores: list[float] = []
    n_blocks = 0
    for blk in parser.blocks:
        blk_text = normalize_ws("".join(blk.chars))
        if not blk_text or is_noise_line(blk_text):
            continue
        n_blocks += 1
        link_density = blk.link_chars / blk.total_chars if blk.total_chars else 0.0
        scores.append(1.0 - link_density)
        if _classify(blk_text, link_density):
            kept.append(blk_text)

    if not kept:
        # Quality gate failure (P1 analog): all blocks were boilerplate.
        q = sum(scores) / len(scores) if scores else 0.0
        return ExtractionResult.failure("no_content_blocks", n_blocks=n_blocks, quality_score=q)

    return ExtractionResult(
        # each kept block is already normalize_ws'd and non-empty, so
        # the single-space join is the normalized text and the spans
        # are exact block boundaries
        extracted_text=" ".join(kept),
        success=True,
        quality_score=sum(scores) / len(scores),
        confidence=len(kept) / n_blocks,
        n_blocks=n_blocks,
        n_kept=len(kept),
        spans=spans_of(kept),
    )
