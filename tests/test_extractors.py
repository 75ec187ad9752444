"""Operator-level unit tests for the extraction core (SURVEY.md §5.1).

Threshold/semantics cases mirror the reference's stages: quality gate
(P1), noise filter incl. MRZ analogs (P2), regex/label classification
(P7), geometric reading order (P8/P9), normalizers (P11), validators
(P12).
"""

from __future__ import annotations

from ocr_poc_ray.extractors import extract_turn, is_noise_line, normalize_ws
from ocr_poc_ray.extractors.html import extract_html
from ocr_poc_ray.extractors.pdf import extract_pdf
from ocr_poc_ray.extractors.plain import extract_plain


# -- normalizer (P11) --------------------------------------------------------
def test_normalize_ws():
    assert normalize_ws("  a \t b\n\nc ") == "a b c"
    assert normalize_ws("") == ""
    assert normalize_ws(" \n\t ") == ""


# -- noise filter (P2 / MRZ analog, cni_extractor_25_b.py:121-129) ----------
def test_noise_lines():
    assert is_noise_line("I<CMR0123<<<<")
    assert is_noise_line("abc<<<def")
    assert is_noise_line("CMR")
    assert is_noise_line("   ")
    assert not is_noise_line("normal text line")
    assert not is_noise_line("CMRX")  # 4 letters: not a country code


# -- plain path --------------------------------------------------------------
def test_plain_normalizes_and_filters():
    r = extract_plain("Hello   world\nI<CMR000<<<\nsecond  line")
    assert r.success
    assert r.extracted_text == "Hello world second line"
    assert r.n_blocks == 3 and r.n_kept == 2


def test_plain_empty_fails_not_raises():
    r = extract_plain("   \n  ")
    assert not r.success and r.error == "empty_after_filter"
    r2 = extract_plain("I<CMR<<<\n<<<")
    assert not r2.success


# -- html path (boilerplate classifier, P7 analog) ---------------------------
def test_html_strips_chrome_and_labels():
    html = (
        "<html><head><style>p{}</style><script>x=1</script></head><body>"
        "<nav><ul><li><a href='/x'>Home</a></li><li><a href='/y'>About</a></li></ul></nav>"
        "<div>Nom / Name:</div>"
        "<p>This paragraph carries the actual long-form content of the page.</p>"
        "<footer><p>© 2025 Corp</p></footer></body></html>"
    )
    r = extract_html(html)
    assert r.success
    assert r.extracted_text == (
        "This paragraph carries the actual long-form content of the page."
    )


def test_html_link_density_block_dropped():
    html = (
        "<body><div><a href='/a'>one two three four five six seven eight</a></div>"
        "<p>Real content sentence that is clearly long enough to keep here.</p></body>"
    )
    r = extract_html(html)
    assert r.extracted_text == (
        "Real content sentence that is clearly long enough to keep here."
    )


def test_html_all_boilerplate_fails():
    r = extract_html("<body><nav><a href='/'>Home</a></nav><div>Menu:</div></body>")
    assert not r.success and r.error == "no_content_blocks"


def test_html_short_block_dropped():
    r = extract_html("<body><p>tiny</p><p>A properly long content paragraph kept.</p></body>")
    assert r.extracted_text == "A properly long content paragraph kept."


# -- pdf path (reading order, P8/P9 analog) ----------------------------------
def test_pdf_reading_order_two_columns():
    # right column listed first, scrambled rows; left column must come first.
    text = "\n".join(
        [
            "330.0,88.0,400.0,99.0|right two",
            "72.0,88.0,200.0,99.0|left two",
            "330.0,74.0,400.0,85.0|right one",
            "72.0,74.0,200.0,85.0|left one",
        ]
    )
    r = extract_pdf(text)
    assert r.success
    assert r.extracted_text == "left one left two right one right two"


def test_pdf_drops_furniture_and_mrz():
    text = "\n".join(
        [
            "72.0,30.0,200.0,41.0|Running Head",
            "72.0,74.0,200.0,85.0|body span",
            "300.0,745.0,330.0,756.0|Page 7",
            "72.0,90.0,200.0,101.0|I<CMR000<<<",
        ]
    )
    r = extract_pdf(text)
    assert r.extracted_text == "body span"
    assert r.n_kept == 1


def test_pdf_malformed_fails():
    r = extract_pdf("not a span at all\n1,2|still bad")
    assert not r.success and r.error == "no_valid_spans"


# -- dispatch + validators (P12 analog) --------------------------------------
def test_dispatch_and_validators():
    assert extract_turn("plain  text here", "").extracted_text == "plain text here"
    assert extract_turn("x", "img").error == "unknown_tool:img"
    assert not extract_turn(None, "").success
    from ocr_poc_ray.extractors.base import MAX_TEXT_CHARS

    assert extract_turn("x" * (MAX_TEXT_CHARS + 1), "").error == "oversized"


def test_failures_never_raise():
    for text, tool in [("", ""), ("<<<", ""), ("<a", "html"), ("1,2,3,4|", "pdf")]:
        r = extract_turn(text, tool)
        assert r.success is False and r.extracted_text == ""


def test_register_extractor_plugin():
    """User-extension surface: a new tool value gets its own program."""
    from ocr_poc_ray.extractors.base import ExtractionResult
    from ocr_poc_ray.extractors.registry import EXTRACTORS, extract_turn, register_extractor

    def extract_csvish(text: str) -> ExtractionResult:
        cells = [c.strip() for c in text.split(",") if c.strip()]
        return ExtractionResult(
            extracted_text=" ".join(cells), success=bool(cells),
            quality_score=1.0, confidence=1.0, n_blocks=len(cells), n_kept=len(cells),
        )

    try:
        register_extractor("csv", extract_csvish)
        assert extract_turn("a, b ,c", "csv").extracted_text == "a b c"
        with __import__("pytest").raises(ValueError):
            register_extractor("csv", extract_csvish)  # no silent clobber
        register_extractor("csv", extract_csvish, replace=True)
    finally:
        EXTRACTORS.pop("csv", None)


def test_field_extractor_config_thresholds():
    """Config analog of the reference's constructor params: loosening
    the quality gate admits a document the default config rejects."""
    from ocr_poc_ray.extractors.fields import FieldExtractorConfig, extract_fields

    texts = ["RIVERDALE", "M"]
    scores = [0.9, 0.9]
    polys = [[[60, 80], [140, 80], [140, 92], [60, 92]],
             [[60, 560], [70, 560], [70, 572], [60, 572]]]
    assert not extract_fields(texts, scores, polys).success  # gate: <5 lines
    loose = FieldExtractorConfig(min_positive_lines=1, min_good_lines=1)
    r = extract_fields(texts, scores, polys, config=loose)
    assert r.success and r.fields["sexe"] == "M"


def test_html_entities_and_selfclosing():
    """Charrefs decode; self-closing and raw-text elements behave like
    html.parser's CDATA handling."""
    from ocr_poc_ray.extractors.html import extract_html

    html = (
        "<html><body><p>Tom &amp; Jerry run &lt;fast&gt; through the meadow "
        "beyond the old mill every single day.</p><br/>"
        "<script>if (x < 3) { document.write('<p>junk</p>'); }</script>"
        "<p>Second paragraph continues the honest story with plenty of words.</p>"
        "</body></html>"
    )
    r = extract_html(html)
    assert r.success
    assert "Tom & Jerry run <fast> through the meadow" in r.extracted_text
    assert "junk" not in r.extracted_text
    assert "Second paragraph continues" in r.extracted_text


def test_html_unclosed_script_is_contained():
    from ocr_poc_ray.extractors.html import extract_html

    r = extract_html("<p>Real content sentence that is long enough to keep here.</p><script>var x=1;")
    assert r.success and "Real content" in r.extracted_text
    assert "var x" not in r.extracted_text


def test_html_comment_and_doctype_ignored():
    from ocr_poc_ray.extractors.html import extract_html

    r = extract_html(
        "<!DOCTYPE html><!-- hidden <p>comment</p> -->"
        "<p>The visible paragraph stays in the extracted output today.</p>"
    )
    assert r.success
    assert "comment" not in r.extracted_text
    assert "visible paragraph" in r.extracted_text


def test_pdf_three_column_reading_order():
    from ocr_poc_ray.extractors.pdf import extract_pdf

    spans = []
    words = [f"w{i}" for i in range(9)]
    for ci, base in enumerate((72.0, 250.0, 428.0)):
        for ri in range(3):
            w = words[ci * 3 + ri]
            y = 60.0 + 14.0 * ri
            spans.append(f"{base + ri:.1f},{y:.1f},{base + 40:.1f},{y + 11:.1f}|{w}")
    import random

    random.Random(0).shuffle(spans)
    r = extract_pdf("\n".join(spans))
    assert r.success
    assert r.extracted_text == " ".join(words)


def test_pdf_single_column_wide_jitter_stays_one_column():
    from ocr_poc_ray.extractors.pdf import extract_pdf

    spans = [
        f"{72.0 + j:.1f},{60.0 + 14 * i:.1f},{300.0:.1f},{71.0 + 14 * i:.1f}|line{i}"
        for i, j in enumerate((0, 18, 5, 12))
    ]
    r = extract_pdf("\n".join(spans))
    assert r.success and r.extracted_text == "line0 line1 line2 line3"


def test_pdf_multipage_reading_order():
    from ocr_poc_ray.extractors.pdf import extract_pdf

    spans = [
        "1,72.0,60.0,150.0,71.0|page1-first",
        "0,72.0,74.0,150.0,85.0|page0-second",
        "0,72.0,60.0,150.0,71.0|page0-first",
        "1,72.0,74.0,150.0,85.0|page1-second",
    ]
    import random

    random.Random(1).shuffle(spans)
    r = extract_pdf("\n".join(spans))
    assert r.success
    assert r.extracted_text == "page0-first page0-second page1-first page1-second"


def test_html_unquoted_attr_slash_not_selfclosing():
    """<a href=http://x.com/> — the '/' belongs to the unquoted
    attribute value, so the <a> stays OPEN (html.parser/HTML5 parity)
    and its text counts as link chars; '<br />' and '<img src="x"/>'
    remain self-closing."""
    from ocr_poc_ray.extractors.html import extract_html

    # the anchor's text must be accounted as link chars → block dropped
    # by link density, proving the <a> was not closed at the tag end
    linky = (
        "<p><a href=http://x.com/>click click click click click</a></p>"
        "<p>An honest full-length paragraph that easily clears the "
        "minimum content threshold for keeping blocks.</p>"
    )
    r = extract_html(linky)
    assert r.success
    assert "click" not in r.extracted_text
    assert "honest full-length paragraph" in r.extracted_text

    # quoted/space self-closing forms still close immediately: the text
    # after them is NOT link text
    kept = (
        '<p><img src="x"/><br />A plain paragraph long enough to keep '
        "with no anchors anywhere inside it at all.</p>"
    )
    r2 = extract_html(kept)
    assert r2.success and "plain paragraph long enough" in r2.extracted_text


def test_markdown_strips_markup_and_furniture():
    from ocr_poc_ray.extractors.markdown import extract_markdown

    text = (
        "# Title Site\n"
        "- [Home](/home)\n- [Docs](/docs)\n"
        "![badge](http://img.example/b.png)\n"
        "---\n"
        "The **quick** brown [fox](http://a.example/f) jumps over the `lazy` *dog.*\n"
        "\n"
        "```python\nx = 1\nreturn x\n```\n"
        "## Footer\n"
        "- [Terms](/terms) - [About](/about)\n"
    )
    r = extract_markdown(text)
    assert r.success
    assert r.extracted_text == "The quick brown fox jumps over the lazy dog."
    # one kept prose line of 8 visible lines (headings/nav/rule/badge/footer)
    assert r.n_kept == 1
    assert r.spans == f"0:{len(r.extracted_text)}"


def test_markdown_furniture_only_fails():
    from ocr_poc_ray.extractors.markdown import extract_markdown

    r = extract_markdown("# Only Site\n- [Home](/h)\n---\n```js\n1\n```")
    assert not r.success
    assert r.error == "no_content_lines"
    assert r.extracted_text == ""


def test_markdown_dispatch_registered():
    from ocr_poc_ray.extractors.registry import extract_turn

    r = extract_turn("Plain prose with *emphasis* kept intact.", "md")
    assert r.success
    assert r.extracted_text == "Plain prose with emphasis kept intact."


def test_markdown_unclosed_fence_contained():
    """An unterminated fence swallows the rest of the doc (CommonMark
    behavior) — prior content still extracts; never raises."""
    from ocr_poc_ray.extractors.markdown import extract_markdown

    r = extract_markdown("Good opening prose line here.\n```\ncode forever\nmore code")
    assert r.success
    assert r.extracted_text == "Good opening prose line here."


def test_json_extracts_long_string_leaves_in_document_order():
    from ocr_poc_ray.extractors.json_tool import extract_json

    text = (
        '{"status": "ok", "took_ms": 42, "result": {"items": ['
        '{"id": "a1b2", "snippet": "First  long prose payload about rivers and bridges.", "score": 0.5},'
        '{"id": "c3d4", "snippet": "Second long prose payload about market squares.", "tags": ["web"]}'
        '], "cursor": "ff00"}, "meta": {"node": "w3", "cached": true}}'
    )
    r = extract_json(text)
    assert r.success
    assert r.extracted_text == (
        "First long prose payload about rivers and bridges. "
        "Second long prose payload about market squares."
    )
    # blocks = ALL string leaves (status, ids, snippets, tags, cursor, node)
    assert r.n_kept == 2 and r.n_blocks == 8
    first_len = len("First long prose payload about rivers and bridges.")
    assert r.spans.split(";")[0] == f"0:{first_len}"


def test_json_noise_only_fails():
    from ocr_poc_ray.extractors.json_tool import extract_json

    r = extract_json('{"status": "ok", "ids": ["a1", "b2"], "n": 3}')
    assert not r.success
    assert r.error == "no_content_strings"
    assert r.n_blocks == 3


def test_json_malformed_fails_as_data():
    from ocr_poc_ray.extractors.json_tool import extract_json

    r = extract_json('{"status": "ok", "result": [1, 2')
    assert not r.success
    assert r.error == "json_parse"


def test_json_dispatch_registered():
    from ocr_poc_ray.extractors.registry import extract_turn

    r = extract_turn(
        '{"content": "Dispatched through the registry with enough characters."}',
        "json",
    )
    assert r.success
    assert r.extracted_text == "Dispatched through the registry with enough characters."
