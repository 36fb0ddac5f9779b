"""Unit tests for the pure-Python extraction core (no Spark).

Hand-crafted payloads with known-by-construction goldens; semantics
cited to the reference in each module's docstring.
"""

from __future__ import annotations

import pytest

from pdfwf_spark.core.html_extract import extract_html
from pdfwf_spark.core.normalize import (
    abstract_or_empty,
    collapse_blank_runs,
    collapse_ws_runs,
    extract_doi,
)
from pdfwf_spark.core.pdfish_extract import ParseFailure, extract_pdfish
from pdfwf_spark.core.plain_extract import extract_plain
from pdfwf_spark.core.route import extract_payload, route_payload
from pdfwf_spark.core.sniff import sniff


# ------------------------------------------------------------- sniffer

def test_sniff_families():
    assert sniff("%PDFISH1\nPAGE 1") == "pdfish"
    assert sniff("<html><body><p>x</p></body></html>") == "html"
    assert sniff("just ordinary prose with no markup") == "plain"
    assert sniff("") == "empty"
    assert sniff("   \n\t ") == "empty"
    # prose mentioning a tag once in a long text is NOT html (density guard)
    long_prose = "mentions <div> once " + "word " * 500
    assert sniff(long_prose) == "plain"


# ------------------------------------------------------------- normalize

def test_normalize_rules():
    # F2: nougat_.py:250
    assert collapse_blank_runs("a\n\n\n\nb\n\n\nc") == "a\n\nb\n\nc"
    assert collapse_blank_runs("\n\na\n\n") == "a"
    # F3: tensor_utils.py:2399
    assert collapse_ws_runs("a\n  \n\t\nb") == "a\nb"
    # F1: pymupdf.py:36-39
    assert extract_doi("see doi:10.1000/xyz end") == "10.1000/xyz"
    assert extract_doi("at https://doi.org/10.5/abc.") == "10.5/abc."
    assert extract_doi("doi: 10.2/q r") == "10.2/q"
    assert extract_doi("no identifier here") == ""
    # F4: pymupdf.py:34,76-80 — strictly greater than 580
    assert abstract_or_empty("x" * 580) == ""
    assert abstract_or_empty("x" * 581) == "x" * 581


# ------------------------------------------------------------- html

def test_html_basic_strip():
    payload = (
        "<html><head><title>My Title</title><style>p{}</style></head><body>"
        '<div class="nav"><a href="/">Home</a> <a href="/a">About</a></div>'
        '<article><p>First para text.</p><p>Second para.</p></article>'
        "<footer>Copyright 2025</footer></body></html>"
    )
    text, spans, meta = extract_html(payload)
    assert text == "First para text.\nSecond para."
    assert meta["title"] == "My Title"
    # spans point into the ORIGINAL payload
    for start, end, label in spans:
        assert label == "content"
        assert "para" in payload[start:end]


def test_html_link_density_and_markers():
    payload = (
        "<body>"
        '<div><a href="1">one</a> <a href="2">two</a> <a href="3">three</a> x</div>'
        '<div>mostly prose here with <a href="4">a link</a> inside it</div>'
        '<div class="cookie-banner">We use cookies</div>'
        '<nav><div>inner nav text</div></nav>'
        '<article><nav>nav inside article</nav><p>kept body</p></article>'
        "</body>"
    )
    text, _, _ = extract_html(payload)
    assert "one" not in text            # link farm dropped
    assert "mostly prose" in text       # low link density kept
    assert "cookies" not in text        # class vocab
    assert "inner nav" not in text      # tag vocab, inherited
    assert "nav inside article" not in text  # nearest decisive = nav
    assert "kept body" in text


def test_html_entities_comments_unclosed():
    payload = (
        "<body><!-- hidden comment --><p>Fish &amp; chips &#62; all</p>"
        "<p>unclosed tag content"
        "<script>var hidden = 1;</script></body>"
    )
    text, _, _ = extract_html(payload)
    assert "Fish & chips > all" in text
    assert "unclosed tag content" in text
    assert "hidden" not in text


def test_html_empty_content():
    text, spans, _ = extract_html("<body><nav>only nav</nav></body>")
    assert text == "" and spans == []


# ------------------------------------------------------------- pdfish

def _doc(lines):
    return "%PDFISH1\n" + "\n".join(lines)


def test_pdfish_two_column_reading_order():
    # two columns at x~100 and x~400; scrambled input order; reading
    # order = col-major (col_idx, y0) like tensor_utils.py:661-669
    payload = _doc(
        [
            "PAGE 1 612 792",
            "BLOCK 350 300 550 350 text|right-bottom",
            "BLOCK 50 300 250 350 text|left-bottom",
            "BLOCK 350 100 550 150 text|right-top",
            "BLOCK 50 100 250 150 text|left-top",
        ]
    )
    text, spans, _ = extract_pdfish(payload)
    assert text == "left-top\nleft-bottom\nright-top\nright-bottom"
    labels = [payload[s:e] for s, e, _ in spans]
    assert labels == ["right-bottom", "left-bottom", "right-top", "left-top"]


def test_pdfish_nms_dedup():
    # overlapping near-duplicate: larger area wins (tensor_utils.py:38-178)
    payload = _doc(
        [
            "PAGE 1",
            "BLOCK 100 100 300 200 text|the original block",
            "BLOCK 104 104 298 198 text|the duplicate",
        ]
    )
    text, _, _ = extract_pdfish(payload)
    assert text == "the original block"


def test_pdfish_meta_and_excluded():
    payload = _doc(
        [
            "PAGE 1",
            "BLOCK 100 40 500 60 title|A Title",
            "BLOCK 100 65 500 80 author|A. Author",
            "BLOCK 100 700 500 720 footer|page 1 of 9",
            "BLOCK 100 120 500 200 text|body text",
        ]
    )
    text, spans, meta = extract_pdfish(payload)
    assert text == "body text"
    assert meta == {"title": "A Title", "author": "A. Author"}
    assert {s[2] for s in spans} == {"title", "author", "text"}


def test_pdfish_sentinels():
    # empty page -> [MISSING_PAGE_EMPTY:n] (nougat_.py:218-243)
    payload = _doc(["PAGE 1", "BLOCK 1 1 9 9 text|ok", "PAGE 2"])
    text, _, _ = extract_pdfish(payload)
    assert text == "ok\n[MISSING_PAGE_EMPTY:2]"
    # malformed line -> page fails with [MISSING_PAGE_FAIL:n]
    payload = _doc(["PAGE 1", "BLOCK 1 1 9 9 text|ok", "PAGE 2", "garbage line"])
    text, _, _ = extract_pdfish(payload)
    assert text == "ok\n[MISSING_PAGE_FAIL:2]"


def test_pdfish_failures():
    with pytest.raises(ParseFailure):
        extract_pdfish("%PDFISH1\nBLOCK 1 2 3 4 text|orphan")  # block before page
    with pytest.raises(ParseFailure):
        extract_pdfish("%PDFISH1\n")  # no pages
    with pytest.raises(ParseFailure):
        extract_pdfish("not even magic")


# ------------------------------------------------------------- plain/meta

PLAIN_META_KEYS = {
    "title", "authors", "creationdate", "keywords", "doi",
    "producer", "format", "first_page", "abstract",
}


def test_plain_and_meta():
    payload = "Subject: " + "y" * 600 + "\nSee doi:10.1/ab now.\n\n\n\n\nBody."
    text, spans, meta = extract_plain(payload)
    assert "\n\n\n" not in text and text.endswith("Body.")
    assert meta["doi"] == "10.1/ab"
    assert meta["abstract"] == "y" * 600
    payload2 = "Subject: short\nbody"
    _, _, meta2 = extract_plain(payload2)
    assert meta2["abstract"] == ""  # <=580 chars -> '' (F4, pymupdf.py:76-80)


def test_plain_nine_key_metadata_record():
    """P6 — the full 9-key out_meta of pymupdf.py:83-93, always
    present, ''-defaulted."""
    payload = (
        "Title: A Study of Shuffles\n"
        "Authors: Ada L., Grace H.\n"
        "Created: 2025-01-15\n"
        "Keywords: spark, shuffle\n"
        "Producer: engine-v2\n"
        "Subject: " + "z" * 581 + "\n"
        "Intro paragraph mentioning doi:10.42/xyz here.\n\n\n\n"
        "Second paragraph."
    )
    _, _, meta = extract_plain(payload)
    assert set(meta) == PLAIN_META_KEYS
    assert meta["title"] == "A Study of Shuffles"
    assert meta["authors"] == "Ada L., Grace H."
    assert meta["creationdate"] == "2025-01-15"
    assert meta["keywords"] == "spark, shuffle"
    assert meta["producer"] == "engine-v2"
    assert meta["doi"] == "10.42/xyz"
    assert meta["format"] == "plain"
    assert meta["abstract"] == "z" * 581
    # first_page = first blank-line-delimited segment (pymupdf.py:64-66
    # page-one analog) — header block up to the first paragraph break
    assert meta["first_page"].startswith("Title: A Study of Shuffles")
    assert meta["first_page"].endswith("doi:10.42/xyz here.")

    # no headers at all -> every key still present, '' (format/first_page set)
    _, _, bare = extract_plain("just a body paragraph")
    assert set(bare) == PLAIN_META_KEYS
    assert bare["title"] == "" and bare["authors"] == ""
    assert bare["first_page"] == "just a body paragraph"


# ------------------------------------------------------------- routing

def test_route_text_tool():
    assert route_payload("hello", "") == ("hello", "text")
    assert route_payload("", "tool payload") == ("tool payload", "tool")
    assert route_payload(None, None) == ("", "text")


def test_extract_payload_statuses():
    ok = extract_payload("plain prose body", "")
    assert ok.status == "ok" and ok.parser == "plain"
    emp = extract_payload("", "")
    assert emp.status == "failed" and emp.reason == "empty"
    bad = extract_payload("%PDFISH1\nBLOCK 0 0 1 1 text|orphan", "")
    assert bad.status == "failed" and bad.parser == "pdfish"
    via_tool = extract_payload("", "<body><p>tool html</p></body>")
    assert via_tool.status == "ok" and via_tool.source == "tool" and via_tool.parser == "html"


# ------------------------------------------------------------- latex (F6)

def test_latex_to_text_basics():
    from pdfwf_spark.core.latex import LatexError, latex_to_text

    # identity on non-latex prose (guard: % and braces untouched)
    assert latex_to_text("plain prose, 50% off {really}") == \
        "plain prose, 50% off {really}"
    # commands stripped, operands kept (pylatexenc-subset shape)
    assert latex_to_text(r"\textbf{bold} and \emph{it}") == "bold and it"
    # '$' delimiters are stripped once the text is latex-bearing;
    # a backslash-free "costs $5" stays untouched (guard)
    assert latex_to_text(r"$E = \mu c^2$") == "E = μ c^2"
    assert latex_to_text("costs $5 today") == "costs $5 today"
    assert latex_to_text(r"\frac{a+b}{c}") == "a+b/c"
    assert latex_to_text(r"\sqrt{x+1}") == "√(x+1)"
    assert latex_to_text(r"\alpha \leq \beta") == "α ≤ β"
    assert latex_to_text("A\\\\B") == "A\nB"            # \\ -> newline
    assert latex_to_text(r"100\% \& \{x\}") == "100% & {x}"
    assert latex_to_text(r"\begin{eq}x=1\end{eq}") == "x=1"
    # comments stripped only in latex-bearing text
    assert latex_to_text("x \\alpha % note\ny") == "x α \ny"
    # failures -> LatexError (reference: key dropped)
    with pytest.raises(LatexError):
        latex_to_text(r"\frac{a}")       # missing second operand
    with pytest.raises(LatexError):
        latex_to_text(r"\begin{eq}x=1")  # unclosed environment
    with pytest.raises(LatexError):
        latex_to_text(r"\end{eq}")       # mismatched end


def test_pdfish_equation_class():
    """F6 — 'equation' blocks land raw in meta['equations'] (' '-join,
    tensor_utils.py:2405-2408); body text passes through latex_to_text."""
    payload = _doc(
        [
            "PAGE 1",
            r"BLOCK 100 100 500 160 text|result uses \textbf{bold} math",
            r"BLOCK 100 200 500 260 equation|E = \frac{m}{c}",
            r"BLOCK 100 300 500 360 equation|\alpha + 1",
            "PAGE 2",
            "BLOCK 100 100 500 160 text|second page",
        ]
    )
    text, spans, meta = extract_pdfish(payload)
    assert meta["equations"] == r"E = \frac{m}{c} \alpha + 1"   # raw latex
    assert text == "result uses bold math\nsecond page"         # latex'd body
    assert ("equation" in {s[2] for s in spans})


def test_pdfish_latex_failure_drops_key():
    # meta category with broken latex -> key dropped, doc still ok
    payload = _doc(
        [
            "PAGE 1",
            r"BLOCK 100 40 500 60 title|\frac{broken",
            "BLOCK 100 100 500 160 text|fine body",
        ]
    )
    text, _, meta = extract_pdfish(payload)
    assert text == "fine body"
    assert "title" not in meta
    # broken latex in the BODY -> whole doc fails (text key dropped)
    payload2 = _doc(["PAGE 1", r"BLOCK 100 100 500 160 text|\begin{x} y"])
    with pytest.raises(ParseFailure):
        extract_pdfish(payload2)


# ------------------------------------------------------------- markdown (F7)

def test_markdown_compatible():
    from pdfwf_spark.core.normalize import markdown_compatible

    assert markdown_compatible("#Title\n##Sub") == "# Title\n## Sub"
    assert markdown_compatible("# ok\n#### ok") == "# ok\n#### ok"
    assert markdown_compatible("(1.2) \\[E=mc^2\\]") == "\\[E=mc^2 \\tag{1.2}\\]"
    assert markdown_compatible("\\[E=mc^2\\] (3a)") == "\\[E=mc^2 \\tag{3a}\\]"
    assert markdown_compatible("\\bm{x} stays \\mathbf{y}") == "\\mathbf{x} stays \\mathbf{y}"
    assert markdown_compatible("end\\. next") == "end. next"
    assert markdown_compatible("see https://ex.org/a?b=1 now") == \
        "see [https://ex.org/a?b=1](https://ex.org/a?b=1) now"
    # idempotent-ish on already-clean text
    assert markdown_compatible("# Title\nplain body") == "# Title\nplain body"


# ------------------------------------------------------------- conf (P5)

def test_pdfish_confidence_threshold_and_nms():
    from pdfwf_spark.core.pdfish_extract import CONF_THRESHOLD

    assert CONF_THRESHOLD == 0.6  # tensor_utils.py:402-466 default
    payload = _doc(
        [
            "PAGE 1",
            "BLOCK 100 100 300 200 0.95 text|high conf block",
            "BLOCK 100 300 300 400 0.31 text|low conf dropped",
            "BLOCK 100 500 300 600 text|no conf defaults to 1.0",
        ]
    )
    text, _, _ = extract_pdfish(payload)
    assert text == "high conf block\nno conf defaults to 1.0"

    # NMS prefers HIGHER CONF even when the overlapping rival is larger
    payload2 = _doc(
        [
            "PAGE 1",
            "BLOCK 100 100 400 300 0.61 text|big but less confident",
            "BLOCK 110 110 390 290 0.99 text|small and confident",
        ]
    )
    text2, _, _ = extract_pdfish(payload2)
    assert text2 == "small and confident"


def test_latex_guard_ignores_unknown_backslash_prose():
    """An unrecognized '\\word' (Windows path, regex in prose) must NOT
    activate LaTeX semantics — no macro deletion, no % comment
    stripping, no brace/$ removal, no ParseFailure."""
    from pdfwf_spark.core.latex import latex_to_text

    prose = r"run C:\temp\new, fees fell 5% today {see notes} for $5"
    assert latex_to_text(prose) == prose
    # but genuine latex still converts (and then % IS a comment)
    assert latex_to_text(r"\alpha up 5% today") == "α up 5"


def test_sniff_text_heavy_html():
    """Genuine HTML with low tag density (long paragraphs) must still
    route to the HTML parser via the absolute tag-count escape hatch."""
    paras = "".join(f"<p>{'word ' * 120}</p>" for _ in range(10))
    assert sniff("<body>" + paras + "</body>") == "html"
    # prose mentioning one tag stays plain
    assert sniff("mentions <div> once " + "word " * 500) == "plain"
