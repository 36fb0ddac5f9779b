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

def test_plain_and_meta():
    payload = "Subject: " + "y" * 600 + "\nSee doi:10.1/ab now.\n\n\n\n\nBody."
    text, spans, meta = extract_plain(payload)
    assert "\n\n\n" not in text and text.endswith("Body.")
    assert meta["doi"] == "10.1/ab"
    assert meta["abstract"] == "y" * 600
    payload2 = "Subject: short\nbody"
    _, _, meta2 = extract_plain(payload2)
    assert "abstract" not in meta2  # <=580 chars -> dropped (F4)


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
