"""Property-based robustness: the extraction core must never crash on
arbitrary input — failures surface as parse_status='failed', mirroring
the reference's @exception_handler contract (utils.py:92-115): a bad
document degrades to a dropped row, never a task failure."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from pdfwf_spark.core.route import extract_payload
from pdfwf_spark.core.sniff import sniff

payloads = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=2000
)


@settings(max_examples=300, deadline=None)
@given(payloads, payloads)
def test_extract_never_raises(text, tool):
    res = extract_payload(text, tool)
    assert res.status in ("ok", "failed")
    if res.status == "ok":
        assert res.clean_text
        for s in res.spans:
            assert 0 <= s.start <= s.end <= max(len(text), len(tool))


@settings(max_examples=300, deadline=None)
@given(payloads)
def test_sniff_total(payload):
    assert sniff(payload) in ("html", "pdfish", "plain", "empty")


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="<>ab c/=\"'!-", max_size=500))
def test_html_tokenizer_tolerates_tag_soup(soup):
    res = extract_payload("<body>" + soup + "</body>", "")
    assert res.status in ("ok", "failed")
