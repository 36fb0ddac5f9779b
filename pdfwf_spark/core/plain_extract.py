"""Plain-text fast path — the pymupdf/pypdf parser semantics.

Mirrors (file:line into /root/reference):
- blank-run collapse + strip   <- nougat_.py:250
- DOI metadata regex            <- pymupdf.py:36-39
- abstract >580-char threshold  <- pymupdf.py:34,76-80 (the reference
  reads the PDF 'subject' metadata field; our transcript analog is a
  'Subject: ...' line in the payload)
- 9-key metadata record         <- pymupdf.py:83-93 / pypdf.py:100-110:
  title, authors, creationdate, keywords, doi, producer, format,
  first_page, abstract — ALWAYS present, '' when absent (the reference
  assembles out_meta with ''-defaulting .get()s). Transcript analogs
  of the PDF metadata dict are RFC822-ish header lines; first_page
  (reference: text of page one, pymupdf.py:64-66) is the first
  blank-line-delimited segment of the normalized payload.
"""

from __future__ import annotations

import re

from pdfwf_spark.core.normalize import (
    abstract_or_empty,
    ascii_strip,
    collapse_blank_runs,
    extract_doi,
)

# Header patterns in the engine-pinned form (normalize.LINE_START +
# [^\n] instead of re.M ^(.*)$): Java (?m)/. treat \r//
# as line terminators where Python/RE2 do not, so the JVM twins in
# operators/functions.py would otherwise diverge on CRLF payloads.
from pdfwf_spark.core.normalize import LINE_START

SUBJECT_RE = re.compile(rf"{LINE_START}Subject:[ \t]*([^\n]*)")

# Header-line analogs of the PDF metadata dict fields (pymupdf.py:68-82)
HEADER_RES = {
    "title": re.compile(rf"{LINE_START}Title:[ \t]*([^\n]*)"),
    "authors": re.compile(rf"{LINE_START}Authors?:[ \t]*([^\n]*)"),
    "creationdate": re.compile(
        rf"{LINE_START}(?:Creation-Date|Created|Date):[ \t]*([^\n]*)"
    ),
    "keywords": re.compile(rf"{LINE_START}Keywords:[ \t]*([^\n]*)"),
    "producer": re.compile(rf"{LINE_START}Producer:[ \t]*([^\n]*)"),
}

PLAIN_FORMAT = "plain"  # the reference's doc.metadata['format'] analog

# first_page cap: the reference's first_page is bounded by one PDF
# page of text (pymupdf.py:64-66); a plain payload with no blank line
# would otherwise duplicate the ENTIRE clean_text into the meta map of
# every row (doubling output + window shuffle bytes at corpus scale).
FIRST_PAGE_MAX = 2000


def _header(payload: str, key: str) -> str:
    m = HEADER_RES[key].search(payload)
    return ascii_strip(m.group(1)) if m else ""


def extract_plain(payload: str) -> tuple[str, list[tuple[int, int, str]], dict[str, str]]:
    """Normalize a plain-text payload. Returns (clean_text, spans, meta)."""
    clean_text = collapse_blank_runs(payload)

    sm = SUBJECT_RE.search(payload)
    subject = ascii_strip(sm.group(1)) if sm else ""
    # the full 9-key record of pymupdf.py:83-93, ''-defaulted
    meta: dict[str, str] = {
        "title": _header(payload, "title"),
        "authors": _header(payload, "authors"),
        "creationdate": _header(payload, "creationdate"),
        "keywords": _header(payload, "keywords"),
        "doi": extract_doi(payload),
        "producer": _header(payload, "producer"),
        "format": PLAIN_FORMAT,
        "first_page": clean_text.split("\n\n", 1)[0][:FIRST_PAGE_MAX],
        "abstract": abstract_or_empty(subject),
    }

    # one body span: the stripped extent of the original payload
    spans: list[tuple[int, int, str]] = []
    stripped = payload.strip()
    if stripped:
        start = len(payload) - len(payload.lstrip())
        end = len(payload.rstrip())
        spans.append((start, end, "body"))
    return clean_text, spans, meta
