"""Plain-text fast path — the pymupdf/pypdf parser semantics.

Mirrors (file:line into /root/reference):
- blank-run collapse + strip   <- nougat_.py:250
- DOI metadata regex            <- pymupdf.py:36-39
- abstract >580-char threshold  <- pymupdf.py:34,76-80 (the reference
  reads the PDF 'subject' metadata field; our transcript analog is a
  'Subject: ...' line in the payload)
"""

from __future__ import annotations

import re

from pdfwf_spark.core.normalize import abstract_or_empty, collapse_blank_runs, extract_doi

SUBJECT_RE = re.compile(r"^Subject:[ \t]*(.*)$", re.M)


def extract_plain(payload: str) -> tuple[str, list[tuple[int, int, str]], dict[str, str]]:
    """Normalize a plain-text payload. Returns (clean_text, spans, meta)."""
    clean_text = collapse_blank_runs(payload)

    meta: dict[str, str] = {}
    doi = extract_doi(payload)
    if doi:
        meta["doi"] = doi
    sm = SUBJECT_RE.search(payload)
    if sm:
        abstract = abstract_or_empty(sm.group(1).strip())
        if abstract:
            meta["abstract"] = abstract

    # one body span: the stripped extent of the original payload
    spans: list[tuple[int, int, str]] = []
    stripped = payload.strip()
    if stripped:
        start = len(payload) - len(payload.lstrip())
        end = len(payload.rstrip())
        spans.append((start, end, "body"))
    return clean_text, spans, meta
