"""Spark Column expressions of the scalar rules (SURVEY §2.8).

These mirror pdfwf_spark.core.normalize exactly (same regexes) so
SQL-level pipelines and the UDF path agree byte-for-byte. Each cites
the reference behavior it reproduces.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from pdfwf_spark.core.normalize import ABSTRACT_THRESHOLD

# Java-regex renderings of the same patterns in core/normalize.py
DOI_PATTERN = r"(?:doi:\s*|doi\.org/)(\S+)"
BLANK_RUN_PATTERN = r"\n{3,}"
WS_RUN_PATTERN = r"(\n\s*)+"


def doi_extract(c: Column) -> Column:
    """F1 — pymupdf.py:36-39."""
    return F.regexp_extract(c, DOI_PATTERN, 1)


def collapse_blank_runs(c: Column) -> Column:
    """F2 — nougat_.py:250 (strip twin of str.strip(): ALL whitespace,
    not F.trim's spaces-only)."""
    return F.regexp_replace(
        F.regexp_replace(c, BLANK_RUN_PATTERN, "\n\n"), r"^\s+|\s+$", ""
    )


def collapse_ws_runs(c: Column) -> Column:
    """F3 — tensor_utils.py:2399,2414-2415."""
    return F.regexp_replace(c, WS_RUN_PATTERN, "\n")


def abstract_or_empty(c: Column) -> Column:
    """F4 — pymupdf.py:34,76-80 (strictly greater than 580 chars)."""
    return F.when(F.length(c) > ABSTRACT_THRESHOLD, c).otherwise(F.lit(""))


# P6 — header-line analogs of the PDF metadata fields (pymupdf.py:68-82);
# same patterns as core.plain_extract.HEADER_RES, Java/RE2-rendered.
HEADER_PATTERNS = {
    "title": r"(?m)^Title:[ \t]*(.*)$",
    "authors": r"(?m)^Authors?:[ \t]*(.*)$",
    "creationdate": r"(?m)^(?:Creation-Date|Created|Date):[ \t]*(.*)$",
    "keywords": r"(?m)^Keywords:[ \t]*(.*)$",
    "producer": r"(?m)^Producer:[ \t]*(.*)$",
    "subject": r"(?m)^Subject:[ \t]*(.*)$",
}


def _strip(c: Column) -> Column:
    """Python str.strip() twin: removes ALL leading/trailing
    whitespace (F.trim strips only ASCII spaces — a tab-terminated
    header value would diverge from the UDF path byte-for-byte)."""
    return F.regexp_replace(c, r"^\s+|\s+$", "")


def project_meta9(payload: Column) -> list[Column]:
    """P6 — the full 9-key metadata projection of pymupdf.py:83-93 as
    JVM-side columns (select/rename of ~9 metadata keys; ''-defaulted,
    abstract iff subject > 580 chars, first_page = first
    blank-line-delimited segment of the normalized payload, capped at
    FIRST_PAGE_MAX like the UDF path)."""
    from pdfwf_spark.core.plain_extract import FIRST_PAGE_MAX

    def hdr(key: str) -> Column:
        return _strip(F.regexp_extract(payload, HEADER_PATTERNS[key], 1))

    subject = hdr("subject")
    clean = _strip(F.regexp_replace(payload, BLANK_RUN_PATTERN, "\n\n"))
    return [
        hdr("title").alias("title"),
        hdr("authors").alias("authors"),
        hdr("creationdate").alias("creationdate"),
        hdr("keywords").alias("keywords"),
        doi_extract(payload).alias("doi"),
        hdr("producer").alias("producer"),
        F.lit("plain").alias("format"),
        F.substring(F.split(clean, r"\n\n").getItem(0), 1, FIRST_PAGE_MAX)
        .alias("first_page"),
        abstract_or_empty(subject).alias("abstract"),
    ]


def markdown_compatible_col(c: Column) -> Column:
    """F7 — nougat_.py:124,245-246 markdown repair, JVM-side twin of
    core.normalize.markdown_compatible (same patterns, Java/RE2-safe;
    whole-stage-codegen'd, so zero Python in the hot path)."""
    c = F.regexp_replace(c, r"(?m)^(#{1,6})([^#\s])", "$1 $2")
    c = F.regexp_replace(
        c, r"(?m)^\(([0-9][0-9.]*[A-Za-z]?)\) \\\[(.+)\\\]$",
        "\\\\[$2 \\\\tag{$1}\\\\]",
    )
    c = F.regexp_replace(
        c, r"(?m)^\\\[(.+)\\\] \(([0-9][0-9.]*[A-Za-z]?)\)$",
        "\\\\[$1 \\\\tag{$2}\\\\]",
    )
    c = F.replace(c, F.lit("\\bm{"), F.lit("\\mathbf{"))
    c = F.replace(c, F.lit("\\. "), F.lit(". "))
    return F.regexp_replace(
        c, r"(?m)(^|\s)(https?://[^\s<>)\]\"']+)", "$1[$2]($2)"
    )
