"""Spark Column expressions of the scalar rules (SURVEY §2.8).

These mirror pdfwf_spark.core.normalize exactly (same regexes) so
SQL-level pipelines and the UDF path agree byte-for-byte. Each cites
the reference behavior it reproduces.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from pdfwf_spark.core.normalize import (
    ABSTRACT_THRESHOLD,
    LINE_END,
    LINE_START,
    WS_CLASS,
)

# Java-regex renderings of the same patterns in core/normalize.py.
# Twin-parity contract: every pattern is built from the SAME pinned
# pieces (WS_CLASS / LINE_START / [^\n]) as the Python side — never
# \s or (?m), whose semantics differ between Python and Java regex
# (Java \s is ASCII-only, Java (?m) anchors at \r//; see
# core/normalize.py). A CRLF or NBSP payload must take the identical
# path through both engines.
DOI_PATTERN = rf"(?:doi:[{WS_CLASS}]*|doi\.org/)([^{WS_CLASS}]+)"
BLANK_RUN_PATTERN = r"\n{3,}"
WS_RUN_PATTERN = rf"(\n[{WS_CLASS}]*)+"
STRIP_PATTERN = rf"^[{WS_CLASS}]+|[{WS_CLASS}]+$"


def eval_once(c: Column) -> Column:
    """Identity wrapper that pins an expensive expression to a SINGLE
    evaluation (r6, guide §4.4 generalized to pure expressions).

    Catalyst's filter pushdown + CollapseProject inline a computed
    column's expression into every consumer: `withColumn(q, <heavy>)
    .filter(q >= t)` evaluates <heavy> once below the pushed filter
    and again in the output projection (measured 4.4x on the sf1
    curate_corpus score-then-filter chain). Wrapping the column as
    shuffle(array(c))[0] is value-identity — a 1-element array has
    one permutation — but `shuffle` is NON-DETERMINISTIC, which the
    optimizer may not duplicate, push past, or constant-fold, so the
    expression is computed exactly once and consumers read the
    attribute. Apply to the expensive scored columns right before a
    filter on them, not blanket (non-determinism also blocks
    legitimate reorderings of other predicates).
    """
    return F.shuffle(F.array(c))[0]


def doi_extract(c: Column) -> Column:
    """F1 — pymupdf.py:36-39."""
    return F.regexp_extract(c, DOI_PATTERN, 1)


def collapse_blank_runs(c: Column) -> Column:
    """F2 — nougat_.py:250 (strip twin of ascii_strip: the explicit
    ASCII_WS set, not F.trim's spaces-only and not Java \\s)."""
    return F.regexp_replace(
        F.regexp_replace(c, BLANK_RUN_PATTERN, "\n\n"), STRIP_PATTERN, ""
    )


def collapse_ws_runs(c: Column) -> Column:
    """F3 — tensor_utils.py:2399,2414-2415."""
    return F.regexp_replace(c, WS_RUN_PATTERN, "\n")


def abstract_or_empty(c: Column) -> Column:
    """F4 — pymupdf.py:34,76-80 (strictly greater than 580 chars)."""
    return F.when(F.length(c) > ABSTRACT_THRESHOLD, c).otherwise(F.lit(""))


# P6 — header-line analogs of the PDF metadata fields (pymupdf.py:68-82);
# byte-identical twins of core.plain_extract.HEADER_RES (pinned
# LINE_START + [^\n] form — Java (?m)^(.*)$ would capture differently
# on CRLF payloads).
HEADER_PATTERNS = {
    "title": rf"{LINE_START}Title:[ \t]*([^\n]*)",
    "authors": rf"{LINE_START}Authors?:[ \t]*([^\n]*)",
    "creationdate": rf"{LINE_START}(?:Creation-Date|Created|Date):[ \t]*([^\n]*)",
    "keywords": rf"{LINE_START}Keywords:[ \t]*([^\n]*)",
    "producer": rf"{LINE_START}Producer:[ \t]*([^\n]*)",
    "subject": rf"{LINE_START}Subject:[ \t]*([^\n]*)",
}


def _strip(c: Column) -> Column:
    """core.normalize.ascii_strip twin: strips the explicit ASCII_WS
    set (F.trim strips only spaces; Java \\s would diverge from the
    Python side on NBSP — see WS_CLASS)."""
    return F.regexp_replace(c, STRIP_PATTERN, "")


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
    core.normalize.markdown_compatible (identical pinned patterns —
    see WS_CLASS/LINE_START; whole-stage-codegen'd, so zero Python in
    the hot path)."""
    c = F.regexp_replace(c, rf"{LINE_START}(#{{1,6}})([^#{WS_CLASS}])", "$1 $2")
    c = F.regexp_replace(
        c, rf"{LINE_START}\(([0-9][0-9.]*[A-Za-z]?)\) \\\[([^\n]+)\\\]{LINE_END}",
        "\\\\[$2 \\\\tag{$1}\\\\]",
    )
    c = F.regexp_replace(
        c, rf"{LINE_START}\\\[([^\n]+)\\\] \(([0-9][0-9.]*[A-Za-z]?)\){LINE_END}",
        "\\\\[$1 \\\\tag{$2}\\\\]",
    )
    c = F.replace(c, F.lit("\\bm{"), F.lit("\\mathbf{"))
    c = F.replace(c, F.lit("\\. "), F.lit(". "))
    return F.regexp_replace(
        c, rf"(^|[{WS_CLASS}])(https?://[^{WS_CLASS}<>)\]\"']+)", "$1[$2]($2)"
    )


def fix_mojibake_col(c: Column) -> Column:
    """JVM-side twin of core.normalize.fix_mojibake: the pinned
    cp1252-double-encoding repair table applied as ordered literal
    `replace` calls (whole-stage-codegen'd; literal replace has no
    regex-engine divergence to pin, so the DuckDB twin is the same
    chain verbatim)."""
    from pdfwf_spark.core.normalize import MOJIBAKE_MAP

    for bad, good in MOJIBAKE_MAP:
        c = F.replace(c, F.lit(bad), F.lit(good))
    return c
