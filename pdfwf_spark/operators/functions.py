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
    """F2 — nougat_.py:250."""
    return F.trim(F.regexp_replace(c, BLANK_RUN_PATTERN, "\n\n"))


def collapse_ws_runs(c: Column) -> Column:
    """F3 — tensor_utils.py:2399,2414-2415."""
    return F.regexp_replace(c, WS_RUN_PATTERN, "\n")


def abstract_or_empty(c: Column) -> Column:
    """F4 — pymupdf.py:34,76-80 (strictly greater than 580 chars)."""
    return F.when(F.length(c) > ABSTRACT_THRESHOLD, c).otherwise(F.lit(""))
