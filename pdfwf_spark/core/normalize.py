"""Scalar normalization rules (SURVEY §2.8 F1–F5).

Each function mirrors a reference behavior with the file:line cited;
the same regexes are used as Spark SQL ``regexp_replace`` /
``regexp_extract`` expressions in ``pdfwf_spark.operators.functions``
so SQL-level and UDF-level normalization agree byte-for-byte.
"""

from __future__ import annotations

import re

# Engine-pinned regex building blocks. The same patterns run in three
# engines (Python re here, Java regex in operators/functions.py, RE2
# in the DuckDB oracles) whose \s, ., (?m)^ and $ semantics all
# differ: Python \s is Unicode while Java/RE2 \s are ASCII (and RE2's
# lacks \x0B); Java (?m) treats \r//  as line terminators
# while Python/RE2 are \n-only; Java . excludes \r, Python/RE2 . do
# not. So the twins use ONLY explicit forms: WS_CLASS for whitespace,
# [^\n] for "rest of line", and \n-anchored groups instead of (?m).
WS_CLASS = r" \t\r\n\f\x0B"          # == ASCII_WS, as a regex class body
LINE_START = r"(?:^|(?<=\n))"        # Python/Java twin of \n-only (?m)^
# \n-only (?m)$ twin: before a \n, or at ABSOLUTE end. Bare $ differs
# again (Java matches before a final \r; Python before a final \n);
# (?![\s\S]) is "no character follows" in every engine.
LINE_END = r"(?:(?=\n)|(?![\s\S]))"

# F1 — DOI extraction. Reference: pdfwf/parsers/pymupdf.py:36-39 and
# pdfwf/parsers/pypdf.py:43-46 use r'(doi:\s*|doi\.org/)(\S+)'
# group(2); \s/\S pinned to the explicit ASCII class for twin parity.
DOI_RE = re.compile(rf"(doi:[{WS_CLASS}]*|doi\.org/)([^{WS_CLASS}]+)")

# F2 — blank-line collapse. Reference: pdfwf/parsers/nougat_.py:250
# (re.sub(r'\n{3,}', '\n\n', out).strip()).
BLANK_RUN_RE = re.compile(r"\n{3,}")

# F3 — whitespace-run collapse. Reference:
# pdfwf/parsers/oreo/tensor_utils.py:2399,2414-2415
# (re.sub(re.compile(r'(\n\s*)+'), '\n', proc_text)).
WS_RUN_RE = re.compile(rf"(\n[{WS_CLASS}]*)+")

# F4 — abstract-length threshold. Reference: pdfwf/parsers/pymupdf.py:34
# (ABSTRACT_THRESHOLD = 580), applied at pymupdf.py:76-80.
ABSTRACT_THRESHOLD = 580

# Intra-block whitespace squeeze used by the HTML path (one space
# between words inside a block; the reference analog is pymupdf's
# per-page text already being space-joined).
SPACE_RUN_RE = re.compile(r"[ \t\r\f\v]+")


def extract_doi(text: str) -> str:
    """Return the DOI token or '' (pymupdf.py:36-39 semantics)."""
    m = DOI_RE.search(text)
    return m.group(2) if m else ""


# ASCII whitespace set — identical to Java/RE2 \s, so the Python UDF
# path and the JVM/DuckDB twins strip the SAME characters (str.strip()
# with no args would also strip Unicode whitespace like NBSP, which
# \s-based regex strips do not).
ASCII_WS = " \t\r\n\f\v"


def ascii_strip(text: str) -> str:
    return text.strip(ASCII_WS)


def collapse_blank_runs(text: str) -> str:
    """'\\n{3,}' -> '\\n\\n' then strip (nougat_.py:250 semantics;
    ASCII strip for twin parity — see ASCII_WS)."""
    return ascii_strip(BLANK_RUN_RE.sub("\n\n", text))


def collapse_ws_runs(text: str) -> str:
    """'(\\n\\s*)+' -> '\\n' (tensor_utils.py:2399 semantics)."""
    return WS_RUN_RE.sub("\n", text)


def abstract_or_empty(subject: str) -> str:
    """Keep subject as abstract iff len > 580 (pymupdf.py:76-80)."""
    return subject if len(subject) > ABSTRACT_THRESHOLD else ""


def squeeze_spaces(text: str) -> str:
    """Collapse horizontal whitespace runs to single spaces."""
    return SPACE_RUN_RE.sub(" ", text)


# F7 — markdown_compatible. Reference: pdfwf/parsers/nougat_.py:124,
# 245-246 runs nougat's markdown postprocessing over each page when
# config.markdown is set. Deterministic re-expression of its repair
# shapes (all patterns RE2-safe so the Spark/DuckDB twins match):
#   1. heading repair:  '#Title'            -> '# Title'
#   2. equation tags:   '(1.2) \[E\]'       -> '\[E \tag{1.2}\]'
#                       '\[E\] (1.2)'       -> '\[E \tag{1.2}\]'
#   3. macro repair:    '\bm{'              -> '\mathbf{'
#   4. escape repair:   '\. '               -> '. '
#   5. URL autolink:    bare http(s) URL    -> '[url](url)'
#      (only at start-of-line/after whitespace, so an existing
#      '[text](url)' link is never rewritten — repair stays idempotent
#      on well-formed markdown)
# All patterns in the pinned explicit form (see WS_CLASS/LINE_START
# above) so the Java twins in operators/functions.py fire on EXACTLY
# the same inputs — including CRLF and NBSP payloads, where (?m)//\s
# semantics differ across engines.
MD_HEADING_RE = re.compile(rf"{LINE_START}(#{{1,6}})([^#{WS_CLASS}])")
MD_TAG_LEAD_RE = re.compile(
    rf"{LINE_START}\(([0-9][0-9.]*[A-Za-z]?)\) \\\[([^\n]+)\\\]{LINE_END}"
)
MD_TAG_TRAIL_RE = re.compile(
    rf"{LINE_START}\\\[([^\n]+)\\\] \(([0-9][0-9.]*[A-Za-z]?)\){LINE_END}"
)
MD_URL_RE = re.compile(rf"(^|[{WS_CLASS}])(https?://[^{WS_CLASS}<>)\]\"']+)")


def markdown_compatible(text: str) -> str:
    """Normalize text into valid-markdown shape (nougat_.py:124 analog)."""
    s = MD_HEADING_RE.sub(r"\1 \2", text)
    s = MD_TAG_LEAD_RE.sub(r"\\[\2 \\tag{\1}\\]", s)
    s = MD_TAG_TRAIL_RE.sub(r"\\[\1 \\tag{\2}\\]", s)
    s = s.replace("\\bm{", "\\mathbf{")
    s = s.replace("\\. ", ". ")
    s = MD_URL_RE.sub(r"\1[\2](\2)", s)
    return s


# Mojibake repair: UTF-8 text mis-decoded as cp1252 and re-encoded
# ("Ã©" for "é", "â€™" for "'") is the single most common encoding
# damage in web-crawled corpora (the repair ftfy automates). This is a
# PINNED literal substitution table, not a general decoder: ordered
# literal replacements work identically in Python, Spark `replace`,
# and DuckDB `replace`, so the operator is oracle-able. Entries avoid
# C0/C1 control bytes and NBSP so every literal survives source files,
# SQL strings, and parquet round-trips unchanged. Three-byte artifacts
# are listed before two-byte ones that could prefix-overlap.
MOJIBAKE_MAP: tuple[tuple[str, str], ...] = (
    ("â€™", "’"),  # â€™ -> ’
    ("â€œ", "“"),  # â€œ -> “
    ("â€”", "—"),  # â€” -> — (em dash)
    ("â€“", "–"),  # â€“ -> – (en dash)
    ("â€¦", "…"),  # â€¦ -> …
    ("Ã©", "é"),        # Ã© -> é
    ("Ã¨", "è"),        # Ã¨ -> è
    ("Ã¼", "ü"),        # Ã¼ -> ü
    ("Ã¶", "ö"),        # Ã¶ -> ö
    ("Ã±", "ñ"),        # Ã± -> ñ
    ("Â«", "«"),        # Â« -> «
    ("Â»", "»"),        # Â» -> »
    ("Â°", "°"),        # Â° -> °
)


def fix_mojibake(text: str) -> str:
    """Apply the pinned cp1252-double-encoding repairs in order."""
    for bad, good in MOJIBAKE_MAP:
        text = text.replace(bad, good)
    return text
