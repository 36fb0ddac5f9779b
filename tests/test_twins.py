r"""Python/JVM twin-parity on hostile line endings and whitespace.

The one-normalization-path contract: core.normalize (Python, runs
inside the extraction UDF and the golden generator) and
operators.functions (Java regex, runs JVM-side/codegen'd) must
produce byte-identical output. Python and Java regex disagree on
(?m) anchors (Java: \r//  are line terminators), on \s
(Java ASCII-only vs Python Unicode), and on . (Java excludes \r) —
so every twin is pinned to explicit forms (normalize.WS_CLASS /
LINE_START / [^\n]) and these tests feed exactly the inputs where
the unpinned semantics diverge: CRLF, bare \r, NEL (\x85), U+2028,
NBSP (\xa0), and vertical tab (\x0B).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pdfwf_spark.core.normalize import (
    ascii_strip,
    collapse_blank_runs,
    collapse_ws_runs,
    extract_doi,
    markdown_compatible,
)

NASTY = [
    "#Title\r\n#Another\r\nbody\r\n",                # CRLF: Java (?m)^ fires mid-\r\n
    "(1.2) \\[E=mc^2\\]\r\n(3) \\[F=ma\\]",          # CRLF after equation line
    "(1.2) \\[E=mc^2\\]\r",                           # bare trailing \r: Java $ matches before it
    "#NoNL\x85#AfterNEL",                             # NEL: Java line terminator, not Python
    "#A #B",                                     # LS: Java line terminator, not Python
    "\xa0#Heading after NBSP",                        # NBSP: Python \s, not Java \s
    "see https://ex.org/a\xa0then http://b.c/d end",  # NBSP around URLs
    "doi:\xa010.1/x and doi: 10.2/y",                 # NBSP after doi:
    "Title:\xa0padded\nbody",                         # NBSP-padded header value
    "a\n\x0b\n\nb",                                   # vertical tab inside blank run
    "  \xa0 padded \xa0  ",                           # NBSP strip edges
    "##\r\n#x\r#y\nplain",                            # mixed \r\n, \r, \n
    "\\[E\\] (2b)\r\n(9) \\[Q\\]\n\\[Z\\] (3)",
]


@pytest.fixture(scope="module")
def jvm_eval(spark):
    def run(col_fn, text: str) -> str:
        df = spark.createDataFrame([(text,)], "t string")
        return df.select(col_fn(F.col("t")).alias("o")).collect()[0]["o"]

    return run


@pytest.mark.parametrize("text", NASTY)
def test_markdown_compatible_twins(jvm_eval, text):
    from pdfwf_spark.operators.functions import markdown_compatible_col

    assert jvm_eval(markdown_compatible_col, text) == markdown_compatible(text)


@pytest.mark.parametrize("text", NASTY)
def test_f2_f3_doi_strip_twins(jvm_eval, text):
    from pdfwf_spark.operators import functions as jf

    assert jvm_eval(jf.collapse_blank_runs, text) == collapse_blank_runs(text)
    assert jvm_eval(jf.collapse_ws_runs, text) == collapse_ws_runs(text)
    assert jvm_eval(jf.doi_extract, text) == extract_doi(text)
    assert jvm_eval(jf._strip, text) == ascii_strip(text)


@pytest.mark.parametrize(
    "payload",
    [
        "Title: crlf value\r\nAuthors: a, b\r\nSubject: s\r\nbody",
        "Title:\xa0nbsp-padded\nProducer: p\t\nKeywords: k \x0b\nbody",
        "Title: tab-end\t\r\nCreated: 2025-01-01\r",
        "no headers at all Title: after-LS",
    ],
)
def test_header_projection_twins(spark, payload):
    """P6: project_meta9 (JVM) vs extract_plain meta (Python UDF path)
    on CRLF/NBSP payloads — the 9 keys must agree byte-for-byte."""
    from pdfwf_spark.core.plain_extract import extract_plain
    from pdfwf_spark.operators.functions import project_meta9

    _, _, py_meta = extract_plain(payload)
    row = (
        spark.createDataFrame([(payload,)], "payload string")
        .select(*project_meta9(F.col("payload")))
        .collect()[0]
    )
    jvm_meta = row.asDict()
    assert jvm_meta == py_meta
