"""Sniff -> route -> extract dispatch.

The analog of the reference's strategy registry + exception handling:
- strategy dispatch            <- pdfwf/parsers/__init__.py:34-58
- failure isolation            <- @exception_handler(default_return=None)
  (pdfwf/utils.py:92-115, applied at pymupdf.py:41,101 etc.): any
  extractor exception -> status='failed', row excluded from success
  output (README.md:115-116 "failed PDFs have no output row") but
  COUNTED in lineage parse_failures (our improvement: first-class
  accounting instead of timer-log scraping).

Empty extraction result is also 'failed' (reason='empty') — the
reference's content-free page yields no usable record.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pdfwf_spark.core.html_extract import extract_html
from pdfwf_spark.core.pdfish_extract import extract_pdfish
from pdfwf_spark.core.plain_extract import extract_plain
from pdfwf_spark.core.sniff import sniff


@dataclass(frozen=True)
class Span:
    start: int
    end: int
    label: str


@dataclass
class ExtractResult:
    parser: str                      # html | pdfish | plain | none
    status: str                      # ok | failed
    reason: str = ""                 # '' | 'empty' | exception class msg
    clean_text: str = ""
    spans: list[Span] = field(default_factory=list)
    meta: dict[str, str] = field(default_factory=dict)
    source: str = "text"             # which column carried the payload


def route_payload(text: str | None, tool: str | None) -> tuple[str, str]:
    """Pick the payload column: text, else tool (tool_result turns may
    carry the payload in `tool` — exercises the text/tool routing)."""
    if text and text.strip():
        return text, "text"
    if tool and tool.strip():
        return tool, "tool"
    return "", "text"


_EXTRACTORS = {
    "html": extract_html,
    "pdfish": extract_pdfish,
    "plain": extract_plain,
}


def extract_payload(text: str | None, tool: str | None) -> ExtractResult:
    """Full per-turn pipeline: route -> sniff -> extract -> status."""
    payload, source = route_payload(text, tool)
    label = sniff(payload)
    if label == "empty":
        return ExtractResult(parser="none", status="failed", reason="empty", source=source)
    extractor = _EXTRACTORS[label]
    try:
        clean_text, raw_spans, meta = extractor(payload)
    except Exception as exc:  # failure isolation: utils.py:92-115 semantics
        return ExtractResult(
            parser=label, status="failed",
            reason=f"{type(exc).__name__}: {exc}"[:200], source=source,
        )
    if not clean_text:
        return ExtractResult(parser=label, status="failed", reason="empty", source=source)
    return ExtractResult(
        parser=label, status="ok", clean_text=clean_text,
        spans=[Span(*s) for s in raw_spans], meta=meta, source=source,
    )
