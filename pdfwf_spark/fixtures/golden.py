"""Golden outputs: the pure-Python twin of the Spark pipeline.

Runs the SAME extraction core (pdfwf_spark.core) over fixture rows in
plain Python, with the SAME total ordering key the Spark window uses
(turn_idx, ts, role, tie_key=md5 of length-prefixed text/tool) — so
per-turn text equality is well-defined (SURVEY §7 risk register: one
normalization code path for both sides).
"""

from __future__ import annotations

import hashlib
from typing import Any

from pdfwf_spark.core.route import extract_payload


def tie_key(text: str, tool: str) -> str:
    """Pure-Python twin of operators.extract.tie_key_col: md5 of the
    length-prefixed concatenation (unambiguous under NUL/':' payloads;
    len() counts code points, matching Spark length())."""
    t, u = text or "", tool or ""
    return hashlib.md5(
        f"{len(t)}:{t}{len(u)}:{u}".encode("utf-8", "surrogatepass")
    ).hexdigest()


def golden_records(
    rows: list[dict[str, Any]], markdown_compat: bool = False
) -> list[dict[str, Any]]:
    """Extract + totally order every row; attach turn_rank (1-based
    within conv). Includes failed rows (parse_status != 'ok') so both
    the success contract and lineage counts can be checked.
    markdown_compat mirrors pipeline.extract_df(markdown_compat=True)."""
    keyed = sorted(
        rows,
        key=lambda r: (
            r["conv_id"],
            r["turn_idx"],
            r["ts"],
            r["role"],
            tie_key(r.get("text", ""), r.get("tool", "")),
        ),
    )
    out: list[dict[str, Any]] = []
    rank = 0
    prev_conv = None
    for r in keyed:
        if r["conv_id"] != prev_conv:
            prev_conv, rank = r["conv_id"], 0
        rank += 1
        res = extract_payload(r.get("text", ""), r.get("tool", ""))
        clean = res.clean_text
        if markdown_compat:
            from pdfwf_spark.core.normalize import markdown_compatible

            clean = markdown_compatible(clean)
        out.append(
            {
                "conv_id": r["conv_id"],
                "turn_idx": r["turn_idx"],
                "turn_rank": rank,
                "role": r["role"],
                "ts": r["ts"],
                "parser": res.parser,
                "parse_status": res.status,
                "clean_text": clean,
                "spans": [(s.start, s.end, s.label) for s in res.spans],
                "meta": dict(res.meta),
                "tie_key": tie_key(r.get("text", ""), r.get("tool", "")),
                "family": r.get("_family", ""),
            }
        )
    return out
