"""PDF-ish byte-stream layout parser.

Deterministic plain-text page-stream format modeling what the
reference's Oreo path computes from page images. The semantics mirror
(file:line citations into /root/reference):

- block parsing + class labels   <- YOLO detect + SPv05 classes
  (pdfwf/parsers/oreo/tensor_utils.py:511-527 patch-table columns)
- overlap dedup (IoU > 0.5)      <- non_max_suppression
  (tensor_utils.py:38-178; thresholds 402-466); keep larger area,
  earlier block on tie (no confidences in the text format)
- class-subset filtering          <- subset_y_by_class
  (tensor_utils.py:690-751): body = 'text'; meta categories
  title/abstract/author/date/institution collected separately
  (tensor_utils.py:2216-2229); header/footnote/table/figure excluded
  by default (oreo.py:44-51 flag defaults)
- column detection by x-mid modes <- robust mode estimation
  (tensor_utils.py:600-658: histogram x_mid, keep high-frequency
  modes, assign col_idx = argmin |x_mid - mode|)
- reading-order lexsort           <- lexsort by (col_idx, row, y)
  (tensor_utils.py:1681-1743, applied 661-669)
- page sentinels                  <- nougat missing-page markers
  (pdfwf/parsers/nougat_.py:218-243: [MISSING_PAGE_EMPTY:n] /
  [MISSING_PAGE_FAIL:n])
- final whitespace collapse       <- tensor_utils.py:2399,2414-2415

Format::

    %PDFISH1
    PAGE 1 612 792
    BLOCK x0 y0 x1 y1 cls|text...

Malformed BLOCK/PAGE line -> that page fails (sentinel). No pages or
structure broken at the top level -> ParseFailure (row dropped from
success output, reference semantics README.md:115-116).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from functools import cached_property

from pdfwf_spark.core.latex import LatexError, latex_to_text
from pdfwf_spark.core.normalize import ascii_strip, collapse_ws_runs

MAGIC = "%PDFISH1"

PAGE_RE = re.compile(r"^PAGE\s+(\d+)(?:\s+[-\d.]+\s+[-\d.]+)?\s*$")
# optional confidence token between the bbox and the class (P5: the
# reference thresholds on conf BEFORE NMS, tensor_utils.py:402-466);
# absent -> 1.0, keeping conf-less payloads byte-identical.
BLOCK_RE = re.compile(
    r"^BLOCK\s+(-?\d+(?:\.\d+)?)\s+(-?\d+(?:\.\d+)?)\s+"
    r"(-?\d+(?:\.\d+)?)\s+(-?\d+(?:\.\d+)?)\s+(?:(0?\.\d+|1(?:\.0+)?)\s+)?"
    r"([a-z_]+)\|(.*)$"
)

BODY_CLASSES = frozenset({"text"})
META_CLASSES = frozenset({"title", "abstract", "author", "date", "institution", "keywords"})
# 'equation' is a meta-like category stored RAW with ' '-join
# (tensor_utils.py:2405-2408: Equations/Table/Figure are ' '.join'd
# without LaTeX conversion); other categories get '\n'-join ->
# latex_to_text -> whitespace collapse (tensor_utils.py:2410-2415).
EQUATION_CLASSES = frozenset({"equation"})
EXCLUDED_CLASSES = frozenset({"header", "footer", "footnote", "table", "figure"})

IOU_THRESHOLD = 0.5
CONF_THRESHOLD = 0.6  # tensor_utils.py:402-466 conf_thres default
COLUMN_GRID = 50.0
MODE_MIN_FREQ = 0.25


class ParseFailure(Exception):
    """Unrecoverable payload-level parse failure (reference: failed
    docs have no output row, README.md:115-116, pymupdf.py:110-113)."""


@dataclass
class _Block:
    page: int
    x0: float
    y0: float
    x1: float
    y1: float
    cls: str
    text: str
    text_start: int   # offset of text portion in original payload
    text_end: int
    seq: int          # arrival order (NMS tiebreak)
    conf: float = 1.0  # detection confidence (P5); 1.0 when absent

    # cached (r6): area/x_mid are pure functions of the frozen-at-parse
    # coordinates, but the NMS loop reads `area` O(kept) times per
    # candidate and the rank sort O(log n) times per block — a plain
    # @property recomputed the multiply every read (profiled: 230k
    # area() calls for 2.3k payloads). Same IEEE ops once per block,
    # so every downstream float compares bit-identically.
    @cached_property
    def area(self) -> float:
        return max(0.0, self.x1 - self.x0) * max(0.0, self.y1 - self.y0)

    @cached_property
    def x_mid(self) -> float:
        return (self.x0 + self.x1) / 2.0


def _iou(a: _Block, b: _Block) -> float:
    ix0, iy0 = max(a.x0, b.x0), max(a.y0, b.y0)
    ix1, iy1 = min(a.x1, b.x1), min(a.y1, b.y1)
    iw, ih = max(0.0, ix1 - ix0), max(0.0, iy1 - iy0)
    inter = iw * ih
    union = a.area + b.area - inter
    return inter / union if union > 0 else 0.0


def _nms(blocks: list[_Block]) -> list[_Block]:
    """Greedy overlap dedup (tensor_utils.py:38-178): candidates
    ranked by confidence desc (the reference's score sort), then area
    desc, then arrival order — conf-less payloads (all conf=1.0)
    reduce to the area/arrival ranking."""
    order = sorted(blocks, key=lambda b: (-b.conf, -b.area, b.seq))
    kept: list[_Block] = []
    for cand in order:
        if all(_iou(cand, k) <= IOU_THRESHOLD for k in kept):
            kept.append(cand)
    kept.sort(key=lambda b: b.seq)
    return kept


def _column_modes(body: list[_Block]) -> list[float]:
    """Robust x-mid modes (tensor_utils.py:600-611): histogram on a
    grid, keep bins with relative frequency >= MODE_MIN_FREQ."""
    if not body:
        return []
    counts: dict[float, int] = {}
    for b in body:
        bin_ = round(b.x_mid / COLUMN_GRID) * COLUMN_GRID
        counts[bin_] = counts.get(bin_, 0) + 1
    total = len(body)
    modes = sorted(v for v, c in counts.items() if c / total >= MODE_MIN_FREQ)
    if not modes:
        modes = [min(b.x_mid for b in body)]
    return modes


def _col_idx(b: _Block, modes: list[float]) -> int:
    """argmin |x_mid - mode| (tensor_utils.py:613-658 semantics)."""
    if not modes:
        return 0
    best, best_d = 0, abs(b.x_mid - modes[0])
    for i, mode in enumerate(modes[1:], start=1):
        d = abs(b.x_mid - mode)
        if d < best_d:
            best, best_d = i, d
    return best


def extract_pdfish(payload: str) -> tuple[str, list[tuple[int, int, str]], dict[str, str]]:
    """Parse a pdfish payload. Returns (clean_text, spans, meta)."""
    if not payload.startswith(MAGIC):
        raise ParseFailure("missing magic")

    pages: dict[int, list[_Block]] = {}
    failed_pages: set[int] = set()
    cur_page: int | None = None
    offset = 0
    seq = 0
    lines = payload.split("\n")
    for lineno, line in enumerate(lines):
        line_start = offset
        offset += len(line) + 1
        stripped = line.strip()
        if lineno == 0 or not stripped:
            continue
        pm = PAGE_RE.match(stripped)
        if pm:
            cur_page = int(pm.group(1))
            pages.setdefault(cur_page, [])
            continue
        bm = BLOCK_RE.match(line)
        if bm:
            if cur_page is None:
                raise ParseFailure("BLOCK before any PAGE")
            conf = float(bm.group(5)) if bm.group(5) is not None else 1.0
            seq += 1
            if conf < CONF_THRESHOLD:
                # P5: confidence thresholding happens BEFORE NMS
                # (tensor_utils.py:402-466); seq still advances so
                # arrival order is unaffected by drops
                continue
            text = bm.group(7)
            text_start = line_start + bm.start(7)
            pages[cur_page].append(
                _Block(
                    page=cur_page,
                    x0=float(bm.group(1)), y0=float(bm.group(2)),
                    x1=float(bm.group(3)), y1=float(bm.group(4)),
                    cls=bm.group(6), text=text,
                    text_start=text_start, text_end=text_start + len(text),
                    seq=seq - 1, conf=conf,
                )
            )
            continue
        # Unparseable non-empty line: the page it falls on fails
        # (per-page failure isolation, oreo.py:256-262 skip semantics).
        if cur_page is None:
            raise ParseFailure(f"garbage before any PAGE: {stripped[:40]!r}")
        failed_pages.add(cur_page)

    if not pages:
        raise ParseFailure("no pages")

    page_texts: list[str] = []
    spans: list[tuple[int, int, str]] = []
    meta_parts: dict[str, list[str]] = {}
    equation_parts: list[str] = []
    for page_no in sorted(pages):
        if page_no in failed_pages:
            page_texts.append(f"[MISSING_PAGE_FAIL:{page_no}]")
            continue
        # P4 class-subset predicate: EXCLUDED_CLASSES (and any unknown
        # class) are dropped here; only body/meta/equation survive
        blocks = [
            b for b in _nms(pages[page_no]) if b.cls not in EXCLUDED_CLASSES
        ]
        body = [b for b in blocks if b.cls in BODY_CLASSES]
        metas = [b for b in blocks if b.cls in META_CLASSES or b.cls in EQUATION_CLASSES]
        for b in sorted(metas, key=lambda b: (b.y0, b.x0, b.seq)):
            if b.cls in EQUATION_CLASSES:
                equation_parts.append(b.text.strip())
            else:
                meta_parts.setdefault(b.cls, []).append(b.text.strip())
            spans.append((b.text_start, b.text_end, b.cls))
        if not body:
            page_texts.append(f"[MISSING_PAGE_EMPTY:{page_no}]")
            continue
        modes = _column_modes(body)
        ordered = sorted(body, key=lambda b: (_col_idx(b, modes), b.y0, b.x0, b.seq))
        for b in ordered:
            spans.append((b.text_start, b.text_end, "text"))
        page_texts.append("\n".join(b.text for b in ordered))

    # body: join -> latex_to_text -> collapse (tensor_utils.py:2410-2415
    # order); a LaTeX failure on the body drops the document's text ->
    # ParseFailure (the reference's doc would lose its 'text' key).
    try:
        body_text = latex_to_text("\n".join(page_texts))
    except LatexError as exc:
        raise ParseFailure(f"latex: {exc}") from exc
    clean_text = ascii_strip(collapse_ws_runs(body_text))

    meta: dict[str, str] = {}
    for k, v in meta_parts.items():
        if not any(v):
            continue
        try:
            meta[k] = ascii_strip(collapse_ws_runs(latex_to_text("\n".join(v))))
        except LatexError:
            continue  # failure -> key dropped (tensor_utils.py:2414-2417)
    if any(equation_parts):
        # Equations stored raw with ' '-join (tensor_utils.py:2405-2408)
        meta["equations"] = " ".join(equation_parts).strip()
    spans.sort(key=lambda s: (s[0], s[1]))
    return clean_text, spans, meta
