"""PDF glyph-dump layout parser — the geometry family (D1-D8) of the graft.

Payload grammar: one glyph per line, ``G x y w h ch`` (floats + a single
char); anything else is noise and ignored. Glyphs cluster into text lines
(y-interval merge), lines into words (x-gap split), lines into blocks
(y-adjacency + x-overlap) — the connected-component + min-area-rect analog
(ref ocrlib/src/main/cpp/jni/convexHull.cpp:433-466: region -> minAreaRect;
here a block's rect is plain min/max aggregates, the degenerate axis-aligned
case).

Pinned semantics:
- line break when |y - current line mean y| > PDF_LINE_Y_TOL * median height;
- word break when x gap > PDF_WORD_GAP * median width;
- block merge when y gap <= PDF_BLOCK_Y_GAP * median height AND x-interval
  overlap >= PDF_BLOCK_X_OVERLAP * the narrower interval;
- blocks with < MIN_TOKENS words are dropped (header/footer noise — the
  min-area filter, ref ocrlib/src/main/cpp/jni/ocr.cpp:191);
- reading order: left column first, then top-to-bottom (column = block x0
  vs page midpoint); spans are sorted by raw offset, independent of
  reading order.
"""

from __future__ import annotations

import operator
import re
from dataclasses import dataclass, field
from typing import NamedTuple

from text_ocr_spark.kernels.constants import (
    MIN_TOKENS,
    PDF_BLOCK_X_OVERLAP,
    PDF_BLOCK_Y_GAP,
    PDF_COL_GAP,
    PDF_LINE_Y_TOL,
    PDF_WORD_GAP,
)
from text_ocr_spark.kernels.normalize import normalize_text

# MULTILINE: one C-level scan of the payload; m.start()/m.end() are the
# raw line offsets (ident. to per-line matching: $ stops before each \n,
# and a \r or any junk on the line makes the whole line a non-glyph)
_GLYPH_RE = re.compile(
    r"^G (-?[0-9]+(?:\.[0-9]+)?) (-?[0-9]+(?:\.[0-9]+)?) "
    r"(-?[0-9]+(?:\.[0-9]+)?) (-?[0-9]+(?:\.[0-9]+)?) (\S)$",
    re.MULTILINE,
)


class Glyph(NamedTuple):
    x: float
    y: float
    w: float
    h: float
    ch: str
    start: int  # raw offset of the glyph's line
    end: int


class Line:
    """Glyph run; x0/x1/y_sum are maintained by the constructor/append —
    never recomputed per overlap test (they were the parse-time hot spot).
    """

    __slots__ = ("glyphs", "y_sum", "x0", "x1")

    def __init__(self, glyphs: list[Glyph], y_sum: float) -> None:
        self.glyphs = glyphs
        self.y_sum = y_sum
        if glyphs:
            self.x0 = min(g.x for g in glyphs)
            self.x1 = max(g.x + g.w for g in glyphs)
        else:
            self.x0 = 0.0
            self.x1 = 0.0

    @property
    def y(self) -> float:
        return self.y_sum / len(self.glyphs)

    def append(self, g: Glyph) -> None:
        self.glyphs.append(g)
        self.y_sum += g.y
        if g.x < self.x0:
            self.x0 = g.x
        if g.x + g.w > self.x1:
            self.x1 = g.x + g.w


@dataclass
class Block:
    lines: list[Line] = field(default_factory=list)
    n_words: int = 0


def parse_glyphs(payload: str) -> list[Glyph]:
    # one group(1..5) call per match instead of five __getitem__ C-API
    # roundtrips — this loop is the PDF parse hot spot
    out: list[Glyph] = []
    ap = out.append
    for m in _GLYPH_RE.finditer(payload):
        x, y, w, h, ch = m.group(1, 2, 3, 4, 5)
        ap(Glyph(float(x), float(y), float(w), float(h), ch, m.start(), m.end()))
    return out


# C-level sort keys (attrgetter beats a Python lambda per element; the
# orderings are identical tuples)
_YXS_KEY = operator.attrgetter("y", "x", "start")
_XS_KEY = operator.attrgetter("x", "start")


def _median(vals: list[float]) -> float:
    s = sorted(vals)
    n = len(s)
    return s[n // 2] if n % 2 else 0.5 * (s[n // 2 - 1] + s[n // 2])


def _cluster_lines(glyphs: list[Glyph], h_med: float, w_med: float) -> list[Line]:
    # phase 1 with plain locals: the running-mean membership test
    # (|y - mean(cur)| <= tol*h_med, ref C3's seed-growing semantics)
    # is sequential by definition, so the win is avoiding 250k
    # attribute/method calls, not vectorizing
    y_tol = PDF_LINE_Y_TOL * h_med
    groups: list[list[Glyph]] = []
    cur: list[Glyph] = []
    cur_y_sum = 0.0
    for g in sorted(glyphs, key=_YXS_KEY):
        if cur and abs(g.y - cur_y_sum / len(cur)) <= y_tol:
            cur.append(g)
            cur_y_sum += g.y
        else:
            if cur:
                groups.append(cur)
            cur = [g]
            cur_y_sum = g.y
    if cur:
        groups.append(cur)
    # split each y-line at column gaps (two columns share a y but must not
    # fuse into one reading-order line)
    col_gap = PDF_COL_GAP * w_med
    out: list[Line] = []
    for grp in groups:
        grp.sort(key=_XS_KEY)
        seg: list[Glyph] = []
        seg_y = 0.0
        prev_end = None
        for g in grp:
            if prev_end is not None and g.x - prev_end > col_gap:
                out.append(Line(seg, seg_y))
                seg = []
                seg_y = 0.0
            seg.append(g)
            seg_y += g.y
            prev_end = g.x + g.w
        if seg:
            out.append(Line(seg, seg_y))
    return out


def _line_words(line: Line, w_med: float) -> list[str]:
    words: list[str] = []
    cur: list[str] = []
    prev_end = None
    for g in line.glyphs:
        if prev_end is not None and g.x - prev_end > PDF_WORD_GAP * w_med:
            words.append("".join(cur))
            cur = []
        cur.append(g.ch)
        prev_end = g.x + g.w
    if cur:
        words.append("".join(cur))
    return words


def _x_overlap(a: Line, b: Line) -> float:
    lo = max(a.x0, b.x0)
    hi = min(a.x1, b.x1)
    if hi <= lo:
        return 0.0
    return (hi - lo) / max(1e-9, min(a.x1 - a.x0, b.x1 - b.x0))


def extract_pdf(payload: str) -> tuple[str, list[tuple[int, int]]]:
    """payload -> (normalized text in reading order, raw-offset spans)."""
    return _extract_from_glyphs(parse_glyphs(payload))


def extract_vertical(payload: str) -> tuple[str, list[tuple[int, int]]]:
    """Vertical/columnar glyph dump -> text, via transpose-then-extract.

    The reference routes tall crops through a 90-degree rotate into the
    horizontal recognizer (ocrcvlib/src/main/cpp/jni/ocr.cpp:422,479 —
    the E4 tall-box path; ocrlib angle-class 2/3 rotations are the same
    move). The graft's analog: swap each glyph's axes (x<->y, w<->h) so
    top-to-bottom columns become left-to-right lines, then run the
    standard clustering/ordering pipeline. Spans keep the glyphs' RAW
    payload offsets, untouched by the transpose.
    """
    glyphs = [
        Glyph(g.y, g.x, g.h, g.w, g.ch, g.start, g.end)
        for g in parse_glyphs(payload)
    ]
    return _extract_from_glyphs(glyphs)


def _extract_from_glyphs(
    glyphs: list[Glyph],
) -> tuple[str, list[tuple[int, int]]]:
    if not glyphs:
        return "", []
    h_med = _median([g.h for g in glyphs])
    w_med = _median([g.w for g in glyphs])
    lines = _cluster_lines(glyphs, h_med, w_med)

    # lines -> blocks (greedy, lines are in y order already)
    blocks: list[Block] = []
    for ln in lines:
        target = None
        for b in blocks:
            last = b.lines[-1]
            if (
                ln.y - last.y <= PDF_BLOCK_Y_GAP * h_med
                and _x_overlap(ln, last) >= PDF_BLOCK_X_OVERLAP
            ):
                target = b
                break
        if target is None:
            target = Block()
            blocks.append(target)
        target.lines.append(ln)

    # words per line; min-size filter per block
    block_words: list[list[list[str]]] = []
    kept: list[Block] = []
    for b in blocks:
        words = [_line_words(ln, w_med) for ln in b.lines]
        b.n_words = sum(len(ws) for ws in words)
        if b.n_words >= MIN_TOKENS:
            kept.append(b)
            block_words.append(words)
    if not kept:
        return "", []

    # reading order: column-major (left column first), then top-to-bottom
    page_x0 = min(b.lines[0].x0 for b in kept)
    page_x1 = max(max(ln.x1 for ln in b.lines) for b in kept)
    mid = 0.5 * (page_x0 + page_x1)
    order = sorted(
        range(len(kept)),
        key=lambda i: (
            0 if min(ln.x0 for ln in kept[i].lines) < mid else 1,
            kept[i].lines[0].y,
            min(ln.x0 for ln in kept[i].lines),
        ),
    )

    pieces = [
        "\n".join(" ".join(ws) for ws in block_words[i]) for i in order
    ]
    extracted = normalize_text("\n".join(pieces))
    spans = sorted(
        (
            min(g.start for ln in b.lines for g in ln.glyphs),
            max(g.end for ln in b.lines for g in ln.glyphs),
        )
        for b in kept
    )
    return extracted, spans
