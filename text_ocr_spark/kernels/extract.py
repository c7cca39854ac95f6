"""Per-payload extraction dispatch — the detect() driver analog.

Mirrors the reference's fixed physical plan (ocrlib/src/main/cpp/jni/
ocr.cpp:485-685: resize -> detect -> decode -> crop -> classify -> recognize)
as: classify kind -> kind-specific extractor -> (kind, extracted, spans).

Invariants (pytest-enforced):
- spans index the RAW payload, sorted by start, 0 <= start <= end <= len;
- extracted == '' <=> spans == [] for empty-ish results;
- every turn yields exactly one output row, even for null payloads.
"""

from __future__ import annotations

import re

from text_ocr_spark.kernels.classify import classify_payload
from text_ocr_spark.kernels.constants import (
    MAX_ANALYSIS_CHARS,
    WINDOW_BOUNDARY_SEARCH,
)
from text_ocr_spark.kernels.html import extract_html
from text_ocr_spark.kernels.normalize import normalize_text
from text_ocr_spark.kernels.ocr_dump import extract_ocr
from text_ocr_spark.kernels.pdf import extract_pdf, extract_vertical

_NONWS_RE = re.compile(r"\S")


def _last_nonws_end(payload: str) -> int | None:
    """End offset of the LAST \\S match — backward chunked scan, so the
    cost is O(trailing whitespace), not one match object per non-ws char
    (the full finditer sweep was ~7% of total kernel time). Exact-equal
    to the old full sweep: same regex, no copies (finditer slices by
    position)."""
    n = len(payload)
    pos = n
    while pos > 0:
        lo = max(0, pos - 4096)
        m = None
        for m in _NONWS_RE.finditer(payload, lo, pos):
            pass
        if m is not None:
            return m.end()
        pos = lo
    return None


def extract_plain(payload: str) -> tuple[str, list[tuple[int, int]]]:
    """Identity extraction: whitespace normalization only (E7 'plain' route)."""
    extracted = normalize_text(payload)
    if not extracted:
        return "", []
    first = _NONWS_RE.search(payload)
    last_end = _last_nonws_end(payload)
    assert first is not None and last_end is not None
    return extracted, [(first.start(), last_end)]


_EXTRACTORS = {
    "html": extract_html,
    "pdf": extract_pdf,
    "vertical": extract_vertical,  # E4 transpose-then-extract route
    "ocr": extract_ocr,
    "plain": extract_plain,
}


def window_bounds(
    n: int, max_chars: int, text: str, search: int = WINDOW_BOUNDARY_SEARCH
) -> list[tuple[int, int]]:
    """Deterministic analysis windows covering [0, n).

    Cuts at the last newline (else last whitespace) within ``search``
    chars of the hard limit, so windows respect block boundaries where
    one exists; a boundary-free stretch gets a hard cut at max_chars.
    Every window is <= max_chars long and non-empty.
    """
    if max_chars < 1:
        raise ValueError(f"max_chars must be >= 1, got {max_chars}")
    bounds: list[tuple[int, int]] = []
    start = 0
    while n - start > max_chars:
        hard = start + max_chars
        lo = max(start + 1, hard - search)
        cut = text.rfind("\n", lo, hard)
        if cut < lo:
            for m in re.finditer(r"\s", text[lo:hard]):
                cut = lo + m.start()
        if cut < lo:
            cut = hard
        else:
            cut += 1  # the boundary char stays with the left window
        bounds.append((start, cut))
        start = cut
    bounds.append((start, n))
    return bounds


#: D6 analog — the reference's detCvlib grows every crop box by 15% of
#: its size before cropping (ocrcvlib/src/main/cpp/jni/ocr.cpp:411-414);
#: its ocrlib twin does NOT pad, which is why the graft default is off.
SPAN_PAD_FRAC = 0.15


def pad_spans(
    spans: list[tuple[int, int]], n: int, pad_frac: float
) -> list[tuple[int, int]]:
    """Grow each span by ``int(len * pad_frac)`` context chars per side
    (the reference's truncating int math), clamped to [0, n]; re-sorted
    so the sorted-by-start invariant survives unequal growth.

    CONTRACT NOTE (ADVICE r2): padded spans may OVERLAP or NEST — the
    reference's crop-box grow does exactly the same on adjacent boxes
    and recognizes the overlap twice — and after the re-sort a
    containing span can precede a contained one (pinned by
    tests/test_windowing.py). Only sorted-by-start and 0<=s<=e<=n are
    guaranteed; consumers that need disjoint coverage must merge
    (unpadded spans, the default, ARE disjoint)."""
    if pad_frac <= 0:
        return spans
    out = []
    for s, e in spans:
        grow = int((e - s) * pad_frac)
        out.append((max(0, s - grow), min(n, e + grow)))
    return sorted(out)


def extract_payload(
    text: str | None,
    tool: str | None = None,
    max_chars: int = MAX_ANALYSIS_CHARS,
    pad_frac: float = 0.0,
) -> tuple[str, str, list[tuple[int, int]]]:
    """(text, tool) -> (kind, extracted, spans). Total: never raises on
    well-typed input; null/empty payloads yield ('empty', '', []).

    Payloads longer than ``max_chars`` take the B2 bounded-analysis path
    (ref resize_img long-side 640, ocrcvlib/src/main/cpp/jni/ocr.cpp:
    77-102): each window is extracted independently, window spans shift
    by the window's raw offset (spans ALWAYS index the raw payload), and
    window texts join with the extractors' own block separator. Bounded
    per-task memory at the cost of boundary effects only — a payload
    <= max_chars is byte-identical to the unwindowed result.
    """
    kind = classify_payload(text, tool)
    if kind == "empty":
        return kind, "", []
    assert text is not None
    # max_chars <= 0 means "windowing disabled" (a negative bound would
    # otherwise loop window_bounds forever)
    if max_chars and max_chars > 0 and len(text) > max_chars:
        pieces: list[str] = []
        spans: list[tuple[int, int]] = []
        for s, e in window_bounds(len(text), max_chars, text):
            ext_w, spans_w = _EXTRACTORS[kind](text[s:e])
            if ext_w:
                pieces.append(ext_w)
                spans.extend((s + a, s + b) for a, b in spans_w)
        return kind, "\n".join(pieces), pad_spans(spans, len(text), pad_frac)
    extracted, spans = _EXTRACTORS[kind](text)
    return kind, extracted, pad_spans(spans, len(text), pad_frac)
