"""Payload-kind classifier — the angle-classifier analog (E5/E7).

The reference routes crops through a 4-class ShuffleNet angle head
(ocrcvlib/src/main/cpp/jni/ocr.cpp:428-452) to pick the recognizer; the
graft routes payloads through a rule cascade {empty, pdf, vertical,
html, ocr, plain} to pick the extractor. ``vertical`` is the E4 analog:
the reference sends tall crops through a 90-degree rotate into a
vertical recognizer (ocrcvlib/src/main/cpp/jni/ocr.cpp:422,479); here a
glyph dump whose flow runs top-to-bottom (columns) routes to the
transpose-then-extract path. Content sniffing is authoritative; the
``tool`` column hint only breaks the ocr-vs-plain tie (FIXTURES.md
makes ~5% of hints deliberately wrong). The reference's argmax bug
(ocrcvlib/.../ocr.cpp:448 compares value to index) is NOT replicated —
this cascade is a correct priority order (SURVEY.md §4.3).
"""

from __future__ import annotations

import re

_GLYPH_LINE_RE = re.compile(r"(?m)^G -?[0-9]")
_GLYPH_COORD_RE = re.compile(
    r"(?m)^G (-?[0-9]+(?:\.[0-9]+)?) (-?[0-9]+(?:\.[0-9]+)?) "
    r"(-?[0-9]+(?:\.[0-9]+)?) (-?[0-9]+(?:\.[0-9]+)?) "
)
#: glyph pairs sampled for the flow vote — enough for a stable majority,
#: O(1) regardless of payload size
_FLOW_SAMPLE = 48
_TAG_RE = re.compile(r"</?[a-zA-Z][a-zA-Z0-9]*(?:\s[^>]*)?>")
_OCR_ARTIFACT_RE = re.compile(
    "[\\ufb00-\\ufb06"            # ligatures ff..st
    "\\u200b-\\u200d\\ufeff"      # zero-width + BOM
    "\\u00a0\\u3000"              # NBSP / ideographic space
    "\\uff01-\\uff5e]"            # fullwidth ASCII
)
_STUTTER_RE = re.compile(r"(\S)\1{2,}")

#: tool-column hints that vote for the ocr path when content is ambiguous
_OCR_HINTS = frozenset({"ocr", "ocr_read", "screenshot_ocr"})


#: same-coordinate tolerance for the flow vote, as a fraction of the
#: sampled MEDIAN glyph dimension: two glyphs "share a column" when
#: |dx| <= 0.75 * w_med (resp. rows / h_med). Real-world glyph dumps
#: jitter (sub-pixel rasterization, kerning); exact float equality —
#: the r3 formulation — was deterministic for the synthetic fixtures
#: but brittle for anything real (VERDICT r3 item 5). 0.75 absorbs
#: +-0.3 * dim jitter (max pairwise delta 0.6 * dim, pinned by the
#: hypothesis jitter test) while a genuine next-column/next-word step
#: (>= 1.0 * dim) stays an advance, and the advance condition demands
#: > eps in the flow direction so a pair can never vote both ways.
_FLOW_EPS = 0.75


def _glyph_flow_is_vertical(text: str) -> bool:
    """Two independent signals must BOTH vote vertical:

    1. flow — consecutive sampled glyphs mostly share a column (x within
       the epsilon band) while advancing down y (top-to-bottom column
       flow) rather than sharing a row and advancing x;
    2. aspect — sampled glyphs are wider than tall on balance (a
       rotated-into-the-file glyph box has its w/h swapped) — the
       reference's own tall-box aspect discriminator (crop h > 1.5 w
       triggers its rotate route) applied per glyph.

    The aspect guard keeps degenerate horizontal dumps with one glyph
    per line at a fixed left margin (flow looks columnar, glyphs are
    taller than wide) on the pdf route (review finding r3); square
    glyphs break ties toward 'pdf', the safe default.
    """
    xs: list[float] = []
    ys: list[float] = []
    gw: list[float] = []
    gh: list[float] = []
    wide = tall = 0
    for m in _GLYPH_COORD_RE.finditer(text):
        xs.append(float(m.group(1)))
        ys.append(float(m.group(2)))
        w, h = float(m.group(3)), float(m.group(4))
        gw.append(w)
        gh.append(h)
        if w > h:
            wide += 1
        elif h > w:
            tall += 1
        if len(xs) >= _FLOW_SAMPLE:
            break
    if len(xs) < 2:
        return False
    sw, sh = sorted(gw), sorted(gh)
    eps_x = _FLOW_EPS * max(sw[len(sw) // 2], 1e-9)
    eps_y = _FLOW_EPS * max(sh[len(sh) // 2], 1e-9)
    vert = horiz = 0
    for i in range(1, len(xs)):
        dx = xs[i] - xs[i - 1]
        dy = ys[i] - ys[i - 1]
        if abs(dx) <= eps_x and dy > eps_y:
            vert += 1
        elif abs(dy) <= eps_y and dx > eps_x:
            horiz += 1
    return vert > horiz and wide > tall


def classify_payload(text: str | None, tool: str | None = None) -> str:
    """-> one of {'empty','pdf','vertical','html','ocr','plain'}."""
    if text is None or text.strip() == "":
        return "empty"
    if text.startswith("%PDF") or len(_GLYPH_LINE_RE.findall(text)) >= 3:
        return "vertical" if _glyph_flow_is_vertical(text) else "pdf"
    if len(_TAG_RE.findall(text)) >= 2:
        return "html"
    if _OCR_ARTIFACT_RE.search(text) or _STUTTER_RE.search(text):
        return "ocr"
    if tool is not None and tool in _OCR_HINTS:
        return "ocr"
    return "plain"
