"""OCR-dump extractor — recognition post-processing path (F-family).

Payloads are text blocks separated by blank lines, carrying recognizer
artifacts: stuttered character runs, ligatures, NBSP / zero-width chars,
CRLF, fullwidth ASCII. Blocks are scored with the shared density formula
(link density = 0), the seed/filter/expand machinery runs over the token
sequence, and kept-region raw slices are normalized with the full decode
table INCLUDING repeat collapse — the only path where the CTC collapse
applies, mirroring that the reference collapses recognizer output only
(ref ocrlib/src/main/cpp/jni/ocr.cpp:96-117).
"""

from __future__ import annotations

import re

import numpy as np

from text_ocr_spark.kernels.blocks import block_scores, label_and_expand, region_bounds
from text_ocr_spark.kernels.normalize import normalize_text

_BLOCK_SEP_RE = re.compile(r"\n[ \t ]*\n+")
_TOKEN_RE = re.compile(r"\S+")


def extract_ocr(payload: str) -> tuple[str, list[tuple[int, int]]]:
    """payload -> (normalized text, raw-offset spans)."""
    # split into blocks on blank lines, keeping raw offsets
    bounds: list[tuple[int, int]] = []
    pos = 0
    for m in _BLOCK_SEP_RE.finditer(payload):
        bounds.append((pos, m.start()))
        pos = m.end()
    bounds.append((pos, len(payload)))

    tok_start: list[int] = []
    tok_end: list[int] = []
    tok_len: list[int] = []
    tok_block: list[int] = []
    for bi, (lo, hi) in enumerate(bounds):
        for m in _TOKEN_RE.finditer(payload, lo, hi):
            tok_start.append(m.start())
            tok_end.append(m.end())
            tok_len.append(m.end() - m.start())
            tok_block.append(bi)
    if not tok_start:
        return "", []

    blocks = np.asarray(tok_block, dtype=np.int64)
    lens = np.asarray(tok_len, dtype=np.int64)
    nb = int(blocks.max()) + 1
    text_chars = np.bincount(blocks, weights=lens, minlength=nb)
    scores = block_scores(text_chars, np.zeros(nb))[:, blocks]

    labels = label_and_expand(scores)
    pieces: list[str] = []
    spans: list[tuple[int, int]] = []
    for _rid, first, last in region_bounds(labels):
        lo, hi = tok_start[first], tok_end[last]
        pieces.append(payload[lo:hi])
        spans.append((lo, hi))
    extracted = normalize_text("\n".join(pieces), collapse_repeats=True)
    spans.sort()
    return extracted, spans
