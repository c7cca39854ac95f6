"""Block scoring + region labeling + progressive expansion (C-family).

The reference's pse_decode (ocrlib/src/main/cpp/jni/ocr.cpp:253-339) over a
2-D pixel raster, re-expressed over the 1-D token sequence of a payload:

  C1 score     -> SIX text-density x (1 - link-density) score maps per
                  block (progressively stricter saturation LEVEL_C, the
                  shrunk-kernel analog), broadcast to the block's tokens
  C2 threshold -> each map binarized at the SAME BINARY_THRESH = 0.7311
                  (ref ocr.cpp:281-285,508)
  C3 find      -> contiguous runs of seed-masked tokens (4-connectivity
                  degenerates to run adjacency in 1-D) via vectorized cumsum
  C4 mark      -> per-run count >= MIN_TOKENS and mean FULL-map score
                  >= MIN_MEAN_SCORE (the load-bearing 10 / 0.93 filters on
                  the ch-5 score, ref ocr.cpp:191,287)
  C6 expand    -> kernels 1..5; regions claim adjacent unclaimed tokens in
                  the level mask, region ids ascending, first-claim-wins
                  (scan-order analog of ref ocr.cpp:305)
  C7/C8        -> region -> [first_token, last_token] boundaries

Pinned tie-break (fixture semantics): within each level, regions are
processed in ascending id order and each extends left then right over the
maximal admissible run of unclaimed tokens. A token claimed at an earlier
level or by a lower id is never re-claimed.

All functions are pure numpy; ``label_and_expand`` is the single entry the
extractors share. A deliberately naive pure-Python twin lives in
``text_ocr_spark.oracle`` for differential testing.
"""

from __future__ import annotations

import numpy as np

from text_ocr_spark.kernels.constants import (
    BINARY_THRESH,
    LEVEL_C,
    MIN_MEAN_SCORE,
    MIN_TOKENS,
    N_LEVELS,
)


def block_scores(text_chars: np.ndarray, link_chars: np.ndarray) -> np.ndarray:
    """-> (N_LEVELS, n_blocks) float64 score maps in [0, 1).

    score_k = (1 - link_chars/max(text_chars,1)) * text_chars/(text_chars + C_k)

    The saturating density term plays the role of the PSENet sigmoid output
    (ref psenet_lite_mbv2.param head: Convolution->Interp->Sigmoid); the
    link-density term is the Readability/Boilerpipe boilerplate signal;
    LEVEL_C strictness is the kernel-shrink analog.
    """
    tc = np.asarray(text_chars, dtype=np.float64)
    lc = np.asarray(link_chars, dtype=np.float64)
    link_term = 1.0 - lc / np.maximum(tc, 1.0)
    c = np.asarray(LEVEL_C, dtype=np.float64)[:, None]
    return link_term[None, :] * (tc[None, :] / (tc[None, :] + c))


def _label_runs(mask: np.ndarray) -> np.ndarray:
    """1-D connected components: label contiguous True runs 1..R, else 0.

    The degenerate-but-exact analog of the reference's DFS flood fill
    (ocrlib/src/main/cpp/jni/ocr.cpp:136-171): np.cumsum over run starts.
    """
    mask = np.asarray(mask, dtype=bool)
    starts = mask & ~np.concatenate(([False], mask[:-1]))
    labels = np.cumsum(starts)
    labels[~mask] = 0
    return labels.astype(np.int32)


def label_and_expand(level_scores: np.ndarray) -> np.ndarray:
    """level_scores (float64[N_LEVELS, n]) -> labels (int32[n]), 0 = bg.

    Seeds from map 0 at BINARY_THRESH, min-size/mean filters on the full
    (level 5) map, then expansion through maps 1..5. Region ids are 1..K in
    left-to-right seed order.
    """
    level_scores = np.asarray(level_scores, dtype=np.float64)
    assert level_scores.ndim == 2 and level_scores.shape[0] == N_LEVELS
    n = level_scores.shape[1]
    if n == 0:
        return np.zeros(0, dtype=np.int32)
    full = level_scores[N_LEVELS - 1]

    # C2+C3: seed mask and run labeling
    raw = _label_runs(level_scores[0] >= BINARY_THRESH)
    nraw = int(raw.max())
    if nraw == 0:
        return np.zeros(n, dtype=np.int32)

    # C4: per-run count/mean filters via bincount (the groupBy+HAVING analog)
    counts = np.bincount(raw, minlength=nraw + 1)
    sums = np.bincount(raw, weights=full, minlength=nraw + 1)
    keep = np.zeros(nraw + 1, dtype=bool)
    nz = counts > 0
    keep[nz] = (counts[nz] >= MIN_TOKENS) & (
        sums[nz] / counts[nz] >= MIN_MEAN_SCORE
    )
    keep[0] = False

    # renumber survivors 1..K left-to-right
    remap = np.zeros(nraw + 1, dtype=np.int32)
    remap[keep] = np.arange(1, int(keep.sum()) + 1, dtype=np.int32)
    labels = remap[raw]
    nkept = int(keep.sum())
    if nkept == 0:
        return labels

    # region boundaries [lo, hi] (token indexes, inclusive)
    lo = np.full(nkept + 1, n, dtype=np.int64)
    hi = np.full(nkept + 1, -1, dtype=np.int64)
    idx = np.nonzero(labels)[0]
    np.minimum.at(lo, labels[idx], idx)
    np.maximum.at(hi, labels[idx], idx)

    # C6: progressive expansion through kernels 1..5
    for k in range(1, N_LEVELS):
        admissible = level_scores[k] >= BINARY_THRESH
        for r in range(1, nkept + 1):
            i = lo[r] - 1
            while i >= 0 and labels[i] == 0 and admissible[i]:
                labels[i] = r
                i -= 1
            lo[r] = i + 1
            j = hi[r] + 1
            while j < n and labels[j] == 0 and admissible[j]:
                labels[j] = r
                j += 1
            hi[r] = j - 1
    return labels


def region_bounds(labels: np.ndarray) -> list[tuple[int, int, int]]:
    """labels -> [(region_id, first_token, last_token)] sorted by id.

    The span-boundary reduction (C7: min/max per label, the boundary-
    extraction analog of ref ocr.cpp:210-243).
    """
    labels = np.asarray(labels)
    out: list[tuple[int, int, int]] = []
    nk = int(labels.max()) if labels.size else 0
    for r in range(1, nk + 1):
        idx = np.nonzero(labels == r)[0]
        if idx.size:
            out.append((r, int(idx[0]), int(idx[-1])))
    return out
