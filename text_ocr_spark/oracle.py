"""Pure-Python oracle — the manufactured reference (SURVEY.md §5.2).

The reference repo ships no tests or golden outputs, so correctness is
pinned here: a deliberately naive, loop-based implementation of the region
machinery (differential twin of the vectorized ``kernels.blocks``), plus a
row-at-a-time driver that produces the golden extraction frame the Spark
pipeline must match byte-for-byte per turn.

No Spark imports. numpy allowed only in the vectorized module under test.
"""

from __future__ import annotations

import json

import pandas as pd

from text_ocr_spark.kernels.constants import (
    BINARY_THRESH,
    LEVEL_C,
    MIN_MEAN_SCORE,
    MIN_TOKENS,
    N_LEVELS,
)
from text_ocr_spark.kernels.extract import extract_payload


def block_scores_naive(text_chars: float, link_chars: float) -> list[float]:
    """Scalar twin of kernels.blocks.block_scores: one score per level."""
    link_term = 1.0 - link_chars / max(text_chars, 1.0)
    return [link_term * (text_chars / (text_chars + c)) for c in LEVEL_C]


def label_and_expand_naive(level_scores: list[list[float]]) -> list[int]:
    """Loop-based twin of kernels.blocks.label_and_expand.

    Same pinned semantics: seed runs from map 0 at BINARY_THRESH; drop runs
    with < MIN_TOKENS tokens or mean full-map (level 5) score
    < MIN_MEAN_SCORE; renumber survivors left-to-right; expansion through
    maps 1..5 in ascending region-id order, each region taking its maximal
    admissible unclaimed run left then right.
    """
    assert len(level_scores) == N_LEVELS
    n = len(level_scores[0])
    full = level_scores[N_LEVELS - 1]
    labels = [0] * n

    # seed runs + filters
    runs: list[tuple[int, int]] = []
    i = 0
    while i < n:
        if level_scores[0][i] >= BINARY_THRESH:
            j = i
            while j < n and level_scores[0][j] >= BINARY_THRESH:
                j += 1
            runs.append((i, j))
            i = j
        else:
            i += 1
    kept: list[tuple[int, int]] = []
    for lo, hi in runs:
        size = hi - lo
        mean = sum(full[lo:hi]) / size
        if size >= MIN_TOKENS and mean >= MIN_MEAN_SCORE:
            kept.append((lo, hi))
    for rid, (lo, hi) in enumerate(kept, start=1):
        for k in range(lo, hi):
            labels[k] = rid

    # progressive expansion
    bounds = [(lo, hi - 1) for lo, hi in kept]  # inclusive
    for lvl in range(1, N_LEVELS):
        sc = level_scores[lvl]
        for rid, (lo, hi) in enumerate(bounds, start=1):
            i = lo - 1
            while i >= 0 and labels[i] == 0 and sc[i] >= BINARY_THRESH:
                labels[i] = rid
                i -= 1
            lo = i + 1
            j = hi + 1
            while j < n and labels[j] == 0 and sc[j] >= BINARY_THRESH:
                labels[j] = rid
                j += 1
            hi = j - 1
            bounds[rid - 1] = (lo, hi)
    return labels


def spans_to_json(spans: list[tuple[int, int]]) -> str:
    """Canonical span serialization: compact JSON [[start,end],...]."""
    return json.dumps([[s, e] for s, e in spans], separators=(",", ":"))


def extract_turn(text: str | None, tool: str | None) -> tuple[str, str, str]:
    """One turn -> (kind, extracted, spans_json)."""
    kind, extracted, spans = extract_payload(text, tool)
    return kind, extracted, spans_to_json(spans)


def golden_frame(transcripts: pd.DataFrame) -> pd.DataFrame:
    """transcripts(conv_id, turn_idx, text, tool, ...) -> golden
    (conv_id, turn_idx, kind, extracted, spans_json), sorted by
    (conv_id, turn_idx) — the stable-turn-ordering contract."""
    rows = []
    for r in transcripts.itertuples(index=False):
        text = None if pd.isna(r.text) else r.text
        tool = None if (r.tool is None or pd.isna(r.tool)) else r.tool
        kind, extracted, spans_json = extract_turn(text, tool)
        rows.append((r.conv_id, r.turn_idx, kind, extracted, spans_json))
    out = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "kind", "extracted", "spans_json"]
    )
    out["turn_idx"] = out["turn_idx"].astype("int32")
    return out.sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(
        drop=True
    )
