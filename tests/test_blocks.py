"""Differential + hand-case tests for the region machinery (C-family)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from text_ocr_spark.kernels.blocks import (
    _label_runs,
    block_scores,
    label_and_expand,
    region_bounds,
)
from text_ocr_spark.kernels.constants import (
    BINARY_THRESH,
    LEVEL_C,
    MIN_MEAN_SCORE,
    MIN_TOKENS,
    N_LEVELS,
)
from text_ocr_spark.oracle import block_scores_naive, label_and_expand_naive


def scores_from_chars(chars: list[float], links: list[float] | None = None):
    """(per-token block char counts) -> (N_LEVELS, n) score matrix."""
    links = links or [0.0] * len(chars)
    return block_scores(np.array(chars, float), np.array(links, float))


def test_level_c_monotone_strict_to_loose():
    assert all(a > b for a, b in zip(LEVEL_C, LEVEL_C[1:]))
    assert LEVEL_C[0] == 32.0 and LEVEL_C[-1] == 8.0


def test_block_scores_matches_naive():
    for tc, lc in [(0, 0), (1, 0), (22, 0), (100, 30), (500, 500)]:
        vec = block_scores(np.array([tc], float), np.array([lc], float))[:, 0]
        naive = block_scores_naive(float(tc), float(lc))
        assert np.allclose(vec, naive)


def test_label_runs_basic():
    m = np.array([0, 1, 1, 0, 1, 0, 1, 1, 1], dtype=bool)
    assert _label_runs(m).tolist() == [0, 1, 1, 0, 2, 0, 3, 3, 3]


def test_min_tokens_filter():
    # 9 tokens of very high score: below MIN_TOKENS -> dropped
    s = scores_from_chars([1000.0] * (MIN_TOKENS - 1))
    assert label_and_expand(s).tolist() == [0] * (MIN_TOKENS - 1)
    s = scores_from_chars([1000.0] * MIN_TOKENS)
    assert label_and_expand(s).tolist() == [1] * MIN_TOKENS


def test_mean_score_filter_uses_full_map():
    # seed-passing but full-map mean just below 0.93 -> dropped.
    # full = tc/(tc+8) = 0.93 at tc = 106.2857...; pick tc just below
    tc = 106.0
    full = tc / (tc + 8.0)
    assert full < MIN_MEAN_SCORE
    assert tc / (tc + LEVEL_C[0]) >= BINARY_THRESH  # it IS a seed
    s = scores_from_chars([tc] * 20)
    assert label_and_expand(s).tolist() == [0] * 20
    # just above -> kept
    s = scores_from_chars([107.0] * 20)
    assert label_and_expand(s).tolist() == [1] * 20


def test_expansion_absorbs_medium_neighbor():
    # strong core (200 chars) + medium tail (60 chars): tail is no seed
    # (60/92 = 0.652 < 0.7311) but joins via a looser kernel
    s = scores_from_chars([200.0] * 12 + [60.0] * 5)
    labels = label_and_expand(s)
    assert labels.tolist() == [1] * 17


def test_expansion_blocked_by_low_score_gap():
    # two strong regions separated by a zero-score gap (pure links)
    s = scores_from_chars([200.0] * 12 + [0.0] * 3 + [200.0] * 12,
                          [0.0] * 12 + [0.0] * 3 + [0.0] * 12)
    s[:, 12:15] = 0.0
    labels = label_and_expand(s)
    assert labels.tolist() == [1] * 12 + [0] * 3 + [2] * 12


def test_first_claim_wins_lower_id():
    # a medium run sits between two strong regions; both could claim it at
    # the same level -> region 1 (lower id, processed first) takes it all
    s = scores_from_chars([200.0] * 12 + [60.0] * 4 + [200.0] * 12)
    labels = label_and_expand(s)
    assert labels.tolist() == [1] * 12 + [1] * 4 + [2] * 12


def test_region_bounds():
    labels = np.array([0, 1, 1, 0, 0, 2, 2, 2], dtype=np.int32)
    assert region_bounds(labels) == [(1, 1, 2), (2, 5, 7)]


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.floats(min_value=0.0, max_value=600.0),
            st.floats(min_value=0.0, max_value=1.0),
        ),
        max_size=60,
    )
)
def test_differential_vs_naive(blocks):
    """Vectorized label_and_expand == naive loop twin on arbitrary inputs."""
    chars = [tc for tc, _ in blocks]
    links = [tc * lr for tc, lr in blocks]
    vec = scores_from_chars(chars, links)
    got = label_and_expand(vec).tolist()
    naive_scores = [list(vec[k]) for k in range(N_LEVELS)]
    want = label_and_expand_naive(naive_scores)
    assert got == want
