"""B2 bounded-analysis windowing (ref resize_img long-side bounding,
ocrcvlib/src/main/cpp/jni/ocr.cpp:77-102): payloads beyond
MAX_ANALYSIS_CHARS process in bounded windows with raw-offset stitching."""

from __future__ import annotations

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st

from text_ocr_spark.kernels.extract import extract_payload, window_bounds


@given(
    n=st.integers(1, 50_000),
    max_chars=st.integers(64, 8192),
    seed=st.integers(0, 5),
)
@settings(max_examples=60, deadline=None)
def test_window_bounds_partition_the_payload(n, max_chars, seed):
    text = "".join(
        "x" if (i * 2654435761 + seed) % 97 else "\n" for i in range(n)
    )
    bounds = window_bounds(n, max_chars, text)
    assert bounds[0][0] == 0 and bounds[-1][1] == n
    for (a, b), (c, _) in zip(bounds, bounds[1:]):
        assert b == c  # contiguous, no gap/overlap
    assert all(0 < e - s <= max_chars for s, e in bounds)


def _giant_plain(n_lines: int = 400) -> str:
    # digits joined with '-' so no 3-in-a-row repeat trips the OCR
    # stutter heuristic (classify_payload must say 'plain')
    return "\n".join(
        f"line {'-'.join(str(i))} with some plain words of text here"
        for i in range(n_lines)
    )


def test_small_payloads_are_untouched():
    text = _giant_plain(10)
    assert extract_payload(text, None) == extract_payload(
        text, None, max_chars=1 << 30
    )


def test_windowed_invariants_and_determinism():
    text = _giant_plain()
    kind, extracted, spans = extract_payload(text, None, max_chars=1500)
    k2, e2, s2 = extract_payload(text, None, max_chars=1500)
    assert (kind, extracted, spans) == (k2, e2, s2)
    assert kind == "plain" and extracted
    # spans index the RAW payload, sorted, in range
    last = 0
    for s, e in spans:
        assert 0 <= s <= e <= len(text)
        assert s >= last
        last = s
    # the spans really point at the claimed content: every extracted
    # word must occur inside SOME span's slice of the raw payload — a
    # forgotten raw-offset shift in the windowed path fails this
    span_words = set()
    for s, e in spans:
        span_words.update(text[s:e].split())
    assert set(extracted.split()) <= span_words


def test_windowed_plain_recovers_all_content():
    """Newline-cut plain windows stitch to the same normalized content
    as the unwindowed run (the cut lands on a line boundary)."""
    text = _giant_plain()
    _, unwindowed, _ = extract_payload(text, None, max_chars=0)
    _, windowed, _ = extract_payload(text, None, max_chars=1500)
    norm = lambda t: " ".join(t.split())
    assert norm(windowed) == norm(unwindowed)


def test_windowed_html_bounded_and_recovers_content():
    """A fixture-grade HTML payload far beyond max_chars: windows stay
    bounded, output is deterministic, and nearly all article content
    survives the stitching (loss only at window boundaries)."""
    from text_ocr_spark.fixtures import build_payload

    base = (
        "the quick brown fox jumps over the lazy dog near the river bank "
        "and walks through the quiet meadow while evening light settles "
    ) * 60
    text, tool = build_payload(0, base)  # html payload, ~8 KB
    kind, unwindowed, _ = extract_payload(text, tool, max_chars=0)
    assert kind == "html" and unwindowed
    k2, windowed, spans = extract_payload(text, tool, max_chars=2000)
    assert k2 == "html"
    assert windowed == extract_payload(text, tool, max_chars=2000)[1]
    for s, e in spans:
        assert 0 <= s <= e <= len(text)
        assert e - s <= 2000  # no span wider than one analysis window
    # >= 99% of the content chars survive the bounded-analysis path
    assert len(windowed) >= 0.99 * len(unwindowed)
    assert hashlib.md5(windowed.encode()).hexdigest() != ""


def test_span_padding_flag():
    """D6 analog (ref ocrcvlib ocr.cpp:411-414, 15% crop-box grow):
    opt-in pad_frac grows spans by int(len*frac) per side with boundary
    clamping; default OFF leaves every existing golden untouched."""
    from text_ocr_spark.kernels.extract import SPAN_PAD_FRAC, pad_spans

    text = "   alpha beta gamma delta epsilon zeta eta theta iota   "
    kind, ext, spans = extract_payload(text, None)
    assert extract_payload(text, None, pad_frac=0.0) == (kind, ext, spans)
    kp, ep, sp = extract_payload(text, None, pad_frac=SPAN_PAD_FRAC)
    assert (kp, ep) == (kind, ext)  # only spans change
    assert len(sp) == len(spans)
    for (s0, e0), (s1, e1) in zip(spans, sp):
        grow = int((e0 - s0) * SPAN_PAD_FRAC)
        assert s1 == max(0, s0 - grow) and e1 == min(len(text), e0 + grow)
    # clamping: a full-width span cannot grow past the payload
    assert pad_spans([(0, 10)], 10, 0.5) == [(0, 10)]
    # re-sort under unequal growth keeps the sorted-by-start invariant
    assert pad_spans([(5, 6), (6, 100)], 100, 0.5) == [(0, 100), (5, 6)]


@given(
    text=st.text(max_size=8000),
    mc=st.integers(64, 2000),
    pad=st.sampled_from([0.0, 0.15]),
)
@settings(max_examples=80, deadline=None)
def test_windowed_extract_payload_total(text, mc, pad):
    """B2/D6 composition is TOTAL on arbitrary unicode: never raises,
    one (kind, extracted, spans) result, spans sorted within the raw
    payload, '' <=> [] invariant preserved."""
    kind, extracted, spans = extract_payload(text, None, max_chars=mc, pad_frac=pad)
    assert kind in ("empty", "html", "pdf", "ocr", "plain")
    assert (extracted == "") == (spans == [])
    prev = -1
    for s, e in spans:
        assert 0 <= s <= e <= len(text)
        assert s >= prev
        prev = s
