"""Property-based kernel invariants (SURVEY.md §5.2 layer 3) over
adversarial random payloads: total functions, bounded sorted spans,
determinism. No Spark involved."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from text_ocr_spark.kernels.extract import extract_payload
from text_ocr_spark.kernels.pdf import extract_pdf

KINDS = {"html", "pdf", "ocr", "plain", "empty"}


def _check_spans(payload: str, spans: list[tuple[int, int]]) -> None:
    n = len(payload)
    prev = -1
    for s, e in spans:
        assert 0 <= s <= e <= n
        assert s >= prev  # sorted by start
        prev = s


@settings(max_examples=60, deadline=None)
@given(st.text(max_size=2000))
def test_extract_payload_total_on_any_text(text):
    """Arbitrary unicode payloads never crash; outputs well-formed."""
    kind, extracted, spans = extract_payload(text, None)
    assert kind in KINDS
    assert isinstance(extracted, str)
    _check_spans(text, spans)
    # determinism
    assert extract_payload(text, None) == (kind, extracted, spans)


@settings(max_examples=60, deadline=None)
@given(
    st.sampled_from([None, "web_fetch", "pdf_read", "ocr", "garbage-tool"]),
    st.text(max_size=500),
)
def test_tool_hint_never_breaks_sniffing(tool, text):
    kind, extracted, spans = extract_payload(text, tool)
    assert kind in KINDS
    _check_spans(text, spans)


glyph_line = st.builds(
    lambda x, y, w, h, c: f"G {x:.1f} {y:.1f} {w:.1f} {h:.1f} {c}",
    st.floats(0, 600, allow_nan=False),
    st.floats(0, 800, allow_nan=False),
    st.floats(1, 20, allow_nan=False),
    st.floats(1, 20, allow_nan=False),
    st.characters(blacklist_categories=("Zs", "Cc", "Cs")),
)
noise_line = st.text(
    alphabet=st.characters(blacklist_characters="\n", blacklist_categories=("Cs",)),
    max_size=40,
)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.one_of(glyph_line, noise_line), max_size=80))
def test_pdf_kernel_on_random_glyph_soup(lines):
    payload = "\n".join(lines)
    extracted, spans = extract_pdf(payload)
    _check_spans(payload, spans)
    assert extract_pdf(payload) == (extracted, spans)
    # spans start at glyph-line boundaries: payload[start] is 'G' or the
    # span is empty-range-free (spans only exist if glyphs were kept)
    for s, e in spans:
        assert payload[s] == "G"
