"""E4 vertical/columnar route: flow classification, transpose-then-
extract equivalence with the horizontal twin, span integrity, and the
end-to-end contract surface vs the committed golden."""

from __future__ import annotations

import json

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tests.conftest import SF_TINY


WORDS = st.lists(
    st.text(alphabet="abcdefghij", min_size=1, max_size=8),
    min_size=4,
    max_size=40,
)


def test_classifier_routes_vertical_and_pdf(docs_tiny):
    """Every pdf-kind fixture payload stays 'pdf'; its transposed twin
    classifies 'vertical' — the flow vote never misroutes either way."""
    from text_ocr_spark.fixtures import build_pdf, build_vertical
    from text_ocr_spark.kernels.classify import classify_payload

    n = 0
    for r in docs_tiny.itertuples(index=False):
        if int(r.doc_id) % 10 not in (3, 4):
            continue
        h = build_pdf(int(r.doc_id), r.text or "")
        v = build_vertical(int(r.doc_id), r.text or "")
        assert classify_payload(h) == "pdf"
        assert classify_payload(v) == "vertical"
        n += 1
    assert n > 0


def test_vertical_extraction_equals_horizontal_text(docs_tiny):
    """Transposing the layout then extracting through the vertical route
    must recover the SAME text the horizontal route reads — the
    rotate-into-horizontal-recognizer semantics of the reference."""
    from text_ocr_spark.fixtures import build_pdf, build_vertical
    from text_ocr_spark.kernels.extract import extract_payload

    n = 0
    for r in docs_tiny.itertuples(index=False):
        if int(r.doc_id) % 10 != 3:
            continue
        kh, eh, _ = extract_payload(build_pdf(int(r.doc_id), r.text or ""))
        kv, ev, sv = extract_payload(build_vertical(int(r.doc_id), r.text or ""))
        assert (kh, kv) == ("pdf", "vertical")
        assert ev == eh
        payload = build_vertical(int(r.doc_id), r.text or "")
        assert all(0 <= s <= e <= len(payload) for s, e in sv)
        assert sv == sorted(sv)
        # spans index the RAW vertical payload: each starts on a glyph line
        for s, _e in sv:
            assert payload[s : s + 2] == "G "
        n += 1
    assert n > 0


@settings(max_examples=30, deadline=None)
@given(WORDS, st.integers(min_value=0, max_value=10_000))
def test_vertical_horizontal_equivalence_property(words, doc_id):
    """Property: for ANY word list, the transposed dump extracts to the
    same text as the horizontal dump (totality + equivalence)."""
    from text_ocr_spark.fixtures import build_pdf, build_vertical
    from text_ocr_spark.kernels.extract import extract_payload

    text = " ".join(words)
    _, eh, _ = extract_payload(build_pdf(doc_id, text))
    kv, ev, _ = extract_payload(build_vertical(doc_id, text))
    assert ev == eh
    assert kv in ("vertical", "pdf", "empty")  # tiny dumps may stay pdf


def test_contract_vertical_matches_committed_golden(spark):
    """The Spark surface at sf0.001 equals a fresh pure-Python replay
    row-for-row (the sf0.01 golden is committed for the driver gate)."""
    import pandas as pd

    from text_ocr_spark.pipeline import extract_vertical_corpus
    from text_ocr_spark.fixtures import build_vertical
    from text_ocr_spark.oracle import extract_turn

    got = {
        r.doc_id: (r.kind, r.extracted, r.spans_json)
        for r in extract_vertical_corpus(spark, SF_TINY).collect()
    }
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF_TINY}/documents.parquet')"
        " WHERE doc_id % 10 = 3 ORDER BY doc_id"
    ).df()
    want = {}
    for r in docs.itertuples(index=False):
        payload = build_vertical(int(r.doc_id), r.text or "")
        want[int(r.doc_id)] = extract_turn(payload, None)
    assert got == want
    assert len(got) > 0
    assert all(k == "vertical" for k, _, _ in got.values())
    # spans are non-trivial on real payloads
    assert any(len(json.loads(sj)) > 0 for _, _, sj in got.values())


@settings(max_examples=25, deadline=None)
@given(WORDS, st.integers(min_value=0, max_value=10_000),
       st.integers(min_value=0, max_value=2**31 - 1))
def test_flow_vote_stable_under_jitter(words, doc_id, seed):
    """VERDICT r3 item 5: the flow vote uses an epsilon band (0.75 x
    median glyph dim), not exact float equality — +-0.3*dim coordinate
    jitter (sub-pixel rasterization / kerning noise in real glyph
    dumps) must not flip either route. Jitter rides the shared-axis
    coordinate: x for vertical columns, y for horizontal rows."""
    import random

    from text_ocr_spark.fixtures import build_pdf, build_vertical
    from text_ocr_spark.kernels.classify import classify_payload

    rng = random.Random(seed)

    def jitter(payload: str, axis: str) -> str:
        out = []
        for line in payload.split("\n"):
            _tag, x, y, w, h, ch = line.split(" ")
            if axis == "x":
                x = f"{float(x) + rng.uniform(-0.3, 0.3) * float(w):.2f}"
            else:
                y = f"{float(y) + rng.uniform(-0.3, 0.3) * float(h):.2f}"
            out.append(f"G {x} {y} {w} {h} {ch}")
        return "\n".join(out)

    text = " ".join(words)
    assert classify_payload(jitter(build_pdf(doc_id, text), "y")) == "pdf"
    assert (
        classify_payload(jitter(build_vertical(doc_id, text), "x"))
        == "vertical"
    )
