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
from text_ocr_spark.kernels.html import extract_html
from text_ocr_spark.kernels.normalize import normalize_text
from text_ocr_spark.kernels.ocr_dump import extract_ocr
from text_ocr_spark.kernels.pdf import extract_pdf

_NONWS_RE = re.compile(r"\S")


def extract_plain(payload: str) -> tuple[str, list[tuple[int, int]]]:
    """Identity extraction: whitespace normalization only (E7 'plain' route)."""
    extracted = normalize_text(payload)
    if not extracted:
        return "", []
    first = _NONWS_RE.search(payload)
    last = None
    for last in _NONWS_RE.finditer(payload):
        pass
    assert first is not None and last is not None
    return extracted, [(first.start(), last.end())]


_EXTRACTORS = {
    "html": extract_html,
    "pdf": extract_pdf,
    "ocr": extract_ocr,
    "plain": extract_plain,
}


def extract_payload(
    text: str | None, tool: str | None = None
) -> tuple[str, str, list[tuple[int, int]]]:
    """(text, tool) -> (kind, extracted, spans). Total: never raises on
    well-typed input; null/empty payloads yield ('empty', '', [])."""
    kind = classify_payload(text, tool)
    if kind == "empty":
        return kind, "", []
    assert text is not None
    extracted, spans = _EXTRACTORS[kind](text)
    return kind, extracted, spans
