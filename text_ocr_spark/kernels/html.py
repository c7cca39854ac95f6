"""HTML main-content extractor — the detection path of the graft (C-family
applied to markup payloads).

Tokenizes an HTML fragment into (token, raw offset, block id, link flag)
records, scores blocks by text-density x (1 - link-density), and runs the
shared seed/filter/expand machinery (``blocks.label_and_expand``). Spans
index the RAW payload (tags and entities included in offsets) — the box
rescale-to-original-coords analog (ref ocrcvlib/src/main/cpp/jni/
ocr.cpp:344-345,381-384: boxes map back to pre-resize coordinates).

Pinned tokenizer semantics:
- any tag breaks a token; whitespace breaks a token;
- <script>/<style>/<!-- --> content is invisible;
- block-level tags (open or close) start a new block id;
- <a>...</a> nesting marks tokens as link tokens;
- entities decode via an explicit table + numeric forms; unknown named
  entities pass through literally.
"""

from __future__ import annotations

import re
from typing import NamedTuple

import numpy as np

from text_ocr_spark.kernels.blocks import block_scores, label_and_expand, region_bounds
from text_ocr_spark.kernels.normalize import normalize_text

BLOCK_TAGS = frozenset(
    "p div br li ul ol h1 h2 h3 h4 h5 h6 nav footer header aside table tr td th "
    "section article title blockquote pre hr form body html head main".split()
)

_ENTITIES = {
    "amp": "&",
    "lt": "<",
    "gt": ">",
    "quot": '"',
    "apos": "'",
    "nbsp": " ",
}

_SCAN_RE = re.compile(
    r"(?s)(?P<comment><!--.*?-->)"
    r"|(?P<tag><[a-zA-Z/!][^>]*>)"
    r"|(?P<entity>&[a-zA-Z][a-zA-Z0-9]*;|&#[0-9]+;|&#x[0-9a-fA-F]+;)"
    r"|(?P<ws>\s+)"
    r"|(?P<text>[^<&\s]+)"
)

_TAG_NAME_RE = re.compile(r"</?\s*([a-zA-Z][a-zA-Z0-9]*)")


class Token(NamedTuple):
    # NamedTuple, not dataclass: C-level construction matters at one
    # Token per lexeme over 100 TB of markup
    start: int
    end: int
    text: str
    block: int
    link: bool


def _decode_entity(raw: str) -> str:
    body = raw[1:-1]
    if body.startswith("#x") or body.startswith("#X"):
        try:
            return chr(int(body[2:], 16))
        except (ValueError, OverflowError):
            return raw
    if body.startswith("#"):
        try:
            return chr(int(body[1:]))
        except (ValueError, OverflowError):
            return raw
    return _ENTITIES.get(body, raw)


def tokenize_html(payload: str) -> list[Token]:
    tokens: list[Token] = []
    block = 0
    link_depth = 0
    skip_until: str | None = None  # inside <script>/<style>
    cur_start = -1
    cur_parts: list[str] = []
    cur_end = -1

    def flush() -> None:
        nonlocal cur_start, cur_parts, cur_end
        if cur_parts:
            text = "".join(cur_parts)
            if text:
                tokens.append(Token(cur_start, cur_end, text, block, link_depth > 0))
        cur_start, cur_parts, cur_end = -1, [], -1

    for m in _SCAN_RE.finditer(payload):
        kind = m.lastgroup
        if kind == "comment":
            flush()
            continue
        if kind == "tag":
            flush()
            nm = _TAG_NAME_RE.match(m.group())
            name = nm.group(1).lower() if nm else ""
            closing = m.group().startswith("</")
            if skip_until is not None:
                if closing and name == skip_until:
                    skip_until = None
                continue
            if name in ("script", "style") and not closing:
                skip_until = name
            elif name == "a":
                link_depth = max(0, link_depth - 1) if closing else link_depth + 1
            if name in BLOCK_TAGS:
                block += 1
            continue
        if skip_until is not None:
            continue
        if kind == "ws":
            flush()
            continue
        # entity or text: accumulate into the current token
        if cur_start < 0:
            cur_start = m.start()
        cur_end = m.end()
        cur_parts.append(_decode_entity(m.group()) if kind == "entity" else m.group())
    flush()
    return tokens


def extract_html(payload: str) -> tuple[str, list[tuple[int, int]]]:
    """payload -> (normalized main-content text, raw-offset spans)."""
    tokens = tokenize_html(payload)
    if not tokens:
        return "", []

    blocks = np.array([t.block for t in tokens], dtype=np.int64)
    lens = np.array([len(t.text) for t in tokens], dtype=np.int64)
    links = np.array([t.link for t in tokens], dtype=bool)

    nb = int(blocks.max()) + 1
    text_chars = np.bincount(blocks, weights=lens, minlength=nb)
    link_chars = np.bincount(blocks, weights=lens * links, minlength=nb)
    scores = block_scores(text_chars, link_chars)[:, blocks]

    labels = label_and_expand(scores)
    pieces: list[str] = []
    spans: list[tuple[int, int]] = []
    for _rid, first, last in region_bounds(labels):
        parts: list[str] = []
        for i in range(first, last + 1):
            if i > first:
                parts.append("\n" if tokens[i].block != tokens[i - 1].block else " ")
            parts.append(tokens[i].text)
        pieces.append("".join(parts))
        spans.append((tokens[first].start, tokens[last].end))
    extracted = normalize_text("\n".join(pieces))
    spans.sort()
    return extracted, spans
