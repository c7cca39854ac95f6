"""Deterministic transcripts fixture — derived from the driver's read-only
``documents`` table (FIXTURES.md §1).

Every column is a pure function of (doc_id, text): payload randomness comes
from md5(doc_id), never from sequential RNG state, so distributed Spark-side
generation and single-threaded oracle-side generation produce identical rows
regardless of row order and partitioning.

Layout (pins the skew story of SURVEY.md §2.H):
- doc_id < 100           -> conv_id='conv-skew', turn_idx=doc_id  (hot key)
- doc_id >= 100          -> conv_id='conv-%06d' % ((doc_id-100)//8),
                            turn_idx=(doc_id-100)%8
- role cycles user/assistant/tool by turn_idx
- ts = 2026-01-01 + conv_ordinal hours + turn_idx seconds
- payload kind by doc_id % 10: 0-2 html, 3-4 pdf, 5-6 ocr, 7-8 plain, 9 edge
- ~5% of tool hints are deliberately wrong (h(doc_id) % 20 == 0)
- doc_id == 7 carries a giant (~hundreds of KB) payload inside conv-skew

The conv/turn/role/ts derivation is intentionally SQL-expressible (see
__spark_entry__.transcript_index) so the DuckDB oracle can rebuild it.
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta

import pandas as pd

EPOCH = datetime(2026, 1, 1, 0, 0, 0)
ROLES = ("user", "assistant", "tool")
KIND_BY_MOD = {
    0: "html", 1: "html", 2: "html",
    3: "pdf", 4: "pdf",
    5: "ocr", 6: "ocr",
    7: "plain", 8: "plain",
    9: "edge",
}
HINT_BY_KIND = {"html": "web_fetch", "pdf": "pdf_read", "ocr": "ocr", "plain": None}
_HINT_ROTATE = {"web_fetch": "pdf_read", "pdf_read": "ocr", "ocr": "web_fetch", None: "ocr"}

GIANT_DOC_ID = 7
GIANT_REPEAT = 600  # ~100-260 KB payload in the skew conversation


def h(doc_id: int, salt: str = "") -> int:
    """Stable 64-bit hash of (doc_id, salt) — never Python hash()."""
    d = hashlib.md5(f"{doc_id}:{salt}".encode()).digest()
    return int.from_bytes(d[:8], "big")


# --------------------------------------------------------------------------
# payload builders (pure functions of doc_id + source text)
# --------------------------------------------------------------------------

def _chunks(words: list[str], size: int) -> list[list[str]]:
    return [words[i : i + size] for i in range(0, len(words), size)] or [[]]


def build_html(doc_id: int, text: str) -> str:
    words = text.split()
    paras = _chunks(words, 35)
    nav = "".join(
        f'<a href="/{w}">{w} {w2}</a> '
        for w, w2 in zip(words[:3], words[3:6] + ["more"] * 3)
    )
    parts = [f"<nav>{nav}</nav>", '<div class="content">']
    for i, p in enumerate(paras):
        parts.append(f"<p>{' '.join(p)}</p>")
        # every third doc: a link-list gap splits content into two regions
        if h(doc_id, "gap") % 3 == 0 and i == 0 and len(paras) > 1:
            parts.append(
                '<ul><li><a href="/x">read more now</a></li>'
                '<li><a href="/y">subscribe today free</a></li></ul>'
            )
    parts.append("</div>")
    if h(doc_id, "aside") % 4 == 0:
        parts.append('<aside><a href="/ad">sponsored content link here</a></aside>')
    parts.append(
        f'<footer><a href="/about">about</a> <a href="/tos">terms</a> '
        f"&copy; 2026 {words[0] if words else 'corp'}</footer>"
    )
    return "".join(parts)


def build_pdf(doc_id: int, text: str) -> str:
    """Two-column glyph dump + header/footer noise (FIXTURES.md §3 'pdf')."""
    words = text.split()
    half = max(1, (len(words) + 1) // 2)
    cols = [words[:half], words[half:]]
    out: list[str] = []

    def emit_line(line_words: list[str], x0: float, y: float) -> None:
        x = x0
        for wi, w in enumerate(line_words):
            if wi:
                x += 6.0  # word gap
            for ch in w:
                out.append(f"G {x:.1f} {y:.1f} 6.0 10.0 {ch}")
                x += 6.0

    emit_line(["page", str(doc_id % 97), "of", "9"], 150.0, 0.0)  # header noise
    for ci, col_words in enumerate(cols):
        y = 40.0
        for line_words in _chunks(col_words, 3):
            if line_words:
                emit_line(line_words, 400.0 * ci, y)
                y += 14.0
    emit_line(["footer", str(doc_id % 89)], 150.0, 900.0)  # footer noise
    return "\n".join(out)


_LIG_SUBS = (("fi", "ﬁ"), ("fl", "ﬂ"), ("ff", "ﬀ"))


def build_ocr(doc_id: int, text: str) -> str:
    """Stutter, ligatures, NBSP/zero-width, CRLF, fullwidth (FIXTURES §3)."""
    words = text.split()
    mangled: list[str] = []
    for i, w in enumerate(words):
        k = h(doc_id, f"w{i}")
        if k % 7 == 0 and w:
            w = w[0] * 3 + w[1:]  # stutter
        if k % 11 == 3:
            for plain, lig in _LIG_SUBS:
                if plain in w:
                    w = w.replace(plain, lig, 1)
                    break
        if k % 17 == 5 and len(w) > 2:
            w = w[:2] + "​" + w[2:]  # zero-width insert
        if k % 19 == 7:
            w = w + "！"  # fullwidth '!'
        mangled.append(w)
        if k % 13 == 2:
            mangled.append(" ")  # NBSP run between words
    paras = _chunks(mangled, 34)
    blocks = []
    for p in paras:
        sep = "\r\n" if h(doc_id, "crlf") % 2 else "\n"
        lines = [" ".join(c) for c in _chunks(p, 8)]
        blocks.append(sep.join(lines))
    if h(doc_id, "noise") % 2 == 0:
        blocks.append("* * * *")  # sub-threshold junk block (1-char tokens)
    return "\n\n".join(blocks)


def build_vertical(doc_id: int, text: str) -> str:
    """Columnar glyph dump — ``build_pdf``'s layout with every glyph's
    axes swapped (x<->y, w<->h): text flows top-to-bottom in columns,
    the vertical-recognizer regime the reference reaches via its
    tall-box rotate (E4). Pure function of (doc_id, text); the committed
    golden replays it with zero Spark."""
    out: list[str] = []
    for line in build_pdf(doc_id, text).split("\n"):
        _tag, x, y, w, h, ch = line.split(" ")
        out.append(f"G {y} {x} {h} {w} {ch}")
    return "\n".join(out)


def build_plain(doc_id: int, text: str) -> str:
    words = text.split()
    out: list[str] = []
    for i, w in enumerate(words):
        out.append(w)
        k = h(doc_id, f"s{i}")
        if k % 9 == 0:
            out.append(" ")  # doubled space
        if k % 15 == 4:
            out.append("\n")
    return " ".join(out)


def build_payload(doc_id: int, text: str) -> tuple[str | None, str | None]:
    """-> (payload text or None, tool hint or None)."""
    kind = KIND_BY_MOD[doc_id % 10]
    if kind == "edge":
        sub = h(doc_id, "edge") % 5
        if sub == 0:
            return None, "web_fetch"
        if sub == 1:
            return "", None
        if sub == 2:
            return "   \n\t  ", "pdf_read"
        if sub == 3:
            return "  ", None
        return "ok", None
    if doc_id == GIANT_DOC_ID:
        payload = build_plain(doc_id, " ".join([text] * GIANT_REPEAT))
        hint = HINT_BY_KIND["plain"]
        return payload, hint
    payload = {
        "html": build_html,
        "pdf": build_pdf,
        "ocr": build_ocr,
        "plain": build_plain,
    }[kind](doc_id, text)
    hint = HINT_BY_KIND[kind]
    if h(doc_id, "hint") % 20 == 0:  # ~5% deliberately wrong hints
        hint = _HINT_ROTATE[hint]
    return payload, hint


# --------------------------------------------------------------------------
# transcript metadata (SQL-expressible derivation — see __spark_entry__)
# --------------------------------------------------------------------------

def conv_of(doc_id: int) -> tuple[str, int, int]:
    """doc_id -> (conv_id, turn_idx, conv_ordinal)."""
    if doc_id < 100:
        return "conv-skew", doc_id, 0
    k = (doc_id - 100) // 8
    return f"conv-{k:06d}", (doc_id - 100) % 8, k + 1


def make_transcripts_pdf(docs: pd.DataFrame) -> pd.DataFrame:
    """documents(doc_id, text) -> transcripts frame (oracle/pytest path).

    Column-for-column the BASELINE.json input_hint shape:
    (conv_id string, turn_idx int32, role string, text string,
     tool string, ts timestamp).
    """
    rows = []
    for r in docs.itertuples(index=False):
        doc_id = int(r.doc_id)
        payload, tool = build_payload(doc_id, r.text or "")
        conv_id, turn_idx, conv_ord = conv_of(doc_id)
        rows.append(
            (
                conv_id,
                turn_idx,
                ROLES[turn_idx % 3],
                payload,
                tool,
                EPOCH + timedelta(hours=conv_ord, seconds=turn_idx),
            )
        )
    out = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    out["turn_idx"] = out["turn_idx"].astype("int32")
    return out
