"""Table-driven text normalization — the CTC-decode analog (F4).

The reference's recognition post-processing (ocrlib/src/main/cpp/jni/
ocr.cpp:96-117) does three things per decoded line:

  (a) drop CTC blanks            -> here: strip zero-content characters
      (zero-width spaces, BOM) and map NBSP to a plain space;
  (b) collapse repeated argmax   -> here: collapse stuttered character runs
      (OCR-dump artifact) — applied only on the OCR path, mirroring that the
      reference collapses only recognizer output, never raw pixels;
  (c) alphabet table lookup      -> here: an explicit char->str mapping
      (ligatures, fullwidth ASCII), the keys.txt analog
      (ocrlib/src/main/cpp/jni/ocr.cpp:42-52).

Everything is an explicit table or an explicit ASCII regex — never locale,
never blanket NFKC — so per-turn byte equality is reproducible anywhere.
"""

from __future__ import annotations

import re

# (c) alphabet table: ligature and fullwidth folding + whitespace canon.
_CHAR_MAP: dict[int, str] = {
    0xFB00: "ff",
    0xFB01: "fi",
    0xFB02: "fl",
    0xFB03: "ffi",
    0xFB04: "ffl",
    0xFB05: "ft",
    0xFB06: "st",
    0x00A0: " ",   # NBSP
    0x3000: " ",   # ideographic space
    0x0009: " ",   # tab
    # (a) blank-drop: zero-width chars vanish entirely
    0x200B: "",
    0x200C: "",
    0x200D: "",
    0xFEFF: "",
}
# fullwidth ASCII block FF01..FF5E -> 0x21..0x7E
_CHAR_MAP.update({cp: chr(cp - 0xFF00 + 0x20) for cp in range(0xFF01, 0xFF5F)})

_STUTTER_RE = re.compile(r"(\S)\1{2,}")
_INLINE_WS_RE = re.compile(r"[^\S\n]+")
_NL_RUN_RE = re.compile(r"\s*\n\s*")


def fold_chars(s: str) -> str:
    """Apply the explicit char table: ligatures, fullwidth, NBSP, zero-width."""
    s = s.replace("\r\n", "\n").replace("\r", "\n")
    return s.translate(_CHAR_MAP)


def collapse_stutter(s: str) -> str:
    """Collapse runs of >=3 identical non-whitespace chars to one.

    The lag-1 repeat-collapse analog of CTC greedy decode
    (ocrlib/src/main/cpp/jni/ocr.cpp:111-114): the reference drops a
    timestep when argmax == previous argmax; a length>=3 run is the graft's
    definition of recognizer stutter (length-2 runs are legitimate English
    double letters, so they survive).
    """
    return _STUTTER_RE.sub(r"\1", s)


def collapse_whitespace(s: str) -> str:
    """Canonical whitespace: inline runs -> one space, any run containing a
    newline -> one newline; strip both ends."""
    s = _INLINE_WS_RE.sub(" ", s)
    s = _NL_RUN_RE.sub("\n", s)
    return s.strip()


def normalize_text(s: str, *, collapse_repeats: bool = False) -> str:
    """Full normalization pipeline. Idempotent (property-tested)."""
    s = fold_chars(s)
    if collapse_repeats:
        s = collapse_stutter(s)
    return collapse_whitespace(s)
