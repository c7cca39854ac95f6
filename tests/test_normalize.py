"""Unit tests for the F4-analog normalization (table-driven, byte-exact)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from text_ocr_spark.kernels.normalize import (
    collapse_stutter,
    collapse_whitespace,
    fold_chars,
    normalize_text,
)


def test_ligatures_fold():
    assert fold_chars("eﬃcient ﬁne ﬂow") == "efficient fine flow"


def test_fullwidth_folds_to_ascii():
    assert fold_chars("Ｈｉ！") == "Hi!"
    assert fold_chars("　") == " "


def test_nbsp_and_zero_width():
    assert fold_chars("a b") == "a b"
    assert fold_chars("a​b‌c‍d﻿e") == "abcde"


def test_crlf():
    assert fold_chars("a\r\nb\rc") == "a\nb\nc"


def test_stutter_collapses_triple_not_double():
    assert collapse_stutter("jjjoin") == "join"
    assert collapse_stutter("letter") == "letter"  # double survives
    assert collapse_stutter("aaaa     bbbb") == "a     b"


def test_whitespace_canon():
    assert collapse_whitespace("  a \t b  \n\n  c ") == "a b\nc"


def test_normalize_end_to_end():
    s = "sﬁx  y\r\n\r\nzzz​z"
    assert normalize_text(s, collapse_repeats=True) == "sfix y\nz"
    assert normalize_text(s, collapse_repeats=False) == "sfix y\nzzzz"


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=200), st.booleans())
def test_normalize_idempotent(s, collapse):
    once = normalize_text(s, collapse_repeats=collapse)
    assert normalize_text(once, collapse_repeats=collapse) == once
