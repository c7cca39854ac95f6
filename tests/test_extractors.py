"""Unit tests for the kind-specific extractors (E/D/F families)."""

from __future__ import annotations

from text_ocr_spark.kernels.classify import classify_payload
from text_ocr_spark.kernels.extract import extract_payload, extract_plain
from text_ocr_spark.kernels.html import extract_html, tokenize_html
from text_ocr_spark.kernels.ocr_dump import extract_ocr
from text_ocr_spark.kernels.pdf import extract_pdf

LOREM = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo "
    "lima mike november oscar papa quebec romeo sierra tango uniform victor"
)  # 22 words, 132 token chars -> solid seed block


# ---- classifier ----------------------------------------------------------

def test_classify_priority():
    assert classify_payload(None, "web_fetch") == "empty"
    assert classify_payload("   \n ", None) == "empty"
    assert classify_payload("  ", None) == "empty"
    assert classify_payload("<p>x</p><p>y</p>", "ocr") == "html"  # sniffer wins
    assert (
        classify_payload("G 0.0 0.0 6.0 10.0 a\nG 6.0 0.0 6.0 10.0 b\nG 12.0 0.0 6.0 10.0 c", None)
        == "pdf"
    )
    assert classify_payload("a ﬁne day", "web_fetch") == "ocr"  # artifact wins
    assert classify_payload("plain words here", "ocr") == "ocr"  # hint breaks tie
    assert classify_payload("plain words here", "pdf_read") == "plain"
    assert classify_payload("plain words here", None) == "plain"


# ---- html ----------------------------------------------------------------

def test_html_tokenizer_offsets_and_entities():
    payload = '<p>AT&amp;T &lt;ok&gt;</p>'
    toks = tokenize_html(payload)
    assert [t.text for t in toks] == ["AT&T", "<ok>"]
    t0 = toks[0]
    assert payload[t0.start : t0.end] == "AT&amp;T"
    t1 = toks[1]
    assert payload[t1.start : t1.end] == "&lt;ok&gt;"


def test_html_script_style_invisible():
    toks = tokenize_html("<p>a</p><script>var x = 1;</script><style>.x{}</style><p>b</p>")
    assert [t.text for t in toks] == ["a", "b"]


def test_html_link_tokens_flagged():
    toks = tokenize_html('<p>keep <a href="/x">drop me</a> keep2</p>')
    assert [(t.text, t.link) for t in toks] == [
        ("keep", False),
        ("drop", True),
        ("me", True),
        ("keep2", False),
    ]


def test_html_extracts_content_drops_boilerplate():
    payload = (
        f'<nav><a href="/">home link</a><a href="/b">other link</a></nav>'
        f'<div class="content"><p>{LOREM}</p></div>'
        f'<footer><a href="/t">terms</a> short</footer>'
    )
    extracted, spans = extract_html(payload)
    assert extracted == LOREM
    assert len(spans) == 1
    s, e = spans[0]
    assert payload[s:e] == LOREM  # spans index the RAW payload


def test_html_two_regions_split_by_link_list():
    gap = '<ul><li><a href="/x">more stuff</a></li><li><a href="/y">ads here</a></li></ul>'
    payload = f"<p>{LOREM}</p>{gap}<p>{LOREM}</p>"
    extracted, spans = extract_html(payload)
    assert extracted == f"{LOREM}\n{LOREM}"
    assert len(spans) == 2
    assert spans == sorted(spans)


def test_html_empty_input():
    assert extract_html("") == ("", [])
    assert extract_html("<div></div>") == ("", [])


# ---- pdf -----------------------------------------------------------------

def _glyph_line(word: str, x: float, y: float) -> list[str]:
    out = []
    for i, ch in enumerate(word):
        out.append(f"G {x + 6.0 * i:.1f} {y:.1f} 6.0 10.0 {ch}")
    return out


def _pdf_payload() -> str:
    lines: list[str] = []
    lines += _glyph_line("page", 150.0, 0.0) + _glyph_line("9", 190.0, 0.0)
    # left column: 4 lines x 3 words; right column: same ys at x=400
    leftw = ["alpha", "bravo", "charl", "delta", "echos", "foxtr",
             "golfy", "hotel", "india", "julie", "kilos", "limas"]
    rightw = ["mikes", "novem", "oscar", "papas", "quebe", "romeo",
              "sierr", "tango", "unifo", "victo", "whisk", "xrays"]
    for col, wordlist in ((0.0, leftw), (400.0, rightw)):
        y = 40.0
        for li in range(4):
            x = col
            for w in wordlist[li * 3 : li * 3 + 3]:
                lines += _glyph_line(w, x, y)
                x += 6.0 * len(w) + 6.0
            y += 14.0
    lines += _glyph_line("footer", 150.0, 900.0)
    return "\n".join(lines)


def test_pdf_two_columns_reading_order():
    payload = _pdf_payload()
    extracted, spans = extract_pdf(payload)
    lines = extracted.split("\n")
    # left column lines first (top-to-bottom), then right column
    assert lines[0] == "alpha bravo charl"
    assert lines[3] == "julie kilos limas"
    assert lines[4] == "mikes novem oscar"
    assert lines[7] == "victo whisk xrays"
    assert "page" not in extracted and "footer" not in extracted  # noise dropped
    assert len(spans) == 2
    assert spans == sorted(spans)
    for s, e in spans:
        assert 0 <= s <= e <= len(payload)


def test_pdf_garbage_lines_ignored():
    assert extract_pdf("not a glyph dump\nat all") == ("", [])


# ---- ocr -----------------------------------------------------------------

def test_ocr_normalization_and_noise_block():
    block = (
        "tttable w​ord ﬁne day some more words here to pass "
        "the minimum token and char thresholds easily indeed "
        "certainly always tremendous quality"
    )
    payload = block + "\n\n* * * *"
    extracted, spans = extract_ocr(payload)
    assert extracted.startswith("table word fine day")
    assert "*" not in extracted
    assert len(spans) == 1
    s, e = spans[0]
    assert payload[s:e] == block


def test_ocr_crlf_and_nbsp():
    # 4-char words, no stutter triples: 120 token chars -> solid region
    words = ["wx%02d" % i for i in range(30)]
    payload = " ".join(words[:15]) + "\r\n" + " ".join(words[15:])
    extracted, _ = extract_ocr(payload)
    assert "\r" not in extracted and " " not in extracted
    assert extracted.split("\n")[0] == " ".join(words[:15])


# ---- plain / dispatch ----------------------------------------------------

def test_plain_identity_with_ws_normalization():
    extracted, spans = extract_plain("  hello   world \n\n again  ")
    assert extracted == "hello world\nagain"
    assert spans == [(2, 24)]


def test_extract_payload_total():
    assert extract_payload(None, None) == ("empty", "", [])
    assert extract_payload("", "ocr") == ("empty", "", [])
    kind, ex, spans = extract_payload("ok", None)
    assert (kind, ex, spans) == ("plain", "ok", [(0, 2)])


def test_spans_invariants_on_fixture(transcripts_tiny):
    for r in transcripts_tiny.itertuples(index=False):
        text = r.text
        kind, ex, spans = extract_payload(text, r.tool)
        if text is None:
            assert kind == "empty"
            continue
        prev_end = -1
        for s, e in spans:
            assert 0 <= s <= e <= len(text)
            assert s >= prev_end  # sorted, non-overlapping
            prev_end = e
        assert (ex == "") == (len(spans) == 0)
