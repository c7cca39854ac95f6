"""Cleaning-family ops (pii_scrub / paragraph_dedup / repetition_stats):
the driver corpus is single-line per doc, so the multi-paragraph,
duplicate-heavy semantics are pinned here on constructed documents."""

from __future__ import annotations

import pytest

from tests.conftest import SF_TINY


@pytest.fixture(scope="module")
def messy(spark):
    rows = [
        (1, "contact me at a.user@example.com or 10.0.0.1 today"),
        (2, "alpha\n\nbeta\nalpha\n\n  \nbeta"),
        (3, "beta\nalpha\ngamma"),
        (4, ""),
        (5, "alpha\nalpha\nalpha"),
        (6, "mail x@y.io and x@y.io from 192.168.1.255"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pii_scrub_masks_and_counts(spark, messy):
    from text_ocr_spark.ops.cleaning import pii_scrub

    out = {r.doc_id: r for r in pii_scrub(messy).collect()}
    assert out[1].clean_text == "contact me at <EMAIL> or <IP> today"
    assert out[1].n_emails == 1 and out[1].n_ips == 1
    assert out[6].clean_text == "mail <EMAIL> and <EMAIL> from <IP>"
    assert out[6].n_emails == 2 and out[6].n_ips == 1
    assert out[4].n_emails == 0 and out[4].n_ips == 0
    assert out[2].clean_text == messy.where("doc_id=2").first().text


def test_paragraph_dedup_first_occurrence_wins(spark, messy):
    from text_ocr_spark.ops.cleaning import paragraph_dedup

    rows = {
        (r.doc_id, r.para_idx): (r.keep_doc, r.keep_idx, r.is_dup)
        for r in paragraph_dedup(messy).collect()
    }
    # doc 2: alpha(0) beta(1) alpha(2) beta(3) after trim/empty-drop
    assert rows[(2, 0)] == (2, 0, 0)  # first alpha anywhere
    assert rows[(2, 1)] == (2, 1, 0)  # first beta anywhere
    assert rows[(2, 2)] == (2, 0, 1)  # intra-doc duplicate alpha
    assert rows[(2, 3)] == (2, 1, 1)
    # doc 3: beta/alpha duplicate doc 2's; gamma is fresh
    assert rows[(3, 0)] == (2, 1, 1)
    assert rows[(3, 1)] == (2, 0, 1)
    assert rows[(3, 2)] == (3, 2, 0)
    # doc 4 (empty) contributes no rows
    assert not any(d == 4 for d, _ in rows)
    # doc 5: alpha x3, all dups of doc 2's first
    assert rows[(5, 0)] == (2, 0, 1)
    assert rows[(5, 1)] == (2, 0, 1)
    assert rows[(5, 2)] == (2, 0, 1)


def test_repetition_stats_fractions(spark, messy):
    from text_ocr_spark.ops.cleaning import repetition_stats

    out = {r.doc_id: r for r in repetition_stats(messy).collect()}
    # doc 5: 3 identical lines -> dup_line_frac = 1 - 1/3
    assert out[5].n_lines == 3 and out[5].n_distinct_lines == 1
    assert abs(out[5].dup_line_frac - round(1 - 1 / 3, 6)) < 1e-12
    # doc 2: lines alpha,beta,alpha,beta -> 4 lines 2 distinct
    assert out[2].n_lines == 4 and out[2].n_distinct_lines == 2
    assert out[2].dup_line_frac == 0.5
    # doc 2 paragraphs (blank-line split): 'alpha', 'beta\nalpha', 'beta'
    assert out[2].n_paras == 3 and out[2].n_distinct_paras == 3
    assert out[2].dup_para_frac == 0.0
    # empty doc: zeros, no NaN
    assert out[4].n_lines == 0 and out[4].dup_line_frac == 0.0


def test_cleaning_plans_stay_jvm_only(spark):
    """The whole family must plan without any Python stage."""
    from tests.test_plans import plan_str
    from text_ocr_spark.ops.cleaning import (
        paragraph_dedup,
        pii_scrub,
        repetition_stats,
    )

    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet")
    from text_ocr_spark.ops.cleaning import gopher_filter

    for df in (
        pii_scrub(docs),
        paragraph_dedup(docs),
        repetition_stats(docs),
        gopher_filter(docs),
    ):
        p = plan_str(spark, df)
        assert "MapInPandas" not in p
        assert "BatchEvalPython" not in p
        assert "ArrowEvalPython" not in p


def test_gopher_filter_verdicts(spark, messy):
    """Per-rule flags fire on constructed documents, keep is their
    conjunction, and signal columns agree with the standalone ops
    (repetition_stats fractions, quality_score token counts)."""
    from text_ocr_spark.ops.cleaning import gopher_filter, repetition_stats
    from text_ocr_spark.ops.text_stats import quality_score

    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet")
    out = {r.doc_id: r for r in gopher_filter(docs).collect()}
    assert len(out) == docs.count()
    # both verdicts occur on the real corpus (thresholds discriminate)
    keeps = sum(r.keep for r in out.values())
    assert 0 < keeps < len(out)
    # keep == no rule failed
    for r in out.values():
        fails = (r.fail_tokens + r.fail_tok_len + r.fail_stop
                 + r.fail_dup_line + r.fail_dup_para)
        assert r.keep == (1 if fails == 0 else 0)
    # signal agreement with the standalone ops
    rep = {r.doc_id: r for r in repetition_stats(docs).collect()}
    qs = {r.doc_id: r for r in quality_score(docs).collect()}
    for did, r in out.items():
        assert r.dup_line_frac == rep[did].dup_line_frac
        assert r.dup_para_frac == rep[did].dup_para_frac
        assert r.n_tokens == qs[did].n_tokens

    # constructed cases: repetition + short-doc rules actually fire
    messy_out = {r.doc_id: r for r in gopher_filter(messy).collect()}
    assert messy_out[5].fail_dup_line == 1  # "alpha\nalpha\nalpha"
    assert messy_out[4].fail_tokens == 1  # empty doc
    assert all(r.keep == 0 for r in messy_out.values())  # all tiny docs

    # NULL text (ADVICE r3): flags and keep must be DEFINED (0/1, never
    # NULL) — a quarantine filter on keep == 0 has to catch null docs
    import pandas as pd

    nulls = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1], "text": [None, "x"]}).astype(
            {"doc_id": "int64", "text": "object"}
        )
    )
    nr = {r.doc_id: r for r in gopher_filter(nulls).collect()}
    assert nr[0].keep == 0 and nr[0].fail_tokens == 1 and nr[0].fail_stop == 1
    assert all(
        getattr(nr[0], c) is not None
        for c in (
            "n_tokens", "mean_tok_len", "n_stop_hits", "dup_line_frac",
            "dup_para_frac", "fail_tokens", "fail_tok_len", "fail_stop",
            "fail_dup_line", "fail_dup_para", "keep",
        )
    )


def test_curate_corpus_composition(spark):
    """extract -> scrub -> quality floor -> dedup composes into ONE DAG:
    single Arrow stage (the extraction), everything downstream JVM-side;
    kept rows obey the floor and are hash-unique. Runs at sf0.01: the
    tiny corpus has no duplicate extracted turns, so only sf0.01
    actually exercises the dedup stage."""
    from tests.conftest import SF_SMALL
    from tests.test_plans import plan_str
    from text_ocr_spark.ops.curate import MIN_TOKENS_KEEP, curate_corpus

    df = curate_corpus(spark, SF_SMALL)
    p = plan_str(spark, df)
    import re

    assert len(re.findall(r"\(\d+\) MapInPandas", p)) == 1
    rows = df.collect()
    assert 0 < len(rows) < 500  # filtering actually dropped turns
    assert all(r.n_tokens >= MIN_TOKENS_KEEP for r in rows)
    # first-occurrence dedup REALLY deduped: kept-row count must equal
    # the number of DISTINCT extracted texts among quality-passing turns
    # (deleting the row_number stage would fail this)
    from pyspark.sql import functions as F

    from text_ocr_spark.pipeline import extract_corpus

    base = (
        extract_corpus(spark, SF_SMALL)
        .filter(F.length("extracted") > 0)
        .filter(
            F.size(F.split(F.trim("extracted"), r"[ \t\n\f\r]+"))
            >= MIN_TOKENS_KEEP
        )
    )
    n_base = base.count()
    n_distinct = base.select("extracted").distinct().count()
    assert n_distinct < n_base  # the corpus genuinely contains dup turns
    assert len(rows) == n_distinct


# ---------------------------------------------------------------------------
# c4_line_filter
# ---------------------------------------------------------------------------


def test_c4_line_rules(spark):
    """Each line rule independently: terminal punct, >= 5 words,
    no 'javascript' (case-insensitive)."""
    from text_ocr_spark.ops.cleaning import c4_line_filter

    good = "alpha beta gamma delta epsilon."
    doc = "\n".join(
        [
            good,  # kept
            "alpha beta gamma delta epsilon",  # no terminal punct
            "alpha beta gamma.",  # < 5 words
            "alpha beta gamma delta JavaScript here.",  # javascript
            'quoted alpha beta gamma delta epsilon"',  # end quote kept
            "ends bang alpha beta gamma delta!",  # bang kept
        ]
    )
    df = spark.createDataFrame([(1, doc)], "doc_id long, text string")
    r = c4_line_filter(df).collect()[0]
    assert r.n_lines_total == 6
    assert r.n_lines_kept == 3
    assert r.keep_doc == 1
    assert r.clean_text.split("\n") == [
        good,
        'quoted alpha beta gamma delta epsilon"',
        "ends bang alpha beta gamma delta!",
    ]


def test_c4_doc_rules(spark):
    """Doc gate: >= 3 kept lines, no 'lorem ipsum', no '{' — and the
    brace/lorem checks run against the WHOLE doc, even dropped lines."""
    from text_ocr_spark.ops.cleaning import c4_line_filter

    l1 = "alpha beta gamma delta epsilon."
    three = "\n".join([l1] * 3)
    rows = [
        (1, three),  # keep
        (2, "\n".join([l1] * 2)),  # only 2 kept lines
        (3, three + "\nLorem Ipsum dolor."),  # lorem ipsum anywhere
        (4, three + "\nvar x = {"),  # brace in a dropped line
        (5, None),  # NULL -> keep_doc 0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.keep_doc for r in c4_line_filter(df).collect()}
    assert got == {1: 1, 2: 0, 3: 0, 4: 0, 5: 0}
    null_row = [
        r for r in c4_line_filter(df).collect() if r.doc_id == 5
    ][0]
    assert (null_row.clean_text, null_row.n_lines_kept) == ("", 0)


def test_c4_plan_is_zero_exchange_jvm(spark, tmp_path):
    from text_ocr_spark.ops.cleaning import c4_line_filter

    p = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon.")], "doc_id long, text string"
    ).write.parquet(p)
    plan = (
        c4_line_filter(spark.read.parquet(p))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan


def test_c4_handles_crlf_documents(spark):
    """CRLF (Windows) docs split cleanly: no trailing \\r survives to
    fail the terminal-punctuation rule or pad the word count."""
    from text_ocr_spark.ops.cleaning import c4_line_filter

    l1 = "alpha beta gamma delta epsilon."
    crlf = ("\r\n").join([l1] * 3) + "\r\n"
    df = spark.createDataFrame([(1, crlf)], "doc_id long, text string")
    r = c4_line_filter(df).collect()[0]
    assert r.n_lines_kept == 3
    assert r.keep_doc == 1
    assert r.clean_text == "\n".join([l1] * 3)


def test_c4_handles_tab_edged_lines(spark):
    """Edge whitespace beyond spaces (tabs, form feeds) must neither
    defeat the terminal-punctuation rule (trailing tab on a clean
    line) nor inflate the word count (leading tab adding a phantom ''
    word): the 4-word line stays dropped and the 5-word tab-wrapped
    line stays kept."""
    from text_ocr_spark.ops.cleaning import c4_line_filter

    good = "\talpha beta gamma delta epsilon.\t"   # 5 words, tab-wrapped
    short = "\tfoo bar baz qux."                    # 4 words + leading tab
    doc = "\n".join([good, good, good, short])
    df = spark.createDataFrame([(1, doc)], "doc_id long, text string")
    r = c4_line_filter(df).collect()[0]
    assert r.n_lines_kept == 3          # short line dropped (4 < 5 words)
    assert r.keep_doc == 1              # trailing tabs don't hide the '.'
    assert r.clean_text == "\n".join([good] * 3)  # kept lines verbatim


def test_gopher_keep_expr_equals_gopher_filter(spark):
    """The inline gate expression (used by pretrain_pipeline's stage 1
    as a FILTER) must agree with gopher_filter's keep verdict on every
    doc, NULLs included."""
    from pyspark.sql import functions as F

    from text_ocr_spark.ops.cleaning import gopher_filter, gopher_keep_expr

    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet")
    want = {
        r.doc_id for r in gopher_filter(docs).where("keep = 1").collect()
    }
    got = {
        r.doc_id
        for r in docs.select("doc_id", "text").where(gopher_keep_expr()).collect()
    }
    assert got == want and len(want) > 0


def test_pretrain_pipeline_segment_plans(spark):
    """Capstone plan gates (VERDICT r4 item 4): each stage segment, as
    built over the previous stage's barrier, keeps its Arrow-stage and
    exchange budget — in particular the extraction Arrow stage appears
    exactly ONCE in the whole pipeline (stage 1), and the
    selection/packing segment is entirely JVM."""
    from pyspark.sql import functions as F

    from text_ocr_spark.ops.curate import (
        _pretrain_clean,
        _pretrain_gate,
        _pretrain_select_pack,
        _pretrain_strip,
    )
    from text_ocr_spark.plans import count_arrow_stages, count_exchanges

    gate = _pretrain_gate(spark, SF_TINY)
    assert count_arrow_stages(gate) == 1  # the extraction, fused once
    assert count_exchanges(gate) <= 2     # the salted exchange

    gated = gate.localCheckpoint(eager=False)
    strip = _pretrain_strip(gated)
    assert count_arrow_stages(strip) == 0  # span surgery is pure JVM
    assert count_exchanges(strip) <= 6

    stripped = strip.localCheckpoint(eager=False)
    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet")
    clean = _pretrain_clean(
        stripped, docs.where("doc_id % 13 = 0").select("doc_id", "text")
    )
    # dedup's verified pairs + decontamination's near arm: bounded
    # Arrow work (the tile/GEMM kernels), never per-row Python
    assert count_arrow_stages(clean) <= 3
    assert count_exchanges(clean) <= 32
    assert "BatchEvalPython" not in _plan(clean)

    cleaned = clean.localCheckpoint(eager=False)
    final = _pretrain_select_pack(
        cleaned,
        docs.where("doc_id % 11 = 0").select("doc_id", "text"),
        dsir_k=32,
        max_tokens=512,
    )
    assert count_arrow_stages(final) == 0  # selection/packing pure JVM
    assert count_exchanges(final) <= 32


def _plan(df):
    from text_ocr_spark.plans import plan_str

    return plan_str(df)


def test_pretrain_pipeline_deterministic_and_packed(spark):
    """End-to-end capstone at tiny SF: deterministic across runs and
    partitioning noise (the barriers are purely physical), shards obey
    the token-budget contract, selection size = min(k, survivors)."""
    from text_ocr_spark.ops.curate import pretrain_pipeline

    a = pretrain_pipeline(spark, SF_TINY, dsir_k=64, max_tokens=512)
    ra = sorted(map(tuple, a.collect()))
    b = pretrain_pipeline(spark, SF_TINY, dsir_k=64, max_tokens=512)
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb and 0 < len(ra) <= 64
    # shard budget: exclusive prefix sum in doc_id order, so every
    # shard except possibly the last holds >= 1 doc and crosses the
    # boundary by at most one doc
    rows = sorted(ra)
    cum = 0
    for doc_id, conv_id, turn_idx, n_tokens, shard_id in rows:
        assert shard_id == cum // 512
        cum += n_tokens
