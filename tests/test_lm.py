"""LM-perplexity scoring (ops/lm.py — the CCNet LM-quality leg):
hand-computed toy models, unscored-edge discipline, tercile threshold
semantics, and the pure-JVM plan gate."""

from __future__ import annotations

import math

import pytest

from text_ocr_spark.ops.lm import LP_SCALE, lm_perplexity, lm_train


def _py_lp_micro(c2: int, c1: int, v: int) -> int:
    """Pure-Python replay of the fixed-point per-pair log-prob."""
    return int(round(math.log((c2 + 1) / (c1 + v)) * LP_SCALE))


@pytest.fixture(scope="module")
def toy(spark):
    # ref: "a b a b" + "b c"  ->  uni {a:2, b:3, c:1}, V = 3+1 = 4
    #      bigrams {(a,b):2, (b,a):1, (b,c):1}
    ref = spark.createDataFrame(
        [(100, "a b a b"), (101, "b c")], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [
            (1, "a b x"),        # (a,b) seen; (b,x) unseen bigram, seen head
            (2, "z q"),          # (z,q): unseen head word entirely
            (3, "a"),            # 1 token -> unscored
            (4, None),           # NULL -> unscored
            (5, "   "),          # whitespace-only -> unscored
            (6, "A  B"),         # lowercased + multi-space: the (a,b) pair
        ],
        "doc_id long, text string",
    )
    return ref, docs


def test_lm_train_counts(spark, toy):
    ref, _ = toy
    uni, bi, vocab = lm_train(ref)
    assert {r.w: r.c1 for r in uni.collect()} == {"a": 2, "b": 3, "c": 1}
    assert {(r.w1, r.w2): r.c2 for r in bi.collect()} == {
        ("a", "b"): 2,
        ("b", "a"): 1,
        ("b", "c"): 1,
    }
    assert vocab.collect()[0].v == 4


def test_lm_perplexity_hand_computed(spark, toy):
    ref, docs = toy
    out = {r.doc_id: r for r in lm_perplexity(docs, ref).collect()}
    V = 4
    lp_ab = _py_lp_micro(2, 2, V)   # (a,b): c2=2, c1(a)=2
    lp_bx = _py_lp_micro(0, 3, V)   # (b,x): unseen bigram, c1(b)=3
    lp_zq = _py_lp_micro(0, 0, V)   # (z,q): unseen head -> ln(1/V)

    d1 = out[1]
    assert d1.n_pairs == 2
    assert d1.n_unseen_bigrams == 1
    assert d1.sum_lp_micro == lp_ab + lp_bx
    assert d1.ce == round(-(lp_ab + lp_bx) / (2 * LP_SCALE), 6)

    d2 = out[2]
    assert d2.n_pairs == 1
    assert d2.n_unseen_bigrams == 1
    assert d2.sum_lp_micro == lp_zq
    assert d2.ce == round(-lp_zq / LP_SCALE, 6)

    # lowercasing + whitespace-run tokenizer: "A  B" scores as (a, b)
    d6 = out[6]
    assert d6.n_pairs == 1
    assert d6.sum_lp_micro == lp_ab
    assert d6.n_unseen_bigrams == 0


def test_lm_unscored_discipline(spark, toy):
    """1-token / NULL / whitespace-only docs: one output row each, zero
    sums, ce = 0.0, bucket 'unscored' — never NULL (gopher_filter's
    output contract)."""
    ref, docs = toy
    out = {r.doc_id: r for r in lm_perplexity(docs, ref).collect()}
    for did in (3, 4, 5):
        r = out[did]
        assert r.n_pairs == 0
        assert r.sum_lp_micro == 0
        assert r.n_unseen_bigrams == 0
        assert r.ce == 0.0
        assert r.ppl_bucket == "unscored"
    assert all(v is not None for r in out.values() for v in r)


def test_lm_tercile_thresholds(spark):
    """Buckets come from threshold cutoffs over the ce histogram: the
    best third scores 'head', ties share a bucket (threshold semantics,
    NOT ntile row-splitting)."""
    ref = spark.createDataFrame(
        [(0, "a b a b a b")], "doc_id long, text string"
    )
    # three ce levels: "a b" (seen pair, lowest ce) x2 docs, "b a"
    # (unseen bigram) x2, "z q" (oov) x2 — terciles split exactly
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "b a"), (4, "b a"), (5, "z q"), (6, "z q")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.ppl_bucket for r in lm_perplexity(docs, ref).collect()}
    assert out == {1: "head", 2: "head", 3: "middle", 4: "middle",
                   5: "tail", 6: "tail"}
    # all six tied -> cumulative count hits every cutoff at the single
    # distinct ce -> everyone lands in 'head' TOGETHER (no row split)
    docs_tied = spark.createDataFrame(
        [(i, "a b") for i in range(1, 7)], "doc_id long, text string"
    )
    tied = {r.doc_id: r.ppl_bucket for r in lm_perplexity(docs_tied, ref).collect()}
    assert set(tied.values()) == {"head"}


def test_lm_plan_is_pure_jvm(spark, toy):
    """No Python anywhere in the scoring plan: token explode, count
    aggs, model joins, histogram cutoffs are all JVM expressions (the
    model + cutoff frames ride broadcasts)."""
    ref, docs = toy
    plan = (
        lm_perplexity(docs, ref)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan
    assert "BroadcastExchange" in plan  # vocab + cutoff 1-row frames
