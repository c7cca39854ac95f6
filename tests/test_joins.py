"""As-of join semantics + physical shape (sort-based, no pair
explosion)."""

from __future__ import annotations

import re

from tests.conftest import SF_TINY


def test_asof_matches_bruteforce(spark):
    from text_ocr_spark.ops.joins import purchases_asof_view

    ev = spark.read.parquet(f"{SF_TINY}/events.parquet").collect()
    views = {}
    for r in ev:
        if r.event_type == "view":
            views.setdefault(r.user_id, []).append((r.ts, r.event_id))
    expect = {}
    for r in ev:
        if r.event_type != "purchase":
            continue
        prior = [(t, i) for t, i in views.get(r.user_id, []) if t <= r.ts]
        if prior:
            expect[r.event_id] = max(prior)[1]  # latest ts, then max id
    got = {
        r.purchase_id: r.view_id
        for r in purchases_asof_view(spark, SF_TINY).collect()
    }
    assert got == expect
    assert len(got) > 0


def test_asof_is_sort_based(spark):
    """No pair-exploding join in the plan: a union + ONE exchange for
    the per-key window, no Join node at all."""
    from text_ocr_spark.ops.joins import purchases_asof_view

    df = purchases_asof_view(spark, SF_TINY)
    em = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    p = df._jdf.queryExecution().explainString(em)
    assert "Join" not in p
    assert len(re.findall(r"\(\d+\) Exchange", p)) <= 2  # window + dedupe agg


def test_asof_lag_nonnegative(spark):
    from text_ocr_spark.ops.joins import purchases_asof_view

    rows = purchases_asof_view(spark, SF_TINY).collect()
    assert all(r.lag_secs >= 0 for r in rows)


def test_range_join_matches_bruteforce(spark):
    from text_ocr_spark.ops.joins import purchase_error_window

    ev = spark.read.parquet(f"{SF_TINY}/events.parquet").collect()
    errors = {}
    for r in ev:
        if r.event_type == "error":
            errors.setdefault(r.user_id, []).append((r.ts, r.event_id))
    expect = set()
    from datetime import timedelta

    win = timedelta(seconds=21600)
    for r in ev:
        if r.event_type != "purchase":
            continue
        for t, eid in errors.get(r.user_id, []):
            if r.ts - win <= t <= r.ts + win:
                expect.add((r.event_id, eid))
    got = {
        (r.purchase_id, r.error_id)
        for r in purchase_error_window(spark, SF_TINY).collect()
    }
    assert got == expect
    assert len(got) > 0


def test_range_join_plan_is_equi_join(spark):
    """The bucketized range join plans as a hash equi-join on
    (key, bucket) — never a BroadcastNestedLoopJoin theta join."""
    from text_ocr_spark.ops.joins import purchase_error_window

    df = purchase_error_window(spark, SF_TINY)
    em = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    p = df._jdf.queryExecution().explainString(em)
    assert "NestedLoop" not in p and "CartesianProduct" not in p


def test_asof_carries_matched_row_atomically(spark):
    """A NULL payload field in the matched (latest prior) right row must
    come back NULL — never backfilled from an older right row
    (per-column last(ignorenulls) franken-row, ADVICE r1)."""
    from pyspark.sql import functions as F

    from text_ocr_spark.ops.joins import asof_join

    left = spark.createDataFrame(
        [("u1", 100, "L1")], "k string, ts long, lv string"
    )
    right = spark.createDataFrame(
        [("u1", 10, 1, "old-value"), ("u1", 50, 2, None)],
        "k string, ts long, rid int, payload string",
    )
    out = asof_join(
        left, right, on="k", left_ts="ts", right_ts="ts", right_tiebreak="rid"
    ).collect()
    assert len(out) == 1
    row = out[0]
    assert row.right_ts == 50 and row.right_rid == 2
    assert row.right_payload is None  # NOT "old-value"


def test_asof_null_right_ts_never_matches(spark):
    """A right row with NULL timestamp can never satisfy
    right_ts <= left_ts (DuckDB ASOF semantics): it must neither match
    nor shadow a real match (review r2 regression pin)."""
    from text_ocr_spark.ops.joins import asof_join

    left = spark.createDataFrame([("u1", 100, "L")], "k string, ts long, lv string")
    only_null = spark.createDataFrame(
        [("u1", None, 1, "x")], "k string, ts long, rid int, payload string"
    )
    out = asof_join(
        left, only_null, on="k", left_ts="ts", right_ts="ts", right_tiebreak="rid"
    ).collect()
    assert out == []  # no prior right row -> inner as-of drops the left
    mixed = spark.createDataFrame(
        [("u1", None, 9, "bogus"), ("u1", 50, 2, "real")],
        "k string, ts long, rid int, payload string",
    )
    out2 = asof_join(
        left, mixed, on="k", left_ts="ts", right_ts="ts", right_tiebreak="rid"
    ).collect()
    assert len(out2) == 1 and out2[0].right_rid == 2
    assert out2[0].right_payload == "real"
