"""Error-bound gates for the sketch aggregate twins (VERDICT r2 item 4).

Sketches cannot be hash-exact against a SQL oracle; the honest contract
is their published error bound, asserted here against the EXACT result
at sf0.1 (the bench scale — big enough that the sketch actually
compresses, per the scale-only-bug protocol).
"""

from __future__ import annotations

import pytest

SF_BENCH = "/root/testdata/sf0.1"


@pytest.fixture(scope="module")
def sketch_and_exact(spark):
    from pyspark.sql import functions as F

    from text_ocr_spark.ops.relational import (
        SKETCH_ACCURACY,
        events_quantiles_sketch,
    )

    sketch = {
        r.event_type: r.asDict()
        for r in events_quantiles_sketch(spark, SF_BENCH).collect()
    }
    # exact rank-window bounds: percentile_approx guarantees the returned
    # ELEMENT's rank is within n/accuracy of the target; the exact
    # percentile() is linearly INTERPOLATED between elements, so widen
    # the window by one extra rank (1e-4 covers rank+-1 for n >= 10^4)
    eps = 1.0 / SKETCH_ACCURACY + 1e-4
    aggs = [F.count("*").alias("n")]
    for q in (0.5, 0.9, 0.99):
        lo, hi = max(0.0, q - eps), min(1.0, q + eps)
        tag = str(int(q * 100))
        aggs.append(F.expr(f"percentile(value, {lo})").alias(f"lo{tag}"))
        aggs.append(F.expr(f"percentile(value, {hi})").alias(f"hi{tag}"))
    ev = spark.read.parquet(f"{SF_BENCH}/events.parquet")
    exact = {
        r.event_type: r.asDict()
        for r in ev.groupBy("event_type").agg(*aggs).collect()
    }
    # true distinct-user counts (exact, for the HLL bound)
    true_users = {
        r.event_type: r.n_users
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .collect()
    }
    return sketch, exact, true_users


def test_percentile_sketch_within_rank_bound(sketch_and_exact):
    sketch, exact, _ = sketch_and_exact
    assert set(sketch) == set(exact) and len(sketch) >= 3
    for et, srow in sketch.items():
        erow = exact[et]
        assert srow["n"] == erow["n"]  # the exact face matches
        for tag in ("50", "90", "99"):
            val = srow[f"p{tag}_sketch"]
            assert erow[f"lo{tag}"] <= val <= erow[f"hi{tag}"], (
                et, tag, val, erow[f"lo{tag}"], erow[f"hi{tag}"],
            )


def test_hll_user_sketch_within_rsd_bound(sketch_and_exact):
    from text_ocr_spark.ops.relational import SKETCH_RSD

    sketch, _, true_users = sketch_and_exact
    for et, srow in sketch.items():
        truth = true_users[et]
        assert truth > 0
        rel_err = abs(srow["n_users_sketch"] - truth) / truth
        assert rel_err <= 4 * SKETCH_RSD, (et, srow["n_users_sketch"], truth)
