"""Temporal join operators for training-data pipelines.

``asof_join`` is the point-in-time join (the "latest right row at or
before each left row" semantics feature stores need). The scalable
physical strategy is sort-based, not a range join:

    tag left/right -> unionByName -> ONE hash shuffle on the key ->
    per-key window ordered by (ts, side, tiebreak) carrying the last
    non-null right row forward -> keep left rows.

A naive ``left.join(right, key).filter(r.ts <= l.ts)`` explodes to all
(left x right) same-key pairs before aggregating; the union+window form
moves each row exactly once and never materializes pairs, so it
survives hot keys with millions of rows on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str,
    right_ts: str,
    right_tiebreak: str,
) -> DataFrame:
    """For each left row: the right row with the greatest
    ``right_ts <= left_ts`` for the same ``on`` key (ties on right_ts
    broken by max ``right_tiebreak`` — deterministic in both engines).
    Left rows with no prior right row are dropped (inner as-of,
    matching DuckDB's ASOF JOIN).

    Right columns come back with a ``right_`` prefix (except the key).
    """
    lcols = [c for c in left.columns if c not in (on, left_ts)]
    rcols = [c for c in right.columns if c != on]
    # dedupe right to one row per (key, ts): max tiebreak wins, and the
    # whole winning ROW is kept (struct max is lexicographic, tiebreak
    # first — never a per-column mix of different rows)
    others = [c for c in rcols if c != right_ts and c != right_tiebreak]
    r_latest = (
        right.groupBy(on, right_ts)
        .agg(
            F.max(
                F.struct(F.col(right_tiebreak), *[F.col(c) for c in others])
            ).alias("_packed")
        )
        .select(
            on,
            right_ts,
            F.col(f"_packed.{right_tiebreak}").alias(right_tiebreak),
            *[F.col(f"_packed.{c}").alias(c) for c in others],
        )
    )
    tagged_l = left.select(
        F.col(on),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"right_{c}") for c in rcols],
    )
    tagged_r = r_latest.select(
        F.col(on),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"right_{c}") for c in rcols],
    )
    u = tagged_l.unionByName(tagged_r)
    # right rows sort before left rows at equal ts: "at or before"
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.select(
        on,
        "_ts",
        "_side",
        *lcols,
        *[
            F.last(f"right_{c}", ignorenulls=True).over(w).alias(f"right_{c}")
            for c in rcols
        ],
    )
    return (
        carried.filter(F.col("_side") == 1)
        .filter(F.col(f"right_{right_ts}").isNotNull())
        .drop("_side")
        .withColumnRenamed("_ts", left_ts)
    )


def purchases_asof_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each purchase event: the same user's most recent view event
    at or before the purchase. -> (purchase_id, user_id,
    purchase_epoch, view_id, view_epoch, lag_secs)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_id"), "ts"
    )
    joined = asof_join(
        purchases,
        views,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_tiebreak="view_id",
    )
    return joined.select(
        "purchase_id",
        "user_id",
        F.unix_timestamp("ts").alias("purchase_epoch"),
        F.col("right_view_id").alias("view_id"),
        F.unix_timestamp("right_ts").alias("view_epoch"),
        (F.unix_timestamp("ts") - F.unix_timestamp("right_ts")).alias(
            "lag_secs"
        ),
    )
