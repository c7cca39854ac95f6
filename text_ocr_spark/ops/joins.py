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

    The matched right row is carried ATOMICALLY: one
    ``last(struct(<right cols>), ignorenulls=True)`` over the window,
    unpacked after. Carrying each right column through its own
    last(ignorenulls) would backfill a NULL payload field from an OLDER
    right row — a silent franken-row for nullable right columns
    (ADVICE r1).
    """
    from pyspark.sql.types import StructType

    lcols = [c for c in left.columns if c not in (on, left_ts)]
    rcols = [c for c in right.columns if c != on]
    # dedupe right to one row per (key, ts): max tiebreak wins, and the
    # whole winning ROW is kept (struct max is lexicographic, tiebreak
    # first — never a per-column mix of different rows)
    others = [c for c in rcols if c != right_ts and c != right_tiebreak]
    # a NULL-timestamp right row can never satisfy right_ts <= left_ts
    # (DuckDB ASOF semantics); dropped up front so NULL _ts can't sort
    # first in the window and get carried as a bogus match
    right = right.where(F.col(right_ts).isNotNull())
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
    r_struct_type = StructType([right.schema[c] for c in rcols])
    tagged_l = left.select(
        F.col(on),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in lcols],
        F.lit(None).cast(r_struct_type).alias("_r"),
    )
    tagged_r = r_latest.select(
        F.col(on),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        F.struct(*[F.col(c) for c in rcols]).alias("_r"),
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
        F.last("_r", ignorenulls=True).over(w).alias("_r"),
    )
    return (
        carried.filter(F.col("_side") == 1)
        .filter(F.col("_r").isNotNull())
        .select(
            on,
            F.col("_ts").alias(left_ts),
            *lcols,
            *[F.col(f"_r.{c}").alias(f"right_{c}") for c in rcols],
        )
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str,
    right_ts: str,
    lower_s: int,
    upper_s: int,
) -> DataFrame:
    """Same-key pairs with ``right_ts`` in ``[left_ts+lower_s,
    left_ts+upper_s]`` (inclusive), without a pair-exploding theta join.

    Physical strategy: bucketize time at width = window span; each left
    row explodes to the <= 2 buckets its window can touch, right rows
    keep their own bucket, the join runs on (key, bucket) equality —
    Catalyst plans a plain hash join — and the exact interval predicate
    filters after. Join fan-out is bounded by real temporal locality,
    never |left| x |right| per key.

    Right columns return with a ``right_`` prefix (except the key).
    """
    width = upper_s - lower_s
    if width <= 0:
        raise ValueError("upper_s must exceed lower_s")
    w = F.lit(int(width))
    lcols = [c for c in left.columns if c != on]
    rcols = [c for c in right.columns if c != on]

    # second-truncated bucketing (unix_timestamp works on NTZ and is
    # session-TZ-proof there); whole-second bounds keep the <=2-bucket
    # coverage property under truncation
    lo_bucket = F.floor((F.unix_timestamp(F.col(left_ts)) + F.lit(lower_s)) / w)
    hi_bucket = F.floor((F.unix_timestamp(F.col(left_ts)) + F.lit(upper_s)) / w)
    l = left.withColumn(
        "_bucket",
        F.explode(F.array_distinct(F.array(lo_bucket, hi_bucket))),
    )
    r = right.select(
        F.col(on),
        F.floor(F.unix_timestamp(F.col(right_ts)) / w).alias("_bucket"),
        *[F.col(c).alias(f"right_{c}") for c in rcols],
    )
    joined = l.join(r, [on, "_bucket"]).drop("_bucket")
    rt = F.col(f"right_{right_ts}")
    lt = F.col(left_ts)
    return joined.filter(
        (rt >= lt + F.expr(f"INTERVAL {lower_s} SECONDS"))
        & (rt <= lt + F.expr(f"INTERVAL {upper_s} SECONDS"))
    ).select(on, *lcols, *[f"right_{c}" for c in rcols])


def purchase_error_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: error events within +-6h of each purchase, same user.
    -> (purchase_id, error_id, user_id, delta_secs)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), "ts"
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", F.col("event_id").alias("error_id"), "ts"
    )
    j = range_join(
        purchases,
        errors,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        lower_s=-21600,
        upper_s=21600,
    )
    return j.select(
        "purchase_id",
        F.col("right_error_id").alias("error_id"),
        "user_id",
        (F.unix_timestamp("right_ts") - F.unix_timestamp("ts")).alias(
            "delta_secs"
        ),
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


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | list[str],
    *,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join immune to hot keys (SURVEY.md §2.H): each big-side row
    gets a per-row salt, the small side replicates across every salt
    value, and the join keys on (key..., salt) — so one hot key's rows
    spread over ``salt_buckets`` tasks instead of collapsing into one.

    Result set is IDENTICAL to the plain join (each big row still meets
    each matching small row exactly once, under its own salt), so the
    salt values themselves may be arbitrary; they come from a row-id
    hash purely to spread uniformly even when a hot key's rows are
    byte-identical. Use where AQE's skew-join can't help: non-AQE
    paths, streaming micro-batch joins, or when the small side is too
    big to broadcast but small enough to replicate salt_buckets x.

    ``how`` supports inner/left (right/full would need null-extension
    handling per salt and are refused).
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if salt_buckets < 1:
        # pmod(x, 0) is NULL and sequence(0, -1) descends: 0 buckets
        # would silently produce an empty/all-null join
        raise ValueError(f"salt_buckets must be >= 1, got {salt_buckets}")
    sc = "__salted_join_salt"
    if sc in big.columns or sc in small.columns:
        raise ValueError(f"inputs must not already carry a {sc!r} column")
    keys = [on] if isinstance(on, str) else list(on)
    b = big.withColumn(
        sc,
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets)),
    )
    s = small.withColumn(
        sc,
        F.explode(
            F.sequence(F.lit(0), F.lit(salt_buckets - 1)).cast("array<long>")
        ),
    )
    return b.join(s, [*keys, sc], how).drop(sc)
