"""Physical-plan introspection shared by the pytest plan gates
(tests/test_plans.py, tests/test_incremental.py) and the bench's
plan assertion (bench.py) — one copy of the formatted-explain recipe
and the Arrow-stage counting convention, so the gates cannot drift."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_str(df: DataFrame, mode: str = "formatted") -> str:
    spark = df.sparkSession
    em = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(em)


def count_arrow_stages(df: DataFrame) -> int:
    """Number of MapInPandas nodes in the formatted plan (each node's
    numbered detail header counted once)."""
    return len(re.findall(r"\(\d+\) MapInPandas", plan_str(df)))


def count_exchanges(df: DataFrame) -> int:
    """Number of Exchange nodes in the formatted plan (numbered detail
    headers, so ReuseExchange references are not double-counted)."""
    return len(re.findall(r"\(\d+\) Exchange", plan_str(df)))
