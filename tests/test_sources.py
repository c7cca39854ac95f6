"""Multi-format transcript ingestion returns the declared input_hint
schema regardless of storage format (SURVEY.md §2.A entry family)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_TINY

EXPECT_TYPES = {
    "conv_id": "string",
    "turn_idx": "int",
    "role": "string",
    "text": "string",
    "tool": "string",
    "ts": "timestamp",
}


def _transcripts(spark):
    from text_ocr_spark.pipeline import build_transcripts

    return build_transcripts(spark, SF_TINY)


def _types(df):
    return {f.name: f.dataType.simpleString() for f in df.schema.fields}


@pytest.mark.parametrize("fmt", ["parquet", "json", "csv"])
def test_roundtrip_formats(spark, tmp_path, fmt):
    from text_ocr_spark.sources import read_transcripts

    src = _transcripts(spark)
    path = str(tmp_path / f"t.{fmt}")
    w = src.coalesce(2).write.mode("overwrite")
    if fmt == "parquet":
        w.parquet(path)
    elif fmt == "json":
        w.json(path)
    else:
        w.option("header", "true").option("escape", '"').option(
            "timestampFormat", "yyyy-MM-dd'T'HH:mm:ssXXX"
        ).csv(path)

    back = read_transcripts(spark, path, fmt=fmt)
    assert _types(back) == EXPECT_TYPES
    # csv cannot represent "" vs null; compare on the stable key + ts
    got = sorted(
        (r.conv_id, r.turn_idx, r.role, r.ts) for r in back.collect()
    )
    want = sorted(
        (r.conv_id, r.turn_idx, r.role, r.ts) for r in src.collect()
    )
    assert got == want
    if fmt != "csv":
        gt = sorted((r.conv_id, r.turn_idx, r.text) for r in back.collect())
        wt = sorted((r.conv_id, r.turn_idx, r.text) for r in src.collect())
        assert gt == wt


def test_unknown_format_rejected(spark):
    from text_ocr_spark.sources import read_transcripts

    with pytest.raises(ValueError, match="unsupported transcript format"):
        read_transcripts(spark, "/nonexistent", fmt="orc2")


def test_iceberg_gated(spark):
    """No iceberg runtime in this sandbox -> clear actionable error."""
    from text_ocr_spark.sources import read_transcripts_iceberg

    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        read_transcripts_iceberg(spark, "cat.db.transcripts")


def test_bucketed_join_skips_exchange(spark, tmp_path):
    """Two tables bucketed on the same key join WITHOUT shuffling either
    side — the write-time co-location that a 100 TB conv_id join needs."""
    import re

    from pyspark.sql import functions as F

    from text_ocr_spark.pipeline import extract_corpus
    from text_ocr_spark.sources import write_bucketed

    ex = extract_corpus(spark, SF_TINY, num_partitions=4)
    left = ex.select("conv_id", "turn_idx", "kind")
    right = ex.groupBy("conv_id").agg(F.count("*").alias("n_turns"))
    write_bucketed(left, "bkt_left", str(tmp_path / "l"), n_buckets=8)
    write_bucketed(right, "bkt_right", str(tmp_path / "r"), n_buckets=8)
    try:
        # hint("merge"): at fixture scale AQE prefers broadcasting the
        # tiny side (which also never shuffles); force the sort-merge
        # path to show the bucketed layout carries the join keys
        joined = spark.table("bkt_left").hint("merge").join(
            spark.table("bkt_right"), "conv_id"
        )
        em = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        p = joined._jdf.queryExecution().explainString(em)
        assert re.search(r"\(\d+\) SortMergeJoin", p)
        assert not re.search(r"\(\d+\) Exchange", p)  # co-located: no shuffle
        # and the result is right
        assert joined.count() == spark.table("bkt_left").count()
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_left")
        spark.sql("DROP TABLE IF EXISTS bkt_right")
