"""Skew semantics (SURVEY.md §5.2 layer 6): the hot conversation must
spread across tasks after salting, and no partition may dominate."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_TINY


def test_hot_conversation_spreads_over_salt_buckets(spark):
    from text_ocr_spark.pipeline import extract_corpus

    ex = extract_corpus(spark, SF_TINY, salt_buckets=16, num_partitions=16)
    parts = (
        ex.where(F.col("conv_id") == "conv-skew")
        .select("part_id")
        .distinct()
        .count()
    )
    # conv-skew has 100 turns; unsalted they'd collapse into ONE task.
    assert parts >= 8


def test_partition_balance_bounded(spark):
    from text_ocr_spark.pipeline import extract_corpus, lineage_metrics

    ex = extract_corpus(spark, SF_TINY, salt_buckets=16, num_partitions=8)
    m = lineage_metrics(ex, run_id="skew").toPandas()
    # max partition carries < 3x the mean (500 rows over 8 partitions)
    assert m.rows_out.max() < 3 * m.rows_out.mean()


def test_unsalted_would_collapse(spark):
    """Control: partitioning by conv_id alone sends the hot conversation
    to one task — documents why the salt exists."""
    from text_ocr_spark.pipeline import build_transcripts

    t = build_transcripts(spark, SF_TINY)
    one = (
        t.repartition(16, F.col("conv_id"))
        .withColumn("pid", F.spark_partition_id())
        .where(F.col("conv_id") == "conv-skew")
        .select("pid")
        .distinct()
        .count()
    )
    assert one == 1
