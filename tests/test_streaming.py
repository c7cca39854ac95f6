"""Streaming surface: stream == batch for the stateless per-turn
transform (the reference's camera path reuses the gallery pipeline), and
watermarked windows emit once the watermark passes."""

from __future__ import annotations

from tests.conftest import SF_TINY


def _write_transcript_parquet(spark, path: str, n_files: int = 4) -> None:
    from text_ocr_spark.pipeline import build_transcripts

    build_transcripts(spark, SF_TINY).repartition(n_files).write.mode(
        "overwrite"
    ).parquet(path)


def test_stream_extract_equals_batch(spark, tmp_path):
    from text_ocr_spark.pipeline import build_transcripts, extract_transcripts
    from text_ocr_spark.streaming import stream_extract

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _write_transcript_parquet(spark, src)

    q = stream_extract(spark, src, out, ckpt, num_partitions=4)
    q.awaitTermination(120)

    cols = ["conv_id", "turn_idx", "kind", "extracted", "spans_json"]
    got = sorted(
        tuple(r) for r in spark.read.parquet(out).select(*cols).collect()
    )
    want = sorted(
        tuple(r)
        for r in extract_transcripts(
            build_transcripts(spark, SF_TINY), num_partitions=4
        )
        .select(*cols)
        .collect()
    )
    assert got == want


def test_stream_resume_is_incremental(spark, tmp_path):
    """Restarting against the same checkpoint reprocesses nothing."""
    from text_ocr_spark.streaming import stream_extract

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _write_transcript_parquet(spark, src)

    stream_extract(spark, src, out, ckpt, num_partitions=4).awaitTermination(120)
    n1 = spark.read.parquet(out).count()
    stream_extract(spark, src, out, ckpt, num_partitions=4).awaitTermination(120)
    assert spark.read.parquet(out).count() == n1  # no duplicate epochs


def test_windowed_turn_rates(spark, tmp_path):
    from pyspark.sql import functions as F

    from text_ocr_spark.pipeline import build_transcripts
    from text_ocr_spark.streaming import stream_turn_rates, turn_rates

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _write_transcript_parquet(spark, src)

    q = stream_turn_rates(spark, src, out, ckpt)
    q.awaitTermination(120)

    got = spark.read.parquet(out)
    # batch computation of the same windowed agg over the same input
    want = turn_rates(build_transcripts(spark, SF_TINY))
    gk = {
        (r.window_start, r.role, r.n_turns, r.sum_chars) for r in got.collect()
    }
    wk = {
        (r.window_start, r.role, r.n_turns, r.sum_chars) for r in want.collect()
    }
    # append mode only emits windows the watermark has passed; with
    # availableNow the final watermark closes all-but-the-latest windows
    assert gk <= wk
    assert len(gk) >= len(wk) - 3
    assert got.agg(F.sum("n_turns")).first()[0] > 0


def test_epoch_write_is_idempotent(spark, tmp_path):
    """Replaying a micro-batch (same epoch_id) must replace, not
    duplicate — the checkpoint-retry failure path."""
    from pyspark.sql import functions as F

    from text_ocr_spark.streaming import write_epoch

    out_dir = str(tmp_path / "sink")
    df = spark.range(10).select(
        F.col("id"), F.lit(0).alias("epoch_id")
    )
    write_epoch(df, out_dir)
    write_epoch(df, out_dir)  # the retry
    assert spark.read.parquet(out_dir).count() == 10
    # a NEW epoch appends rather than clobbering earlier epochs
    write_epoch(
        spark.range(5).select(F.col("id"), F.lit(1).alias("epoch_id")),
        out_dir,
    )
    assert spark.read.parquet(out_dir).count() == 15


def test_conversation_state_persists_across_batches(spark, tmp_path):
    """applyInPandasWithState: state must carry between micro-batches —
    a conversation split across batches emits increasing snapshots whose
    LAST value equals the batch ground truth."""
    from pyspark.sql import functions as F

    from text_ocr_spark.pipeline import build_transcripts
    from text_ocr_spark.streaming import conversation_state_stream

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    tr = build_transcripts(spark, "/root/testdata/sf0.001")
    # 16 files with maxFilesPerTrigger=8 -> at least 2 micro-batches
    tr.repartition(16).write.mode("overwrite").parquet(src)
    q = conversation_state_stream(spark, src, out, ckpt)
    q.awaitTermination(300)

    snap = spark.read.parquet(out)
    final = (
        snap.groupBy("conv_id")
        .agg(
            F.max("n_turns").alias("n_turns"),
            F.max("sum_chars").alias("sum_chars"),
            F.count("*").alias("n_snapshots"),
        )
    )
    truth = tr.groupBy("conv_id").agg(
        F.count("*").alias("t_turns"),
        F.sum(F.length("text")).alias("t_chars"),
    )
    j = final.join(truth, "conv_id").collect()
    assert len(j) == 51  # every conversation surfaced
    for r in j:
        assert r.n_turns == r.t_turns, r
        assert r.sum_chars == r.t_chars, r
    # state actually crossed a batch boundary for at least one conv
    assert any(r.n_snapshots >= 2 for r in j)
