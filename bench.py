"""Headline benchmark — prints ONE JSON line.

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 python bench.py

Queries timed (post-warmup of the Spark session):
- extract:      the flagship transcript extraction pipeline (turns/sec is
                the north-star metric; corpus replicated x REPEAT so python
                work dominates JVM fixed costs)
- dedup_minhash: MinHash LSH + verified jaccard over documents
- knn_topk:     brute-force cosine top-k over embeddings
- q1:           TPC-H Q1 shape over lineitem
- token_stats:  JVM-only text analysis sweep
- curate:       the end-to-end capstone (extract -> scrub -> quality
                floor -> first-occurrence dedup in ONE DAG); its
                single-Arrow-stage plan is re-asserted at bench scale
                before timing

Env knobs: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_REPEAT (default
4), SPARK_GRAFT_PARTITIONS (default 4x cpus).
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    repeat = int(os.environ.get("SPARK_GRAFT_REPEAT", "16"))
    partitions = int(os.environ.get("SPARK_GRAFT_PARTITIONS", str(cpus * 2)))
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")

    from pyspark.sql import functions as F

    from text_ocr_spark.ops.curate import curate_corpus
    from text_ocr_spark.ops.dedup import minhash_dedup
    from text_ocr_spark.ops.relational import q1_pricing_summary
    from text_ocr_spark.ops.similarity import brute_topk
    from text_ocr_spark.ops.text_stats import token_stats
    from text_ocr_spark.pipeline import extract_corpus, session_builder

    spark = (
        session_builder(master=f"local[{cpus}]", app="text_ocr_spark-bench")
        .config("spark.sql.shuffle.partitions", str(partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "48g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm up the JVM AND the Python workers (each core's worker imports
    # numpy/pandas/the engine on first use) so per-query times measure
    # steady-state throughput — the regime a long-running job lives in
    spark.range(1000).select(F.sum("id")).collect()
    import pandas as _pd

    def _noop(batches):
        import text_ocr_spark.kernels.extract  # noqa: F401
        for b in batches:
            yield _pd.DataFrame({"id": b["id"]})

    spark.range(cpus * 4).repartition(cpus * 4).mapInPandas(
        _noop, schema="id long"
    ).count()
    # one un-replicated pass primes scan/codegen/AQE codepaths so timed
    # queries report steady-state throughput (extract_job does the same)
    extract_corpus(spark, sf_dir, repeat=1, num_partitions=partitions).count()

    timings: dict[str, float] = {}
    extra: dict[str, float] = {}

    def timed(name: str, fn) -> None:
        # best of 2: this guest shows ~20% run-to-run swings (hypervisor
        # neighbors); the better pass reports the job's capability, the
        # worse one the host's mood (BENCH/BASELINE.md protocol)
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            result = fn()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)
        if isinstance(result, dict):
            extra.update(result)

    def run_extract():
        out = extract_corpus(spark, sf_dir, repeat=repeat, num_partitions=partitions)
        n = out.count()
        return {"turns": n}

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    # plan gate at BENCH scale: the curate capstone must still be one
    # exchange + one Arrow stage here, not just at the pytest SF
    from text_ocr_spark.plans import count_arrow_stages

    n_arrow = count_arrow_stages(curate_corpus(spark, sf_dir))
    if n_arrow != 1:
        raise RuntimeError(
            f"curate plan regressed: {n_arrow} Arrow stages (want 1)"
        )

    timed("extract", run_extract)
    timed("dedup_minhash", lambda: minhash_dedup(docs).count())
    timed("knn_topk", lambda: brute_topk(emb).count())
    timed("q1", lambda: q1_pricing_summary(spark, sf_dir).count())
    timed("token_stats", lambda: token_stats(docs).count())
    timed("curate", lambda: curate_corpus(spark, sf_dir).count())

    total = round(sum(timings.values()), 3)
    turns_per_sec = round(extra.get("turns", 0) / max(timings["extract"], 1e-9), 1)
    print(
        json.dumps(
            {
                "metric": "bench_total_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cpus": cpus,
                "repeat": repeat,
                "turns": int(extra.get("turns", 0)),
                "turns_per_sec": turns_per_sec,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
