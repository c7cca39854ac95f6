"""Cross-corpus decontamination: flag training documents that leak an
evaluation/test document — the train/test-overlap removal step every
LLM training-data pipeline runs before training (GPT-3 / Gopher /
RefinedWeb all document a variant). No reference analog (the reference
is an OCR engine); this is a first-class pipeline operator with an
exact DuckDB oracle in __spark_entry__.

Semantics: a train doc is contaminated iff its text EXACTLY matches any
test doc (md5 equality, NULL-safe) or its token/shingle-set jaccard
against some test doc clears ``threshold``. The reported best match is
deterministic: exact beats near; within a kind, max jaccard then min
test_id.

Scale shape (train >> test, the production regime): the exact arm is a
join on md5(text) — Catalyst broadcasts the test hash set, so the train
corpus never shuffles for it. The near arm is an exact inverted-index
CROSS join (train tokens x test tokens on the token), the same exact
machinery as jaccard_pairs but restricted to cross pairs — the train
side never self-joins, so the output is bounded by true cross-candidate
mass, and a small test side broadcasts its exploded token list (AQE
picks this up from size estimates). Cardinalities ride the exploded
rows as constants (min() in the group — a long aggregate, keeping the
HashAggregate map-side-combined; a string aggregate would demote to
SortAggregate). No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from text_ocr_spark.ops.dedup import tokens_col


def decontaminate(
    train: DataFrame,
    test: DataFrame,
    threshold: float = 0.8,
    ngram: int = 1,
) -> DataFrame:
    """-> (doc_id, contaminated, match_kind, best_test_id, best_jaccard)
    for EVERY train doc (a verdict table, like gopher_filter — consumers
    quarantine ``contaminated == 1``).

    ``ngram > 1`` matches on w-shingles instead of token sets (the
    order-sensitive unit production decontamination uses, e.g. 13-gram
    collision in GPT-3's cleanup); NULL-text train docs are never
    contaminated (they match nothing, mirroring tokens_col's NULL
    discipline)."""
    tr = train.select("doc_id", "text")
    te = test.select(F.col("doc_id").alias("test_id"), "text")

    # exact arm: md5 equality (128-bit — collision-free at any corpus
    # size, unlike a 64-bit hash at 10^10 docs); both sides filter
    # NULL text BEFORE hashing, so NULL never matches NULL (no
    # sentinel needed — unlike dedup's text_hash_col, which must keep
    # null docs as singleton groups)
    h = F.md5(F.col("text").cast("binary")).alias("h")
    ex = (
        tr.where(F.col("text").isNotNull())
        .select("doc_id", h)
        .join(te.where(F.col("text").isNotNull()).select("test_id", h), "h")
        .select(
            "doc_id",
            "test_id",
            F.lit(0).alias("kind_rank"),
            F.lit(1.0).cast("double").alias("jaccard"),
        )
    )

    # near arm: exact inverted-index cross jaccard (cardinality rides
    # the exploded rows; min() keeps the agg hash-based)
    tok_t = tr.select(
        "doc_id", tokens_col("text", ngram).alias("toks")
    ).select(
        "doc_id",
        F.size("toks").alias("card_t"),
        F.explode("toks").alias("w"),
    )
    tok_s = te.select(
        "test_id", tokens_col("text", ngram).alias("toks")
    ).select(
        "test_id",
        F.size("toks").alias("card_s"),
        F.explode("toks").alias("w"),
    )
    near = (
        tok_t.join(tok_s, "w")
        .groupBy("doc_id", "test_id")
        .agg(
            F.count("*").alias("n_inter"),
            F.min("card_t").alias("card_t"),
            F.min("card_s").alias("card_s"),
        )
        .withColumn(
            "jaccard",
            F.col("n_inter")
            / (F.col("card_t") + F.col("card_s") - F.col("n_inter")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_id", "test_id", F.lit(1).alias("kind_rank"), "jaccard")
    )

    best = (
        ex.unionByName(near)
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(
                    "kind_rank", F.desc("jaccard"), "test_id"
                )
            ),
        )
        .where(F.col("rn") == 1)
    )
    # sentinel values (not NULLs) for clean docs keep the verdict table
    # fully typed — same contract discipline as gopher_filter post
    # ADVICE r3 #3; jaccard stays the raw double (bit-identical to the
    # oracle's n/(a+b-n) on the same int inputs — rounding could
    # tie-break differently across engines)
    return tr.select("doc_id").join(best, "doc_id", "left").select(
        "doc_id",
        F.col("test_id").isNotNull().cast("int").alias("contaminated"),
        F.when(F.col("kind_rank") == 0, F.lit("exact"))
        .when(F.col("kind_rank") == 1, F.lit("near"))
        .otherwise(F.lit("none"))
        .alias("match_kind"),
        F.coalesce("test_id", F.lit(-1)).alias("best_test_id"),
        F.coalesce("jaccard", F.lit(0.0)).alias("best_jaccard"),
    )
