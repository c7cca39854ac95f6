"""Snapshot-checkpoint resume + per-chunk lineage (SURVEY.md §7 M4).

The reference engine is restartable only at whole-image granularity (one
``detect`` call per image, ref ocrlib/src/main/cpp/jni/main.cpp:74-87);
the graft makes restartability a first-class table-scale property:

- input splits into N deterministic, conversation-aligned chunks:
  ``chunk_id = pmod(xxhash64(conv_id), n_chunks)`` — a conversation never
  straddles a chunk, so per-turn outputs land exactly once;
- each chunk commits atomically: parquet written to
  ``out/extracted/chunk=<id>/`` first, then a manifest row is renamed
  into ``out/manifest/`` (rename-as-commit). A killed run leaves either
  a committed chunk (skipped on restart) or an uncommitted one (rerun);
- the manifest row carries the lineage/metrics (FIXTURES.md §4): rows
  in/out, per-kind counts, bytes, wall_ms, and the input snapshot id.

On an Iceberg catalog the same interface rides snapshot isolation
instead of directory renames: ``snapshot_id`` pins the input version
(``spark.read.option("snapshot-id", ...)``), chunks prune via the
table's ``bucket(conv_id, N)`` partition transform, and commits append
to the output table + metrics table in one transaction. DESIGN INTENT,
NOT VERIFIED BEHAVIOR: no iceberg-spark runtime jar exists anywhere in
this sandbox (filesystem-wide search; no network), so the Iceberg code
paths have never executed here — the parquet-dir implementation is the
tested path and the Iceberg calls are gated (sources.py, STATUS.md
"Iceberg" note).
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from text_ocr_spark.pipeline import (
    SALT_BUCKETS,
    conv_chunk_expr,
    extract_corpus,
    lineage_metrics,
)

MANIFEST_DIR = "manifest"
CHUNK_DIR = "extracted"


def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, MANIFEST_DIR)


def committed_chunks(out_dir: str) -> dict[int, dict]:
    """chunk_id -> manifest record for every committed chunk."""
    mdir = _manifest_path(out_dir)
    if not os.path.isdir(mdir):
        return {}
    out: dict[int, dict] = {}
    for name in os.listdir(mdir):
        if not name.endswith(".json"):
            continue
        with open(os.path.join(mdir, name)) as f:
            rec = json.load(f)
        out[int(rec["chunk_id"])] = rec
    return out


def _commit_chunk(out_dir: str, rec: dict) -> None:
    """Rename-as-commit: the manifest row appears atomically or not at
    all (POSIX rename; on object stores Iceberg's metadata swap plays
    this role)."""
    mdir = _manifest_path(out_dir)
    os.makedirs(mdir, exist_ok=True)
    tmp = os.path.join(mdir, f".tmp-{uuid.uuid4().hex}")
    with open(tmp, "w") as f:
        json.dump(rec, f)
    os.replace(tmp, os.path.join(mdir, f"chunk-{rec['chunk_id']:05d}.json"))


def chunk_col(n_chunks: int) -> F.Column:
    return F.pmod(F.xxhash64("conv_id"), F.lit(n_chunks)).cast("int")


def resumable_extract(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    *,
    run_id: str,
    n_chunks: int = 8,
    salt_buckets: int = SALT_BUCKETS,
    num_partitions: int | None = None,
    fail_after: int | None = None,
    snapshot_id: str | None = None,
) -> dict:
    """Run (or resume) the extraction, committing chunk by chunk.

    Identical final output to a single-shot run — pytest kills a run
    mid-way (``fail_after``) and asserts the resumed result matches.
    Returns {"chunks_run": int, "chunks_skipped": int, "rows_out": int}.

    At 100 TB each chunk is an independent bounded job (conversation-
    bucket pruned scan -> salted exchange -> Arrow extract -> append),
    so a restart loses at most one chunk of work, and the manifest is
    the per-partition lineage table the north_rule asks for.
    """
    snapshot_id = snapshot_id or _snapshot_fingerprint(sf_dir)
    done = committed_chunks(out_dir)
    stale = [cid for cid, rec in done.items() if rec["snapshot_id"] != snapshot_id]
    if stale:
        raise ValueError(
            f"manifest was committed against another input snapshot: {stale}"
        )

    ran = 0
    skipped = 0
    rows_out = 0
    for cid in range(n_chunks):
        if cid in done:
            skipped += 1
            rows_out += int(done[cid]["rows_out"])
            continue
        if fail_after is not None and ran >= fail_after:
            raise RuntimeError(f"injected failure after {ran} chunks")
        t0 = time.time()
        # chunk predicate computed from doc_id on the SCAN side: each
        # chunk's job reads, exchanges, and extracts only its own
        # conversations. Filtering the extraction OUTPUT instead (the
        # equivalent chunk_col(n)==cid on conv_id) would sit above the
        # MapInPandas node, which Catalyst cannot push a predicate
        # below — re-running the full Python extraction once per chunk.
        ex = extract_corpus(
            spark,
            sf_dir,
            salt_buckets=salt_buckets,
            num_partitions=num_partitions,
            doc_predicate=conv_chunk_expr(n_chunks) == cid,
        )
        chunk_path = os.path.join(out_dir, CHUNK_DIR, f"chunk={cid}")
        ex.write.mode("overwrite").parquet(chunk_path)
        metrics = (
            lineage_metrics(spark.read.parquet(chunk_path), run_id=run_id)
            .agg(
                F.sum("rows_out").alias("rows_out"),
                *[
                    F.sum(f"n_{k}").alias(f"n_{k}")
                    for k in ("html", "pdf", "ocr", "plain", "empty")
                ],
                F.sum("bytes_in").alias("bytes_in"),
                F.sum("bytes_out").alias("bytes_out"),
            )
            .first()
        )
        rec = {
            "run_id": run_id,
            "chunk_id": cid,
            "snapshot_id": snapshot_id,
            "rows_out": int(metrics["rows_out"] or 0),
            "bytes_in": int(metrics["bytes_in"] or 0),
            "bytes_out": int(metrics["bytes_out"] or 0),
            "wall_ms": int(1000 * (time.time() - t0)),
            **{
                f"n_{k}": int(metrics[f"n_{k}"] or 0)
                for k in ("html", "pdf", "ocr", "plain", "empty")
            },
        }
        _commit_chunk(out_dir, rec)
        ran += 1
        rows_out += rec["rows_out"]
    return {"chunks_run": ran, "chunks_skipped": skipped, "rows_out": rows_out}


def read_extracted(spark: SparkSession, out_dir: str) -> DataFrame:
    """All committed chunks as one DataFrame (chunk is a partition col)."""
    return spark.read.parquet(os.path.join(out_dir, CHUNK_DIR))


def _snapshot_fingerprint(sf_dir: str) -> str:
    """Stand-in for the Iceberg snapshot id: input file names + mtimes +
    sizes. Good enough to refuse resuming over changed input."""
    path = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(path)
    return f"{os.path.basename(path)}:{st.st_size}:{int(st.st_mtime)}"
