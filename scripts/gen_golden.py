"""Generate committed golden fixtures: pure-Python oracle over the driver's
documents tables. No Spark. Deterministic (hash-keyed builders, seed-free).

    python scripts/gen_golden.py [sf0.001 sf0.01 ...]

Writes fixturedata/golden_<sf>.parquet with columns
(conv_id, turn_idx, kind, extracted, spans_json) sorted by (conv_id, turn_idx).
"""

from __future__ import annotations

import sys
import time

import duckdb

from text_ocr_spark.fixtures import make_transcripts_pdf
from text_ocr_spark.oracle import golden_frame


def main(sfs: list[str]) -> None:
    for sf in sfs:
        t0 = time.time()
        docs = duckdb.sql(
            f"SELECT doc_id, text FROM read_parquet('/root/testdata/{sf}/documents.parquet')"
            " ORDER BY doc_id"
        ).df()
        golden = golden_frame(make_transcripts_pdf(docs))
        out = f"fixturedata/golden_{sf}.parquet"
        golden.to_parquet(out, index=False)
        print(f"{out}: {len(golden)} rows in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main(sys.argv[1:] or ["sf0.001", "sf0.01"])
