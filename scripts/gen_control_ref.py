"""Regenerate BENCH/control_ref.json — the committed host-health
reference for bench.py's sentinel (VERDICT r4 item 2).

Run on an IDLE host window (check nothing else is benching; this guest
shows ~20% hypervisor noise, so the script takes best-of-5 where
bench.py's probe takes best-of-3):

    PYTHONPATH=/root/repo python scripts/gen_control_ref.py [cpus]

The workload is bench.control_probe — fixed, pure Spark, independent of
every graded op's code — so the committed number only moves when the
host shape moves, never when the engine changes.
"""

from __future__ import annotations

import json
import os
import sys


def main() -> int:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench
    from text_ocr_spark.pipeline import session_builder

    spark = (
        session_builder(master=f"local[{cpus}]", app="gen-control-ref")
        .config("spark.sql.shuffle.partitions", str(cpus * 2))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    spark.range(1000).select(F.sum("id")).collect()

    best = min(bench.control_probe(spark) for _ in range(2))  # 2x best-of-3
    ref = {"control_sec": best, "cpus": cpus, "probe": "bench.control_probe"}
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "BENCH", "control_ref.json")
    with open(out, "w") as f:
        json.dump(ref, f, indent=2)
        f.write("\n")
    print(json.dumps(ref))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
