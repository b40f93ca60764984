"""spark-submit bench job: streaming CDC replay of a change-event fixture.

The north-rule launch path (BASELINE.json:14): ``spark-submit
--master local[N] --py-files engine.zip bench/replay.py --input <dir>
--work <dir>``. On a real cluster the identical command with
``--master yarn/k8s --num-executors N`` runs unchanged — the job never
assumes local mode. Prints ONE JSON line with applied-event throughput
(the north-star metric) derived from the engine's per-micro-batch T7
metrics log.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="change-event parquet dir")
    p.add_argument("--work", required=True, help="scratch dir for lake+checkpoint")
    p.add_argument("--buckets", type=int, default=64)
    p.add_argument("--max-files-per-trigger", type=int, default=8)
    p.add_argument("--label", default="")
    args = p.parse_args()

    from pyspark.sql import SparkSession

    # master/parallelism come from spark-submit; set only engine defaults.
    spark = (
        SparkSession.builder.appName(f"tartare-replay-{args.label}")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism
    spark.conf.set("spark.sql.shuffle.partitions", str(cores))

    from tartare_spark.lake.table import LakeTable
    from tartare_spark.streaming.runner import run_stream

    lake = LakeTable.create(os.path.join(args.work, "lake"), num_buckets=args.buckets)
    n_events = spark.read.parquet(args.input).count()

    t0 = time.time()
    run_stream(
        spark,
        args.input,
        lake,
        os.path.join(args.work, "ckpt"),
        max_files_per_trigger=args.max_files_per_trigger,
    )
    wall = time.time() - t0

    batches = [m for m in lake.metrics() if not m.get("skipped")]
    final_rows = lake.snapshot(spark).count()
    print(
        json.dumps(
            {
                "label": args.label,
                "cores": cores,
                "events": n_events,
                "wall_seconds": round(wall, 3),
                "events_per_sec": round(n_events / wall, 1),
                "n_batches": len(batches),
                "final_rows": final_rows,
                "lake_version": lake.current_version(),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
