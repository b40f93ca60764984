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
import shutil
import sys
import time


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="change-event parquet dir")
    p.add_argument("--work", required=True, help="scratch dir for lake+checkpoint")
    p.add_argument("--buckets", type=int, default=64)
    p.add_argument("--max-files-per-trigger", type=int, default=8)
    p.add_argument("--label", default="")
    p.add_argument("--warmup", type=int, default=1,
                   help="1 = run an untimed small replay first (JIT warmup)")
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
        # INT96 (the default) carries no parquet min/max stats; MICROS
        # enables footer-derived lag metrics and ts predicate pushdown
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism
    # FIXED partition layout across cluster sizes: a real N->4N
    # comparison keeps the same shuffle/bucket layout and varies only
    # the executors processing it (with cores-scaled partitions, the
    # N-level run gets a degenerate 1-partition "shuffle" and the
    # comparison stops being executor scaling). AQE coalesces small
    # partitions at runtime either way.
    spark.conf.set("spark.sql.shuffle.partitions", "32")

    from tartare_spark.lake.table import LakeTable
    from tartare_spark.streaming.runner import run_stream

    # a stale --work dir is a measurement hazard: its checkpoint marks
    # every input file processed while LakeTable.create resets the lake,
    # yielding a zero-batch run reported as absurd throughput — wipe it.
    for sub in ("lake", "ckpt", "warmup"):
        shutil.rmtree(os.path.join(args.work, sub), ignore_errors=True)
    lake = LakeTable.create(os.path.join(args.work, "lake"), num_buckets=args.buckets)
    n_events = spark.read.parquet(args.input).count()

    if args.warmup:
        # untimed JIT/codegen warmup: replay a small slice into a
        # throwaway lake. The metric of interest is steady-state
        # throughput (a 10^10-event replay runs for hours; one-time JVM
        # warmup is noise there but would be ~30% of a short sandbox run).
        wdir = os.path.join(args.work, "warmup")
        (spark.read.parquet(args.input).limit(30_000)
         .write.parquet(os.path.join(wdir, "events")))
        wlake = LakeTable.create(os.path.join(wdir, "lake"), num_buckets=args.buckets)
        run_stream(spark, os.path.join(wdir, "events"), wlake,
                   os.path.join(wdir, "ckpt"), max_files_per_trigger=None)
        shutil.rmtree(wdir, ignore_errors=True)

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
