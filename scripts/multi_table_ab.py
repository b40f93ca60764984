"""A/B the S18 multi-table fan-out overhead: the SAME change stream
replayed (a) through the single-table runner into one lake and (b)
through ``run_stream_multi`` into 1, 4 and 8 route-hashed tables, on
identical streaming settings — interleaved draws, medians reported.

What this prices: the fan-out's per-epoch constant (one cached pass +
route-count collect) plus N per-table apply pipelines instead of one.
The per-table batches are 1/N the rows, so the delta is machinery
constant, not data volume — the number a deployment uses to decide
table-per-query vs fan-out sharding.

Usage: python scripts/multi_table_ab.py [sf_dir] [cpus] [draws]
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
CPUS = sys.argv[2] if len(sys.argv) > 2 else "16"
DRAWS = int(sys.argv[3]) if len(sys.argv) > 3 else 3


def main() -> None:
    from pyspark.sql import functions as F

    from tartare_spark.demos import _events_as_changelog
    from tartare_spark.lake.table import LakeTable
    from tartare_spark.session import get_spark
    from tartare_spark.streaming.runner import run_stream, run_stream_multi

    spark = get_spark(master=f"local[{CPUS}]", app_name="multi-table-ab",
                      shuffle_partitions=int(CPUS))
    spark.sparkContext.setLogLevel("ERROR")
    scratch = tempfile.mkdtemp(prefix="multi_ab_")

    # materialize the changelog as a file-stream source dir (4 files →
    # 2 micro-batches at maxFilesPerTrigger=2, same shape both arms)
    events_dir = os.path.join(scratch, "events")
    ch = _events_as_changelog(spark, SF_DIR)
    ch.repartition(4).write.mode("overwrite").parquet(events_dir)
    n = spark.read.parquet(events_dir).count()
    print(f"fixture: {n} events in {events_dir}", flush=True)

    def single(tag: str) -> float:
        root = os.path.join(scratch, tag)
        shutil.rmtree(root, ignore_errors=True)
        lake = LakeTable.create(os.path.join(root, "lake"), num_buckets=16)
        t0 = time.time()
        run_stream(spark, events_dir, lake, os.path.join(root, "ck"),
                   max_files_per_trigger=2)
        dt = time.time() - t0
        print(f"  {tag}: {dt:.3f}s", flush=True)
        return dt

    def multi(tag: str, n_tables: int) -> float:
        root = os.path.join(scratch, tag)
        shutil.rmtree(root, ignore_errors=True)
        names = [f"t{i}" for i in range(n_tables)]
        lakes = {
            t: LakeTable.create(os.path.join(root, t), num_buckets=16)
            for t in names
        }
        route = F.concat(
            F.lit("t"), F.pmod(F.xxhash64("repo"), F.lit(n_tables)).cast("string")
        )
        t0 = time.time()
        run_stream_multi(spark, events_dir, lakes, os.path.join(root, "ck"),
                         route=route, max_files_per_trigger=2)
        dt = time.time() - t0
        total = sum(lk.snapshot(spark).count() for lk in lakes.values())
        print(f"  {tag} (n={n_tables}): {dt:.3f}s ({total} keys)", flush=True)
        return dt

    walls: dict[str, list[float]] = {"single": [], "multi1": [], "multi4": [], "multi8": []}
    for d in range(DRAWS):
        print(f"draw {d}:", flush=True)
        walls["single"].append(single(f"s_{d}"))
        walls["multi1"].append(multi(f"m1_{d}", 1))
        walls["multi4"].append(multi(f"m4_{d}", 4))
        walls["multi8"].append(multi(f"m8_{d}", 8))

    med = {k: statistics.median(v) for k, v in walls.items()}
    print("\nmedians:")
    for k, v in med.items():
        print(f"  {k}: {v:.3f}s  (x{v / med['single']:.2f} vs single)")
    shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
