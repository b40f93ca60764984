"""Profile a single apply_batch micro-batch: time the stages
(scan+dedup+collect vs delta write vs commit) to direct optimization.
Usage: python scripts/profile_apply.py [n_events] [cpus]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 250_000
    cpus = sys.argv[2] if len(sys.argv) > 2 else "32"

    from pyspark.sql import functions as F

    from tartare_spark.fixtures import FixtureSpec, write_events_parquet_fast
    from tartare_spark.lake.table import LakeTable, bucket_expr
    from tartare_spark.operators.dedup import dedup_latest_lsn
    from tartare_spark.session import get_spark

    spark = get_spark(master=f"local[{cpus}]", app_name="profile",
                      shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="prof_")
    try:
        spec = FixtureSpec(n_repos=2000, paths_per_repo=500, n_events=n_events)
        events_dir = os.path.join(work, "events")
        t0 = time.time()
        write_events_parquet_fast(events_dir, spec, events_per_file=n_events)
        print(f"fixture gen+write: {time.time()-t0:.2f}s")

        lake = LakeTable.create(os.path.join(work, "lake"), num_buckets=64)

        ev = spark.read.parquet(events_dir)
        # warm the JVM/codegen once
        ev.limit(10).count()

        t0 = time.time()
        staged = dedup_latest_lsn(ev, keys=["repo", "path"], order_col="lsn")
        staged = staged.withColumn("_bucket", bucket_expr(lake.num_buckets))
        staged = staged.persist()
        bstats = (
            staged.groupBy("_bucket")
            .agg(F.max("lsn").alias("max_lsn"), F.count("*").alias("keys"))
            .collect()
        )
        t_collect = time.time() - t0
        print(f"scan+dedup+bucketstats collect: {t_collect:.2f}s "
              f"({len(bstats)} buckets)")

        t0 = time.time()
        phys = staged.select(
            "repo", "path", "commit", "lang", "content",
            F.col("lsn").alias("_lsn"),
            (F.col("op") == "delete").alias("_deleted"),
            F.sha2(F.coalesce("content", F.lit("")), 256).alias("_content_sha"),
            "_bucket",
        )
        committed = lake.commit_delta(
            phys, batch_id=0,
            touched_buckets=sorted(int(r["_bucket"]) for r in bstats),
            bucket_lsn_updates={int(r["_bucket"]): int(r["max_lsn"]) for r in bstats},
        )
        t_write = time.time() - t0
        print(f"delta write+commit: {t_write:.2f}s (committed={committed})")
        staged.unpersist()

        # variant: no persist, no separate collect — single write job,
        # stats recovered from parquet footers afterwards
        lake2 = LakeTable.create(os.path.join(work, "lake2"), num_buckets=64)
        t0 = time.time()
        staged2 = dedup_latest_lsn(ev, keys=["repo", "path"], order_col="lsn")
        phys2 = staged2.select(
            "repo", "path", "commit", "lang", "content",
            F.col("lsn").alias("_lsn"),
            (F.col("op") == "delete").alias("_deleted"),
            F.sha2(F.coalesce("content", F.lit("")), 256).alias("_content_sha"),
        ).withColumn("_bucket", bucket_expr(lake2.num_buckets))
        out_dir = os.path.join(lake2.root, "data", "delta-0-test")
        (phys2.repartition(64, "_bucket")
         .write.option("maxRecordsPerFile", 2_000_000)
         .partitionBy("_bucket").parquet(out_dir))
        t_single = time.time() - t0
        print(f"single-job write (no persist/collect): {t_single:.2f}s")

        t0 = time.time()
        import pyarrow.parquet as pq
        stats = {}
        nkeys = 0
        for entry in os.scandir(out_dir):
            if entry.name.startswith("_bucket="):
                b = int(entry.name.split("=", 1)[1])
                for f in os.scandir(entry.path):
                    if f.name.endswith(".parquet"):
                        md = pq.read_metadata(f.path)
                        nkeys += md.num_rows
                        ci = md.schema.to_arrow_schema().get_field_index("_lsn")
                        mx = max(md.row_group(g).column(ci).statistics.max
                                 for g in range(md.num_row_groups))
                        stats[b] = max(stats.get(b, 0), mx)
        t_footer = time.time() - t0
        print(f"footer-stats recovery: {t_footer:.2f}s "
              f"({len(stats)} buckets, {nkeys} keys)")
        print(f"TOTAL two-job: {t_collect+t_write:.2f}s | "
              f"one-job: {t_single+t_footer:.2f}s")
    finally:
        shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
