"""Per-round benchmark harness (driver contract).

Runs the headline CDC replay (the north-star metric: change-events/sec
applied end-to-end with exactly-once commits) on a deterministic
generated fixture, plus representative operator queries on
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1), on
``local[$SPARK_GRAFT_CPUS]``. Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}``.

The N-vs-4N scaling evidence (local[1] vs local[4] executors — see
BENCH/BASELINE.md for the host-ceiling rationale) lives in
scripts/scaling_bench.py; this file is the fast per-round feedback loop.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
# fixture sized for a ~1-2 min replay in the per-round loop; the
# dedicated scaling bench uses 10x this (see scripts/scaling_bench.py)
N_EVENTS = int(os.environ.get("BENCH_EVENTS", "1000000"))

HEADLINE_QUERIES = [
    "cdc_apply_current_state",
    "j2_equi_join_broadcast",
    "j7_sort_merge_join",
    "a1_dedup_latest_lsn",
    "a3_salted_two_phase_agg",
    "w2_lag_delta",
    "dd2_minhash_lsh",
    "dd3_simhash",
    "sim1_ann_bruteforce",
    "tx1_document_stats",
    "f5_json_settings",
    "mm1_blob_metadata",
]


def main() -> None:
    from tartare_spark.demos import SPARK
    from tartare_spark.fixtures import FixtureSpec, write_events_parquet_fast
    from tartare_spark.lake.table import LakeTable
    from tartare_spark.session import get_spark
    from tartare_spark.streaming.runner import run_stream

    spark = get_spark(
        master=f"local[{CPUS}]",
        app_name="tartare-bench",
        shuffle_partitions=int(CPUS),
    )
    spark.sparkContext.setLogLevel("ERROR")

    queries: dict[str, float] = {}
    t_total0 = time.time()

    # ---- headline: streaming CDC replay on the generated binlog -------
    work = tempfile.mkdtemp(prefix="tartare_bench_")
    try:
        spec = FixtureSpec(
            n_repos=2000, paths_per_repo=500, n_events=N_EVENTS
        )
        events_dir = os.path.join(work, "events")
        n_written = write_events_parquet_fast(
            events_dir, spec, events_per_file=N_EVENTS // 16
        )
        # untimed JIT/codegen warmup through the same apply path (the
        # headline metric is steady-state throughput; a 10^10-event
        # replay amortizes JVM warmup to nothing)
        wspec = FixtureSpec(n_repos=50, paths_per_repo=50, n_events=30_000)
        wdir = os.path.join(work, "warmup")
        write_events_parquet_fast(os.path.join(wdir, "events"), wspec,
                                  events_per_file=30_000)
        wlake = LakeTable.create(os.path.join(wdir, "lake"), num_buckets=64)
        run_stream(spark, os.path.join(wdir, "events"), wlake,
                   os.path.join(wdir, "ckpt"), max_files_per_trigger=None)
        shutil.rmtree(wdir, ignore_errors=True)

        lake = LakeTable.create(os.path.join(work, "lake"), num_buckets=64)
        t0 = time.time()
        run_stream(
            spark,
            events_dir,
            lake,
            os.path.join(work, "ckpt"),
            max_files_per_trigger=8,  # big micro-batches: the 10^10-scale design point
        )
        dt = time.time() - t0
        queries["cdc_stream_replay"] = round(dt, 3)
        events_per_sec = round(n_written / dt, 1)
    finally:
        shutil.rmtree(work, ignore_errors=True)

    # ---- operator headliners on the sf dir ----------------------------
    for name in HEADLINE_QUERIES:
        t0 = time.time()
        df = SPARK[name](spark, SF_DIR)
        n = df.count()  # materialize
        queries[name] = round(time.time() - t0, 3)
        _ = n

    total = round(time.time() - t_total0, 3)
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "e2e_suite_seconds",
                "value": total,
                "unit": "sec",
                "queries": queries,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "cdc_events_per_sec": events_per_sec,
                "cdc_events": n_written,
                "cpus": int(CPUS),
            }
        )
    )


if __name__ == "__main__":
    main()
