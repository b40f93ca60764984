"""A/B the expectations gate's per-batch constant (round-4 verdict
item 9): replay the same fixture with no expectations, with a
2-expectation all-pass config (pure gate overhead: one extra aggregate
per batch, no quarantine write), and with a 2-expectation config where
one drop-action expectation actually fires (overhead + the smaller
merge). Results are pasted into BENCH/BASELINE.md.

Usage: python scripts/expectations_ab.py [cpus]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cpus = sys.argv[1] if len(sys.argv) > 1 else "32"

    from tartare_spark.fixtures import (
        FixtureSpec,
        stamp_files_in_order,
        write_events_parquet_fast,
    )
    from tartare_spark.lake.table import LakeTable
    from tartare_spark.operators.expect import Expectation
    from tartare_spark.session import get_spark
    from tartare_spark.streaming.runner import run_stream

    spark = get_spark(master=f"local[{cpus}]", app_name="expect-ab",
                      shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="expect_ab_")
    results = []
    try:
        spec = FixtureSpec(n_repos=200, paths_per_repo=100, n_events=60_000)
        ev_src = os.path.join(work, "events")
        write_events_parquet_fast(ev_src, spec, events_per_file=60_000 // 8)
        stamp_files_in_order(ev_src)

        variants = {
            "none": None,
            # all-pass pair: measures the gate's pure per-batch constant
            # (the violation-count aggregate; zero quarantine writes)
            "expect2_allpass": [
                Expectation("has_key", "repo IS NOT NULL AND path IS NOT NULL"),
                Expectation("lsn_nonneg", "lsn >= 0"),
            ],
            # ~1% of rows violate the second expectation (drop action):
            # overhead + a slightly smaller merge
            "expect2_1pct_drop": [
                Expectation("has_key", "repo IS NOT NULL AND path IS NOT NULL"),
                Expectation("lsn_mod", "lsn % 97 != 0"),
            ],
        }

        # JIT warmup (untimed)
        wl = LakeTable.create(os.path.join(work, "lake_w"), num_buckets=32)
        run_stream(spark, ev_src, wl, os.path.join(work, "ckpt_w"),
                   max_files_per_trigger=4)

        for name, exp in variants.items():
            best = None
            for rep in range(2):  # best-of-2 vs hypervisor noise
                tag = f"{name}_{rep}"
                lk = LakeTable.create(os.path.join(work, f"lake_{tag}"),
                                      num_buckets=32)
                t0 = time.time()
                run_stream(spark, ev_src, lk, os.path.join(work, f"ckpt_{tag}"),
                           max_files_per_trigger=4, expectations=exp)
                dt = time.time() - t0
                rows = sum(m.get("rows") or 0 for m in lk.metrics())
                dropped = sum(
                    m.get("rows_excluded") or 0 for m in lk.metrics()
                )
                if best is None or dt < best[0]:
                    best = (dt, rows, dropped)
                shutil.rmtree(os.path.join(work, f"lake_{tag}"),
                              ignore_errors=True)
                shutil.rmtree(os.path.join(work, f"ckpt_{tag}"),
                              ignore_errors=True)
            rec = {"variant": name, "replay_seconds": round(best[0], 3),
                   "applied_rows": best[1], "dropped_rows": best[2]}
            results.append(rec)
            print(json.dumps(rec), flush=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)

    print("\n| variant | replay s (best-of-2) | applied rows | dropped rows |")
    print("|---|---|---|---|")
    for r in results:
        print("| {} | {} | {} | {} |".format(
            r["variant"], r["replay_seconds"], r["applied_rows"],
            r["dropped_rows"],
        ))


if __name__ == "__main__":
    main()
