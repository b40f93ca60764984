"""Quantify the redelivery-fence break-even (round-2 verdict item):
for each redelivery ratio (fraction of the already-applied log that is
re-shipped) and each strategy (no fence / JVM manifest-watermark fence /
T5 state-store fence), measure the wall cost and applied volume of the
pure-redelivery tail. Results are pasted into BENCH/BASELINE.md.

Usage: python scripts/fence_breakeven.py [cpus]
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cpus = sys.argv[1] if len(sys.argv) > 1 else "32"

    from tartare_spark.fixtures import FixtureSpec, write_events_parquet_fast
    from tartare_spark.lake.table import LakeTable
    from tartare_spark.session import get_spark
    from tartare_spark.streaming.runner import run_stream

    spark = get_spark(master=f"local[{cpus}]", app_name="fence-breakeven",
                      shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="fence_be_")
    results = []
    try:
        spec = FixtureSpec(n_repos=200, paths_per_repo=100, n_events=60_000)
        ev_src = os.path.join(work, "events_src")
        write_events_parquet_fast(ev_src, spec, events_per_file=60_000 // 8)
        src_files = sorted(glob.glob(os.path.join(ev_src, "*.parquet")))

        # warm up JIT on a throwaway replay
        wl = LakeTable.create(os.path.join(work, "lake_w"), num_buckets=32)
        wdir = os.path.join(work, "events_w")
        os.makedirs(wdir)
        for p in src_files:
            shutil.copy(p, wdir)
        run_stream(spark, wdir, wl, os.path.join(work, "ckpt_w"),
                   max_files_per_trigger=8)

        from tartare_spark.fixtures import stamp_files_in_order as _stamp_in_order

        def run_one(ratio: float, variant: str, rep: int):
            tag = f"{variant}_{int(ratio * 100)}_{rep}"
            kw = {}
            if variant == "manifest":
                # slack = the fixture's documented 1000-LSN reorder
                # horizon; 0-slack would drop late-but-new events
                kw = {"manifest_fence": True, "fence_lateness": 1000}
            elif variant == "manifest_nocheck":
                # A/B the out-of-order-source detector: since round 5 it
                # rides the write job as observe() metrics (zero extra
                # jobs), so ON vs OFF should be wall-equal — this row is
                # the proof (round-4 verdict item 2)
                kw = {"manifest_fence": True, "fence_lateness": 1000,
                      "fence_order_check": False}
            elif variant == "stateful":
                kw["stateful_fence"] = True
            ev2 = os.path.join(work, f"events_{tag}")
            os.makedirs(ev2)
            for p in src_files:
                shutil.copy(p, ev2)
            _stamp_in_order(ev2)
            lk = LakeTable.create(os.path.join(work, f"lake_{tag}"),
                                  num_buckets=32)
            ck = os.path.join(work, f"ckpt_{tag}")
            run_stream(spark, ev2, lk, ck, max_files_per_trigger=8, **kw)
            rows0 = sum(m.get("rows") or 0 for m in lk.metrics())
            n_re = max(1, int(len(src_files) * ratio))
            for p in src_files[:n_re]:
                shutil.copy(p, os.path.join(
                    ev2,
                    os.path.basename(p).replace(".parquet", "-re.parquet"),
                ))
            _stamp_in_order(ev2)
            t0 = time.time()
            run_stream(spark, ev2, lk, ck, max_files_per_trigger=8, **kw)
            dt = time.time() - t0
            rows = sum(m.get("rows") or 0 for m in lk.metrics()) - rows0
            from pyspark.sql import functions as F

            snap = lk.snapshot(spark)
            sig = tuple(
                snap.select(
                    F.count("*").alias("n"),
                    F.sum(F.pmod(F.xxhash64(*snap.columns), F.lit(2**31))).alias("h"),
                ).collect()[0]
            )
            shutil.rmtree(os.path.join(work, f"lake_{tag}"), ignore_errors=True)
            shutil.rmtree(ev2, ignore_errors=True)
            shutil.rmtree(ck, ignore_errors=True)
            return dt, rows, sig

        for ratio in (0.25, 0.5, 1.0):
            ref_sig = None
            for variant in ("plain", "manifest", "manifest_nocheck", "stateful"):
                best = None
                for rep in range(2):  # best-of-2 vs hypervisor noise
                    dt, rows, sig = run_one(ratio, variant, rep)
                    # every variant must converge to the identical
                    # final state — a fence that changes state would
                    # otherwise publish a flattering-but-wrong number
                    if ref_sig is None:
                        ref_sig = sig
                    assert sig == ref_sig, (
                        f"{variant}@{ratio}: state {sig} != plain {ref_sig}"
                    )
                    if best is None or dt < best[0]:
                        best = (dt, rows)
                rec = {
                    "redelivery_ratio": ratio,
                    "variant": variant,
                    "tail_seconds": round(best[0], 3),
                    "applied_rows": best[1],
                }
                results.append(rec)
                print(json.dumps(rec), flush=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)

    # markdown summary for BENCH/BASELINE.md
    print("\n| redelivery ratio | plain s / rows | manifest s / rows | manifest (detector off) s / rows | stateful s / rows |")
    print("|---|---|---|---|---|")
    for ratio in (0.25, 0.5, 1.0):
        row = {r["variant"]: r for r in results if r["redelivery_ratio"] == ratio}
        print("| {:.0%} | {} / {} | {} / {} | {} / {} | {} / {} |".format(
            ratio,
            row["plain"]["tail_seconds"], row["plain"]["applied_rows"],
            row["manifest"]["tail_seconds"], row["manifest"]["applied_rows"],
            row["manifest_nocheck"]["tail_seconds"], row["manifest_nocheck"]["applied_rows"],
            row["stateful"]["tail_seconds"], row["stateful"]["applied_rows"],
        ))


if __name__ == "__main__":
    main()
