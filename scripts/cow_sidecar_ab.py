"""A/B the CoW changed-key sidecar overhead (round-3 verdict item):
replay the bench changelog through a COPY-ON-WRITE lake in 4 chunks,
with the sidecar write ON vs OFF, interleaved draws, and report the
medians. The sidecar is an extra O(batch) pass before the merge
rewrite (operators/apply.py); this quantifies what changes() O(changed
rows) feeds actually cost at commit time.

Usage: python scripts/cow_sidecar_ab.py [sf_dir] [cpus] [draws]
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
    from tartare_spark.demos import _events_as_changelog
    from tartare_spark.lake.table import LakeTable
    from tartare_spark.operators.apply import replay_batches
    from tartare_spark.session import get_spark

    spark = get_spark(master=f"local[{CPUS}]", app_name="cow-sidecar-ab",
                      shuffle_partitions=int(CPUS))
    spark.sparkContext.setLogLevel("ERROR")
    ch = _events_as_changelog(spark, SF_DIR).cache()
    n = ch.count()
    scratch = tempfile.mkdtemp(prefix="cow_ab_")

    def one(tag: str, cow_changelog: bool) -> float:
        root = os.path.join(scratch, f"{tag}")
        shutil.rmtree(root, ignore_errors=True)
        lake = LakeTable.create(root, num_buckets=16, mode="cow")
        t0 = time.time()
        replay_batches(spark, lake, ch, num_chunks=4,
                       cow_changelog=cow_changelog)
        dt = time.time() - t0
        # sanity: both variants converge to the same key count
        keys = lake.snapshot(spark).count()
        print(f"  {tag}: {dt:.3f}s ({keys} keys)", flush=True)
        return dt

    # untimed warmup (JIT dominates the first CoW merge)
    one("warmup", True)
    on, off = [], []
    for d in range(DRAWS):  # interleaved — host noise hits both arms
        on.append(one(f"on-{d}", True))
        off.append(one(f"off-{d}", False))
    shutil.rmtree(scratch, ignore_errors=True)
    m_on, m_off = statistics.median(on), statistics.median(off)
    print(f"events={n} draws={DRAWS} cpus={CPUS} sf={SF_DIR}")
    print(f"sidecar ON  median {m_on:.3f}s  (all: {[round(x,3) for x in on]})")
    print(f"sidecar OFF median {m_off:.3f}s  (all: {[round(x,3) for x in off]})")
    print(f"overhead: {100*(m_on-m_off)/m_off:+.1f}% of CoW replay wall")


if __name__ == "__main__":
    main()
