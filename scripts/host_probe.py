"""Host parallel-capability probe (evidence for the scaling protocol).

Measures how well THIS box scales embarrassingly-parallel CPU work
(sha256 over fixed buffers, independent OS processes, no JVM, no I/O,
no shared state) at several process counts. The per-level efficiency it
prints is the hardware ceiling for ANY engine measurement at that
parallelism — a Spark job cannot scale better than the metal under it.

Used to pick the N-vs-4N pair for scripts/scaling_bench.py
(SCALING_LEVELS there): on this sandbox's 32-vCPU VM, low process
counts sustain ~94-95% efficiency while 8→32 tops out ~70%
(hypervisor/frequency + memory-bus ceiling), so the engine's published
scaling evidence (BENCH/scaling_local1.jsonl / scaling_local4.jsonl,
summarized in BENCH/BASELINE.md) is run at local[1] vs local[4].
Prints one JSON line.
"""

from __future__ import annotations

import hashlib
import json
import sys
import time
from multiprocessing import Pool

UNITS_ITER = 200_000


def work(_):
    h = b"x" * 8192
    for _ in range(UNITS_ITER):
        h = hashlib.sha256(h).digest() + b"y" * 8192
    return 1


def measure(n: int, trials: int = 3) -> float:
    """Wall seconds for n processes each doing ONE fixed work unit
    (ideal scaling = flat time across n). Best of `trials`."""
    best = float("inf")
    for _ in range(trials):
        t0 = time.time()
        with Pool(n) as p:
            p.map(work, range(n))
        best = min(best, time.time() - t0)
    return best


def mem_work(_):
    """Memory-streaming unit: copy a 128 MB buffer 8 times (reads+writes
    ~2 GB through the bus; far beyond cache)."""
    import numpy as np

    # real data, not np.zeros: zero pages are COW-shared and cache-hot,
    # which would measure the cache, not the memory bus
    a = np.arange(128 * 1024 * 1024 // 8, dtype=np.int64)
    s = 0
    for _ in range(8):
        b = a.copy()
        s += int(b[-1])
    return s


def measure_mem(n: int, trials: int = 2) -> float:
    best = float("inf")
    for _ in range(trials):
        t0 = time.time()
        with Pool(n) as p:
            p.map(mem_work, range(n))
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--mem"]
    use_mem = "--mem" in sys.argv
    levels = [int(x) for x in (args[0] if args else "2,8,32").split(",")]
    fn = measure_mem if use_mem else measure
    walls = {n: round(fn(n), 3) for n in levels}
    effs = {
        f"{a}->{b}": round(walls[a] / walls[b], 3)
        for a, b in zip(levels, levels[1:])
    }
    print(json.dumps({
        "mode": "mem_stream" if use_mem else "cpu",
        "unit_wall_seconds": walls,
        "pairwise_efficiency": effs,
    }))


if __name__ == "__main__":
    main()
