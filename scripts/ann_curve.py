"""Publish the ANN recall-vs-cost curve (round-2 verdict item): run the
SHIPPED Spark operators (sim2 LSH / sim3 IVF) over a config grid on the
sf embeddings table, measure recall@5 against the exact brute-force
top-k and the candidate-set fraction (cost proxy), and write
BENCH/ANN.md. Usage: python scripts/ann_curve.py [sf_dir] [cpus]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
CPUS = sys.argv[2] if len(sys.argv) > 2 else "16"


def main() -> None:
    from pyspark.sql import functions as F

    from tartare_spark.operators.similarity import (
        brute_force_topk,
        ivf_candidates,
        ivf_topk,
        lsh_bucketed_topk,
        lsh_candidates,
    )
    from tartare_spark.session import get_spark

    spark = get_spark(master=f"local[{CPUS}]", app_name="ann-curve",
                      shuffle_partitions=int(CPUS))
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    # 25 queries (125 ground-truth pairs): at the demo's 5 queries one
    # pair is 0.04 recall — config choices would be seed luck
    queries = emb.filter(F.col("vec_id") < 25).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    ).cache()
    vectors = emb.filter(F.col("vec_id") >= 25).cache()
    n_q, n_v = queries.count(), vectors.count()

    exact = {
        (r["q_id"], r["vec_id"])
        for r in brute_force_topk(vectors, queries, k=5).collect()
    }

    def recall(df):
        got = {(r["q_id"], r["vec_id"]) for r in df.collect()}
        return len(exact & got) / len(exact)

    lsh_grid = [
        (3, 1, 0), (3, 2, 0), (3, 4, 0), (3, 8, 0),
        (3, 2, 1), (4, 4, 1), (4, 8, 1),
    ]
    ivf_grid = [(16, 2), (16, 4), (16, 8), (32, 8), (32, 12), (32, 16)]

    lines = [
        "# ANN recall-vs-cost (measured, shipped Spark operators)",
        "",
        f"Corpus: `{SF_DIR}/embeddings.parquet` — {n_v} vectors, "
        f"{n_q} queries, k=5. Recall@5 vs exact brute-force cosine; "
        "cost = candidate fraction = |candidate pairs| / (|Q|·|corpus|).",
        "",
        "These embeddings are near-uniform random — the HARD case for "
        "ANN (little cluster structure), so recall is bought almost "
        "linearly with candidates; on real embedding corpora with "
        "cluster structure the same dials sit far left of this curve. "
        "Shipped defaults (marked ✓) chosen as the cheapest measured "
        "configs at recall ≥ 0.8.",
        "",
        "## sim2 — sign-LSH (tables × planes, Hamming-1 multi-probe)",
        "",
        "| planes | tables | probe | recall@5 | cand. fraction | sec |",
        "|---|---|---|---|---|---|",
    ]
    for planes, tables, probe in lsh_grid:
        t0 = time.time()
        r = recall(lsh_bucketed_topk(
            vectors, queries, k=5, n_planes=planes, multi_probe=probe,
            n_tables=tables,
        ))
        cf = lsh_candidates(
            vectors, queries, n_planes=planes, multi_probe=probe,
            n_tables=tables,
        ).count() / (n_q * n_v)
        dt = time.time() - t0
        mark = " ✓" if (planes, tables, probe) == (3, 8, 0) else ""
        lines.append(
            f"| {planes} | {tables} | {probe} | {r:.2f}{mark} | {cf:.3f} | {dt:.1f} |"
        )
        print(lines[-1], flush=True)

    lines += [
        "",
        "## sim3 — IVF (cells × probes × Lloyd iterations)",
        "",
        "Centroids are deterministic `kmeans_centroids` as of round 4: "
        "md5-sample seeding, then `n_iters` Lloyd refinement passes. "
        "Both variants measured. At 16 cells Lloyd buys +0.06–0.09 "
        "recall at IDENTICAL candidate fraction even on this "
        "near-uniform corpus; at 32 cells (denser seeding) it ties. On "
        "corpora with real cluster structure the win is larger — pinned "
        "by tests/test_operators.py::test_kmeans_beats_sampling_on_"
        "clusters (recall 0.95 → 1.00 at probe=1 of 8 true clusters). "
        "Shipped sim3 demo config (✓) = the cheapest measured ≥0.8 "
        "point. Round 3's first-n_cells-by-id seeding was measured on "
        "only 5 queries (one ground-truth pair = 0.04 recall), so its "
        "numbers (32/12 = 0.80 @ 0.375) are not comparable at this "
        "measurement precision.",
        "",
        "| cells | probes | n_iters | recall@5 | cand. fraction | sec |",
        "|---|---|---|---|---|---|",
    ]
    for cells, probes in ivf_grid:
        for iters in (0, 2):
            t0 = time.time()
            r = recall(ivf_topk(vectors, queries, k=5, n_cells=cells,
                                n_probe=probes, n_iters=iters))
            cf = ivf_candidates(
                vectors, queries, n_cells=cells, n_probe=probes, n_iters=iters
            ).count() / (n_q * n_v)
            dt = time.time() - t0
            mark = " ✓" if (cells, probes, iters) == (16, 8, 2) else ""
            lines.append(
                f"| {cells} | {probes} | {iters} | {r:.2f}{mark} | {cf:.3f} | {dt:.1f} |"
            )
            print(lines[-1], flush=True)

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH", "ANN.md")
    # preserve the persisted-index (sim2b) section, which is measured by
    # hand in its own session, across regenerations of the two curves
    persisted = ""
    if os.path.exists(out):
        with open(out) as f:
            old = f.read()
        if "## sim2b" in old:
            persisted = old[old.index("## sim2b"):]
            nxt = persisted.find("\n## sim3")
            if nxt >= 0:
                persisted = persisted[:nxt]
    text = "\n".join(lines) + "\n"
    if persisted:
        text = text.replace("## sim3", persisted.rstrip() + "\n\n## sim3", 1)
    with open(out, "w") as f:
        f.write(text)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
