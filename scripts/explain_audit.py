"""Physical-plan audit: dump explain("formatted") for headline queries
and assert the plan properties the 100 TB design depends on —
PushedFilters reaching the parquet scan, broadcast joins on small dims,
whole-stage codegen in the hot expressions, no Exchange where one isn't
needed. Writes BENCH/PLANS.md. Usage: python scripts/explain_audit.py
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

# query -> properties that MUST appear in its plan. "CODEGEN" is special:
# asserted as a `*(n)` whole-stage-codegen span in the SIMPLE plan (the
# formatted plan doesn't mark codegen); everything else is matched
# against the formatted plan text.
CHECKS = {
    "p2_filter_predicate": ["PushedFilters: [", "CODEGEN"],
    "j2_equi_join_broadcast": ["BroadcastHashJoin", "CODEGEN"],
    "j7_sort_merge_join": ["SortMergeJoin"],
    "j3_semi_join_affected": ["Semi"],
    "j4_anti_join_orphans": ["Anti"],
    "a1_dedup_latest_lsn": ["partial_max_by", "CODEGEN"],
    "a3_salted_two_phase_agg": ["HashAggregate"],
    "f4_hash_invariant": ["sha2", "CODEGEN"],
    "o1_topk_hot_repos": ["TakeOrderedAndProject"],
    "w1_rank_versions": ["Window", "row_number"],
    # SCD2 history: ONE window, no pre-dedup shuffle or join (the
    # single-Exchange invariant is asserted exactly in
    # tests/test_operators.py::test_scd2_single_window_plan; the MV
    # refresh's broadcast-only dirty joins likewise in
    # test_mv_refresh_plan_broadcasts_dirty_keys — s10's RETURNED frame
    # is a plain MV read, so there is nothing to audit here).
    "w5_scd2_history": ["Window", "lead(", "NOT:Join"],
    # dd5 must be a bucket EQUI-join (sign-LSH), never a cartesian
    # all-pairs filter; dd6's band join likewise. Any equi-join physical
    # strategy is fine (AQE broadcasts at small sf; at scale it becomes
    # a shuffled hash/sort-merge join on the same key).
    "dd5_embedding_near_dup": [
        "ANY:BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin",
        "NOT:CartesianProduct",
        "NOT:BroadcastNestedLoopJoin",
    ],
    "dd6_simhash_banded": [
        "ANY:BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin",
        "NOT:CartesianProduct",
        "NOT:BroadcastNestedLoopJoin",
    ],
    # J6 scale path: interval overlap as a coarse-time-bucket EQUI join
    # (+ range residual), never the BNLJ the theta form plans.
    "j6b_interval_overlap_bucketed": [
        "ANY:BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin",
        "NOT:CartesianProduct",
        "NOT:BroadcastNestedLoopJoin",
    ],
    # ANN scale path: bucket equi-join with the (tiny) query side
    # broadcast — never a cross join against the corpus.
    "sim2_ann_lsh_bucketed": [
        "BroadcastHashJoin",
        "NOT:CartesianProduct",
        "NOT:BroadcastNestedLoopJoin",
    ],
    # Incremental dedup: batch band rows equi-join the persisted band
    # index — never a cartesian; the index read must be the real
    # partitioned layout (PartitionFilters shows up only under
    # probe_bands, so only the join shape is pinned here).
    "dd8_incremental_dedup": [
        "ANY:BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin",
        "NOT:CartesianProduct",
        "NOT:BroadcastNestedLoopJoin",
    ],
    # Persisted-LSH query: the probed (t, b) set must reach the index
    # scan as PartitionFilters (only probed directories read), candidates
    # joined equi on (t, b) with the tiny routed query side broadcast.
    "sim2b_ann_lsh_persisted": [
        "PartitionFilters: [",
        "BroadcastHashJoin",
        "NOT:CartesianProduct",
    ],
    # IVF with k-means centroids: the per-vector/query centroid scoring
    # is a BROADCAST of the tiny centroid table (a broadcast NLJ against
    # ≤n_cells rows is the intended plan there); the corpus-vs-query
    # candidate join must still be an equi-join on cell and nothing may
    # plan a true cartesian.
    "sim3_ann_ivf": [
        "ANY:BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin",
        "NOT:CartesianProduct",
    ],
    # Quota cap: the row_number filter must plan as a WindowGroupLimit
    # so each map partition trims to its local top-cap BEFORE the
    # shuffle (the exactly-one-Exchange invariants for tx11 packing and
    # the bucketed-publish zero-Exchange join are asserted with
    # controlled confs in tests/test_operators.py).
    "tx10_quota_cap": ["WindowGroupLimit", "row_number"],
    # Decontamination: the corpus streams through a BROADCAST join on
    # the shingle (benchmark side broadcast) — never a corpus shuffle
    # or an all-pairs comparison.
    "dd9_decontaminate": [
        "BroadcastHashJoin",
        "NOT:CartesianProduct",
        "NOT:BroadcastNestedLoopJoin",
    ],
    # Global rank: the window must be bucket-PARTITIONED — the naive
    # global-order form plans a SinglePartition exchange (whole table
    # to one task), which must never appear.
    "o3_global_rank": ["Window", "NOT:SinglePartition"],
    # Gopher repetition rules: a pure map pass — the text never moves
    # (the zero-Exchange invariant is asserted exactly in
    # tests/test_operators.py::test_gopher_repetition_shuffle_free).
    "tx12_gopher_repetition": ["CODEGEN", "NOT:Exchange"],
    # Span dedup: shared-span detection is a window over fp — no join
    # anywhere (the exactly-two-Exchange invariant is asserted in
    # test_span_dedup_two_exchanges_no_join).
    "dd10_span_dedup": ["Window", "NOT:Join"],
    # Span REMOVAL: the first-occurrence decision windows over
    # xxhash64(span) — span text must never enter that shuffle (the
    # window subtree reads longs only); the flag join is an equi-join
    # on (doc_id, pos), never a cartesian.
    "dd12_span_remove": [
        "Window",
        "xxhash64",
        "NOT:CartesianProduct",
        "NOT:BroadcastNestedLoopJoin",
    ],
    # Replica checksum: the CHECKSUM stage itself is one map-side-
    # combined groupBy to <=num_buckets rows (partial bit_xor/count
    # before its exchange), md5 fold fully codegen'd, no join. The
    # demo's OTHER shuffle is the LWW state build feeding it (A1
    # partial_max_by, pinned below too) — inherent to producing the
    # state, not part of table_checksum.
    "s16_replica_checksum": [
        "HashAggregate",
        "partial_max_by",
        "CODEGEN",
        "NOT:Join",
    ],
    # SemDeDup: the pair comparison is an equi-join on the cell key —
    # never a true cartesian; cell assignment is a literal argmax
    # PROJECTION (bounded trained centroids inlined), so no window and
    # no NLJ may appear anywhere in the plan.
    "sim4_semantic_dedup": [
        "ANY:BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin",
        "NOT:CartesianProduct",
        "NOT:Window",
        "NOT:BroadcastNestedLoopJoin",
    ],
    # Unigram LM scoring: the vocab join must run on the distinct
    # (doc, tok) aggregate (HashAggregate feeds the join), never a
    # cartesian; the 1-row corpus total arrives by broadcast.
    "tx13_unigram_logprob": [
        "ANY:BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin",
        "NOT:CartesianProduct",
    ],
    # Mixture weights: one corpus agg; the total is a broadcast NLJ
    # against 1 row — no data-wide window, no cartesian.
    "tx14_mixture_weights": ["HashAggregate", "NOT:CartesianProduct"],
    # Composed curation pipeline: stages join on doc_id — never a
    # cartesian (the LM stage's 1-row total broadcast NLJ is intended).
    "p5_corpus_curation": ["NOT:CartesianProduct"],
    # SQ8 rerank: encoding is a pure projection; the only join is the
    # broadcast query NLJ (the online-search shape, as in sim1) — no
    # corpus shuffle joins, no cartesian.
    "sim5_sq8_rerank": [
        "BroadcastNestedLoopJoin",
        "NOT:CartesianProduct",
        "NOT:SortMergeJoin",
        "NOT:ShuffledHashJoin",
    ],
    # Frame schedule: pure long arithmetic over metadata — a map-only
    # pass (zero-Exchange asserted exactly in
    # test_frame_schedule_shuffle_free).
    "mm4_frame_schedule": ["CODEGEN", "NOT:Exchange"],
    # URL dedup: one map-side-combined hash groupBy (the ≤1-Exchange
    # invariant is asserted exactly in
    # test_canonical_url_dedup_single_shuffle); canonicalization is a
    # codegen'd projection, no join anywhere.
    "dd11_url_dedup": ["HashAggregate", "CODEGEN", "NOT:Join"],
    # Mixture materialization: the corpus side must not shuffle — the
    # |groups|-row weights frame broadcasts and the draw is a codegen'd
    # filter (the corpus-side zero-hashpartitioning invariant is
    # asserted exactly in test_apply_mixture_no_corpus_shuffle; the
    # demo's weight AGGREGATION legitimately exchanges on source).
    "tx15_apply_mixture": ["BroadcastHashJoin", "NOT:SortMergeJoin"],
    # Sessionization: gap flag + running sum share ONE keyed window and
    # the per-session rollup reuses its partitioning (the exactly-one-
    # Exchange invariant is asserted in test_sessionize_gap_boundary);
    # never a global window.
    "w7_sessionize": ["Window", "HashAggregate", "NOT:SinglePartition"],
    # Global ntile: same two-phase shape as o3 — bucket-partitioned
    # window, the naive SinglePartition global window must never appear.
    "o4_global_ntile": ["Window", "NOT:SinglePartition"],
    # Leakage-safe split: one fingerprint-partitioned window (group
    # representative) + a pure codegen hash draw — no join, no global
    # window anywhere.
    "tx16_leakage_safe_split": ["Window", "NOT:SinglePartition", "NOT:Join"],
    # Quality tiering: the tier split must be the bucket-partitioned
    # two-phase form, never the ntile window function (tx13's 1-row
    # corpus-total agg is a legitimate SinglePartition — the no-
    # SinglePartition-feeding-a-Window invariant is consumer-asserted
    # in test_quality_tiers_partition_and_order).
    "tx17_quality_tiers": ["Window", "NOT:ntile", "NOT:CartesianProduct"],
    # Skew report: ONE map-side-combined groupBy; the totals come back
    # as a 1-row BROADCAST (NLJ on 1 row is intended) — never a
    # partition-less window, never a second hash exchange.
    "o5_skew_report": ["HashAggregate", "NOT:Window", "CODEGEN"],
    # CMS heavy hitters: the sketch probe must be a BROADCAST hash join
    # (the sketch is a few KB — probing never shuffles candidates);
    # no window, no cartesian between data-sized frames (the 1-row
    # threshold total broadcast-NLJ is intended).
    "a7_heavy_hitters": [
        "BroadcastHashJoin",
        "NOT:Window",
        "NOT:CartesianProduct",
    ],
    # Lag report: a grouped pass with conditional aggregates — no
    # window, no data-wide join (the 1-row cutoff broadcast is the
    # only join-shaped node).
    "s17_lag_report": ["HashAggregate", "NOT:Window", "CODEGEN"],
    # Backfill chunk plan: the rank window must stay bucket-partitioned
    # (never SinglePartition) — the whole point of the two-phase form.
    "o6_backfill_ranges": ["Window", "NOT:SinglePartition", "min_by"],
    # Cell diff: ONE key-equi full-outer join (any equi strategy), the
    # changed-column list a codegen projection — no cartesian, no
    # window, no per-column job shape.
    "u4_cell_diff": [
        "ANY:SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin",
        "FullOuter",
        "NOT:CartesianProduct",
        "NOT:Window",
    ],
}


def main() -> None:
    from tartare_spark.demos import SPARK
    from tartare_spark.session import get_spark

    spark = get_spark(master="local[8]", app_name="explain-audit",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    out_lines = [
        "# Physical-plan audit (explain formatted)\n",
        f"sf dir: `{SF_DIR}` — regenerated by `scripts/explain_audit.py`;",
        "each section lists the asserted plan properties, then the plan.\n",
    ]
    failures = []
    for name, must in CHECKS.items():
        df = SPARK[name](spark, SF_DIR)
        df.collect()  # finalize the AQE plan so codegen spans are visible
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        sbuf = io.StringIO()
        with redirect_stdout(sbuf):
            df.explain()  # simple mode: codegen spans marked as *(n)
        simple = sbuf.getvalue()
        def _fails(m: str) -> bool:
            if m == "CODEGEN":
                return "*(" not in simple
            if m.startswith("NOT:"):
                return m[4:] in plan
            if m.startswith("ANY:"):
                return not any(alt in plan for alt in m[4:].split("|"))
            return m not in plan

        missing = [m for m in must if _fails(m)]
        status = "OK" if not missing else f"MISSING {missing}"
        print(f"{name}: {status}")
        if missing:
            failures.append((name, missing))
        out_lines += [
            f"\n## {name} — asserted: {', '.join('`'+m+'`' for m in must)}"
            f" — **{status}**\n",
            "```",
            plan.strip()[:4000],
            "```",
        ]

    os.makedirs("BENCH", exist_ok=True)
    with open(os.path.join("BENCH", "PLANS.md"), "w") as f:
        f.write("\n".join(out_lines) + "\n")
    print(f"\nwrote BENCH/PLANS.md; {len(failures)} failures")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
