"""Property-based replay testing (hypothesis): for ANY change log and
ANY batch split, the engine's final state equals the single-threaded
pandas referee.

This goes beyond the fixed seed-42 fixture: hypothesis explores
adversarial op interleavings (delete-then-late-update, duplicate LSNs,
updates to absent keys, empty content, unicode paths) and arbitrary
chunk boundaries. Examples are kept small so each Spark replay is
cheap; shrinking gives a minimal failing log if a rule is ever broken.
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tartare_spark.fixtures import CHANGE_EVENT_COLUMNS, TS_BASE
from tartare_spark.lake.table import LakeTable
from tartare_spark.operators.apply import replay_batches
from tartare_spark.oracle import replay_referee

REPOS = ["r0", "r1"]
PATHS = ["a.py", "b.rs", "días/ü.md", "x y.go"]

op_st = st.sampled_from(["insert", "update", "delete"])
key_st = st.tuples(st.sampled_from(REPOS), st.sampled_from(PATHS))
content_st = st.sampled_from(["", "x", "héllo\nwörld", "0" * 50])


@st.composite
def change_log(draw):
    n = draw(st.integers(min_value=1, max_value=30))
    rows = []
    for lsn in range(1, n + 1):
        repo, path = draw(key_st)
        op = draw(op_st)
        content = "" if op == "delete" else draw(content_st)
        rows.append(
            (lsn, op, repo, path, f"c{lsn}", None, content,
             TS_BASE + pd.Timedelta(seconds=lsn))
        )
    # duplicate a few events verbatim (redelivery)
    dup_idx = draw(st.lists(st.integers(0, n - 1), max_size=3))
    rows += [rows[i] for i in dup_idx]
    # arbitrary arrival order
    order = draw(st.permutations(range(len(rows))))
    return [rows[i] for i in order]


@given(log=change_log(), chunks=st.integers(min_value=1, max_value=4))
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_any_log_any_split_matches_referee(spark, tmp_path_factory, log, chunks):
    pdf = pd.DataFrame(log, columns=CHANGE_EVENT_COLUMNS)
    events = spark.createDataFrame(pdf)

    root = tmp_path_factory.mktemp("prop_lake")
    lake = LakeTable.create(str(root / "lake"), num_buckets=4)
    replay_batches(spark, lake, events, num_chunks=chunks)

    expected = replay_referee(pdf)
    eng = lake.snapshot(spark)
    if expected.empty:
        assert eng.count() == 0
        return
    eng = eng.select(*expected.columns.tolist())
    exp = spark.createDataFrame(expected)
    assert eng.exceptAll(exp).count() == 0
    assert exp.exceptAll(eng).count() == 0


@given(log=change_log(), chunks=st.integers(min_value=1, max_value=4),
       re_frac=st.floats(min_value=0.1, max_value=1.0))
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_manifest_fence_any_inorder_log_with_redelivery(
    spark, tmp_path_factory, log, chunks, re_frac
):
    """Property: for ANY change log delivered IN ORDER (LSN-sorted
    chunks — the fence's contract) and ANY later redelivery of a
    prefix of it, the manifest-fenced replay converges to the referee
    state and the redelivered tail applies zero rows."""
    from tartare_spark.operators.apply import apply_batch

    pdf = pd.DataFrame(log, columns=CHANGE_EVENT_COLUMNS)
    ordered = pdf.sort_values("lsn", kind="stable").reset_index(drop=True)

    root = tmp_path_factory.mktemp("prop_fence")
    lake = LakeTable.create(str(root / "lake"), num_buckets=4)
    bounds = [int(len(ordered) * i / chunks) for i in range(chunks + 1)]
    bid = 0
    for i in range(chunks):
        part = ordered.iloc[bounds[i]:bounds[i + 1]]
        if part.empty:
            continue
        apply_batch(spark, lake, spark.createDataFrame(part), batch_id=bid,
                    lsn_fence="manifest")
        bid += 1

    # redeliver a prefix of the already-applied log in new batches
    re_n = max(1, int(len(ordered) * re_frac))
    redelivered = ordered.iloc[:re_n]
    rec = apply_batch(spark, lake, spark.createDataFrame(redelivered),
                      batch_id=bid, lsn_fence="manifest")
    assert rec["rows"] == 0  # the fence dropped every redelivered event

    expected = replay_referee(pdf)
    eng = lake.snapshot(spark)
    if expected.empty:
        assert eng.count() == 0
        return
    eng = eng.select(*expected.columns.tolist())
    exp = spark.createDataFrame(expected)
    assert eng.exceptAll(exp).count() == 0
    assert exp.exceptAll(eng).count() == 0


@given(
    ivs=st.lists(
        st.tuples(st.integers(0, 500), st.integers(0, 300)),
        min_size=1, max_size=40,
    ),
    width=st.integers(min_value=1, max_value=1000),
)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_interval_overlap_bucketed_any_intervals_any_width(spark, ivs, width):
    """Property: the bucketed equi+residual overlap join equals the
    theta join for ANY interval set (touching endpoints, zero-length,
    duplicates) and ANY bucket width (tiny fanout-heavy through wider
    than every interval)."""
    from pyspark.sql import functions as F2

    from tartare_spark.operators.ranges import interval_overlap_bucketed

    rows = [(i, s, s + d) for i, (s, d) in enumerate(ivs)]
    iv = spark.createDataFrame(rows, "k INT, s BIGINT, e BIGINT")
    a, b = iv.alias("a"), iv.alias("b")
    theta = {
        (r["k_a"], r["k_b"])
        for r in a.join(
            b,
            (F2.col("a.k") < F2.col("b.k"))
            & (F2.col("a.s") <= F2.col("b.e"))
            & (F2.col("b.s") <= F2.col("a.e")),
        )
        .select(F2.col("a.k").alias("k_a"), F2.col("b.k").alias("k_b"))
        .collect()
    }
    got = {
        (r["k_a"], r["k_b"])
        for r in interval_overlap_bucketed(
            iv, key="k", start="s", end="e", bucket_width=width
        ).collect()
    }
    assert got == theta
