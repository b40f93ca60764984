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
