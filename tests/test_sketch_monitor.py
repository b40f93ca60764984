"""Unit tests for the A7 count-min sketch, O5 skew report and S17 lag
report (cross-engine value parity rides scripts/check_correctness.py)."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _events(spark):
    return spark.read.parquet(f"{SF}/events.parquet")


# ---------------------------------------------------------------- A7 CMS
def test_cms_never_undercounts(spark):
    """The classical CMS guarantee: est ≥ exact for EVERY key, even at
    a deliberately collision-heavy width."""
    from tartare_spark.operators.sketch import cms_build, cms_estimate

    ev = _events(spark).withColumn("k", F.col("user_id").cast("string"))
    exact = ev.groupBy("k").agg(F.count("*").alias("n_exact"))
    for width in (8, 1024):  # 15 keys over 8 slots forces collisions
        sk = cms_build(ev, "k", depth=4, width=width)
        est = cms_estimate(sk, exact, "k", depth=4, width=width)
        bad = exact.join(est, "k").where(F.col("n_est") < F.col("n_exact"))
        assert bad.count() == 0, f"CMS undercounted at width={width}"


def test_cms_sketch_size_bounded(spark):
    from tartare_spark.operators.sketch import cms_build

    ev = _events(spark).withColumn("k", F.col("user_id").cast("string"))
    sk = cms_build(ev, "k", depth=4, width=16)
    assert sk.count() <= 4 * 16
    # total mass per depth row equals the input row count
    per_depth = {r["d"]: r["t"] for r in sk.groupBy("d").agg(F.sum("n").alias("t")).collect()}
    n = ev.count()
    assert set(per_depth) == {0, 1, 2, 3} and all(v == n for v in per_depth.values())


def test_heavy_hitters_superset_and_exact_at_wide_width(spark):
    """At a collision-free width the CMS answer IS the exact answer; at
    a tight width it is a superset that still contains every true hot
    key. Also pins the absolute-threshold form and the arg guard."""
    from tartare_spark.operators.sketch import heavy_hitters

    ev = _events(spark).withColumn("k", F.col("user_id").cast("string"))
    exact_hot = {
        r["k"]
        for r in ev.groupBy("k")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") >= 70)
        .collect()
    }
    wide = heavy_hitters(ev, "k", threshold=70, width=65536)
    rows = wide.collect()
    assert {r["k"] for r in rows} == exact_hot
    assert all(r["overcount"] == 0 for r in rows)

    tight = {r["k"] for r in heavy_hitters(ev, "k", threshold=70, width=8).collect()}
    assert exact_hot <= tight

    with pytest.raises(ValueError):
        heavy_hitters(ev, "k")
    with pytest.raises(ValueError):
        heavy_hitters(ev, "k", threshold=1, rel_threshold=1.0)


def test_cms_probe_is_broadcast_join(spark):
    """The sketch side must broadcast — probing a candidate set never
    shuffles it."""
    from tartare_spark.operators.sketch import cms_build, cms_estimate

    ev = _events(spark).withColumn("k", F.col("user_id").cast("string"))
    keys = ev.select("k").distinct()
    est = cms_estimate(cms_build(ev, "k", width=64), keys, "k", width=64)
    plan = est._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "BroadcastHashJoin" in plan


# ------------------------------------------------------------ O5 skew
def test_skew_report_flags_planted_hot_key(spark):
    from tartare_spark.operators.salt import skew_report

    # 3 cold keys × 10 rows, 1 hot key × 70 rows → mean 25, ratio 2.8
    rows = [(f"k{i % 3}",) for i in range(30)] + [("hot",)] * 70
    df = spark.createDataFrame(rows, "key string")
    rep = {r["key"]: r for r in skew_report(df, "key", hot_ratio=2.0).collect()}
    assert rep["hot"]["is_hot"] and rep["hot"]["salt_factor"] == 3  # ceil(2.8)
    assert not rep["k0"]["is_hot"] and rep["k0"]["salt_factor"] == 1
    assert abs(sum(r["share"] for r in rep.values()) - 1.0) < 1e-4
    assert rep["hot"]["n_events"] == 70


def test_skew_report_no_window_no_extra_shuffle(spark):
    """Plan: ONE Exchange for the groupBy; totals come back as a 1-row
    broadcast, never a partition-less window."""
    from tartare_spark.operators.salt import skew_report

    rep = skew_report(_events(spark), "user_id")
    rep.collect()  # AQE reuse only shows in the FINAL adaptive plan
    plan = rep._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "Window" not in plan
    # ONE real hash exchange for the groupBy; the totals pass REUSES it
    # (ReusedExchange lines echo the exchange text — don't count them)
    real = [
        ln
        for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln and "ReusedExchange" not in ln
    ]
    assert len(real) == 1, plan


# ------------------------------------------------------------ S17 lag
def test_lag_report_semantics(spark):
    from tartare_spark.operators.monitor import lag_report

    rows = [
        ("a", 1), ("a", 5), ("a", 9),   # cutoff 5: wm 5, pending {9}
        ("b", 2), ("b", 4),             # fully applied
        ("c", 7), ("c", 8),             # nothing applied yet
    ]
    df = spark.createDataFrame(rows, "repo string, lsn long")
    rep = {r["repo"]: r for r in lag_report(df, cutoff=5).collect()}
    a, b, c = rep["a"], rep["b"], rep["c"]
    assert (a["applied_wm"], a["n_pending"], a["oldest_pending_lsn"], a["lag_lsn"]) == (5, 1, 9, 4)
    assert (b["applied_wm"], b["n_pending"], b["oldest_pending_lsn"], b["lag_lsn"]) == (4, 0, None, 0)
    # bootstrap-pending key: lag is NULL (unknown), not 0
    assert (c["applied_wm"], c["n_pending"], c["oldest_pending_lsn"], c["lag_lsn"]) == (None, 2, 7, None)


def test_lag_report_single_shuffle(spark):
    from tartare_spark.operators.monitor import lag_report

    rep = lag_report(
        _events(spark).select(F.col("user_id").cast("string").alias("repo"),
                              F.col("event_id").alias("lsn")),
        cutoff=500,
    )
    plan = rep._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    import re

    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert "Window" not in plan and "Join" not in plan
