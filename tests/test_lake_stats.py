"""Manifest zone maps (analyze / scan_where): equality vs a filtered
snapshot, behavioral proof that pruning really skips files, stats
carry-forward/back-fill across commits, and type guards.

The pruning proof follows the persisted-IVF pattern: ``inputFiles()``
lists PRE-pruning files and cannot prove anything, so we corrupt the
files the zone map must skip and show the query still answers exactly
— a query that touched them would crash.
"""

import datetime

import pytest
from pyspark.sql import functions as F

from tartare_spark.lake.table import LakeTable, _stats_admit
from tartare_spark.operators.apply import apply_batch, replay_batches


@pytest.fixture(scope="module")
def unit_events(spark, unit_events_dir):
    return spark.read.parquet(f"{unit_events_dir}/*.parquet")


def _rows_set(df):
    return {tuple(r) for r in df.collect()}


BOUNDS_CASES = [
    {"_lsn": (500, None)},
    {"_lsn": (None, 2000), "repo": ("repo_2", "repo_7")},
    {"repo": (None, "repo_3")},
    {"_lsn": (10**9, None)},  # empty result
]


def test_scan_where_matches_filtered_snapshot(spark, unit_events, tmp_path):
    lake = LakeTable.create(str(tmp_path / "lake_zm"), num_buckets=8)
    replay_batches(spark, lake, unit_events, num_chunks=4)

    def residual(df, bounds):
        for c, (lo, hi) in bounds.items():
            if lo is not None:
                df = df.filter(F.col(c) >= lo)
            if hi is not None:
                df = df.filter(F.col(c) <= hi)
        return df

    # pre-analyze AND with dirty buckets: no stats exist, every file is
    # conservatively read — must already be exact
    for bounds in BOUNDS_CASES:
        got = _rows_set(lake.scan_where(spark, bounds))
        want = _rows_set(residual(lake.snapshot(spark), bounds))
        assert got == want

    lake.compact(spark)
    n = lake.analyze(["_lsn", "repo"])
    assert n > 0
    m = lake.manifest()
    assert m["stats_cols"] == ["_lsn", "repo"]
    base = {p for fl in m["files"].values() for p in fl}
    assert set(m["file_stats"]) == base

    for bounds in BOUNDS_CASES:
        got = _rows_set(lake.scan_where(spark, bounds))
        want = _rows_set(residual(lake.snapshot(spark), bounds))
        assert got == want


def _clustered_lake(spark, tmp_path, name):
    """One path per repo → each (repo, path) key lives in exactly one
    bucket file, so per-file repo min/max actually separate — zone maps
    only prune clustered data, which is the production case they exist
    for (key-clustered compaction output)."""
    rows = [
        (
            i + 1,
            "update",
            f"repo_{i:02d}",
            "main.py",
            f"c{i:02d}",
            "py",
            f"content-{i:02d}",
            datetime.datetime(2024, 1, 1, 0, 0, i),
        )
        for i in range(24)
    ]
    ev = spark.createDataFrame(
        rows, "lsn LONG, op STRING, repo STRING, path STRING, "
        "commit STRING, lang STRING, content STRING, ts TIMESTAMP"
    )
    lake = LakeTable.create(str(tmp_path / name), num_buckets=4)
    apply_batch(spark, lake, ev, batch_id=1)
    lake.compact(spark)
    lake.analyze(["repo"])
    return lake


def test_zone_map_pruning_skips_files(spark, tmp_path):
    lake = _clustered_lake(spark, tmp_path, "lake_prune")
    fstats = lake.manifest()["file_stats"]
    # query for the globally-largest repo: every file whose max is
    # below it MUST be pruned
    target = max(s["repo"][1] for s in fstats.values())
    bounds = {"repo": (target, target)}
    pruned = [p for p, s in fstats.items() if not _stats_admit(s, bounds)]
    kept = [p for p in fstats if p not in pruned]
    assert pruned and kept, "fixture must split into pruned + kept files"

    expected = _rows_set(lake.scan_where(spark, bounds))
    assert expected, "target repo must survive its own bounds"

    for p in pruned:
        with open(p, "wb") as f:
            f.write(b"not a parquet file")
    # corruption is real: a full snapshot read must fail…
    with pytest.raises(Exception):
        lake.snapshot(spark).count()
    # …but the zone-mapped scan never opens the pruned files
    assert _rows_set(lake.scan_where(spark, bounds)) == expected


def test_dirty_buckets_never_file_pruned(spark, tmp_path):
    """A delta'd bucket is read in full even when its BASE file's stats
    exclude the predicate — pruning it could resurrect an older version
    of a key whose latest row sits outside the bounds."""
    lake = _clustered_lake(spark, tmp_path, "lake_dirty")
    fstats = lake.manifest()["file_stats"]
    target = max(s["repo"][1] for s in fstats.values())

    # move the target repo's row OUT of the bounds via a newer version
    # with a different... repo is the key, so update its content; the
    # key stays inside bounds but its latest version lives in a DELTA
    # file the zone map knows nothing about
    upd = spark.createDataFrame(
        [(100, "update", target, "main.py", "c_new", "py", "content-new",
          datetime.datetime(2024, 1, 2))],
        "lsn LONG, op STRING, repo STRING, path STRING, commit STRING, "
        "lang STRING, content STRING, ts TIMESTAMP",
    )
    apply_batch(spark, lake, upd, batch_id=2)

    got = lake.scan_where(spark, {"repo": (target, target)})
    rows = got.collect()
    assert len(rows) == 1
    r = rows[0].asDict()
    assert r["content"] == "content-new" and r["_lsn"] == 100


def test_stats_carry_forward_and_backfill(spark, unit_events, tmp_path):
    lake = LakeTable.create(str(tmp_path / "lake_cf"), num_buckets=8)
    replay_batches(spark, lake, unit_events, num_chunks=2)
    lake.compact(spark)
    lake.analyze(["_lsn"])
    v_analyze = lake.current_version()

    # MOR batches touch only deltas → stats map unchanged, no sweep
    replay_batches(
        spark, lake, unit_events.filter(F.col("lsn") % 3 == 0),
        num_chunks=1, start_batch_id=10,
    )
    m = lake.manifest()
    assert m["version"] > v_analyze
    base = {p for fl in m["files"].values() for p in fl}
    assert set(m["file_stats"]) == base  # carried forward verbatim

    # compaction rewrites dirty buckets → old entries dropped, new base
    # files back-filled automatically (no second analyze call)
    lake.compact(spark)
    m2 = lake.manifest()
    base2 = {p for fl in m2["files"].values() for p in fl}
    assert base2 != base
    assert set(m2["file_stats"]) == base2
    for s in m2["file_stats"].values():
        assert "_lsn" in s and s["_lsn"][0] <= s["_lsn"][1]

    # and the scan still matches a filtered snapshot after all that
    got = _rows_set(lake.scan_where(spark, {"_lsn": (300, 900)}))
    want = _rows_set(
        lake.snapshot(spark).filter(
            (F.col("_lsn") >= 300) & (F.col("_lsn") <= 900)
        )
    )
    assert got == want


def test_scan_where_with_registry_matches_snapshot(spark, unit_events, tmp_path):
    """Read-time evolution applies after pruning: scan_where(registry=)
    must equal snapshot(registry=) filtered by the same bounds."""
    from tartare_spark.fixtures import UNIT, registry_rows
    from tartare_spark.registry import SchemaRegistry

    reg = SchemaRegistry(registry_rows(UNIT))
    lake = LakeTable.create(str(tmp_path / "lake_reg"), num_buckets=8)
    replay_batches(spark, lake, unit_events, num_chunks=2, registry=reg)
    lake.compact(spark)
    lake.analyze(["_lsn"])
    bounds = {"_lsn": (200, 1500)}
    got = _rows_set(lake.scan_where(spark, bounds, registry=reg))
    want = _rows_set(
        lake.snapshot(spark, registry=reg).filter(
            (F.col("_lsn") >= 200) & (F.col("_lsn") <= 1500)
        )
    )
    assert got == want and got


def test_analyze_rejects_unsupported_column(spark, tmp_path):
    lake = _clustered_lake(spark, tmp_path, "lake_badcol")
    with pytest.raises(TypeError, match="numeric or string"):
        lake.analyze(["_ts"])


def test_analyze_cli(spark, unit_events, tmp_path):
    from tartare_spark.__main__ import main

    lake = LakeTable.create(str(tmp_path / "lake_cli"), num_buckets=4)
    replay_batches(spark, lake, unit_events, num_chunks=1)
    lake.compact(spark)
    rc = main(["analyze", "--lake", lake.root, "--cols", "_lsn,repo"])
    assert rc == 0
    assert lake.manifest()["stats_cols"] == ["_lsn", "repo"]


def test_small_file_target_prunes_within_bucket(spark, tmp_path):
    """compact(max_records_per_file=N) splits each bucket into several
    key-sorted files with TIGHT per-file (repo) ranges — so a selective
    repo predicate prunes files INSIDE a clean bucket, not just whole
    buckets. Proven behaviorally: corrupt every pruned file, the scan
    still answers exactly."""
    rows = [
        (
            r * 40 + p + 1,
            "update",
            f"repo_{r:02d}",
            f"src/f{p:03d}.py",
            f"c{r}_{p}",
            "py",
            f"content-{r}-{p}",
            datetime.datetime(2024, 1, 1, 0, 0, 0),
        )
        for r in range(16)
        for p in range(40)
    ]
    ev = spark.createDataFrame(
        rows, "lsn LONG, op STRING, repo STRING, path STRING, "
        "commit STRING, lang STRING, content STRING, ts TIMESTAMP"
    )
    lake = LakeTable.create(str(tmp_path / "lake_split"), num_buckets=2)
    apply_batch(spark, lake, ev, batch_id=1)
    lake.compact(spark, max_records_per_file=60)
    lake.analyze(["repo"])
    m = lake.manifest()
    per_bucket = {b: len(fl) for b, fl in m["files"].items()}
    assert all(n >= 3 for n in per_bucket.values()), (
        f"file-size target did not split buckets: {per_bucket}"
    )

    fstats = m["file_stats"]
    target = max(s["repo"][1] for s in fstats.values())
    bounds = {"repo": (target, target)}
    pruned = [p for p, s in fstats.items() if not _stats_admit(s, bounds)]
    # the point of the split: pruning must now act WITHIN a bucket —
    # some bucket must keep at least one file while losing others
    from collections import Counter

    pruned_per_bucket = Counter(p.split("_bucket=")[1].split("/")[0] for p in pruned)
    assert any(
        0 < pruned_per_bucket.get(b, 0) < n for b, n in per_bucket.items()
    ), f"no intra-bucket pruning: {pruned_per_bucket} of {per_bucket}"

    expected = _rows_set(lake.scan_where(spark, bounds))
    assert expected
    for p in pruned:
        with open(p, "wb") as f:
            f.write(b"garbage")
    assert _rows_set(lake.scan_where(spark, bounds)) == expected


# ----------------------------------------------------------------------
# z-order compaction (lake/zorder.py)
# ----------------------------------------------------------------------
def _grid_lake(spark, tmp_path, name, zorder):
    """32 repos x 32 paths, one event per key: under lexicographic
    (repo, path) clustering every compacted file spans ~the whole path
    domain; under z-order both per-file ranges stay bounded."""
    rows = [
        (
            r * 32 + p + 1,
            "update",
            f"repo_{r:02d}",
            f"p_{p:02d}",
            f"c{r}_{p}",
            "py",
            f"content-{r}-{p}",
            datetime.datetime(2024, 1, 1, 0, 0, 0),
        )
        for r in range(32)
        for p in range(32)
    ]
    ev = spark.createDataFrame(
        rows, "lsn LONG, op STRING, repo STRING, path STRING, "
        "commit STRING, lang STRING, content STRING, ts TIMESTAMP"
    )
    lake = LakeTable.create(str(tmp_path / name), num_buckets=2)
    apply_batch(spark, lake, ev, batch_id=1)
    lake.compact(spark, max_records_per_file=64, zorder=zorder)
    lake.analyze(["repo", "path"])
    return lake


def _kept(lake, bounds):
    fstats = lake.manifest()["file_stats"]
    return sum(1 for s in fstats.values() if _stats_admit(s, bounds)), len(fstats)


def test_zorder_compaction_prunes_both_dimensions(spark, tmp_path):
    lex = _grid_lake(spark, tmp_path, "lake_lex", zorder=None)
    zo = _grid_lake(spark, tmp_path, "lake_zo", zorder=["repo", "path"])

    # same table state either way — clustering is layout, not semantics
    assert _rows_set(zo.snapshot(spark)) == _rows_set(lex.snapshot(spark))

    path_bounds = {"path": ("p_08", "p_08")}
    repo_bounds = {"repo": ("repo_08", "repo_08")}

    lex_path_kept, lex_total = _kept(lex, path_bounds)
    zo_path_kept, zo_total = _kept(zo, path_bounds)
    # the reason z-order exists: a path-only predicate prunes (almost)
    # nothing under lexicographic clustering — only a partial tail file
    # can drop — but most files under z-order
    assert lex_path_kept >= lex_total - 2, (
        f"lex files should span the path domain: kept {lex_path_kept}"
        f"/{lex_total}"
    )
    assert zo_path_kept <= zo_total // 2, (
        f"z-order must bound per-file path ranges: kept {zo_path_kept}"
        f"/{zo_total}"
    )
    # ...while repo pruning still works (degraded vs lex is fine)
    zo_repo_kept, _ = _kept(zo, repo_bounds)
    assert zo_repo_kept < zo_total

    # and the pruned scans stay exact on both layouts
    for lake in (lex, zo):
        for bounds in (path_bounds, repo_bounds):
            col, (lo, hi) = next(iter(bounds.items()))
            want = _rows_set(
                lake.snapshot(spark).filter(
                    (F.col(col) >= lo) & (F.col(col) <= hi)
                )
            )
            assert want, "target slice must be non-empty"
            assert _rows_set(lake.scan_where(spark, bounds)) == want


def test_zvalue_matches_python_morton(spark):
    """The codegen'd bin + interleave arithmetic against a driver-side
    reference on the same sampled boundaries."""
    import bisect

    from tartare_spark.lake.zorder import column_boundaries, zvalue

    rows = [(f"a_{i:03d}", f"b_{(i * 7) % 100:03d}") for i in range(100)]
    df = spark.createDataFrame(rows, "x STRING, y STRING")
    cuts = {c: column_boundaries(df, c) for c in ("x", "y")}
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.withColumn("z", zvalue(df, ["x", "y"])).collect()
    }

    def ref_z(x, y):
        bx = bisect.bisect_right(cuts["x"], x)
        by = bisect.bisect_right(cuts["y"], y)
        z = 0
        for bit in range(8):
            z |= ((bx >> bit) & 1) << (bit * 2)
            z |= ((by >> bit) & 1) << (bit * 2 + 1)
        return z

    assert got == {(x, y): ref_z(x, y) for x, y in rows}
