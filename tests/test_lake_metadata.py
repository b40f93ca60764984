"""Queryable metadata tables (lake/metadata.py — Iceberg
``db.table.files`` / ``.snapshots`` / ``.partitions`` parity): every
view must agree exactly with the manifest it projects and with the
physical parquet files on disk."""

import json

import pyarrow.parquet as pq
import pytest

from tartare_spark.lake.metadata import files_df, partitions_df, snapshots_df
from tartare_spark.lake.table import LakeTable
from tartare_spark.operators.apply import replay_batches


@pytest.fixture(scope="module")
def unit_events(spark, unit_events_dir):
    return spark.read.parquet(f"{unit_events_dir}/*.parquet")


@pytest.fixture(scope="module")
def meta_lake(spark, unit_events, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("meta") / "lake")
    lake = LakeTable.create(root, num_buckets=8)
    replay_batches(spark, lake, unit_events, num_chunks=3)
    return lake


def test_files_df_matches_manifest_and_footers(spark, meta_lake):
    m = meta_lake.manifest()
    got = {r["path"]: r for r in files_df(spark, meta_lake).collect()}

    want_paths = {
        p: (int(b), kind)
        for key, kind in (("files", "base"), ("deltas", "delta"))
        for b, fl in m.get(key, {}).items()
        for p in fl
    }
    assert set(got) == set(want_paths)
    for p, (b, kind) in want_paths.items():
        assert (got[p]["bucket"], got[p]["kind"]) == (b, kind)
        # physical stats must match an independent footer read
        assert got[p]["num_rows"] == pq.read_metadata(p).num_rows
        assert got[p]["size_bytes"] > 0

    # total physical rows across base+delta == a direct parquet read of
    # every listed file (pre-LWW-resolution row count)
    assert sum(r["num_rows"] for r in got.values()) == spark.read.parquet(
        *want_paths
    ).count()


def test_partitions_df_matches_manifest(spark, meta_lake):
    m = meta_lake.manifest()
    rows = {r["bucket"]: r for r in partitions_df(spark, meta_lake).collect()}
    all_b = (
        {int(b) for b in m.get("files", {})}
        | {int(b) for b in m.get("deltas", {})}
        | {int(b) for b in m.get("bucket_lsn", {})}
    )
    assert set(rows) == all_b
    for b, r in rows.items():
        assert r["n_base_files"] == len(m.get("files", {}).get(str(b), []))
        assert r["n_delta_files"] == len(m.get("deltas", {}).get(str(b), []))
        assert r["last_lsn"] == m.get("bucket_lsn", {}).get(str(b))


def test_snapshots_df_is_history(spark, meta_lake):
    hist = meta_lake.history()
    rows = sorted(
        snapshots_df(spark, meta_lake).collect(), key=lambda r: r["version"]
    )
    assert [r["version"] for r in rows] == [h["version"] for h in hist]
    for r, h in zip(rows, hist):
        assert r["batch_id"] == h["batch_id"]
        assert r["rows_written"] == h["stats"].get("rows_written")


def test_files_df_time_travel_and_compact(spark, meta_lake):
    """Past-version view lists the PAST snapshot's files; after
    compaction the live view has no deltas and the same total rows the
    deduped snapshot had."""
    v_before = meta_lake.current_version()
    before = files_df(spark, meta_lake, version=v_before).collect()

    meta_lake.compact(spark)
    live = files_df(spark, meta_lake).collect()
    assert all(r["kind"] == "base" for r in live)
    # compacted bases hold exactly the LWW-resolved raw rows (one per
    # key, tombstones retained)
    assert (
        sum(r["num_rows"] for r in live)
        == meta_lake.read_raw(spark).count()
    )

    # the old version still reports its own (pre-compaction) listing
    again = files_df(spark, meta_lake, version=v_before).collect()
    assert {r["path"] for r in again} == {r["path"] for r in before}


def test_cli_meta(spark, meta_lake, capsys):
    from tartare_spark.__main__ import main

    for table in ("files", "snapshots", "partitions"):
        rc = main(["meta", table, "--lake", meta_lake.root])
        lines = [
            l
            for l in capsys.readouterr().out.strip().splitlines()
            if l.startswith("{")
        ]
        assert rc == 0 and len(lines) >= 1
        json.loads(lines[0])

    # snapshots lists ALL retained versions; --version there is a
    # usage error, rejected before any work
    rc = main(
        ["meta", "snapshots", "--lake", meta_lake.root, "--version", "1"]
    )
    capsys.readouterr()
    assert rc == 2


def test_refs_df_lists_main_tags_branches(spark, meta_lake, capsys):
    """Iceberg ``table.refs`` parity: main HEAD + every tag + every
    live branch, with fork/current versions; CLI `meta refs` prints the
    same rows and rejects --version."""
    from tartare_spark.__main__ import main
    from tartare_spark.lake.metadata import refs_df

    tag_v = meta_lake.current_version()
    meta_lake.create_tag("rel-1", tag_v)
    br = meta_lake.create_branch("audit")
    try:
        refs = {r["name"]: r for r in refs_df(spark, meta_lake).collect()}
        assert refs["main"]["type"] == "branch"
        assert refs["main"]["version"] == meta_lake.current_version()
        assert refs["rel-1"]["type"] == "tag" and refs["rel-1"]["version"] == tag_v
        assert refs["audit"]["type"] == "branch"
        assert refs["audit"]["fork_version"] == tag_v
        assert refs["audit"]["version"] == br.current_version()

        rc = main(["meta", "refs", "--lake", meta_lake.root])
        lines = [
            l
            for l in capsys.readouterr().out.strip().splitlines()
            if l.startswith("{")
        ]
        assert rc == 0 and {json.loads(l)["name"] for l in lines} == {
            "main", "rel-1", "audit",
        }
        rc = main(["meta", "refs", "--lake", meta_lake.root, "--version", "1"])
        capsys.readouterr()
        assert rc == 2
    finally:
        meta_lake.drop_branch("audit")
        meta_lake.drop_tag("rel-1")
