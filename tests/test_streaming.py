"""M3: streaming replay, checkpoint resume, exactly-once (SURVEY.md §5.2)."""

import time

import pandas as pd
from pyspark.sql import functions as F
import pytest

from tartare_spark.fixtures import UNIT, generate_change_events, registry_rows
from tartare_spark.lake.table import LakeTable
from tartare_spark.oracle import replay_referee
from tartare_spark.registry import SchemaRegistry
from tartare_spark.streaming.runner import run_stream


@pytest.fixture(scope="module")
def expected():
    return replay_referee(
        pd.DataFrame(generate_change_events(UNIT)), registry_rows(UNIT)
    )


def _assert_matches(spark, lake, reg, expected):
    exp = spark.createDataFrame(expected)
    eng = lake.snapshot(spark, registry=reg).select(*expected.columns.tolist())
    assert eng.exceptAll(exp).count() == 0
    assert exp.exceptAll(eng).count() == 0


def test_streaming_replay_matches_referee(spark, unit_events_dir, tmp_path, expected):
    lake = LakeTable.create(str(tmp_path / "lake"), num_buckets=16)
    reg = SchemaRegistry(registry_rows(UNIT))
    run_stream(
        spark, unit_events_dir, lake, str(tmp_path / "ckpt"),
        registry=reg, max_files_per_trigger=7,
    )
    assert lake.current_version() >= 2  # multiple micro-batches happened
    _assert_matches(spark, lake, reg, expected)
    # T7: every committed batch has a metrics record with throughput AND
    # event-time lag (footer-derived max event ts per batch)
    recs = [m for m in lake.metrics() if not m.get("skipped")]
    assert recs and all("keys_per_sec" in m for m in recs if m["rows"])
    assert all(
        m["max_event_ts"] is not None and m["lag_seconds"] is not None
        for m in recs if m["rows"]
    )


def test_streaming_resume_after_kill(spark, unit_events_dir, tmp_path, expected):
    """T6: kill mid-replay, resume from the same checkpoint → exact state,
    no loss, no duplication."""
    lake = LakeTable.create(str(tmp_path / "lake2"), num_buckets=16)
    reg = SchemaRegistry(registry_rows(UNIT))
    ckpt = str(tmp_path / "ckpt2")
    q = run_stream(
        spark, unit_events_dir, lake, ckpt, registry=reg,
        max_files_per_trigger=3, available_now=False, await_termination=False,
    )
    deadline = time.time() + 120
    while lake.current_version() < 2 and time.time() < deadline:
        time.sleep(0.3)
    q.stop()
    assert lake.current_version() >= 2
    run_stream(spark, unit_events_dir, lake, ckpt, registry=reg, max_files_per_trigger=3)
    _assert_matches(spark, lake, reg, expected)
    lake.vacuum()  # reclaim any files orphaned by the kill
    _assert_matches(spark, lake, reg, expected)


def test_streaming_rerun_same_checkpoint_noop(spark, unit_events_dir, tmp_path, expected):
    lake = LakeTable.create(str(tmp_path / "lake3"), num_buckets=8)
    reg = SchemaRegistry(registry_rows(UNIT))
    ckpt = str(tmp_path / "ckpt3")
    run_stream(spark, unit_events_dir, lake, ckpt, registry=reg, max_files_per_trigger=10)
    v = lake.current_version()
    run_stream(spark, unit_events_dir, lake, ckpt, registry=reg, max_files_per_trigger=10)
    assert lake.current_version() == v
    _assert_matches(spark, lake, reg, expected)


def test_streaming_cow_lake(spark, unit_events_dir, tmp_path, expected):
    """The streaming runner against a copy-on-write lake (the read-heavy
    mode) converges to the same referee state."""
    lake = LakeTable.create(str(tmp_path / "lake_cow"), num_buckets=8, mode="cow")
    reg = SchemaRegistry(registry_rows(UNIT))
    run_stream(
        spark, unit_events_dir, lake, str(tmp_path / "ckpt_cow"),
        registry=reg, max_files_per_trigger=10,
    )
    _assert_matches(spark, lake, reg, expected)


def test_streaming_stateful_fence_path(spark, unit_events_dir, tmp_path, expected):
    """T5: the applyInPandasWithState applied-LSN fence yields the same
    final state (it only drops events the LWW merge would discard) and
    its per-batch apply volume is <= the unfenced replay's."""
    lake = LakeTable.create(str(tmp_path / "lake5"), num_buckets=8)
    reg = SchemaRegistry(registry_rows(UNIT))
    run_stream(
        spark, unit_events_dir, lake, str(tmp_path / "ckpt5"),
        registry=reg, max_files_per_trigger=7, stateful_fence=True,
    )
    _assert_matches(spark, lake, reg, expected)


def test_streaming_watermark_dedup_path(spark, unit_events_dir, tmp_path, expected):
    """T2: the withWatermark + dropDuplicatesWithinWatermark path yields
    the same final state (dedup is belt-and-braces over the LWW merge)."""
    lake = LakeTable.create(str(tmp_path / "lake4"), num_buckets=8)
    reg = SchemaRegistry(registry_rows(UNIT))
    run_stream(
        spark, unit_events_dir, lake, str(tmp_path / "ckpt4"),
        registry=reg, max_files_per_trigger=None,  # one big batch
        drop_dup_within_watermark=True,
    )
    _assert_matches(spark, lake, reg, expected)


def test_lake_to_lake_relay(spark, unit_events_dir, tmp_path):
    """CDC relay: lake A's streaming change feed drives lake B's apply;
    B converges to exactly A's live snapshot (deletes included), and an
    incremental catch-up after more commits to A also converges."""
    from tartare_spark.operators.apply import apply_batch, feed_as_changelog

    src = spark.read.parquet(f"{unit_events_dir}/*.parquet")
    lake_a = LakeTable.create(str(tmp_path / "a"), num_buckets=8)
    from tartare_spark.operators.apply import replay_batches

    replay_batches(spark, lake_a, src, num_chunks=3)

    lake_b = LakeTable.create(str(tmp_path / "b"), num_buckets=8)

    def relay(batch_df, batch_id):
        apply_batch(spark, lake_b, feed_as_changelog(batch_df), batch_id)

    q = (
        lake_a.stream_changes(spark)
        .writeStream.foreachBatch(relay)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    a = lake_a.snapshot(spark)
    b = lake_b.snapshot(spark)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

    # more commits to A, then resume the relay from the same checkpoint
    more = src.limit(200).withColumn("lsn", F.col("lsn") + 1_000_000)
    apply_batch(spark, lake_a, more, batch_id=lake_a.last_batch_id() + 1)
    q2 = (
        lake_a.stream_changes(spark)
        .writeStream.foreachBatch(relay)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()
    a2, b2 = lake_a.snapshot(spark), lake_b.snapshot(spark)
    assert a2.exceptAll(b2).count() == 0 and b2.exceptAll(a2).count() == 0


def test_progress_listener_survives_recentprogress_cap(spark, unit_events_dir, tmp_path):
    """progress.jsonl must record EVERY micro-batch even when the run
    has more batches than spark.sql.streaming.numRecentProgressUpdates
    retains — the listener, not the capped recentProgress dump, is the
    system of record."""
    import json

    key = "spark.sql.streaming.numRecentProgressUpdates"
    prev = spark.conf.get(key)
    spark.conf.set(key, "3")
    try:
        lake = LakeTable.create(str(tmp_path / "lake"), num_buckets=8)
        run_stream(
            spark,
            f"{unit_events_dir}",
            lake,
            str(tmp_path / "ckpt"),
            max_files_per_trigger=2,  # many micro-batches
        )
        with open(f"{lake.root}/_metrics/progress.jsonl") as f:
            progress_batches = {json.loads(l)["batchId"] for l in f}
        applied = {m["batch_id"] for m in lake.metrics() if not m.get("skipped")}
        assert len(applied) > 3  # the run really exceeded the cap
        assert applied <= progress_batches, (
            f"missing progress for batches {sorted(applied - progress_batches)}"
        )
    finally:
        spark.conf.set(key, prev)
