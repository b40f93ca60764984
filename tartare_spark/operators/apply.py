"""The per-micro-batch CDC apply: the heart of the engine.

Pipeline (SURVEY.md §3.2 Entry A/B), one micro-batch in, one lake
snapshot out:

1. **A1 dedup** — max-LSN event per (repo, path) (map-side combined).
2. **bucket (J3)** — compute each key's bucket (codegen'd hash).
3. **apply** — MOR: ONE job (dedup shuffle → bucket-aligned delta
   write); touched buckets + watermarks recovered from the parquet
   footers of the just-written files (driver-side, ≤num_buckets files,
   no second pass over data). CoW: small bucket-stats collect
   (≤num_buckets rows) → full-outer MERGE vs touched buckets only →
   rewrite (J1).
4. **S5/S7 commit** — publish manifest atomically, keyed by batch_id
   (re-delivery = no-op).
5. **lineage + T7 metrics** — per-bucket applied-LSN watermarks and a
   rows/sec JSONL record.

Scale notes (the 100 TB story): in the default **merge-on-read** lake
mode each batch shuffles (a) the batch once for dedup and (b) once more
to co-locate buckets for the delta write — per-batch cost is O(batch),
independent of table size; read-time LWW resolution is bounded by
periodic compaction (every ``compact_every`` delta files per bucket).
In **copy-on-write** mode step 3/4 full-outer-merge and rewrite the
touched buckets instead (O(table) per batch, zero read-time work).
The driver never sees data rows — only the ≤num_buckets touched-bucket
ids and scalar counters. Skew: bucketing hashes the FULL key
(repo, path), so a hot repo spreads over all buckets (salted bucketing,
BASELINE.json:6); AQE skew-join splitting covers residual join skew.
"""

from __future__ import annotations

import logging
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tartare_spark.lake.table import LakeTable, bucket_expr
from tartare_spark.operators.dedup import dedup_latest_lsn
from tartare_spark.operators.merge import merge_upserts

logger = logging.getLogger(__name__)

EVENT_COLS = ["lsn", "op", "repo", "path", "commit", "lang", "content", "ts"]


def feed_as_changelog(feed: DataFrame) -> DataFrame:
    """Adapt a lake change feed (physical rows from
    ``LakeTable.changes``/``stream_changes``) back into the change-event
    shape, so one lake's feed can drive another lake's apply — the
    CDC-relay / lake-to-lake replication composition. Pure projection."""
    return feed.select(
        F.col("_lsn").alias("lsn"),
        F.when(F.col("_deleted"), "delete").otherwise("update").alias("op"),
        "repo",
        "path",
        "commit",
        "lang",
        "content",
        F.col("_ts").alias("ts"),
    )


def manifest_watermark_fence(
    ev: DataFrame, lake: LakeTable, allowed_lateness: int = 0,
    broadcast_threshold: int = 4096,
) -> DataFrame:
    """JVM-side redelivery fence: drop events at-or-below the lake's
    per-bucket applied-LSN watermark (read from the CURRENT manifest,
    driver-side, ≤num_buckets entries) before any shuffle.

    Up to ``broadcast_threshold`` buckets the watermark map becomes a
    ``create_map`` literal — a pure codegen'd filter evaluated map-side
    during the scan: zero extra shuffle, zero state store, and (unlike
    the T5 state-store fence, which must shuffle by key first) the
    dropped redeliveries never enter the dedup exchange at all. Past
    the threshold a literal map is a plan-size/codegen hazard (tens of
    thousands of expression nodes), so the watermarks become a tiny
    broadcast-joined DataFrame instead — still zero shuffle on the
    event side (BroadcastHashJoin), one broadcast of ≤num_buckets
    (int, long) rows. Both forms drop exactly the same rows
    (tests/test_streaming.py::test_manifest_fence_broadcast_form).

    Contract (same shape as Spark's event-time watermark): an event is
    dropped only when its LSN is ≤ its bucket's applied watermark minus
    ``allowed_lateness``. ``allowed_lateness=0`` assumes a strictly
    in-order binlog tail (per-key — hence per-bucket, bucket being a
    function of key — LSNs nondecreasing across batches except for
    redelivery); a source with bounded LSN reordering (late data) sets
    ``allowed_lateness`` to its horizon, and late-but-new events inside
    the horizon survive while bulk redelivery older than the horizon is
    still cut. Duplicates that slip through the slack are harmless —
    the LWW merge is idempotent; fences only cut apply volume. A source
    with UNBOUNDED reordering needs the per-key T5 fence
    (streaming/stateful.py) or no fence at all.

    Deployment note: delivery ORDER is part of the contract. With
    Spark's file source, files are listed by (mtime, path) — same-ms
    mtime ties between log chunks can flip their order and turn an
    in-order log into an out-of-order source; ship chunks with
    monotone mtimes (or names matching mtime order), as binlog
    shippers do."""
    m = lake.manifest()
    wm = {int(b): int(v) for b, v in m["bucket_lsn"].items()}
    if not wm:
        return ev
    floor = F.lit(-(2**63)).cast("long")
    # layout from the SAME manifest the watermarks came from (not the
    # instance cache) — a stale handle after a rebucket must not compare
    # events against the wrong bucket's watermark
    b = bucket_expr(int(m.get("num_buckets", lake.num_buckets)))
    if len(wm) <= int(broadcast_threshold):
        entries: list = []
        for bk, v in sorted(wm.items()):
            entries += [F.lit(bk), F.lit(v - int(allowed_lateness))]
        wm_map = F.create_map(*entries)
        return ev.filter(F.col("lsn") > F.coalesce(wm_map[b], floor))
    wm_df = ev.sparkSession.createDataFrame(
        [(bk, v - int(allowed_lateness)) for bk, v in sorted(wm.items())],
        "_fence_b int, _fence_wm long",
    )
    return (
        ev.withColumn("_fence_b", b)
        .join(
            F.broadcast(wm_df),
            on="_fence_b",
            how="left",
        )
        .filter(F.col("lsn") > F.coalesce(F.col("_fence_wm"), floor))
        .select(*ev.columns)
    )


def _obs_metrics(obs) -> dict:
    """Observation metrics, tolerant of the Spark 4.1 AQE edge where
    empty-relation propagation collapses the observed subtree: the
    CollectMetrics row is then LOST (empty) and ``Observation.get``'s
    row conversion raises. Returns {} in that case — callers fall back
    to an explicit agg for that (rare, cheap) batch."""
    try:
        return dict(obs.get)
    except Exception:
        return {}


def _fence_order_stats(
    lake: LakeTable, batch_id: int, fence_obs: tuple | None,
    fence_lateness: int,
) -> dict | None:
    """Evaluate the out-of-order-source detector from the observe()
    metrics collected DURING the batch's own write job (see the
    detector comment in :func:`apply_batch`) — called once the first
    full-pass action on the batch has run, so ``Observation.get`` never
    blocks. Zero extra jobs on the hot path; only when AQE's
    empty-relation propagation swallowed the metrics (an all-fenced or
    empty batch — exactly the batches that wrote nothing and cost
    least) does the count/max re-run as one explicit agg on the cached
    lineage. Updates the run's high-water and returns the anomaly
    record, or None."""
    if fence_obs is None:
        return None
    obs_pre, obs_post, ev_pre, ev_fenced = fence_obs
    pre = _obs_metrics(obs_pre)
    if "mx" not in pre:
        pre = ev_pre.agg(
            F.count(F.lit(1)).alias("n"), F.max("lsn").alias("mx")
        ).collect()[0].asDict()
    mx = pre.get("mx")
    prev = getattr(lake, "_fence_prev_batch_max", None)
    stats = None
    if prev is not None and mx is not None and int(mx) < prev - fence_lateness:
        post = _obs_metrics(obs_post)
        n_post = int(post["n"]) if "n" in post else ev_fenced.count()
        dropped = int(pre["n"]) - n_post
        stats = {
            "fence_order_anomaly": True,
            "fence_order_dropped_rows": dropped,
            "fence_batch_max_lsn": int(mx),
            "fence_run_high_water_lsn": int(prev),
        }
        logger.warning(
            "manifest fence: batch %s max LSN %s is below this run's "
            "high-water %s - lateness %s — the source looks "
            "OUT-OF-ORDER; %s fenced rows in this batch may be new "
            "data being dropped, not redelivery. Ship chunks with "
            "monotone mtimes or raise fence_lateness.",
            batch_id, int(mx), prev, fence_lateness, dropped,
        )
    if mx is not None:
        lake._fence_prev_batch_max = (
            max(prev, int(mx)) if prev is not None else int(mx)
        )
    return stats


def _phys_projection(staged: DataFrame) -> DataFrame:
    """Deduped change events → the lake's physical row shape (system
    columns incl. content sha and tombstone flag), keeping ``_bucket``."""
    return staged.select(
        "repo",
        "path",
        "commit",
        "lang",
        "content",
        F.col("lsn").alias("_lsn"),
        (F.col("op") == "delete").alias("_deleted"),
        F.sha2(F.coalesce("content", F.lit("")), 256).alias("_content_sha"),
        F.col("ts").alias("_ts"),
        "_bucket",
    )


def apply_batch(
    spark: SparkSession,
    lake: LakeTable,
    events: DataFrame,
    batch_id: int,
    registry=None,
    lsn_fence: str | None = None,
    fence_lateness: int = 0,
    fence_order_check: bool = True,
    cow_changelog: bool = True,
    compact_async: bool = False,
    expectations=None,
) -> dict:
    """Apply one micro-batch of change events. Idempotent by batch_id.
    Returns a metrics record (also appended to the lake's metrics log).

    ``compact_async=True`` hands a tripped compaction threshold to the
    lake's single maintenance thread (``submit_compaction``) instead of
    folding on this thread — the foreachBatch returns to the trigger
    loop immediately, removing the fold from trigger-to-trigger
    latency. Safe under the concurrent-commit discipline ``compact``
    now enforces (surgical delta-clear + claim retry); drain with
    ``lake.wait_maintenance()`` before treating the table as quiesced.

    ``lsn_fence="manifest"`` applies :func:`manifest_watermark_fence`
    (with ``fence_lateness`` slack) to the batch before staging —
    rebuilt per batch, so it always reflects the latest committed
    watermarks.

    ``cow_changelog=False`` skips the CoW changed-key sidecar write
    (an extra O(batch) write pass, zero extra exchanges); ``changes()``
    then falls back to the snapshot-diff path for those commits.
    Measured overhead is the per-batch constant of one extra write job
    — +17% of a 4-chunk sf0.1 replay wall, shrinking as batch volume
    grows (BENCH/BASELINE.md round-4 addenda) — the Delta-CDF trade:
    pay at write time so the feed reads O(changed rows). No effect in
    MOR mode, whose delta files double as the change feed.
    """
    t0 = time.time()
    if batch_id <= lake.last_batch_id():
        rec = {
            "batch_id": batch_id,
            "skipped": True,
            "rows": 0,
            "seconds": time.time() - t0,
        }
        lake.append_metrics(rec)
        return rec

    ev = events.select(*EVENT_COLS)
    fence_stats: dict | None = None
    fence_obs: tuple | None = None
    if lsn_fence == "manifest":
        # Out-of-order-source detector: the fence's documented contract
        # (in-order tail, bounded reordering) is load-bearing — a
        # misdeployed source (e.g. same-mtime file listing flipping
        # chunk order) silently loses rows. In-order delivery makes
        # per-batch max LSNs nondecreasing WITHIN a run (a crash-resume
        # or intentional replay starts a fresh run and a fresh
        # high-water, so redelivery never false-trips); a batch whose
        # pre-fence max falls below the run's observed high-water minus
        # the lateness slack is a contract violation — warn + record.
        # Cost: ZERO extra jobs — the pre-fence count/max and post-fence
        # count ride the batch's own write job as observe() metrics
        # (CollectMetrics nodes, evaluated inline while rows stream
        # past), and the anomaly check runs AFTER the write from the
        # collected values. The check is advisory (it cannot un-drop
        # rows in this batch either way), so post-write evaluation loses
        # nothing vs the round-4 pre-write agg that cost one extra
        # driver-blocking job per trigger (round-4 verdict item 2).
        # Residual gap, deliberate: a fence_lateness set BELOW the
        # source's true reordering horizon drops late-but-new rows while
        # batch maxes stay monotone — undetectable from LSN aggregates
        # alone (it needs a per-key check, i.e. the T5 stateful fence,
        # or an audit join of dropped rows vs applied state). Validate
        # the horizon against the source's spec when setting lateness.
        # (fence_order_check=False opts out entirely.)
        if fence_order_check:
            from pyspark.sql import Observation

            obs_pre, obs_post = Observation(), Observation()
            ev = ev.observe(
                obs_pre, F.count(F.lit(1)).alias("n"), F.max("lsn").alias("mx")
            )
        fenced = manifest_watermark_fence(
            ev, lake, allowed_lateness=fence_lateness
        )
        if fence_order_check:
            fenced = fenced.observe(obs_post, F.count(F.lit(1)).alias("n"))
            # carry the frames too: the rare AQE-lost-metrics fallback
            # re-aggregates them (see _fence_order_stats)
            fence_obs = (obs_pre, obs_post, ev, fenced)
        ev = fenced
    elif lsn_fence is not None:
        raise ValueError(f"unknown lsn_fence {lsn_fence!r} (use 'manifest')")

    expect_stats = None
    if expectations:
        # data-quality gate (operators/expect.py): enforced AFTER the
        # fence (a redelivered stale row should be fenced, not counted
        # as a quality violation) and BEFORE staging, so a violating
        # event can never reach table state. fail-action raises here —
        # nothing below has written yet. For an all-drop config the
        # returned stats are DEFERRED (observe() metrics riding the
        # write job) — resolved below once the batch's action has run.
        from tartare_spark.operators.expect import enforce_expectations

        ev, expect_stats = enforce_expectations(
            lake, ev, expectations, batch_id
        )

    compact_worst: list[int] = []
    schema_fn = registry.current_version if registry else None
    if lake.mode == "mor":
        # merge-on-read: ONE Spark job AND ONE shuffle per batch. The
        # bucket co-location exchange the delta write needs is issued
        # FIRST; the dedup then groups by (_bucket, repo, path), and
        # HashPartitioning([_bucket]) already satisfies that clustered
        # distribution, so the aggregate runs exchange-free and the
        # write inherits the per-bucket layout (asserted by
        # tests/test_replay_batch.py::test_mor_apply_plan_has_single_shuffle).
        # Touched buckets + per-bucket applied-LSN watermarks are
        # recovered from the parquet footers of the files just written
        # (driver-side, ≤num_buckets files) — no second pass, no collect.
        ev_b = ev.withColumn("_bucket", bucket_expr(lake.num_buckets))
        part = ev_b.repartition(max(lake.num_buckets, 1), "_bucket")
        staged = dedup_latest_lsn(
            part, keys=["_bucket", "repo", "path"], order_col="lsn"
        )
        phys = _phys_projection(staged)
        res = lake.append_delta(
            phys, batch_id=batch_id, schema_version_fn=schema_fn,
            pre_partitioned=True,
        )
        # the delta write was the batch's action — the fence detector's
        # and drop-only expectations' observe() metrics are collected
        # now; evaluate post-write
        fence_stats = _fence_order_stats(
            lake, batch_id, fence_obs, fence_lateness
        )
        if expect_stats is not None and not isinstance(expect_stats, dict):
            expect_stats = expect_stats.resolve()
        committed = res is not None and res["keys"] > 0
        n_keys = res["keys"] if res else 0
        touched = res["touched_buckets"] if res else []
        max_event_ts = res.get("max_event_ts") if res else None
        if committed:
            # incremental compaction: fold back ONLY the buckets whose
            # delta chains crossed the threshold (not every delta'd
            # bucket) — keeps maintenance O(hot buckets), not O(table).
            # DEFERRED past the metrics record below: the batch that
            # trips the threshold must not absorb the bucket-fold
            # latency into its own commit latency (round-2 verdict).
            m = lake.manifest()
            compact_worst = [
                int(b) for b, fl in m.get("deltas", {}).items()
                if len(fl) >= lake.compact_every
            ]
    else:
        # copy-on-write needs the touched-bucket set BEFORE reading the
        # target (partition pruning), so staged feeds three jobs: a
        # small bucket-stats collect (≤num_buckets rows —
        # scale-independent), the changed-key sidecar write, and the
        # MERGE rewrite. Like the MOR path, the ONE exchange is the
        # up-front repartition by _bucket: the dedup groups by
        # (_bucket, repo, path) exchange-free (HashPartitioning subset
        # rule), the bucket-stats agg and the sidecar write inherit the
        # bucket layout shuffle-free, and the merge join is co-located
        # on _bucket (on_bucket=True) so the staged side enters the
        # full-outer join without another exchange. persist() runs the
        # shuffle once for all three consumers.
        ev_b = ev.withColumn("_bucket", bucket_expr(lake.num_buckets))
        part = ev_b.repartition(max(lake.num_buckets, 1), "_bucket")
        staged = dedup_latest_lsn(
            part, keys=["_bucket", "repo", "path"], order_col="lsn"
        )
        staged = staged.persist()
        try:
            bstats = (
                staged.groupBy("_bucket")
                .agg(
                    F.max("lsn").alias("max_lsn"),
                    F.count("*").alias("keys"),
                    F.max("ts").alias("max_ts"),
                )
                .collect()
            )
            # the bucket-stats collect materialized the persisted staged
            # batch (a full pass) — the fence detector's and drop-only
            # expectations' observe() metrics are collected now;
            # evaluate before the early return so an all-fenced batch
            # still records the anomaly / counts
            fence_stats = _fence_order_stats(
                lake, batch_id, fence_obs, fence_lateness
            )
            if expect_stats is not None and not isinstance(expect_stats, dict):
                expect_stats = expect_stats.resolve()
            if not bstats:
                rec = {"batch_id": batch_id, "skipped": False, "rows": 0,
                       "empty": True, "seconds": time.time() - t0}
                if fence_stats:
                    rec.update(fence_stats)
                if expect_stats:
                    rec.update(expect_stats)
                lake.append_metrics(rec)
                return rec
            touched = sorted(int(r["_bucket"]) for r in bstats)
            bucket_lsn = {int(r["_bucket"]): int(r["max_lsn"]) for r in bstats}
            n_keys = sum(int(r["keys"]) for r in bstats)
            max_event_ts = max(
                (r["max_ts"] for r in bstats if r["max_ts"] is not None),
                default=None,
            )
            schema_version = schema_fn(max(bucket_lsn.values())) if schema_fn else None
            # changed-key sidecar: the staged side is already deduped
            # per key, so its physical projection is this commit's
            # UPSERT SET — one extra O(batch) write that lets changes()
            # serve the CoW feed without an O(both snapshots) diff.
            # Redelivery caveat: under unfenced redelivery the staged
            # batch can contain stale rows (LSN below the already-applied
            # row) that the merge then discards, so the feed may carry
            # rows that did not change table state — same semantics as
            # the MOR delta feed; consumers must apply LWW-by-LSN (see
            # LakeTable.changes docstring). (A crash before commit
            # leaves the sidecar as an orphan for vacuum(), same as
            # data files.)
            import uuid as _uuid

            sidecars = {} if not cow_changelog else lake._write_data_files(
                _phys_projection(staged),
                f"cdc-{batch_id}-{_uuid.uuid4().hex[:8]}",
                len(touched),
                pre_partitioned=True,
                blooms=False,
                codec="lz4",
            )
            target = lake.read_raw(spark, buckets=touched)
            merged = merge_upserts(
                target, staged, lake.num_buckets, on_bucket=True
            )
            committed = lake.write_and_commit(
                merged,
                batch_id=batch_id,
                touched_buckets=touched,
                bucket_lsn_updates=bucket_lsn,
                schema_version=schema_version,
                extra_stats={"keys": n_keys},
                changelog_files=[f for fl in sidecars.values() for f in fl],
            )
        finally:
            staged.unpersist()
    dt = time.time() - t0
    rec = {
        "batch_id": batch_id,
        # we got past the idempotency check, so this batch_id is NEW:
        # "skipped" is reserved for redelivered batches (early return
        # above); a new-but-empty batch is marked "empty" instead,
        # matching the CoW path's record shape.
        "skipped": False,
        "empty": not committed,
        "rows": n_keys,
        "touched_buckets": len(touched),
        # compaction is deferred past this record (see below): the
        # batch's own seconds/keys_per_sec exclude maintenance work
        "compact_deferred": len(compact_worst),
        "seconds": round(dt, 4),
        "keys_per_sec": round(n_keys / dt, 2) if dt > 0 else None,
        # T7 lag: wall-clock now minus the newest event time applied in
        # this batch (how far behind the log's head this commit is).
        # The fixture's synthetic timestamps make this large/negative in
        # tests; on a live tail it is the consumer-lag metric.
        # Both provenances yield a correct epoch via .timestamp():
        # footer stats (MOR) are tz-aware UTC (absolute), and collect()
        # (CoW) naive datetimes are DRIVER-LOCAL wall time (PySpark's
        # TimestampType.fromInternal uses datetime.fromtimestamp), which
        # .timestamp() interprets as local — recovering the same epoch.
        # Do NOT pin naive values to UTC: that double-shifts on a
        # non-UTC driver.
        "max_event_ts": max_event_ts.isoformat() if max_event_ts else None,
        "lag_seconds": (
            round(time.time() - max_event_ts.timestamp(), 3)
            if max_event_ts
            else None
        ),
    }
    if fence_stats:
        rec.update(fence_stats)
    if expect_stats:
        rec.update(expect_stats)
    lake.append_metrics(rec)
    if compact_worst:
        # maintenance AFTER the batch's metrics record: the commit is
        # already published and consumers already see the batch, and the
        # fold is excluded from the batch's seconds/keys_per_sec.
        if compact_async:
            # off-thread: the fold overlaps the NEXT trigger's work
            # (compact's surgical delta-clear + claim retry make the
            # concurrent commit safe); skipped if one is already in
            # flight — deltas accumulate and the next fold coalesces.
            lake.submit_compaction(spark, compact_worst, batch_id)
        else:
            # sync default: runs on the foreachBatch thread, so it
            # delays the NEXT trigger, but a crash window never holds
            # an unpublished fold.
            t1 = time.time()
            n_compacted = lake.compact(spark, buckets=compact_worst)
            lake.append_metrics(
                {
                    "batch_id": batch_id,
                    "maintenance": True,
                    "compacted_buckets": n_compacted,
                    "seconds": round(time.time() - t1, 4),
                }
            )
    return rec


def replay_batches(
    spark: SparkSession,
    lake: LakeTable,
    events: DataFrame,
    num_chunks: int = 10,
    registry=None,
    start_batch_id: int = 0,
    **apply_kwargs,
) -> list[dict]:
    """Entry B — bounded batch replay: split an event DataFrame into
    LSN-ordered chunks and apply them in order (used by tests and the
    DuckDB-oracle comparisons; the streaming path shares apply_batch).

    Chunk boundary = lsn range (deterministic, order-insensitive to the
    input's arrival order). Correctness does NOT depend on chunking:
    last-writer-wins merge converges to the same state for any split.
    """
    bounds = events.select(
        F.min("lsn").alias("lo"), F.max("lsn").alias("hi")
    ).collect()[0]
    if bounds["lo"] is None:
        return []  # empty feed (e.g. relaying a lake with no changes yet)
    lo, hi = int(bounds["lo"]), int(bounds["hi"])
    span = max(1, (hi - lo + 1 + num_chunks - 1) // num_chunks)
    out = []
    events = events.cache()
    try:
        for i in range(num_chunks):
            a, b = lo + i * span, lo + (i + 1) * span
            chunk = events.filter((F.col("lsn") >= a) & (F.col("lsn") < b))
            out.append(
                apply_batch(
                    spark, lake, chunk, batch_id=start_batch_id + i,
                    registry=registry, **apply_kwargs,
                )
            )
    finally:
        events.unpersist()
    return out


def bootstrap_load(
    spark: SparkSession,
    lake: LakeTable,
    snapshot: DataFrame,
    batch_id: int = 0,
    snapshot_lsn: int | None = None,
) -> dict:
    """Entry C — initial-snapshot bulk load: seed an EMPTY lake from a
    full source-table snapshot (repo, path, commit, lang, content, and
    optionally per-row ``lsn``/``ts``), then hand off to the binlog
    tail — ``run_stream`` maps its epochs past the bootstrap id
    automatically (``stream_batch_offset``, persisted by the bootstrap
    commit; without it epoch 0 would collide with the bootstrap's
    batch_id and be skipped); batch callers pass ``start_batch_id =
    batch_id + 1`` to ``replay_batches``. This is the standard CDC
    deployment shape
    (consistent snapshot → tail from the snapshot's log position): the
    snapshot skips the merge machinery entirely — one shuffle to
    co-locate buckets, dedup-by-key runs exchange-free on top of it
    (same plan shape as the MOR hot path), and files land as finished
    base segments (blooms + zstd) with footer-recovered watermarks.

    ``snapshot_lsn`` stamps every row when the snapshot has no ``lsn``
    column (a storage-level snapshot taken at one log position);
    per-row LSNs (an export that kept commit positions) take precedence.
    Tail overlap is safe either way: LWW-by-LSN makes redelivered or
    pre-snapshot events lose against the loaded rows.

    Returns the metrics record (also appended to the lake's log)."""
    t0 = time.time()
    # casefold: Spark's analyzer resolves column names case-
    # insensitively by default, so an 'OP'/'Lsn' column would be
    # silently replaced by withColumn — treat any case variant as
    # present for every guard below
    cols = {c.lower() for c in snapshot.columns}
    if "op" in cols:
        # refuse rather than clobber: silently stamping 'update' over a
        # real op column would bulk-load delete events as live rows (and
        # LWW could never heal it — the loaded row carries the delete's
        # own LSN). A snapshot is live rows only; filter + drop first.
        raise ValueError(
            "snapshot carries an 'op' column — bootstrap loads LIVE rows "
            "only; filter deletes and .drop('op') first (a changelog "
            "belongs in apply_batch/replay_batches, not bootstrap_load)"
        )
    if "lsn" not in cols:
        if snapshot_lsn is None:
            raise ValueError(
                "snapshot has no 'lsn' column — pass snapshot_lsn (the "
                "log position the snapshot was taken at)"
            )
        snapshot = snapshot.withColumn("lsn", F.lit(int(snapshot_lsn)))
    if "ts" not in cols:
        snapshot = snapshot.withColumn("ts", F.lit(None).cast("timestamp"))
    if "lang" not in cols:
        snapshot = snapshot.withColumn("lang", F.lit(None).cast("string"))
    ev = snapshot.withColumn("op", F.lit("update")).select(*EVENT_COLS)
    ev_b = ev.withColumn("_bucket", bucket_expr(lake.num_buckets))
    part = ev_b.repartition(max(lake.num_buckets, 1), "_bucket")
    staged = dedup_latest_lsn(
        part, keys=["_bucket", "repo", "path"], order_col="lsn"
    )
    res = lake.bootstrap_base(
        _phys_projection(staged), batch_id=batch_id, pre_partitioned=True
    )
    rec = {
        "batch_id": batch_id,
        "bootstrap": True,
        "skipped": res is None,
        "rows": res["keys"] if res else 0,
        "buckets_touched": len(res["touched_buckets"]) if res else 0,
        "max_lsn": res["max_lsn"] if res else None,
        "seconds": time.time() - t0,
    }
    lake.append_metrics(rec)
    return rec


def rebase_branch(
    spark: SparkSession,
    lake: LakeTable,
    name: str,
    registry=None,
    drop_source: bool = False,
    **apply_kwargs,
) -> list[dict]:
    """Publish a branch whose fork point main has ADVANCED past — the
    merge path ``fast_forward`` deliberately refuses (Iceberg parity:
    FF requires an unchanged main). This automates the documented
    "re-fork and re-apply" recipe: each staged branch commit's logical
    change set (the branch's incremental feed since its fork image,
    ``changes(0, head)``) is re-expressed as change events
    (:func:`feed_as_changelog`) and applied onto main as a NEW batch
    through the normal apply path — one main batch per staged commit,
    in staged order, so commit boundaries and the change feed survive
    the rebase.

    Conflict semantics are the engine's own: row-level LWW by LSN. A
    key the branch staged AND main changed after the fork resolves to
    the higher LSN (the loser's row still appears in the feed and is
    discarded by the merge — the same at-least-once discipline as
    redelivery); branch deletes carry their tombstone LSNs, so they
    win/lose by the same rule. This is the only merge that needs no
    user arbitration, for exactly the reason the LWW lake converges
    under redelivery.

    Cost: O(staged rows) read (the branch feed is delta-file/sidecar
    pruned — main is never diffed) + the normal apply cost per staged
    commit. Driver work: one ≤num-staged-commits collect of version
    ids. Same caveat as ``fast_forward``: do not compact a MOR branch
    first (the fold moves staged rows out of the incremental feed).

    When main has NOT advanced, prefer ``fast_forward`` — it publishes
    by reference without rewriting any data. Returns the per-batch
    metrics records; ``drop_source=True`` drops the branch after a
    clean rebase."""
    br = lake.branch(name)
    head = br.current_version()
    recs: list[dict] = []
    if head > 0:
        feed = br.changes(spark, 0, head)
        versions = sorted(
            int(r["_commit_version"])
            for r in feed.select("_commit_version").distinct().collect()
        )
        next_id = lake.last_batch_id() + 1
        for i, v in enumerate(versions):
            ev = feed_as_changelog(
                feed.filter(F.col("_commit_version") == v)
            )
            recs.append(
                apply_batch(
                    spark, lake, ev, batch_id=next_id + i,
                    registry=registry, **apply_kwargs,
                )
            )
    if drop_source:
        lake.drop_branch(name)
    return recs
