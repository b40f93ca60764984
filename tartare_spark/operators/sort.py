"""Distributed global ranking/sorting without a single-partition window.

Reference analog: tartare's ordered exports [SURVEY §2.6 O2]; at 100 TB
the naive ``row_number() OVER (ORDER BY …)`` plans a Window with NO
partition spec — Spark moves the entire table to ONE task (it even
warns: "No Partition Defined for Window operation"). The scalable shape
is the classic two-phase sort:

1. assign each row a COARSE, ORDER-MONOTONE bucket (a pure function of
   the leading sort key — e.g. ``floor(price / width)``), so bucket ids
   sort in the same order as rows;
2. one tiny aggregate counts rows per bucket (≤ n_buckets rows to the
   driver — scale-independent);
3. prefix-sum the counts driver-side into per-bucket rank offsets;
4. rank within each bucket in parallel (window partitioned by bucket —
   ONE shuffle, partition size = rows/bucket) and add the offset.

Every global rank is exact; no stage ever sees more than one bucket.
This is also how Spark's own ``orderBy`` writes sorted output
(RangePartitioning + local sort), but ranks/offsets need the explicit
count pass — ``orderBy`` alone cannot produce a global row number
without collapsing to one partition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_rank(
    df: DataFrame,
    bucket: Column,
    order_cols: list[str],
    rank_col: str = "rank",
    broadcast_threshold: int = 4096,
) -> DataFrame:
    """Exact global 1-based rank over ``order_cols``, computed with one
    bucket-partitioned window plus a driver-side prefix sum.

    ``bucket`` must be a monotone coarse function of the LEADING sort
    column (same value order — e.g. ``F.floor(F.col("price") / 1000)``
    for ascending price): every row in bucket b sorts before every row
    in bucket b+1. ``order_cols`` must be a total order (add a unique
    tiebreak column) or ranks of ties are nondeterministic.

    Driver cost: one row per non-empty bucket — pick a bucket width
    giving 10^2–10^5 buckets at your scale. Up to
    ``broadcast_threshold`` buckets the offsets become a ``create_map``
    literal (a pure codegen'd lookup, zero extra plan nodes on the data
    side); past it a literal map is a plan-size/codegen hazard (tens of
    thousands of expression nodes), so the prefix-summed offsets are
    shipped as a tiny BROADCAST-joined DataFrame instead — same trade
    as the manifest fence's two forms (operators/apply.py), no shuffle
    of the data side either way. Both forms produce identical ranks
    (tests/test_operators.py::test_global_rank_broadcast_form)."""
    ranked, _total = _global_rank_with_total(
        df, bucket, order_cols, rank_col, broadcast_threshold
    )
    return ranked


def _global_rank_with_total(
    df: DataFrame,
    bucket: Column,
    order_cols: list[str],
    rank_col: str,
    broadcast_threshold: int,
) -> tuple[DataFrame, int]:
    """Shared core of :func:`global_rank` / :func:`global_ntile`: the
    total row count falls out of the same per-bucket count pass, so
    ntile never pays a second job for ``count()``."""
    b = df.withColumn("_rb", bucket.cast("long"))
    counts: dict[int, int] = {}
    for r in b.groupBy("_rb").agg(F.count("*").alias("n")).collect():
        if r["_rb"] is None:
            # fail fast with the caller's contract, not a driver-side
            # TypeError three frames deep: a null bucket means a null
            # order key, which SQL would still tile but this two-phase
            # form cannot place deterministically
            raise ValueError(
                "global_rank/global_ntile: the bucket expression is NULL "
                "for some rows — filter null order keys out or coalesce "
                "them to a sentinel bucket first"
            )
        counts[int(r["_rb"])] = int(r["n"])
    offs: list[tuple[int, int]] = []
    acc = 0
    for k in sorted(counts):
        offs.append((k, acc))
        acc += counts[k]
    w = Window.partitionBy("_rb").orderBy(*[F.col(c) for c in order_cols])
    if len(offs) <= int(broadcast_threshold):
        entries: list = []
        for k, off in offs:
            entries += [F.lit(k), F.lit(off)]
        offsets = F.create_map(*entries) if entries else F.create_map()
        ranked = (
            b.withColumn(
                rank_col,
                (F.row_number().over(w) + offsets[F.col("_rb")]).cast("long"),
            )
            .drop("_rb")
        )
        return ranked, acc
    off_df = df.sparkSession.createDataFrame(offs, "_rb long, _rk_off long")
    ranked = (
        b.join(F.broadcast(off_df), on="_rb", how="inner")
        .withColumn(
            rank_col,
            (F.row_number().over(w) + F.col("_rk_off")).cast("long"),
        )
        .drop("_rb", "_rk_off")
    )
    return ranked, acc


def global_ntile(
    df: DataFrame,
    bucket: Column,
    order_cols: list[str],
    n: int,
    tile_col: str = "tile",
    broadcast_threshold: int = 4096,
) -> DataFrame:
    """Exact global ``NTILE(n)`` without a single-partition window.

    Reference analog: percentile bucketing for ordered exports /
    quality tiers [SURVEY §2.6 O2/O4]. ``NTILE(n) OVER (ORDER BY …)``
    has the same scale problem as a global row_number — one task holds
    the whole table. This computes the exact same tile from the
    two-phase global rank: with ``T`` total rows, ``q = T // n`` and
    ``r = T % n``, SQL NTILE gives tiles ``1..r`` size ``q+1`` and
    tiles ``r+1..n`` size ``q``, so

        tile(rank) = (rank-1) // (q+1) + 1            if rank <= r*(q+1)
                     r + (rank-1 - r*(q+1)) // q + 1  otherwise

    (when ``T < n``, ``q = 0`` and every row is its own tile — the
    first branch covers all rows). The total ``T`` rides the same
    per-bucket count pass that global_rank already makes, so ntile
    costs no extra job. ``order_cols`` must be a total order for the
    tile of boundary rows to be deterministic (same caveat as SQL
    NTILE with ties). The intermediate rank column is dropped."""
    if n < 1:
        raise ValueError(f"ntile n must be >= 1, got {n}")
    ranked, total = _global_rank_with_total(
        df, bucket, order_cols, "_gnt_rank", broadcast_threshold
    )
    tile = _tile_of("_gnt_rank", total, n)
    return ranked.withColumn(tile_col, tile.cast("long")).drop("_gnt_rank")


def _tile_of(rank_col: str, total: int, n: int) -> Column:
    """SQL-NTILE tile of a 1-based global rank (shared by global_ntile
    and backfill_ranges)."""
    q, r = divmod(total, n)
    rk = F.col(rank_col) - F.lit(1)
    if q == 0:
        return rk + F.lit(1)
    # integer DIV, not floor(double /): ranks past 2^53 would hit
    # double rounding on the quotient (same exactness rule as
    # pack_sequences' offsets); DIV binds tighter than minus —
    # parenthesize the numerator
    head = r * (q + 1)
    return F.when(
        rk < F.lit(head),
        F.expr(f"(({rank_col} - 1) DIV {q + 1}) + 1"),
    ).otherwise(F.expr(f"{r} + (({rank_col} - 1 - {head}) DIV {q}) + 1"))


def backfill_ranges(
    df: DataFrame,
    bucket: Column,
    order_cols: list[str],
    n_chunks: int,
    broadcast_threshold: int = 4096,
) -> DataFrame:
    """O6 — balanced parallel-backfill chunk plan (the DMS /
    pt-archiver / Debezium-incremental-snapshot shape): split the keyed
    table into ``n_chunks`` CONTIGUOUS key ranges of near-equal row
    count, so a bootstrap or re-sync can copy chunks concurrently with
    bounded, even task sizes — uniform-width key ranges would inherit
    the key distribution's skew.

    Returns one row per chunk: ``chunk_id`` (1-based, in key order),
    ``lo_<col>``/``hi_<col>`` INCLUSIVE boundary values for each order
    column, and ``n_rows``. Chunk sizes differ by at most 1 (exact SQL
    NTILE split of the exact global rank).

    Scale shape: the two-phase rank's one bucket-partitioned window
    (never SinglePartition) plus a groupBy of ≤ n_chunks groups;
    boundary rows come from min_by/max_by on the rank, so the composite
    key order is respected (independent per-column min/max would cross
    rows). ``order_cols`` must be a total order (unique composite key).
    """
    if n_chunks < 1:
        raise ValueError(f"n_chunks must be >= 1, got {n_chunks}")
    ranked, total = _global_rank_with_total(
        df, bucket, order_cols, "_bf_rank", broadcast_threshold
    )
    tiled = ranked.withColumn(
        "chunk_id", _tile_of("_bf_rank", total, n_chunks).cast("long")
    )
    aggs = []
    for c in order_cols:
        aggs.append(F.min_by(c, F.col("_bf_rank")).alias(f"lo_{c}"))
    for c in order_cols:
        aggs.append(F.max_by(c, F.col("_bf_rank")).alias(f"hi_{c}"))
    aggs.append(F.count("*").alias("n_rows"))
    return tiled.groupBy("chunk_id").agg(*aggs)
