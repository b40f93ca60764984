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
    b = df.withColumn("_rb", bucket.cast("long"))
    counts = {
        int(r["_rb"]): int(r["n"])
        for r in b.groupBy("_rb").agg(F.count("*").alias("n")).collect()
    }
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
        return (
            b.withColumn(
                rank_col,
                (F.row_number().over(w) + offsets[F.col("_rb")]).cast("long"),
            )
            .drop("_rb")
        )
    off_df = df.sparkSession.createDataFrame(offs, "_rb long, _rk_off long")
    return (
        b.join(F.broadcast(off_df), on="_rb", how="inner")
        .withColumn(
            rank_col,
            (F.row_number().over(w) + F.col("_rk_off")).cast("long"),
        )
        .drop("_rb", "_rk_off")
    )
