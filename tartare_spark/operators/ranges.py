"""J6 scale path: interval-overlap join via coarse time-bucket equi key.

The naive interval-overlap join (``a.s <= b.e AND b.s <= a.e``) has no
equi key, so Spark plans a BroadcastNestedLoopJoin — O(n·m) compares
and a broadcast of one whole side. Fine for the bounded demo
(SURVEY.md §2.3 J6), a scale-killer on large interval sets.

``interval_overlap_bucketed`` restores an equi key the standard way
(range-bucketing, as in Spark's own range-join-hint pattern and
DuckDB/Trino range joins): each interval is exploded to the coarse
buckets of width ``w`` it touches (``floor(s/w) .. floor(e/w)``), the
self-join runs as a bucket EQUI-join with the overlap predicate as a
residual filter, and each overlapping pair is kept exactly once — in
the bucket containing the overlap START (``floor(max(a.s, b.s)/w)``) —
so no distinct/dedup shuffle is needed.

Scale shape: explode is map-side (fanout = interval span / w, bounded
by choosing w ~ the median interval length); the only shuffle is the
hash partition on the bucket id; per-bucket work is the local pair
count, which AQE's skew-join splitting caps for pathological hot
buckets. 100× more intervals → same plan, more buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DateType, TimestampNTZType, TimestampType


def _floor_div(col, w):
    """Exact floor division over the FULL long domain. ``F.floor(a / b)``
    divides as doubles, so quotients past 2^53 lose integer precision
    (bucket sizing went erratic near the long extremes, even though the
    consistent use of the same mapping kept results correct). Subtracting
    ``pmod`` first makes the quotient an exact integer — the decimal
    division then has zero true fraction, so its bounded result scale
    cannot round it, at any long magnitude; pmod's non-negative result
    also gives true floor (not truncate-toward-zero) for negative bounds.
    The subtraction itself runs in decimal(38,0): within w of Long.MIN
    the long-domain ``col - pmod`` would underflow (wrap, or error under
    ANSI) before the cast could widen it.
    """
    exact = col.cast("decimal(38,0)") - F.pmod(col, w).cast("decimal(38,0)")
    return (exact / w.cast("decimal(38,0)")).cast("long")


def _to_long(col, dtype):
    """Monotone map of an interval bound to a long for bucket
    arithmetic: days since epoch for dates, seconds since epoch for
    timestamps (NTZ pinned via the UTC session timezone — deterministic),
    raw value for numerics. Used ONLY to assign coarse buckets; the
    overlap residual compares the original values, so coarsening can
    never change the result."""
    if isinstance(dtype, DateType):
        return F.datediff(col, F.lit("1970-01-01").cast("date")).cast("long")
    if isinstance(dtype, (TimestampType, TimestampNTZType)):
        return F.unix_timestamp(col.cast("timestamp"))
    return col.cast("long")


def interval_overlap_bucketed(
    iv: DataFrame,
    key: str = "k",
    start: str = "s",
    end: str = "e",
    bucket_width: int = 90,
) -> DataFrame:
    """Self overlap-join of an interval table ``(key, start, end)``:
    returns ``(k_a, k_b)`` with ``k_a < k_b`` for every overlapping
    pair — identical pairs to the theta form, as an equi join.

    ``bucket_width`` is in the natural unit of the bound type: days for
    dates, seconds for timestamps, raw units for numerics. Pick it near
    the median interval length: too small inflates the explode fanout,
    too large piles intervals into few buckets.
    """
    dtype = iv.schema[start].dataType
    lo = _to_long(F.col(start), dtype)
    hi = _to_long(F.col(end), dtype)
    w = F.lit(int(bucket_width)).cast("long")
    tagged = iv.select(
        F.col(key),
        F.col(start).alias("_s"),
        F.col(end).alias("_e"),
        lo.alias("_lo"),
        hi.alias("_hi"),
    ).select(
        "*",
        F.explode(
            F.sequence(_floor_div(F.col("_lo"), w), _floor_div(F.col("_hi"), w))
        ).alias("_bucket"),
    )
    a = tagged.select(
        F.col(key).alias("k_a"),
        F.col("_s").alias("s_a"),
        F.col("_e").alias("e_a"),
        F.col("_lo").alias("lo_a"),
        "_bucket",
    )
    b = tagged.select(
        F.col(key).alias("k_b"),
        F.col("_s").alias("s_b"),
        F.col("_e").alias("e_b"),
        F.col("_lo").alias("lo_b"),
        "_bucket",
    )
    pairs = a.join(b, "_bucket").filter(
        (F.col("k_a") < F.col("k_b"))
        # residual on the ORIGINAL bounds — exact overlap semantics even
        # when the bucket mapping is coarser than the bound type
        & (F.col("s_a") <= F.col("e_b"))
        & (F.col("s_b") <= F.col("e_a"))
        # report each pair exactly once: in the bucket where the
        # overlap starts (no dedup shuffle needed)
        & (
            _floor_div(F.greatest(F.col("lo_a"), F.col("lo_b")), w)
            == F.col("_bucket")
        )
    )
    return pairs.select("k_a", "k_b")
