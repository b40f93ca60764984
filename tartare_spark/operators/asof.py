"""J5 ``asof_schema_version`` — as-of join (no native as-of in Spark SQL).

Reference analog: the preprocess sequence applicable at export time
[PK: tartare/core/models.py PreProcess.sequence]; in this engine, the
schema-registry version effective at each event's LSN.

Two implementations chosen by the size of the version table:

- **broadcast theta-join + max** (default): correct at any event scale
  when the version side is small (registries are). The event side is
  never shuffled by the join itself (broadcast nested-loop), and the
  follow-up groupBy collapses the ≤|versions| fanout. For a 3-row
  registry over 10^10 events the fanout is bounded and map-side combined.
- **union + window** (``asof_join_window``): for LARGE right sides —
  union both inputs with a tag, single window pass partitioned by key
  ordered by the as-of column, ``last(value, ignorenulls)`` carries the
  most recent right-side value forward. One shuffle, no fanout; this is
  the 100 TB-safe shape when both sides are big.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join_broadcast(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    payload: list[str],
) -> DataFrame:
    """Attach, for each left row, the right row with the greatest
    ``right_on`` ≤ ``left_on``. Right side must be broadcast-small.

    Cardinality-preserving AND deterministic under task retries:
    duplicate left rows (e.g. redelivered events) each keep their own
    output row, recovered WITHOUT a per-row id (the obvious
    ``monotonically_increasing_id`` key is nondeterministic — a shuffle-
    upstream recomputation can reassign ids and duplicate/drop rows).
    Grouping on all left columns collapses an n-duplicate group joined
    against m matching right rows into one row with count n·m; since
    every duplicate matches the SAME m right rows, n = count / m
    (m = distinct matched ``right_on`` values, or 1 for the unmatched
    null-extension), and ``explode(sequence)`` restores the n copies.
    Every expression is deterministic, so retries replay exactly.
    The right side is first deduplicated per ``right_on`` (deterministic
    lexicographic-max payload winner), which the arithmetic requires:
    with duplicate as-of keys on the right, count would be n·m_rows but
    m stays m_distinct, so n = count/m would OVER-recover and duplicate
    output rows. An as-of key seen twice on the right is ambiguous
    anyway; the max-struct winner makes the choice deterministic."""
    keys = left.columns
    rdd_payload = [c for c in payload if c != right_on]
    if rdd_payload:
        r = (
            right.groupBy(right_on)
            .agg(F.max(F.struct(*rdd_payload)).alias("_p"))
            .select(
                F.col(right_on),
                *[F.col(f"_p.{c}").alias(c) for c in rdd_payload],
            )
        )
    else:  # payload is just the as-of key itself
        r = right.select(right_on).distinct()
    j = left.join(F.broadcast(r), F.col(right_on) <= F.col(left_on), "left")
    g = j.groupBy(*keys).agg(
        F.max_by(F.struct(*payload), F.col(right_on)).alias("_best"),
        F.count(F.lit(1)).alias("_nm"),
        F.count_distinct(F.col(right_on)).alias("_m"),
    )
    n_dups = (F.col("_nm") / F.greatest(F.col("_m"), F.lit(1))).cast("long")
    return g.select(
        *keys,
        F.explode(F.sequence(F.lit(1), n_dups)).alias("_dup"),
        *[F.col(f"_best.{c}").alias(c) for c in payload],
    ).drop("_dup")


def asof_join_window(
    left: DataFrame,
    right: DataFrame,
    key: list[str],
    left_on: str,
    right_on: str,
    payload: list[str],
) -> DataFrame:
    """Big-big as-of join: tagged union + one window pass. Keyed — each
    left row gets the latest right row of the SAME key with
    right_on ≤ left_on."""
    key = list(key)
    l_cols = [c for c in left.columns if c not in key]
    lt = left.select(
        *key,
        F.col(left_on).alias("_asof"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in l_cols if c != left_on],
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in payload],
    )
    rt = right.select(
        *key,
        F.col(right_on).alias("_asof"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in l_cols if c != left_on],
        *[F.col(c) for c in payload],
    )
    u = lt.unionByName(rt)
    # right rows sort before left rows at equal _asof (as-of is inclusive)
    w = (
        Window.partitionBy(*key)
        .orderBy(F.col("_asof").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in payload:
        u = u.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))
    return (
        u.filter(F.col("_side") == 1)
        .drop("_side")
        .withColumnRenamed("_asof", left_on)
    )
