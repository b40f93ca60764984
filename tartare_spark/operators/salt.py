"""A3 ``salted_two_phase_agg`` + O1 ``topk_hot_repos`` — skew weapons.

Reference analog: tartare's automatic update is dominated by hot feeds
(implicit ops concern); BASELINE.json:6 mandates "salted repartitioning
to defeat hot-repo skew" explicitly.

Where skew appears in this engine and what handles it:
- **groupBy(repo) style aggregations** — a zipf key (hottest repo ~20%
  of rows) makes one reducer the straggler. Hash aggregation's map-side
  partial combine already absorbs most of it; for high-cardinality
  payloads (collect_list, exact distinct) where partials stay large,
  use the explicit two-phase salted form below.
- **merge join / bucket writes** — handled structurally: the lake
  buckets by hash(repo, path), so a hot repo spreads over all buckets
  (see lake/table.py); AQE skew-join splitting covers the join side.

Two-phase form: ``groupBy(key, salt).agg(partial)`` →
``groupBy(key).agg(final)``. The first shuffle spreads a hot key over
``n_salts`` reducers; the second only moves ``n_salts`` pre-aggregated
rows per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, cols: list[str], n_salts: int = 16) -> DataFrame:
    """Deterministic salt derived from extra entropy columns (NOT rand():
    determinism keeps replays and retries identical)."""
    return df.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_salts))
    )


def salted_count(df: DataFrame, key: str, entropy_cols: list[str], n_salts: int = 16) -> DataFrame:
    """Two-phase skew-proof count per key. Result identical to
    ``groupBy(key).count()`` — proven in tests and by the DuckDB oracle
    (the salt cancels out)."""
    salted = with_salt(df, entropy_cols, n_salts)
    partial = salted.groupBy(key, "_salt").agg(F.count("*").alias("_c"))
    return partial.groupBy(key).agg(F.sum("_c").alias("n"))


def salted_agg(
    df: DataFrame,
    key: str,
    entropy_cols: list[str],
    partial_aggs: list,
    final_aggs: list,
    n_salts: int = 16,
) -> DataFrame:
    """General two-phase form: caller supplies decomposable partial and
    final aggregate expressions (sum→sum, count→sum, min→min, max→max)."""
    salted = with_salt(df, entropy_cols, n_salts)
    partial = salted.groupBy(key, "_salt").agg(*partial_aggs)
    return partial.groupBy(key).agg(*final_aggs)


def skew_report(df: DataFrame, key: str, hot_ratio: float = 2.0) -> DataFrame:
    """O5 — per-key skew diagnostics: the number an operator feeds into
    its salting decision (``n_salts`` sizing) and the report an on-call
    reads when one reducer straggles.

    For every key: row count, share of total, ratio vs the mean key, a
    hot flag at ``ratio ≥ hot_ratio``, and the suggested salt factor
    (``ceil(ratio)`` — enough salts to spread the key back to ~mean-load
    reducers; 1 for non-hot keys).

    Plan shape: one map-side-combined groupBy (O(distinct keys) state),
    then the 2-column totals row joins back via a 1-row broadcast — no
    second shuffle, no partition-less window.
    """
    counts = df.groupBy(key).agg(F.count("*").alias("n_events"))
    totals = counts.agg(
        F.sum("n_events").alias("_total"), F.count("*").alias("_nkeys")
    )
    # cast to double BEFORE the multiply: n_events * nkeys in long
    # arithmetic wraps past 2^63 exactly for the dominant keys this
    # report exists to flag (10^9 keys × a ~10^10-row hot key); the
    # double product is approximate but monotone, and the DuckDB
    # oracle mirrors the same op order bit-exactly
    ratio = F.col("n_events").cast("double") * F.col("_nkeys") / F.col("_total")
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            key,
            "n_events",
            F.round(F.col("n_events") / F.col("_total"), 6).alias("share"),
            F.round(ratio, 6).alias("ratio"),
            (ratio >= F.lit(hot_ratio)).alias("is_hot"),
            F.when(ratio >= F.lit(hot_ratio), F.ceil(ratio))
            .otherwise(F.lit(1))
            .cast("int")
            .alias("salt_factor"),
        )
    )


def topk_hot_keys(df: DataFrame, key: str, k: int = 10) -> DataFrame:
    """O1 — top-k keys by row volume (used to size ``n_salts`` and to
    diagnose skew). Plans as partial-agg + TakeOrderedAndProject: only k
    rows ever reach the driver."""
    return (
        df.groupBy(key)
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc(key))
        .limit(k)
    )
