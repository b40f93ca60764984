"""Batch sessionization: gap-based session ordinals + per-session rows.

Reference analog: tartare groups a contributor's actions into jobs by
idle gaps [SURVEY §2.5 W7]; the same lag+cumsum classic turns any
keyed event stream into sessions. Streaming twin: ``session_window``
(demo t4) — that gives COUNTS under watermarks; this batch form gives
the sessions themselves with stable ordinals, joinable back to events.

Scale shape: the gap flag (lag) and the running sum share ONE
(key)-partitioned window — one shuffle + sort; the per-session
aggregate after it is EXCHANGE-FREE because HashPartitioning(key)
satisfies the (key, session_idx) clustering (subset rule). Nothing
collects to the driver; skewed keys are bounded by the per-key event
count, exactly like any per-key window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: float,
    order_cols: list[str] | None = None,
    idx_col: str = "session_idx",
) -> DataFrame:
    """Add a per-key 1-based session ordinal: a new session starts when
    the gap to the previous event STRICTLY exceeds ``gap_seconds``
    (microsecond-exact — an event exactly ``gap`` later continues the
    session, matching an ``interval > gap`` test; ``session_window``'s
    half-open [t, t+gap) differs by exactly the boundary, see demo t4).

    ``order_cols`` must make the per-key order total (default
    ``[ts_col]`` — pass a unique tiebreak for same-timestamp events or
    ordinals of ties are nondeterministic)."""
    order_cols = order_cols or [ts_col]
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev_us = F.lag(us).over(w)
    gap_us = int(round(float(gap_seconds) * 1_000_000))
    new_sess = (prev_us.isNull() | ((us - prev_us) > F.lit(gap_us))).cast("int")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(idx_col, F.sum(new_sess).over(run).cast("long"))


def session_rollup(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: float,
    order_cols: list[str] | None = None,
    agg: dict[str, str] | None = None,
) -> DataFrame:
    """One row per (key, session): n_events, sess_start/sess_end, plus
    any ``{col: fn}`` extras. The groupBy reuses the window's
    partitioning — zero additional exchanges."""
    s = sessionize(df, key_col, ts_col, gap_seconds, order_cols)
    aggs = [
        F.count("*").alias("n_events"),
        F.min(ts_col).alias("sess_start"),
        F.max(ts_col).alias("sess_end"),
    ]
    for col, fn in (agg or {}).items():
        aggs.append(getattr(F, fn)(col).alias(f"{fn}_{col}"))
    return s.groupBy(key_col, "session_idx").agg(*aggs)
