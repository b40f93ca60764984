"""S17 ``lag_report`` — replication-lag monitoring over a change feed.

Reference analog: SURVEY.md §2 T7 (metrics listener) emits per-batch
throughput/lag; this is the QUERYABLE counterpart a Debezium/DMS
operator watches — "how far behind is each key-space, and what is the
oldest pending change?" — computed from the changelog itself against a
checkpoint watermark (in production: the applied-LSN fence the sink
persists per bucket, lake/table.py manifests).

Scale shape: one pass over the feed, one map-side-combined groupBy with
O(distinct keys) groups and five conditional aggregates — no joins, no
window, no second shuffle. At 10^10 events this is the same plan as a
grouped count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def lag_report(
    df: DataFrame,
    cutoff: Column | int,
    key: str = "repo",
    lsn: str = "lsn",
) -> DataFrame:
    """Per-``key`` lag vs an applied-LSN ``cutoff``: everything at or
    below the cutoff counts as applied, everything above as pending.

    Returns one row per key: ``applied_wm`` (highest applied LSN, NULL
    if nothing applied yet), ``max_lsn``, ``n_pending``,
    ``oldest_pending_lsn`` (NULL when fully caught up) and ``lag_lsn``
    (= max_lsn - applied_wm; NULL while nothing is applied — a
    bootstrap-pending key is "infinitely" behind, not 0 behind).
    """
    cut = F.lit(cutoff) if isinstance(cutoff, int) else cutoff
    lcol = F.col(lsn)
    applied = F.max(F.when(lcol <= cut, lcol))
    return df.groupBy(key).agg(
        applied.alias("applied_wm"),
        F.max(lcol).alias("max_lsn"),
        F.count(F.when(lcol > cut, F.lit(1))).alias("n_pending"),
        F.min(F.when(lcol > cut, lcol)).alias("oldest_pending_lsn"),
        (F.max(lcol) - applied).alias("lag_lsn"),
    )
