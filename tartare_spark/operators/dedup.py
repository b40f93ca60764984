"""A1 ``dedup_latest_lsn`` — keep the max-LSN event per key in a batch.

Reference analog: tartare keeps the latest fetched DataSet per data
source (md5/created_at) [PK: tartare/core/models.py DataSet history];
BASELINE.json:6 mandates dedup by commit LSN.

Implementation: ``groupBy(keys).agg(max_by(struct(*), lsn))`` — Spark
plans this as partial hash-agg (map side) + final hash-agg, i.e. ONE
shuffle of already-reduced data. At 10^10 events the map-side combine is
what makes this survive: hot keys collapse per input partition before
the exchange. The window-function variant (W1, row_number over
partitionBy) is provided for parity but shuffles FULL rows and sorts —
use A1 in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dedup_latest_lsn(
    events: DataFrame, keys: list[str] = ("repo", "path"), order_col: str = "lsn"
) -> DataFrame:
    """One row per key: the event with the highest ``order_col``.
    Duplicate (redelivered) LSNs are verbatim copies, so any winner among
    equals is correct."""
    keys = list(keys)
    payload = [c for c in events.columns if c not in keys]
    packed = events.groupBy(*keys).agg(
        F.max_by(F.struct(*payload), F.col(order_col)).alias("_w")
    )
    return packed.select(*keys, *[F.col(f"_w.{c}").alias(c) for c in payload])


def dedup_latest_window(
    events: DataFrame, keys: list[str] = ("repo", "path"), order_col: str = "lsn"
) -> DataFrame:
    """W1 ``rank_versions`` variant: row_number()==1 over desc order.
    Equivalent result; kept for the operator inventory and for cases
    needing top-N>1 version history."""
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).desc())
    return (
        events.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
