"""SCD Type-2 history over a CDC change log, plus point-in-time lookup.

Reference analog: tartare keeps the full DataSet fetch history per data
source and can serve any historical validity period [SURVEY §2.4 A2,
§1.1]; BASELINE.json's binlog framing makes the natural engine-side
form a slowly-changing-dimension type-2 table: one row per VERSION of a
(repo, path) key, carrying the LSN interval during which that version
was current.

Semantics
---------
Input is changelog-shaped (``lsn``, ``op``, key columns, payload).

* every non-delete event opens a version valid from its LSN;
* the version closes at the NEXT event's LSN for the same key (update
  or delete alike — a delete closes the prior version without opening
  one);
* a version with no successor is open-ended (``valid_to_lsn`` null) and
  flagged ``is_current`` — so the ``is_current`` slice of the history
  equals the lake's LWW live state by construction (property-tested in
  tests/test_operators.py).

Scale shape: ONE shuffle — a window partitioned by key ordered by LSN.
Partitions are per-key (bounded by a key's version count, never by
table size), so there is no skew amplification beyond what the key
distribution already has; hot keys are bounded by their own history
length. No driver-side work. Exact duplicates (redelivered LSNs are
verbatim copies, SURVEY §2.1 S7) need no pre-dedup pass: among k
copies of one LSN, k-1 get a same-LSN successor and are dropped by the
zero-width filter, so redelivery cannot fabricate versions — and the
plan stays a single window (a ``dropDuplicates`` upstream of the
window also trips a Spark 4.1 optimizer bug in the ``exceptAll``
rewrite, INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND; regression-tested in
tests/test_operators.py::test_scd2_redelivery_invariant).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def scd2_history(
    changes: DataFrame,
    keys: list[str] = ("repo", "path"),
    lsn_col: str = "lsn",
    op_col: str = "op",
    delete_op: str = "delete",
) -> DataFrame:
    """Build the type-2 history: one row per surviving version with
    ``valid_from_lsn`` / ``valid_to_lsn`` (null = still open) /
    ``is_current``. Delete events close their predecessor and emit no
    row of their own. Input order does not matter; output is a pure
    function of the event set."""
    keys = list(keys)
    w = Window.partitionBy(*keys).orderBy(F.col(lsn_col).asc())
    versions = changes.withColumn(
        "valid_from_lsn", F.col(lsn_col).cast("long")
    ).withColumn("valid_to_lsn", F.lead(F.col(lsn_col).cast("long")).over(w))
    return (
        versions.filter(
            # zero-width = a redelivered duplicate's shadow (see module
            # docstring); real versions always advance the LSN
            F.col("valid_to_lsn").isNull()
            | (F.col("valid_to_lsn") > F.col("valid_from_lsn"))
        )
        .filter(F.col(op_col) != delete_op)
        .withColumn("is_current", F.col("valid_to_lsn").isNull())
        .drop(lsn_col, op_col)
    )


def _covers(lsn: int) -> Column:
    return (F.col("valid_from_lsn") <= F.lit(int(lsn))) & (
        F.col("valid_to_lsn").isNull() | (F.col("valid_to_lsn") > F.lit(int(lsn)))
    )


def scd2_asof(history: DataFrame, lsn: int) -> DataFrame:
    """Point-in-time read: the version of every key that was current
    just after ``lsn`` was applied. A key deleted at-or-before ``lsn``
    has no covering interval and is absent — matching what a snapshot
    of the lake at that LSN would contain. Pure filter: no shuffle, and
    with the history stored sorted/zone-mapped on ``valid_from_lsn``
    the predicate is file-prunable (lake.analyze / scan_where)."""
    return history.filter(_covers(lsn)).drop("is_current")
