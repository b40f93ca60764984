"""U4 ``cell_diff`` — column-granular diff between two table states.

Reference analog: SURVEY.md §2 U2 gives the ROW-level diff (exceptAll
both ways); a CDC audit usually needs the next question answered —
*which columns* changed per key between a checkpoint and now (the
"what did the migration touch" / "why does the replica disagree"
report). S16's checksum localizes a mismatch to a bucket; this names
the key and the exact columns.

Scale shape: ONE full-outer join on the key (shuffle or broadcast per
stats — the join IS the cost, same as any MERGE), then a pure codegen
projection builds the changed-column list via null-safe comparisons —
no per-column jobs, no window, no Python. Rows equal on every compared
column are filtered out, so the result is O(differences).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cell_diff(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    cols: list[str],
) -> DataFrame:
    """Per-key cell diff of ``left`` (old state) vs ``right`` (new):
    one row per key that differs, with ``op`` ∈ insert/delete/update
    (relative to the transition old→new) and ``changed_cols`` — the
    compared columns whose values are NOT null-safe-equal (empty for
    pure inserts/deletes, where every column trivially "changes").

    Key columns must be non-null on their own side (true for any
    primary-keyed table); value comparison is null-safe (NULL vs NULL
    is equal, NULL vs value is a change).
    """
    lhs = left.select(
        *[F.col(k).alias(f"_lk_{k}") for k in keys],
        *[F.col(c).alias(f"_l_{c}") for c in cols],
    )
    rhs = right.select(
        *[F.col(k).alias(f"_rk_{k}") for k in keys],
        *[F.col(c).alias(f"_r_{c}") for c in cols],
    )
    cond = None
    for k in keys:
        c = F.col(f"_lk_{k}") == F.col(f"_rk_{k}")
        cond = c if cond is None else (cond & c)
    j = lhs.join(rhs, cond, "full_outer")
    in_left = F.col(f"_lk_{keys[0]}").isNotNull()
    in_right = F.col(f"_rk_{keys[0]}").isNotNull()
    changed = F.flatten(
        F.array(
            *[
                F.when(
                    ~F.col(f"_l_{c}").eqNullSafe(F.col(f"_r_{c}")),
                    F.array(F.lit(c)),
                ).otherwise(F.array().cast("array<string>"))
                for c in cols
            ]
        )
    )
    op = (
        F.when(~in_left, F.lit("insert"))
        .when(~in_right, F.lit("delete"))
        .otherwise(F.lit("update"))
    )
    out = j.select(
        *[
            F.coalesce(F.col(f"_lk_{k}"), F.col(f"_rk_{k}")).alias(k)
            for k in keys
        ],
        op.alias("op"),
        F.when(in_left & in_right, changed)
        .otherwise(F.array().cast("array<string>"))
        .alias("changed_cols"),
    )
    return out.where(
        (F.col("op") != "update") | (F.size("changed_cols") > 0)
    )
