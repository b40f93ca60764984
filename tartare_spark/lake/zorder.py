"""Multi-dimensional z-order (Morton) clustering for compaction.

Reference analog: the reference's export/maintenance path rewrites data
sorted by its primary key [SURVEY §2 S5/S6 maintenance notes]; this is
the multi-column generalization — Delta Lake ``OPTIMIZE ZORDER BY`` /
Iceberg ``rewrite_data_files(strategy => 'sort', sort_order => zorder)``
parity for the lake's compaction rewrite.

Why this exists: lexicographic ``(repo, path)`` clustering gives each
compacted file a tight ``repo`` min/max range (zone-map pruning on
``repo`` is near-perfect) but every file spans nearly the whole ``path``
domain — a path-only predicate prunes nothing. Interleaving the bits of
per-column *range bins* bounds BOTH columns' per-file ranges, so the
manifest zone map built by ``analyze()`` prunes on either dimension
(at a modest cost to single-column selectivity vs a pure sort on that
column).

Why bins, not raw/hashed values: z-ordering hashes would scatter the
lexicographic ranges and make raw min/max stats useless; z-ordering
raw bytes over-weights common prefixes. Instead each column is mapped
to an 8-bit *rank bin* via boundaries taken from a bounded,
deterministic sample of its distinct values (md5-ordered — a uniform
pseudo-random draw that needs no seed plumbing and is reproducible
across runs). Delta's OPTIMIZE ZORDER uses the same shape
(sampling-based range-partition ids). Boundary collection is
O(sample) driver memory and runs only at maintenance time, never on
the apply hot path.

The z-value itself is pure codegen'd long arithmetic (aggregate over a
boundary-array literal + shift/or bit interleave) — no UDFs, no extra
shuffle: compaction's existing per-bucket repartition is reused and the
sort just switches keys to ``(_bucket, zvalue)``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 8 bits/dimension: 256 rank bins. With d dimensions the z-value spans
# 8*d bits — well inside a long for any sane column count.
N_BINS = 256
_SAMPLE_ROWS = 60_000


def column_boundaries(
    df: DataFrame, col: str, n_bins: int = N_BINS, sample_rows: int = _SAMPLE_ROWS
) -> list:
    """``n_bins - 1`` ascending cut points for ``col`` from a bounded
    deterministic sample of its distinct values. Fewer distinct values
    than bins simply yields fewer (still correct) cuts."""
    vals = [
        r[0]
        for r in (
            df.select(col)
            .where(F.col(col).isNotNull())
            .distinct()
            .orderBy(F.md5(F.col(col).cast("string")))
            .limit(sample_rows)
            .collect()
        )
    ]
    vals.sort()
    if len(vals) <= 1:
        return []
    cuts = []
    for i in range(1, n_bins):
        j = (i * len(vals)) // n_bins
        if 0 < j < len(vals):
            cuts.append(vals[j])
    # dedupe while preserving order (heavy skew can repeat a value)
    out = []
    for c in cuts:
        if not out or c != out[-1]:
            out.append(c)
    return out


def _bin_column(col: str, cuts: list) -> Column:
    """Rank bin of ``col`` = number of cut points <= value, as a long.
    NULLs land in bin 0 (the when() is null → otherwise-0). Linear in
    len(cuts) but fully codegen'd long math — maintenance-path cost."""
    if not cuts:
        return F.lit(0).cast("long")
    arr = F.array(*[F.lit(c) for c in cuts])
    return F.aggregate(
        arr,
        F.lit(0).cast("long"),
        lambda acc, cut: acc + F.when(F.col(col) >= cut, 1).otherwise(0),
    )


def zvalue(df: DataFrame, cols: list[str]) -> Column:
    """Morton code over the rank bins of ``cols``: bit j of column i
    lands at position ``j * d + i``. Boundary sampling runs one bounded
    job per column; the returned Column is pure long arithmetic."""
    if len(cols) < 2:
        raise ValueError("zorder needs >= 2 columns; use a plain sort for one")
    bins = [_bin_column(c, column_boundaries(df, c)) for c in cols]
    d = len(cols)
    z = F.lit(0).cast("long")
    for bit in range(8):
        for ci, b in enumerate(bins):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(b, bit).bitwiseAND(F.lit(1)), bit * d + ci
                )
            )
    return z
