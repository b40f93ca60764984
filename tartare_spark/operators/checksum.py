"""Replica-validation checksums (pt-table-checksum / Debezium
incremental-snapshot parity): prove a CDC replica equals its source
WITHOUT shipping or diffing rows.

Source and replica each run the same one-pass aggregation; comparing
the two ≤num_buckets-row summaries decides equality. A mismatch
localizes to a bucket, so the repair loop is pt-table-checksum's
protocol exactly: re-checksum the suspect bucket at finer granularity
(or re-sync just that key range) — never a full-table diff.

Scale shape: ONE map-side-combined groupBy to ≤num_buckets rows; the
shuffle carries (bucket, hash) longs only, never row content. XOR is
the combine fn, so the checksum is order- and partitioning-independent
by construction — the same table checksums identically on 1 executor
or 1000, under any file layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup_docs import md5_int

# NULL must hash differently from the empty string AND from the
# literal "None"; chr(0) cannot appear in real column text
_NULL = "\x00"


def _canon(cols: list[str]):
    """Canonical row string: each column hashed to a FIXED-WIDTH md5
    hex first, then concatenated — per-column hashing makes the column
    boundaries unambiguous, so values containing any delimiter cannot
    shift content between columns ((\"x|y\", \"z\") must differ from
    (\"x\", \"y|z\")). NULL canonicalizes via a chr(0) sentinel,
    distinct from ''. Callers normalize float/timestamp columns to a
    canonical text form FIRST (string casts of approximate types are
    not engine-portable); integer/decimal/string/date casts are."""
    return F.concat_ws(
        "",
        *[
            F.md5(F.coalesce(F.col(c).cast("string"), F.lit(_NULL)))
            for c in cols
        ],
    )


def table_checksum(
    df: DataFrame,
    key_cols: list[str],
    val_cols: list[str],
    num_buckets: int = 32,
) -> DataFrame:
    """Per-bucket (n_rows, checksum) summary of ``df``: bucket = md5 of
    the key columns mod ``num_buckets`` (portable — NOT the engine's
    internal hash, so any engine can produce the comparable summary),
    checksum = bit_xor of a 60-bit md5 fold over key+value columns.

    Equal summaries ⇒ equal tables up to md5 collision (~2^-60 per
    colliding pair); a differing row flips exactly its bucket's
    checksum or row count. XOR cancels PAIRS of identical rows, so on
    multisets a duplicated-vs-missing row pair of the same content can
    cancel in the checksum — n_rows still catches it (the pair changes
    the bucket's count); only a SWAP of two identical extra rows
    between buckets is invisible, which requires duplicate keys —
    CDC state tables are keyed, so the summary is exact there.

    ``num_buckets`` is capped at 65536 (the bucket draw is the 16-bit
    md5 prefix mod num_buckets; non-power-of-two counts carry the
    usual tiny 65536-mod-n bias, irrelevant for localization). Finer
    re-sync granularity comes from re-checksumming ONE dirty bucket's
    key range with fresh buckets — pt-table-checksum's own recursion —
    not from a wider first pass.
    """
    if not 1 <= int(num_buckets) <= 65536:
        raise ValueError(
            f"num_buckets must be in [1, 65536], got {num_buckets} "
            "(the bucket draw uses a 16-bit md5 prefix; recurse into "
            "dirty buckets for finer granularity)"
        )
    bucket = F.pmod(
        F.conv(F.substring(F.md5(_canon(key_cols)), 1, 4), 16, 10).cast(
            "long"
        ),
        F.lit(num_buckets),
    )
    return (
        df.select(
            bucket.alias("bucket"),
            md5_int(_canon(key_cols + val_cols)).alias("_h"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.bit_xor("_h").alias("checksum"),
        )
    )


def checksum_diff(source: DataFrame, replica: DataFrame) -> DataFrame:
    """Buckets where two :func:`table_checksum` summaries disagree —
    the re-sync worklist. Full outer join on bucket (≤num_buckets rows
    each side, broadcastable); a bucket present on one side only, or
    with differing n_rows/checksum, is dirty."""
    s = source.select(
        "bucket",
        F.col("n_rows").alias("src_rows"),
        F.col("checksum").alias("src_sum"),
    )
    r = replica.select(
        "bucket",
        F.col("n_rows").alias("rep_rows"),
        F.col("checksum").alias("rep_sum"),
    )
    j = s.join(r, "bucket", "full_outer")
    dirty = (
        F.col("src_rows").isNull()
        | F.col("rep_rows").isNull()
        | (F.col("src_rows") != F.col("rep_rows"))
        | (F.col("src_sum") != F.col("rep_sum"))
    )
    return j.filter(dirty)
