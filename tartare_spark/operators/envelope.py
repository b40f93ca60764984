"""Debezium/wal2json-style CDC envelope source adapter.

Reference analog: tartare ingests external data-source updates through
fetch jobs [SURVEY §2.1 S2/S3]; the binlog framing (BASELINE.json
north_star) makes the real-world wire format a JSON *change envelope* —
the shape Debezium, Maxwell and wal2json all emit on a Kafka-like bus:

    {"op": "c"|"u"|"d"|"r",
     "before": {<row image>} | null,
     "after":  {<row image>} | null,
     "source": {"lsn": <monotone long>, "ts_ms": <epoch millis>}}

``envelope_changelog`` turns a DataFrame of such JSON strings into the
engine's changelog shape (FIXTURES.md §6: lsn, op, repo, path, commit,
lang, content, ts) so the whole engine — apply/fence/SCD2/MV — runs
unchanged off a Debezium topic dump. ``to_envelope`` is the inverse
(changelog → envelope), used for round-trip tests and for relaying a
lake's change feed back onto a bus.

Scale shape: both directions are pure projections — ``from_json`` /
``to_json`` with an explicit schema, whole-stage codegen, zero
shuffle, zero Python. Works identically under ``readStream`` (the
JSON column can come from any streaming source).

Semantics: ``c`` maps to the engine's "insert", ``u``/``r``
(update/snapshot-read) to "update" — the LWW merge treats both
identically, so the distinction is informational but round-trips —
and ``d`` maps to "delete", carrying only the before-image key
fields, per Debezium convention.
Malformed JSON parses to a null envelope, and non-row-change op codes
(Debezium's ``t`` truncate / ``m`` message, or anything unknown) keep
a null ``op``; ``drop_malformed=True`` filters both (the default
surfaces them so a caller can dead-letter them instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ROW = "struct<repo:string,path:string,commit:string,lang:string,content:string>"
ENVELOPE_SCHEMA = (
    f"op string, before {_ROW}, after {_ROW}, "
    "source struct<lsn:bigint,ts_ms:bigint>"
)


def to_envelope(changes: DataFrame) -> DataFrame:
    """Changelog → one-column (``value``) DataFrame of envelope JSON.
    Deletes carry the key in ``before`` (no after-image); upserts carry
    the full row in ``after``."""
    is_del = F.col("op") == "delete"
    _null = F.lit(None).cast("string")
    after_row = F.struct("repo", "path", "commit", "lang", "content")
    before_key = F.struct(
        F.col("repo"),
        F.col("path"),
        _null.alias("commit"),
        _null.alias("lang"),
        _null.alias("content"),
    )
    env = F.struct(
        F.when(is_del, F.lit("d"))
        .when(F.col("op") == "insert", F.lit("c"))
        .otherwise(F.lit("u"))
        .alias("op"),
        F.when(is_del, before_key).alias("before"),
        F.when(~is_del, after_row).alias("after"),
        F.struct(
            F.col("lsn").cast("long").alias("lsn"),
            # NTZ-safe: the engine's changelog carries TIMESTAMP_NTZ
            # (TESTDATA parquet) or TIMESTAMP; wall-clock epoch either way
            F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
        ).alias("source"),
    )
    return changes.select(F.to_json(env).alias("value"))


def envelope_changelog(
    raw: DataFrame, value_col: str = "value", drop_malformed: bool = False
) -> DataFrame:
    """Envelope JSON → engine changelog. Pure ``from_json`` projection
    (codegen, zero shuffle); the row image is ``after`` for upserts and
    falls back to ``before`` for deletes."""
    e = F.from_json(F.col(value_col), ENVELOPE_SCHEMA)
    row = F.coalesce(e["after"], e["before"])
    out = raw.select(
        e["source"]["lsn"].alias("lsn"),
        # ONLY the known row-change codes map; anything else (Debezium
        # also emits 't' truncate and 'm' message events, plus whatever
        # a future connector adds) stays null-op so it is dead-lettered
        # or dropped below — never upserted as a null-key phantom row
        F.when(e["op"] == "d", F.lit("delete"))
        .when(e["op"] == "c", F.lit("insert"))
        .when(e["op"].isin("u", "r"), F.lit("update"))
        .alias("op"),
        row["repo"].alias("repo"),
        row["path"].alias("path"),
        row["commit"].alias("commit"),
        row["lang"].alias("lang"),
        row["content"].alias("content"),
        F.timestamp_millis(e["source"]["ts_ms"]).alias("ts"),
    )
    if drop_malformed:
        out = out.filter(F.col("lsn").isNotNull() & F.col("op").isNotNull())
    return out
