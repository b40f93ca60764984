"""Bucketed publish: export a DataFrame as a Spark BUCKETED parquet
table, so downstream joins and aggregations on the bucket key run with
ZERO exchange.

Reference analog: tartare publishes merged exports for downstream
consumers [SURVEY §2.1 S6]; at the 100 TB design point the dominant
cost of consuming an export is re-shuffling it for every join. Writing
the export bucketed (hash-partitioned AND catalog-registered, with
per-file sort) moves that shuffle to write time, paid ONCE: every
subsequent equi-join between co-bucketed exports is planned as a
SortMergeJoin over aligned bucket files with no Exchange at all
(pinned in tests/test_operators.py), and Spark prunes buckets on point
predicates (``SelectedBucketsCount`` in the scan).

Catalog note: bucket metadata lives in the session catalog. This
sandbox has no persistent metastore, so registration is per-session;
``publish_bucketed`` therefore also writes a tiny JSON SIDECAR
(``_bucket_spec.json``: name, bucket cols, N, sort cols, schema DDL)
next to the data, and ``register_published`` re-creates the catalog
entry from it in a fresh session — downstream exchange-free joins
survive a restart. A production deployment points the same call at a
real metastore (or uses Iceberg's ``bucket(N, col)`` partition
transform, which encodes the same contract in table metadata).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

_SPEC_FILE = "_bucket_spec.json"


def _schema_ddl(df: DataFrame) -> str:
    return ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    )


def publish_bucketed(
    df: DataFrame,
    name: str,
    path: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> str:
    """Write ``df`` as an external bucketed parquet table at ``path``
    registered as ``name``. ``sort_cols`` additionally sorts within
    each bucket file (SMJ reads then need no full re-sort, and
    zone-map/row-group pruning on the sort key gets tight ranges).
    A ``_bucket_spec.json`` sidecar records the bucket contract so
    :func:`register_published` can rebuild the catalog entry after a
    session restart."""
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .option("path", path)
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(name)
    spec = {
        "name": name,
        "bucket_cols": list(bucket_cols),
        "num_buckets": int(num_buckets),
        "sort_cols": list(sort_cols) if sort_cols else [],
        "schema_ddl": _schema_ddl(df),
    }
    # the writer owns `path`; parquet readers ignore non-.parquet files
    with open(os.path.join(path, _SPEC_FILE), "w") as f:
        json.dump(spec, f)
    return name


def register_published(
    spark: SparkSession, path: str, name: str | None = None
) -> str:
    """Recover a published bucketed table in a FRESH session from its
    ``_bucket_spec.json`` sidecar: re-creates the catalog entry (schema
    + CLUSTERED BY ... INTO N BUCKETS + LOCATION) over the existing
    files — no data is read or moved, and joins on the bucket key are
    exchange-free again (tests/test_operators.py). ``name`` overrides
    the recorded table name."""
    with open(os.path.join(path, _SPEC_FILE)) as f:
        spec = json.load(f)
    name = name or spec["name"]
    clustered = ", ".join(f"`{c}`" for c in spec["bucket_cols"])
    sorted_by = (
        " SORTED BY ({})".format(", ".join(f"`{c}`" for c in spec["sort_cols"]))
        if spec["sort_cols"]
        else ""
    )
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    spark.sql(
        f"CREATE TABLE {name} ({spec['schema_ddl']}) USING parquet "
        f"CLUSTERED BY ({clustered}){sorted_by} "
        f"INTO {int(spec['num_buckets'])} BUCKETS "
        f"LOCATION '{os.path.abspath(path)}'"
    )
    return name


def read_published(spark: SparkSession, name: str) -> DataFrame:
    """Read a published bucketed table back (bucket metadata intact —
    joins on the bucket key stay exchange-free)."""
    return spark.table(name)
