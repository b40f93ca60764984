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
a production deployment points the same call at a real metastore (or
uses Iceberg's ``bucket(N, col)`` partition transform, which encodes
the same contract in table metadata).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


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
    zone-map/row-group pruning on the sort key gets tight ranges)."""
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .option("path", path)
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(name)
    return name


def read_published(spark: SparkSession, name: str) -> DataFrame:
    """Read a published bucketed table back (bucket metadata intact —
    joins on the bucket key stay exchange-free)."""
    return spark.table(name)
