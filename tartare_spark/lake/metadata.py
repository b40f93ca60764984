"""Queryable table metadata — Iceberg metadata-table parity
(``table.files`` / ``table.snapshots`` / ``table.partitions``) for the
mini lake format (SURVEY §2.1 S-family; Iceberg exposes these as
``db.table.files`` etc. for ops dashboards and maintenance planning).

Scale shape: the file LISTING comes straight from the manifest — the
same O(files)-strings JSON object every commit already reads, so no
object-store LIST call and no data-file access on the driver. Per-file
physical stats (byte size, footer row count) are gathered
EXECUTOR-side via ``mapInPandas`` over the path list: at the 100 TB
design point that is a few hundred thousand footer opens spread across
the cluster, never a driver-side loop. ``snapshots_df`` /
``partitions_df`` are pure manifest projections (O(versions) /
O(buckets) rows — bounded driver-side metadata, same class as
``history()``).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession

if TYPE_CHECKING:  # pragma: no cover
    from tartare_spark.lake.table import LakeTable

_FILES_SCHEMA = (
    "bucket int, kind string, path string, size_bytes long, num_rows long"
)


def files_df(
    spark: SparkSession, lake: "LakeTable", version: int | None = None
) -> DataFrame:
    """One row per live data file of the snapshot: (bucket, kind
    ``base``|``delta``, path, size_bytes, num_rows). Paths/buckets come
    from the manifest (driver-side strings); size and footer row count
    are read executor-side."""
    m = lake.manifest(version)
    rows = [
        (int(b), kind, p)
        for kind_key, kind in (("files", "base"), ("deltas", "delta"))
        for b, fl in m.get(kind_key, {}).items()
        for p in fl
    ]
    base = spark.createDataFrame(rows, "bucket int, kind string, path string")

    def _phys_stats(batches):
        import os

        import pyarrow.parquet as pq

        for pdf in batches:
            sizes = [os.path.getsize(p) for p in pdf["path"]]
            # read_metadata opens, reads the footer, and CLOSES — a
            # ParquetFile here would leak one handle per listed file
            # for the task's lifetime (EMFILE at the design point)
            nrows = [pq.read_metadata(p).num_rows for p in pdf["path"]]
            pdf = pdf.assign(size_bytes=sizes, num_rows=nrows)
            pdf["size_bytes"] = pdf["size_bytes"].astype("int64")
            pdf["num_rows"] = pdf["num_rows"].astype("int64")
            yield pdf

    n_slices = max(1, min(len(rows), spark.sparkContext.defaultParallelism))
    return base.repartition(n_slices).mapInPandas(_phys_stats, _FILES_SCHEMA)


def snapshots_df(spark: SparkSession, lake: "LakeTable") -> DataFrame:
    """One row per retained snapshot (``history()`` as a DataFrame):
    version, batch_id, committed_at, schema_version, num_buckets,
    rows_written."""
    rows = [
        (
            rec["version"],
            rec["batch_id"],
            rec["committed_at"],
            rec["schema_version"],
            rec["num_buckets"],
            rec["stats"].get("rows_written"),
        )
        for rec in lake.history()
    ]
    return spark.createDataFrame(
        rows,
        "version long, batch_id long, committed_at double, "
        "schema_version int, num_buckets int, rows_written long",
    )


def partitions_df(
    spark: SparkSession, lake: "LakeTable", version: int | None = None
) -> DataFrame:
    """One row per bucket of the snapshot: base/delta file counts and
    the bucket's applied-LSN high-water mark — the maintenance-planning
    view (which buckets are dirty, how deep their delta stacks are)."""
    m = lake.manifest(version)
    buckets = sorted(
        {int(b) for b in m.get("files", {})}
        | {int(b) for b in m.get("deltas", {})}
        | {int(b) for b in m.get("bucket_lsn", {})}
    )
    rows = [
        (
            b,
            len(m.get("files", {}).get(str(b), [])),
            len(m.get("deltas", {}).get(str(b), [])),
            m.get("bucket_lsn", {}).get(str(b)),
        )
        for b in buckets
    ]
    return spark.createDataFrame(
        rows,
        "bucket int, n_base_files int, n_delta_files int, last_lsn long",
    )


def refs_df(spark: SparkSession, lake: "LakeTable") -> DataFrame:
    """One row per named ref (Iceberg ``table.refs`` parity): the main
    HEAD, every tag (type ``tag``, pinned version), and every live
    branch (type ``branch``, fork + current version of the branch
    root). Pure driver-side metadata — O(refs) rows."""
    rows = [("main", "branch", None, lake.current_version())]
    for name, v in sorted(lake.tags().items()):
        rows.append((name, "tag", None, int(v)))
    for name, info in sorted(lake.branches().items()):
        rows.append(
            (name, "branch", int(info["fork_version"]), int(info["current_version"]))
        )
    return spark.createDataFrame(
        rows, "name string, type string, fork_version long, version long"
    )
