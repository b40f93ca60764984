"""Schema registry: DataFrame-driven column evolution (SURVEY.md §2.11).

Reference analog: tartare's sequenced preprocess chain mutates the data
shape over time (GtfsAgencyFile adds a missing agency file with default
values; field mappings rename columns) [PK: tartare/processes/contributor/
gtfs_agency_file.py, tartare/core/data_handler.py]. BASELINE.json:6
mandates the same as a schema-registry DataFrame merged at apply time.

Evolution is metadata-first (Iceberg-style):
- ``add column c default_expr e`` effective at LSN k → rows read under a
  snapshot whose watermark ≥ k get ``c = coalesce(c, expr(e))`` (the
  default backfills existing rows at read time; no rewrite);
- ``rename a -> b`` effective at LSN m → snapshots with watermark ≥ m
  present the physical column ``a`` under the name ``b``. Physical file
  schemas never change.

The registry also supports as-of version tagging of a change-event batch
(SURVEY.md §2 J5) — each event learns the registry version effective at
its own LSN via a broadcast as-of join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# Iceberg-parity widening promotions (metadata-only, lossless): an
# integral type may widen to any wider integral, float to double.
# Anything else (narrowing, cross-family, string) is NOT an evolution —
# it needs a rewrite — and raises at read time rather than corrupting.
_INT_RANK = {"byte": 0, "short": 1, "integer": 2, "long": 3}
_TYPE_ALIASES = {
    "tinyint": "byte", "smallint": "short", "int": "integer",
    "bigint": "long",
}


def _check_widen(src_name: str, dst_name: str, column: str) -> None:
    src = _TYPE_ALIASES.get(src_name, src_name)
    dst = _TYPE_ALIASES.get(dst_name, dst_name)
    if src == dst:
        return
    if src in _INT_RANK and dst in _INT_RANK and _INT_RANK[src] < _INT_RANK[dst]:
        return
    if (src, dst) == ("float", "double"):
        return
    raise ValueError(
        f"widen {column}: {src_name} -> {dst_name} is not a lossless "
        "widening promotion (allowed: integral -> wider integral, "
        "float -> double)"
    )


class SchemaRegistry:
    def __init__(self, rows: list[dict]):
        """``rows``: dicts with version, effective_lsn, action
        (base|add|rename|drop|widen), column, renamed_from,
        default_expr; ``widen`` rows carry ``target_type`` (e.g.
        ``"bigint"``, ``"double"``)."""
        self.rows = sorted(rows, key=lambda r: int(r["version"]))

    # -- metadata ------------------------------------------------------
    def version_at(self, lsn: int) -> int:
        v = 1
        for r in self.rows:
            if int(r["effective_lsn"]) <= lsn:
                v = int(r["version"])
        return v

    def effective_rows(self, watermark: int) -> list[dict]:
        return [r for r in self.rows if int(r["effective_lsn"]) <= watermark]

    # -- read-time application (E1/E2) ---------------------------------
    def apply_read(self, df: DataFrame, watermark: int) -> DataFrame:
        """Apply adds (default backfill) and renames effective at
        ``watermark`` to a physical-schema DataFrame."""
        for r in self.effective_rows(watermark):
            if r["action"] == "add":
                col = r["column"]
                if col in df.columns and r.get("default_expr"):
                    df = df.withColumn(
                        col, F.coalesce(F.col(col), F.expr(r["default_expr"]))
                    )
                elif col not in df.columns:
                    default = r.get("default_expr") or "CAST(NULL AS STRING)"
                    df = df.withColumn(col, F.expr(default))
            elif r["action"] == "rename":
                old, new = r["renamed_from"], r["column"]
                if old in df.columns:
                    df = df.withColumnRenamed(old, new)
            elif r["action"] == "widen":
                # E5 metadata-only type widening (Iceberg parity:
                # int -> long, float -> double): physical files keep the
                # narrow type forever; snapshots at/after the effective
                # LSN read the column CAST to the wider type. Time
                # travel below the boundary still sees the narrow type.
                # The pandas referee needs no counterpart: its int64/
                # float64 dtypes are already the widened shape.
                col = r["column"]
                if col in df.columns:
                    target = r["target_type"]
                    _check_widen(
                        df.schema[col].dataType.typeName(), target, col
                    )
                    df = df.withColumn(col, F.col(col).cast(target))
            elif r["action"] == "drop":
                # metadata-only drop (Iceberg-style): the physical column
                # stays in the files; snapshots at/after the effective
                # LSN simply stop projecting it. Time travel to an older
                # watermark still sees it.
                if r["column"] in df.columns:
                    df = df.drop(r["column"])
        return df

    # -- as-of version tagging (J5) -------------------------------------
    def tag_versions(self, events: DataFrame) -> DataFrame:
        """Attach ``_schema_version`` = registry version effective at each
        event's lsn. The registry is tiny and driver-resident, so the
        as-of lookup constant-folds into a chained CASE expression over
        ``lsn`` — a pure codegen'd projection: no join, no shuffle, and
        (unlike a groupBy-all-columns recovery) hot-path-safe on events
        carrying wide content columns. For genuinely big-big as-of joins
        use operators/asof.py."""
        pairs = sorted(
            (int(r["effective_lsn"]), int(r["version"])) for r in self.rows
        )
        expr = F.lit(1)
        for eff, ver in pairs:
            expr = F.when(F.col("lsn") >= F.lit(eff), F.lit(ver)).otherwise(expr)
        return events.withColumn("_schema_version", expr.cast("int"))

    def current_version(self, watermark: int) -> int:
        return self.version_at(watermark)
