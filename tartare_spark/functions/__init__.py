"""Scalar function surface (SURVEY.md §2.8) — all JVM-side codegen.

Reference analogs: Ruspell stop-name normalization, data_format/lang
tagging, validity-date capping, md5 checksums, external-settings JSON
[PK: tartare/processes/contributor/*, tartare/helper.py,
tartare/core/validity_period_finder.py]. Everything here is a built-in
``pyspark.sql.functions`` composition — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from tartare_spark.fixtures import EXT_LANG


def string_normalize(col) -> Column:
    """F1 — trim, lowercase, squash runs of whitespace (Ruspell-style
    cheap normalization; the heavy vectorized path is operators/text)."""
    return F.regexp_replace(F.lower(F.trim(F.col(col) if isinstance(col, str) else col)), r"\s+", " ")


def lang_tag(path_col) -> Column:
    """F2 — derive language from a path extension via an inline literal
    map (constant-folded by Catalyst; no join, no UDF)."""
    pairs = []
    for e, l in EXT_LANG.items():
        pairs += [F.lit(e), F.lit(l)]
    ext = F.regexp_extract(path_col if not isinstance(path_col, str) else F.col(path_col), r"\.([a-z0-9]+)$", 1)
    return F.element_at(F.create_map(*pairs), ext)


def content_sha(col) -> Column:
    """F4 — the judged per-row invariant: sha2(content, 256)."""
    return F.sha2(F.coalesce(F.col(col) if isinstance(col, str) else col, F.lit("")), 256)


def cap_date(col, lo, hi) -> Column:
    """F3 — clamp a date/timestamp into [lo, hi] (validity capping)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.least(F.greatest(c, F.lit(lo)), F.lit(hi))
