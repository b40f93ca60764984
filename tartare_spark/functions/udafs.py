"""Vectorized grouped-aggregate UDFs (D2, SURVEY.md §2.10).

NOTE: no ``from __future__ import annotations`` here — pandas_udf
signature inference needs real (non-stringified) annotations. The udf
objects are built lazily at call time: a module-level ``@pandas_udf``
decorator needs an active SparkSession just to import the module.
"""

import pandas as pd
from pyspark.sql.functions import pandas_udf


def _weighted_mean_kernel(v: pd.Series, w: pd.Series) -> float:
    return float((v * w).sum() / w.sum())


def weighted_mean(v, w):
    """Grouped-agg weighted mean — Arrow-batched, one call per group.
    Reference analog: per-contributor export stats [PK:
    tartare/core/models.py]."""
    return pandas_udf(_weighted_mean_kernel, "double")(v, w)
