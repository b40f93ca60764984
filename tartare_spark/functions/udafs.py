"""Vectorized grouped-aggregate UDFs (D2, SURVEY.md §2.10).

NOTE: no ``from __future__ import annotations`` here — pandas_udf
signature inference needs real (non-stringified) annotations.
"""

import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def weighted_mean(v: pd.Series, w: pd.Series) -> float:
    """Grouped-agg weighted mean — Arrow-batched, one call per group.
    Reference analog: per-contributor export stats [PK:
    tartare/core/models.py]."""
    return float((v * w).sum() / w.sum())
