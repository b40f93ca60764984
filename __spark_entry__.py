"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the CDC engine end-to-end on
sf0.001), ``queries()``/``oracle_sql()`` expose every implemented
operator from SURVEY.md §2 plus the training-data pipeline ops
(dedup / similarity / text / multimodal). Implementations live in
``tartare_spark.demos``; the engine itself in ``tartare_spark``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import DataFrame, SparkSession  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: replay the sf0.001 events table as a CDC change log
    through the lake engine and return the final table state."""
    from tartare_spark.demos import SPARK

    return SPARK["cdc_apply_current_state"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from tartare_spark.demos import SPARK

    return dict(SPARK)


def oracle_sql() -> dict[str, str]:
    from tartare_spark.demos import ORACLE

    return dict(ORACLE)
