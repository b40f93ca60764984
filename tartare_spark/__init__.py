"""tartare_spark — a PySpark-native CDC / incremental-ingest engine.

Reimagines the capabilities of the ``pbougue/tartare`` reference
(a change-driven data-integration pipeline: conditional fetch by
checksum, sequenced preprocesses, merge of contributor exports into
coverage exports, idempotent sequenced publishes) as a binlog-style
change-event tail applied with exactly-once MERGE upserts into a
partitioned, snapshot-isolated lake table (Iceberg-like semantics,
implemented from scratch — no Iceberg jars in this environment).

Spark-first design: everything is DataFrame / Structured Streaming;
Catalyst + AQE do planning; Python appears only at Arrow (pandas UDF)
boundaries and driver-side commit orchestration.

See SURVEY.md for the operator inventory this package implements.
"""

from tartare_spark.session import get_spark
from tartare_spark.lake.table import LakeTable
from tartare_spark.operators.apply import apply_batch, replay_batches
from tartare_spark.registry import SchemaRegistry

__version__ = "0.1.0"

__all__ = [
    "get_spark",
    "LakeTable",
    "apply_batch",
    "replay_batches",
    "SchemaRegistry",
    "__version__",
]
