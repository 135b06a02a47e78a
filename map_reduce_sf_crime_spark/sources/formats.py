"""Secondary interchange formats (JSON-lines, ORC).

The reference's only formats are CSV/TSV text (SURVEY §2.1 lists
"Other formats (Parquet/ORC/JSON/Avro) — not present"); the engine
standardizes on Parquet for storage but supports the other
interchange formats a pipeline meets at its edges. Both readers take
an EXPLICIT schema (the engine's fixed-schema discipline, SURVEY
§1.6 — no inference drift between engines or runs).

At scale both formats split and parallelize like any FileFormat
source; ORC additionally carries column stats for predicate pushdown
(same pushdown surface the parquet tests assert).

Avro stays a documented non-goal in THIS environment: it is an
external module since Spark 2.4 (`spark-avro` jar), absent from the
container and not installable offline (probed round 8: "Failed to
find data source: avro"). On a cluster with the jar deployed,
`spark.read.format("avro")` slots in beside these with the same
explicit-schema discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def write_json(df: DataFrame, path: str) -> None:
    """JSON-lines sink, atomic overwrite (K4 semantics)."""
    df.write.mode("overwrite").json(path)


def read_json(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """JSON-lines scan with explicit schema (no inference)."""
    return spark.read.schema(schema).json(path)


def write_orc(df: DataFrame, path: str) -> None:
    """ORC sink, atomic overwrite."""
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan (schema from ORC footer — self-describing, like
    parquet)."""
    return spark.read.orc(path)
