"""Parquet loaders for the driver testdata tables.

The reference reads raw CSV (S1, SanFranciscoCrime.java:219); our
engine standardizes on columnar Parquet for everything analytic —
vectorized scan, predicate pushdown, column pruning and partition
pruning come free (SURVEY §2.1 "not present" row). CSV remains
supported for the raw-incident edge via sources/csv_crimes.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Defensive: every oracle comparison assumes UTC-naive timestamp
    # semantics (DuckDB). The harness session pins UTC, but queries may
    # run under a caller-built session — pin it at the data boundary so
    # date/timestamp renders can't shift with the host timezone.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def fan_out(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Round-robin repartition IF the source delivered fewer splits than
    cores — a single-row-group parquet file (like the local testdata) is
    one unsplittable scan task, serializing all per-row compute upstream
    of the first shuffle. On a real cluster the input arrives in
    thousands of splits and this is a no-op; locally it buys scan-side
    parallelism for CPU-heavy derivations (shingling, hashing, UDFs) at
    the cost of one small shuffle. Use on compute-bound paths, not plain
    scan→filter→agg where the shuffle would outweigh the win."""
    spark = df.sparkSession
    target = min_parts or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet stores TIMESTAMP(NANOS), which Spark's parquet
    reader rejects ([PARQUET_TYPE_ILLEGAL]). Read nanos as long
    (runtime SQLConf) and truncate to microsecond timestamps — the
    same ns→µs floor DuckDB applies, so oracles agree."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return raw.withColumn(
        "ts", F.timestamp_micros(F.expr("ts div 1000"))
    )


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
