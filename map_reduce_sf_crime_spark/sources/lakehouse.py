"""Lakehouse write layout — the 100 TB form of the reference's K3/K4
"truncate and bulk reload" sinks (dimensions.ktr:611-740, LoadStarDB.
java:202-217).

Two layout strategies, both exercised by tests/test_lakehouse.py
against the physical plan (not just results):

- **Partitioned parquet** (`write_partitioned`): hive-style
  ``col=value`` directories. Predicates on partition columns become
  *partition pruning* — the scan lists only matching directories, so
  a year/month slice of a 100 TB fact touches only that slice's
  files. This replaces the reference's per-quarter manual file
  handling (one CSV per export window).
- **Bucketed tables** (`write_bucketed`): ``bucketBy(n, key)`` via
  ``saveAsTable``. Two tables bucketed on the same key by the same
  bucket count join WITHOUT a shuffle — the join degenerates to
  per-bucket sort-merge. At 100 TB this removes the dominant cost of
  the orders⋈customer class of joins when one side is reused across
  many queries (write once bucketed, join many times shuffle-free).

``mode="overwrite"`` everywhere — the atomic replacement of the
reference's truncate-then-insert (K4), without its read-gap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """K3 at scale: columnar, partition-pruned, atomically replaced."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` hash-bucketed (and bucket-sorted) on ``bucket_col``
    so equi-joins and aggregations on that key need no shuffle."""
    w = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.format("parquet").saveAsTable(table)
