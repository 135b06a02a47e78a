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
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """K3 at scale: columnar, partition-pruned, atomically replaced."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def merge_upsert(
    spark: SparkSession,
    path: str,
    changes: DataFrame,
    key_cols: list[str],
    partition_cols: list[str],
    delete_col: str | None = None,
) -> None:
    """MERGE INTO for a plain-parquet lakehouse table — the idiomatic
    open-Spark form without a row-level table format: copy-on-write at
    partition granularity.

    - ``changes`` carries upserts (and, when ``delete_col`` names a
      boolean column, deletes) keyed by ``key_cols``.
    - Only partitions PRESENT in the change batch are read (the tiny
      distinct partition-key list prunes the scan) and rewritten
      (``partitionOverwriteMode=dynamic`` replaces exactly those
      directories, atomically per partition). A change batch touching
      one day of a 100 TB fact reads and writes one day.
    - Matched keys take the change row (update), unmatched change
      rows append (insert), delete-flagged keys drop.

    The merged frame is localCheckpoint-ed before the write: the plan
    reads the same path it overwrites, and truncating the lineage is
    what makes the self-overwrite safe (and re-runnable) — the
    checkpoint holds only the touched partitions' rows.
    """
    current = spark.read.parquet(path)
    part_keys = changes.select(*partition_cols).distinct().collect()
    pred = None
    for row in part_keys:
        clause = None
        for pc in partition_cols:
            c = F.col(pc) == row[pc]
            clause = c if clause is None else (clause & c)
        pred = clause if pred is None else (pred | clause)
    touched = current.filter(pred) if pred is not None else current.limit(0)
    if delete_col is not None:
        upserts = changes.filter(~F.col(delete_col)).drop(delete_col)
        change_keys = changes.select(*key_cols).distinct()
    else:
        upserts = changes
        change_keys = changes.select(*key_cols).distinct()
    merged = (
        touched.join(change_keys, key_cols, "left_anti")
        .unionByName(upserts)
        .localCheckpoint()
    )
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(path)
    )


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
