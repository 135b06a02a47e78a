"""Continuous materialization: the streaming form of the reference's
PREP→LOAD pipeline (SanFranciscoCrimePrepOlap + LoadStarDB — batch
recompute + truncate-reload, runmapreduce.sh:6-8).

``foreachBatch`` + dynamic partition overwrite = incremental upsert on
plain parquet: each micro-batch aggregates its rows, merges with the
existing state of only the AFFECTED day partitions, and atomically
replaces just those partitions. Untouched days are never rewritten —
at 100 TB the nightly "reload the world" becomes a per-partition
delta, and the serving table is always a consistent parquet snapshot.

(A lakehouse table format would replace the read-merge-overwrite with
MERGE INTO; the partition-level pattern and costs are the same.)
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def merge_daily_counts(spark: SparkSession, out_dir: str):
    """Returns a foreachBatch function maintaining a day-partitioned
    (day, event_type, n) aggregate under ``out_dir``."""

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        delta = (
            batch_df.withColumn("day", F.to_date("ts"))
            .groupBy("day", "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        days = [r["day"] for r in delta.select("day").distinct().collect()]
        if not days:
            return
        try:
            existing = spark.read.parquet(out_dir).filter(F.col("day").isin(days))
        except AnalysisException as e:
            # ONLY a missing path means "first batch" — any other read
            # failure (permissions, corrupt footer, transient FS error)
            # must propagate, or the overwrite below would replace the
            # affected partitions with just this micro-batch's counts
            if "PATH_NOT_FOUND" not in str(e) and "Path does not exist" not in str(e):
                raise
            existing = None
        merged = (
            delta.unionByName(existing) if existing is not None else delta
        ).groupBy("day", "event_type").agg(F.sum("n").alias("n"))
        (
            merged.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("day")
            .parquet(out_dir)
        )

    return _merge


def run_materialization(
    stream: DataFrame, spark: SparkSession, out_dir: str
) -> None:
    """Drive the stream to completion into the materialized aggregate."""
    from .windows import STREAM_STATE_PARTITIONS

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(STREAM_STATE_PARTITIONS))
    try:
        q = (
            stream.writeStream.foreachBatch(merge_daily_counts(spark, out_dir))
            .option("checkpointLocation", out_dir + "_ckpt")
            .trigger(availableNow=True)
            .start()
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    q.awaitTermination()
