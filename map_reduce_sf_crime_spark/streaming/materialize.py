"""Continuous materialization: the streaming form of the reference's
PREP→LOAD pipeline (SanFranciscoCrimePrepOlap + LoadStarDB — batch
recompute + truncate-reload, runmapreduce.sh:6-8).

``foreachBatch`` + dynamic partition overwrite = incremental upsert on
plain parquet. foreachBatch is AT-LEAST-ONCE: after a crash the
checkpoint replays the failed micro-batch with the SAME batch_id, so
the sink must be idempotent per (batch_id, data). The previous
read-merge-overwrite form was not — a replay would re-add the batch's
counts to partitions its first attempt had already rewritten. This
version uses the standard **staged-delta** discipline instead:

1. The batch's per-day delta is written to a staging table
   ``{out_dir}_deltas`` hive-partitioned by ``(day, batch)``. A
   replay dynamically overwrites exactly its own ``(day, batch_id)``
   directories with identical content — idempotent by layout.
2. The serving table's affected day partitions are then REBUILT as a
   pure aggregate of all staged deltas for those days — a
   deterministic function of staging state, so re-running after any
   crash (mid-stage or mid-rebuild) converges; a torn serving write
   self-heals on the replay. Untouched days are never rewritten.

At 100 TB the nightly "reload the world" becomes a per-partition
delta; staging accrues one small file per (day, batch) —
`sources/lakehouse.py::compact_partitioned` is the matching
maintenance story. (A lakehouse table format would replace this with
MERGE INTO + its transaction log; the pattern and costs are the
same.) Replay-idempotence is pinned in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def merge_daily_counts(spark: SparkSession, out_dir: str):
    """Returns a foreachBatch function maintaining a day-partitioned
    (day, event_type, n) aggregate under ``out_dir`` (staging under
    ``{out_dir}_deltas``), idempotent under micro-batch replay."""
    deltas_dir = out_dir.rstrip("/") + "_deltas"

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        delta = (
            batch_df.withColumn("day", F.to_date("ts"))
            .groupBy("day", "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        days = [r["day"] for r in delta.select("day").distinct().collect()]
        if not days:
            return
        (
            delta.withColumn("batch", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("day", "batch")
            .parquet(deltas_dir)
        )
        merged = (
            spark.read.parquet(deltas_dir)
            .filter(F.col("day").isin(days))  # partition-pruned scan
            .groupBy("day", "event_type")
            .agg(F.sum("n").alias("n"))
        )
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
