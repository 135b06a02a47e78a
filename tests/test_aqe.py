"""AQE behaviors the 100 TB design leans on, exercised for real:
skew-join splitting and partition coalescing are enabled in
session.py — prove they actually fire on this build of Spark."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_aqe_splits_skewed_join(spark):
    """One hot key (300k rows) among 1k sparse keys: with the skew
    thresholds scaled to test size, AQE must mark the hot partition
    skewed and split it (``skew=true`` in the executed plan)."""
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        )
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "512KB"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "512KB")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    try:
        hot = spark.range(300_000).select(
            F.lit(0).cast("long").alias("k"), F.col("id").alias("v")
        )
        sparse = spark.range(1_000).select(
            (F.col("id") + 1).alias("k"), F.col("id").alias("v")
        )
        right = spark.range(1_001).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        # NB: no downstream groupBy — a required hash distribution on k
        # would (correctly) suppress the skew split
        joined = hot.union(sparse).join(right, "k")
        # run THIS DataFrame's own QueryExecution so its adaptive plan
        # finalizes (a separate action like .count() builds another)
        assert len(joined.collect()) == 301_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
        assert "AQEShuffleRead coalesced" in plan  # coalescing fired too
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
