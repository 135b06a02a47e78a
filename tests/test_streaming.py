"""Stream/batch parity and late-data watermark behavior."""

from __future__ import annotations

from pyspark.sql import functions as F

from map_reduce_sf_crime_spark.sources.parquet import load_events
from map_reduce_sf_crime_spark.streaming import windows

from .conftest import SF_SMOKE


def test_tumbling_equals_batch_window(spark):
    streamed = windows.tumbling_counts(spark, SF_SMOKE, "1 hour")
    batch = (
        load_events(spark, SF_SMOKE)
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )
    s = {tuple(r) for r in streamed.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert s == b


def test_session_count_conservation(spark):
    sess = windows.session_windows(spark, SF_SMOKE, "5 minutes")
    total = sess.agg(F.sum("n_events")).first()[0]
    assert total == load_events(spark, SF_SMOKE).count()
