"""Structured Streaming queries (SURVEY §2.9 extension).

Each callable runs a real streaming query (readStream → watermark →
windowed agg → memory sink, availableNow trigger) to completion over
the static events parquet, then returns the materialized result —
which the batch DuckDB oracle verifies exactly (stream/batch parity
over complete input).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..streaming import windows
from .registry import register


@register(
    "stream_window_counts",
    f"""
    select 'tumbling' as kind, win_start, event_type, n, sum_value
    from ({windows.tumbling_counts_sql(60)})
    union all
    select 'sliding' as kind, win_start, event_type, n, sum_value
    from ({windows.sliding_counts_sql()})
    """,
    survey_ids=("ST1", "ST2"),
    rebuild=True,
)
def stream_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling (ST1) and hopping/sliding (ST2) watermarked window
    aggregates in one tagged row-set, verified against the batch twin
    (stream/batch parity over complete input). r12: served by the
    FUSED single-stream form — window-instance assignment is row-local,
    so one keyed streaming aggregation computes both window families
    in one micro-batch pipeline instead of two concurrent queries each
    paying the addBatch + queryPlanning floor (see
    streaming/windows.window_counts_fused; the concurrent two-query
    form stays as window_counts_concurrent, equality pinned in
    tests/test_streaming.py)."""
    return windows.window_counts_fused(spark, sf_dir)


@register(
    "stream_session_windows",
    windows.session_windows_sql(5),
    survey_ids=("ST3",),
    rebuild=True,
)
def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return windows.session_windows(spark, sf_dir, "5 minutes")


@register(
    "stream_stateful_totals",
    None,  # set lazily below to avoid import cycle churn
    survey_ids=("ST4",),
    rebuild=True,
)
def stream_stateful_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.stateful import running_user_totals

    return running_user_totals(spark, sf_dir)


@register(
    "stream_dedup_counts",
    windows.STREAM_DISTINCT_SQL,
    survey_ids=("ST6", "DD1"),
    rebuild=True,
)
def stream_dedup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup (ST6), both state disciplines in one
    tagged row-set: unbounded ``dropDuplicates`` and the bounded-state
    ``dropDuplicatesWithinWatermark`` (the 100 TB form), run
    concurrently; each leg must equal batch count(distinct)."""
    return windows.stream_distinct_user_types(spark, sf_dir)


@register(
    "stream_interval_join",
    windows.stream_interval_self_join_sql(10),
    survey_ids=("ST7",),
    rebuild=True,
)
def stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval self-join (watermarked both sides) —
    equals the batch interval join over the complete replay."""
    return windows.stream_interval_self_join(spark, sf_dir, 10)


@register(
    "stream_materialized_daily",
    """
    select strftime(cast(ts as date), '%Y-%m-%d') as day, event_type,
           count(*) as n
    from events group by 1, 2
    """,
    survey_ids=("ST5",),
    rebuild=True,
)
def stream_materialized_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch continuous materialization (streaming/materialize.py)
    driven to completion into a day-partitioned parquet aggregate, read
    back and verified against the batch oracle. The partition-merge
    path itself is exercised with genuinely overlapping micro-batches
    in tests/test_streaming.py."""
    import os
    import shutil
    import uuid

    from ..sources.parquet import load_events
    from ..streaming.materialize import run_materialization
    from .edge_queries import _scratch

    out = _scratch(sf_dir, f"mat_daily_{uuid.uuid4().hex[:8]}")
    from pyspark.sql import functions as F

    from ..sources.parquet import events_stream

    stream = events_stream(spark, sf_dir)
    run_materialization(stream, spark, out)
    # day as a string: Spark DATE vs DuckDB TIMESTAMP stringify
    # differently in the driver's pandas canonicalizer
    result = spark.read.parquet(out).select(
        F.date_format(F.col("day").cast("date"), "yyyy-MM-dd").alias("day"),
        "event_type",
        "n",
    )
    rows = result.collect()  # materialize before the scratch dir goes away
    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(out + "_deltas", ignore_errors=True)  # staged-delta table
    shutil.rmtree(out + "_ckpt", ignore_errors=True)
    return spark.createDataFrame(rows, result.schema)


# attach the oracle (module constant) after registration
from ..streaming.stateful import RUNNING_USER_TOTALS_SQL  # noqa: E402
from .registry import REGISTRY, QuerySpec  # noqa: E402

REGISTRY["stream_stateful_totals"] = QuerySpec(
    spark=REGISTRY["stream_stateful_totals"].spark,
    oracle=RUNNING_USER_TOTALS_SQL,
    survey_ids=("ST4",),
)
