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
    "stream_tumbling_counts",
    windows.tumbling_counts_sql(60),
    survey_ids=("ST1",),
)
def stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return windows.tumbling_counts(spark, sf_dir, "1 hour")


@register("stream_sliding_counts", windows.sliding_counts_sql(), survey_ids=("ST2",))
def stream_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return windows.sliding_counts(spark, sf_dir)


@register(
    "stream_session_windows",
    windows.session_windows_sql(5),
    survey_ids=("ST3",),
)
def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return windows.session_windows(spark, sf_dir, "5 minutes")


@register(
    "stream_stateful_totals",
    None,  # set lazily below to avoid import cycle churn
    survey_ids=("ST4",),
)
def stream_stateful_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.stateful import running_user_totals

    return running_user_totals(spark, sf_dir)


# attach the oracle (module constant) after registration
from ..streaming.stateful import RUNNING_USER_TOTALS_SQL  # noqa: E402
from .registry import REGISTRY, QuerySpec  # noqa: E402

REGISTRY["stream_stateful_totals"] = QuerySpec(
    spark=REGISTRY["stream_stateful_totals"].spark,
    oracle=RUNNING_USER_TOTALS_SQL,
    survey_ids=("ST4",),
)
