"""Custom stateful streaming operator via ``applyInPandasWithState``.

Demonstrates the engine's arbitrary-state API surface (SURVEY §2.10
north-star): a per-user running aggregate whose state (event count,
value sum) survives across micro-batches. Over the finite test input
it converges to the batch group-by — which is exactly what the DuckDB
oracle checks.

This is the slow path by design (Python + Arrow per group); the
built-in ``session_window``/``window`` operators in windows.py stay
JVM-side and are preferred wherever they can express the semantics.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .windows import _events_stream, _run_to_memory

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("s", T.DoubleType()),
    ]
)


def _update(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    from decimal import ROUND_HALF_UP, Decimal

    n, s = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
    state.update((n, s))
    # HALF_UP on the exact binary value — the same decimal semantics
    # as Spark's F.round and the DuckDB twin; Python's builtin round()
    # is half-EVEN and would diverge at tie boundaries (the pattern
    # every other Python kernel here already follows, see
    # operators/similarity.py cosine kernel / operators/multimodal.py)
    rounded = float(Decimal(s).quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "sum_value": [rounded]}
    )


def running_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_stream(spark, sf_dir).select("user_id", "value")
    out = ev.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    emitted = _run_to_memory(out, "update")
    # update-mode memory sink keeps every batch's emission; the final
    # state per user is the one with the highest running count —
    # single-batch replay makes this a no-op, multi-file inputs stay
    # correct
    from pyspark.sql import functions as F

    return emitted.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max_by("sum_value", "n_events").alias("sum_value"),
    )


RUNNING_USER_TOTALS_SQL = """
select user_id, count(*) as n_events, round(sum(value), 4) as sum_value
from events
group by user_id
"""
