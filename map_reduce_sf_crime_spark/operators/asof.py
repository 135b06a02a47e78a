"""As-of join — the time-series lookup the brief's custom-operator
list calls out (no reference counterpart; SURVEY §2.3 "as-of …
not present").

For each left event, find the same key's most recent right event with
``right.ts <= left.ts``. The naive formulation is a theta join
(``b.ts <= a.ts`` + argmax) — quadratic per key. The scalable Spark
form is MERGE-style: union both sides tagged, one window per key
ordered by (ts, side), and carry the last right-side timestamp
forward with ``last(..., ignorenulls=True)``. One shuffle on the key,
linear scan per partition, no pair blow-up — the same plan shape at
100 TB.

Tie semantics: right sorts before left at equal ts, so the match is
inclusive (``<=``), exactly DuckDB's native ``ASOF LEFT JOIN`` used
as the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    out_col: str = "asof_ts",
) -> DataFrame:
    """Left as-of join on ``key``: every row of ``left`` (``key``,
    ``ts``) gains the latest right-side ``ts`` ≤ its own (NULL when no
    prior right event exists)."""
    tagged = left.select(
        key, ts, F.lit(1).alias("_side")
    ).unionByName(right.select(key, ts, F.lit(0).alias("_side")))
    w = (
        Window.partitionBy(key)
        .orderBy(ts, "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged.withColumn(
        out_col,
        F.last(F.when(F.col("_side") == 0, F.col(ts)), ignorenulls=True).over(w),
    )
    return carried.filter(F.col("_side") == 1).select(key, ts, out_col)


def asof_join_sql(
    left_sql: str, right_sql: str, key: str, ts: str, out_col: str = "asof_ts"
) -> str:
    """DuckDB twin via native ASOF LEFT JOIN."""
    return f"""
    select a.{key}, a.{ts}, b.{ts} as {out_col}
    from ({left_sql}) a
    asof left join ({right_sql}) b
      on a.{key} = b.{key} and b.{ts} <= a.{ts}
    """
