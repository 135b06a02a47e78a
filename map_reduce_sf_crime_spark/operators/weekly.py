"""A1 — weekly summary: group-by + bucketed count + pivot.

Reference: ``SanFranciscoCrime.ReduceByWeek`` (SanFranciscoCrime.java:
154-210) materializes every date per key in a list, buckets them into
``month0*5 + WEEK_OF_MONTH`` cells and writes one dense 16-column row
per category/district. That per-group buffer is memory ∝ group size.

Spark-first rewrite: a single ``groupBy(key).pivot(bucket, 0..15)
.count()`` — hash aggregation with automatic map-side partial
aggregation; no per-group materialization, one shuffle on ``key``
whose cardinality is tiny (~35 categories / ~10 districts), so the
reduce side is trivially balanced even at 100 TB. The pivot domain is
passed explicitly (0..15) so Spark does NOT run a distinct-values job
first, and output columns are deterministic (SURVEY §7.3.2: fixed
domain + aliasing accepted as the reference does).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.calendar import N_WEEK_BUCKETS, week_bucket_col, week_bucket_sql


def weekly_summary(df: DataFrame, key: str, date_col: Column) -> DataFrame:
    """One row per ``key`` value with 16 zero-filled week-bucket counts.

    Output schema: ``key string, w0 .. w15 bigint`` — the DataFrame
    twin of the reference's ``key TAB c0,...,c15`` report rows
    (SanFranciscoCrime.java:193-206).
    """
    buckets = list(range(N_WEEK_BUCKETS))
    out = (
        df.select(F.col(key), week_bucket_col(date_col).alias("bucket"))
        .groupBy(key)
        .pivot("bucket", buckets)
        .count()
        .na.fill(0)
    )
    renamed = out.select(
        F.col(key),
        *[F.col(str(b)).alias(f"w{b}") for b in buckets],
    )
    return renamed


def weekly_summary_sql(table_expr: str, key: str, date_sql: str) -> str:
    """DuckDB oracle twin: 16 conditional sums instead of PIVOT."""
    bucket = week_bucket_sql(date_sql)
    # cast: DuckDB sum() yields HUGEINT, which pandas renders as float64
    # ("3020.0") and hash-mismatches Spark's bigint ("3020") in the gate.
    cols = ",\n  ".join(
        f"cast(coalesce(sum(case when {bucket} = {b} then 1 else 0 end), 0)"
        f" as bigint) as w{b}"
        for b in range(N_WEEK_BUCKETS)
    )
    return f"select {key},\n  {cols}\nfrom {table_expr}\ngroup by {key}"
