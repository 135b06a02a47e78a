"""Reference-parity queries: the two MR jobs and the awk oracle.

Covers SURVEY §2 rows A1 (weekly pivot), A2 (daily triplets),
A4 (category totals / the awk cross-check), P1 (projection — implicit:
every plan selects only load-bearing columns and Catalyst prunes the
scan), P4 (non-zero filter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.calendar import N_WEEK_BUCKETS, week_bucket_col, week_bucket_sql
from ..operators.weekly import weekly_summary, weekly_summary_sql
from .crimes_view import (
    CATEGORY_INCIDENTS_SQL,
    INCIDENTS_SQL,
    category_incidents,
    incidents,
)
from .registry import register


@register(
    "weekly_by_category",
    weekly_summary_sql(CATEGORY_INCIDENTS_SQL + " t", "category", "d"),
    survey_ids=("A1", "P1", "F3", "F4", "S1"),
)
def weekly_by_category(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: SanFranciscoCrime.java:228 ``bycategory`` report."""
    return weekly_summary(category_incidents(spark, sf_dir), "category", F.col("d"))


@register(
    "weekly_by_district",
    weekly_summary_sql(INCIDENTS_SQL + " t", "district", "d"),
    survey_ids=("A1", "J1"),
)
def weekly_by_district(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SanFranciscoCrime.java:229 ``bydistrict`` report."""
    return weekly_summary(incidents(spark, sf_dir), "district", F.col("d"))


@register(
    "daily_cat_dist",
    f"""
    select strftime(d, '%Y/%m/%d') as day, category, district,
           count(*) as crimes
    from {INCIDENTS_SQL} t
    group by d, category, district
    """,
    survey_ids=("A2", "P4", "F2"),
)
def daily_cat_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily heat-map triplets (SanFranciscoCrimePrepOlap.java:155-206).

    The reference builds a dense category×district int matrix per date
    and emits non-zero cells; ``groupBy().count()`` produces exactly the
    non-zero cells with no materialized zeros (count>0 is vacuously
    true post-aggregation — P4 subsumed). The date is rendered
    ``yyyy/MM/dd`` like the MR output key (MapReduceJobBase.java:65).
    """
    return (
        incidents(spark, sf_dir)
        .groupBy(
            F.date_format("d", "yyyy/MM/dd").alias("day"),
            "category",
            "district",
        )
        .agg(F.count(F.lit(1)).alias("crimes"))
        .filter(F.col("crimes") > 0)
    )


@register(
    "weekly_overflow_audit",
    f"""
    select category, count(*) as overflow_rows
    from (select category, {week_bucket_sql('d')} as bucket
          from {CATEGORY_INCIDENTS_SQL} t)
    where bucket >= {N_WEEK_BUCKETS}
    group by category
    """,
    survey_ids=("A1",),
)
def weekly_overflow_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §7.3.2's documented deviation made observable: the
    reference widens rows on-the-fly for bucket > 15
    (SanFranciscoCrime.java:183-187, column order then depends on
    HashMap iteration); this engine fixes the pivot domain 0..15 and
    AUDITS what that drops — per key, the count of incidents landing
    in overflow buckets (empty on any quarter-aligned dataset; a
    6th-week month shows up here instead of silently vanishing)."""
    return (
        category_incidents(spark, sf_dir)
        .select("category", week_bucket_col(F.col("d")).alias("bucket"))
        .filter(F.col("bucket") >= N_WEEK_BUCKETS)
        .groupBy("category")
        .agg(F.count(F.lit(1)).alias("overflow_rows"))
    )


_DOW = ["Sun", "Mon", "Tue", "Wed", "Thu", "Fri", "Sat"]


@register(
    "dow_by_category",
    f"""
    select category,
      {", ".join(f"cast(coalesce(sum(case when dayofweek(d) = {i} then 1 else 0 end), 0) as bigint) as {name.lower()}" for i, name in enumerate(_DOW))}
    from {CATEGORY_INCIDENTS_SQL} t
    group by category
    """,
    survey_ids=("A1",),
)
def dow_by_category(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's day-of-week mapper surface
    (SanFranciscoCrime.java:110-126 ``CategoryMapByDayOfWeek`` /
    ``DistrictMapByDayOfWeek`` — shipped but never wired into main;
    SURVEY §7.3.3). Same pivot shape as the weekly report with the
    7-day domain passed explicitly."""
    return (
        category_incidents(spark, sf_dir)
        .select("category", F.dayofweek("d").alias("dw"))
        .groupBy("category")
        .pivot("dw", list(range(1, 8)))
        .count()
        .na.fill(0)
        .select(
            "category",
            *[F.col(str(i + 1)).alias(n.lower()) for i, n in enumerate(_DOW)],
        )
    )


@register(
    "daily_dense_series",
    f"""
    with bounds as (
      select min(d) as lo, max(d) as hi from {CATEGORY_INCIDENTS_SQL} t
    ),
    days as (
      select unnest(generate_series(lo, hi, interval 1 day))::date as d
      from bounds
    ),
    cats as (select distinct category from {CATEGORY_INCIDENTS_SQL} t),
    counts as (
      select d, category, count(*) as n from {CATEGORY_INCIDENTS_SQL} t
      group by d, category
    )
    select strftime(days.d, '%Y-%m-%d') as day, cats.category,
           coalesce(counts.n, 0) as n
    from days cross join cats
    left join counts on counts.d = days.d and counts.category = cats.category
    """,
    survey_ids=("A1",),
)
def daily_dense_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled dense daily series — the daily analog of the
    reference's zero-filled 16-bucket rows (SanFranciscoCrime.java:
    170-173 pre-seeds every bucket). ``sequence()`` generates the day
    spine from the observed bounds, cross-joined with the category dim
    and left-joined to the sparse counts; the spine sides are tiny →
    both joins broadcast."""
    inc = category_incidents(spark, sf_dir)
    counts = inc.groupBy(
        F.col("d").alias("cd"), F.col("category").alias("cc")
    ).agg(F.count(F.lit(1)).alias("n"))
    days = (
        inc.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
        .select(F.explode(F.sequence("lo", "hi")).alias("day"))
    )
    cats = inc.select("category").distinct()
    return (
        days.crossJoin(F.broadcast(cats))
        .join(
            F.broadcast(counts),
            (F.col("day") == F.col("cd")) & (F.col("category") == F.col("cc")),
            "left",
        )
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "category",
            F.coalesce("n", F.lit(0)).alias("n"),
        )
    )


@register(
    "category_totals",
    f"select category, count(*) as total from {CATEGORY_INCIDENTS_SQL} t group by category",
    survey_ids=("A4",),
)
def category_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The awk oracle (categoryTotals.awk:1-15): raw per-category counts.

    Doubles as the property check sum(w0..w15) == total (tests).
    """
    return (
        category_incidents(spark, sf_dir)
        .groupBy("category")
        .agg(F.count(F.lit(1)).alias("total"))
    )
