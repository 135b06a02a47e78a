"""Star-schema + OLAP queries (SURVEY §2 A5, A6, J2, J3, J4, O2).

The MDX surface (bycategory.mdx, bydistrict.mdx, mondrian.jsp:6-9) is
implemented as Spark SQL semantics — star join + sum + rollup — per
SURVEY §7.5 (no MDX parser; same answers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.star import star_tables, star_tables_sql
from .crimes_view import INCIDENTS_SQL, incidents
from .registry import register

_SQL = star_tables_sql(INCIDENTS_SQL)


@register(
    "dim_category",
    _SQL["category"],
    survey_ids=("A6", "O2", "A3"),
)
def dim_category(spark: SparkSession, sf_dir: str) -> DataFrame:
    return star_tables(incidents(spark, sf_dir))["category"]


@register(
    "dim_district",
    _SQL["district"],
    survey_ids=("A6", "O2"),
)
def dim_district(spark: SparkSession, sf_dir: str) -> DataFrame:
    return star_tables(incidents(spark, sf_dir))["district"]


@register(
    "dim_timeperiod",
    f"select time_id, year, month, week, day from ({_SQL['timeperiod']}) tp",
    survey_ids=("J2", "A3", "F3"),
)
def dim_timeperiod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LoadStarDB.java:149-160 insert-on-miss dedup → distinct+rank."""
    return (
        star_tables(incidents(spark, sf_dir))["timeperiod"]
        .select("time_id", "year", "month", "week", "day")
    )


@register(
    "star_fact",
    _SQL["fact"],
    survey_ids=("J1", "J2", "J5", "K2", "K3"),
)
def star_fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fact(crimes, district_id, category_id, time_id) — LoadStarDB.java:170-177."""
    return star_tables(incidents(spark, sf_dir))["fact"]


def _star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: fact ⋈ category ⋈ district ⋈ timeperiod on FK=PK — all three
    dims broadcast (Mondrian's query-time star join, sfcrime.xml:5-26).
    Cached: all four MDX-surface queries aggregate this same
    denormalized frame (canonicalized-plan cache lookup shares one
    materialization across them)."""
    t = star_tables(incidents(spark, sf_dir))
    return (
        t["fact"]
        .join(F.broadcast(t["category"].withColumnRenamed("name", "category")), "category_id")
        .join(F.broadcast(t["district"].withColumnRenamed("name", "district")), "district_id")
        .join(F.broadcast(t["timeperiod"]), "time_id")
        .cache()
    )


_STAR_JOIN_SQL = f"""
    select f.crimes, c.name as category, dd.name as district,
           tp.year, tp.month, tp.week, tp.day
    from ({_SQL["fact"]}) f
    join ({_SQL["category"]}) c using (category_id)
    join ({_SQL["district"]}) dd using (district_id)
    join ({_SQL["timeperiod"]}) tp using (time_id)
"""


@register(
    "mdx_totals_by_category",
    f"select category, cast(sum(crimes) as bigint) as crimes from ({_STAR_JOIN_SQL}) s group by category",
    survey_ids=("J4", "A5"),
)
def mdx_totals_by_category(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bycategory.mdx:1-4 — [Measures].[crimes] by Category members."""
    return (
        _star_join(spark, sf_dir)
        .groupBy("category")
        .agg(F.sum("crimes").alias("crimes"))
    )


@register(
    "mdx_totals_by_district",
    f"select district, cast(sum(crimes) as bigint) as crimes from ({_STAR_JOIN_SQL}) s group by district",
    survey_ids=("J4", "A5"),
)
def mdx_totals_by_district(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bydistrict.mdx:1-4."""
    return (
        _star_join(spark, sf_dir)
        .groupBy("district")
        .agg(F.sum("crimes").alias("crimes"))
    )


@register(
    "olap_rollup",
    f"""
    select coalesce(district, '(all)') as district,
           coalesce(category, '(all)') as category,
           cast(sum(crimes) as bigint) as crimes
    from ({_STAR_JOIN_SQL}) s
    where year = 1995
    group by rollup (district, category)
    """,
    survey_ids=("A5", "J4"),
)
def olap_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mondrian.jsp:6-9 year-slice with hierarchy rollup: district ×
    category with subtotals and grand total (Mondrian All-members).
    Catalyst expands rollup to a single Expand + one hash aggregate —
    no N² of separate group-bys at scale."""
    return (
        _star_join(spark, sf_dir)
        .filter(F.col("year") == 1995)
        .rollup("district", "category")
        .agg(F.sum("crimes").alias("crimes"))
        .select(
            F.coalesce("district", F.lit("(all)")).alias("district"),
            F.coalesce("category", F.lit("(all)")).alias("category"),
            "crimes",
        )
    )


@register(
    "olap_cube_time",
    f"""
    select coalesce(cast(year as varchar), '(all)') as year,
           coalesce(cast(month as varchar), '(all)') as month,
           coalesce(cast(week as varchar), '(all)') as week,
           cast(sum(crimes) as bigint) as crimes
    from ({_STAR_JOIN_SQL}) s
    group by rollup (year, month, week)
    """,
    survey_ids=("A5",),
)
def olap_cube_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-hierarchy rollup year→month→week (sfcrime.xml:18-26
    TimeDimension levels; week level per MySQL DDL starschema.sql:5)."""
    return (
        _star_join(spark, sf_dir)
        .rollup("year", "month", "week")
        .agg(F.sum("crimes").alias("crimes"))
        .select(
            F.coalesce(F.col("year").cast("string"), F.lit("(all)")).alias("year"),
            F.coalesce(F.col("month").cast("string"), F.lit("(all)")).alias("month"),
            F.coalesce(F.col("week").cast("string"), F.lit("(all)")).alias("week"),
            "crimes",
        )
    )
