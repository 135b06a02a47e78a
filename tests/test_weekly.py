"""Property checks from SURVEY §5: the awk-oracle invariant —
sum of the 16 pivot columns per key == plain group-by count."""

from __future__ import annotations

from pyspark.sql import functions as F

from map_reduce_sf_crime_spark.plans.registry import REGISTRY

from .conftest import SF_SMOKE


def test_pivot_row_sums_equal_totals(spark):
    weekly = (
        REGISTRY["weekly_report"]
        .spark(spark, SF_SMOKE)
        .filter(F.col("dim") == "category")
    )
    totals = (
        REGISTRY["awk_totals"]
        .spark(spark, SF_SMOKE)
        .filter(F.col("rule") == "category_totals")
        .select(F.col("key").alias("member"), F.col("n").alias("total"))
    )
    wsum = weekly.select(
        "member",
        sum([F.col(f"w{i}") for i in range(16)], F.lit(0)).alias("rowsum"),
    )
    joined = wsum.join(totals, "member")
    bad = joined.filter(F.col("rowsum") != F.col("total")).collect()
    assert bad == []
    assert joined.count() == 5  # o_orderpriority cardinality


def test_daily_triplets_sum_to_incident_count(spark):
    daily = REGISTRY["daily_cat_dist"].spark(spark, SF_SMOKE)
    total = daily.agg(F.sum("crimes")).first()[0]
    from map_reduce_sf_crime_spark.plans.crimes_view import incidents

    assert total == incidents(spark, SF_SMOKE).count()


def test_weekly_schema_is_dense_17_columns(spark):
    weekly = REGISTRY["weekly_report"].spark(spark, SF_SMOKE)
    assert weekly.columns == ["dim", "member"] + [f"w{i}" for i in range(16)]
