"""Salted two-phase aggregation: result-identical to the direct
group-by under extreme single-key skew (functions/skew.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from map_reduce_sf_crime_spark.functions.skew import salted_agg, salted_count


def _skewed(spark):
    # one hot key with 50k rows, 500 sparse keys with ~10 each
    return spark.range(55_000).select(
        F.when(F.col("id") < 50_000, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 500).cast("string")))
        .alias("key"),
        (F.col("id") % 97).alias("v"),
    )


def test_salted_count_equals_direct(spark):
    df = _skewed(spark)
    direct = {r.key: r["count"] for r in df.groupBy("key").count().collect()}
    salted = {r.key: r["count"] for r in salted_count(df, "key").collect()}
    assert salted == direct


def test_salted_distinct_agg_equals_direct(spark):
    """collect_set-style state is where map-side combine stops helping
    and salting matters: per-salt partial sets union to the exact
    distinct count."""
    df = _skewed(spark)
    direct = {
        r.key: r.nd
        for r in df.groupBy("key")
        .agg(F.countDistinct("v").alias("nd"))
        .collect()
    }
    salted = {
        r.key: r.nd
        for r in salted_agg(
            df,
            "key",
            partial=[F.collect_set("v").alias("_s")],
            final=[
                F.size(F.array_distinct(F.flatten(F.collect_list("_s")))).alias(
                    "nd"
                )
            ],
        ).collect()
    }
    assert salted == direct
