"""Range-join equivalence and edge cases.

The binned plan must be pair-for-pair identical to the naive theta
join (the semantic definition), including window-boundary timestamps
that land exactly on bin edges.
"""

from __future__ import annotations

import pytest

import datetime as dt

from pyspark.sql import functions as F

from map_reduce_sf_crime_spark.operators.rangejoin import range_join

BASE = dt.datetime(2024, 1, 1)


def _frames(spark, l_rows, r_rows):
    left = spark.createDataFrame(
        [(i, BASE + dt.timedelta(microseconds=us)) for i, us in l_rows],
        "lid long, l_ts timestamp",
    )
    right = spark.createDataFrame(
        [(j, BASE + dt.timedelta(microseconds=us)) for j, us in r_rows],
        "rid long, r_ts timestamp",
    )
    return left, right


def _naive(left, right, lower_us, upper_us):
    l_us = F.unix_micros(F.col("l_ts"))
    r_us = F.unix_micros(F.col("r_ts"))
    return left.crossJoin(right).filter(
        (r_us >= l_us + F.lit(lower_us)) & (r_us <= l_us + F.lit(upper_us))
    )


def _pairs(df):
    return sorted((r.lid, r.rid) for r in df.select("lid", "rid").collect())


@pytest.mark.slow
def test_matches_naive_dense(spark):
    # every microsecond offset around several bin boundaries
    l_rows = [(i, i * 37) for i in range(40)]
    r_rows = [(j, j * 23 + 5) for j in range(60)]
    left, right = _frames(spark, l_rows, r_rows)
    for lower, upper in [(-100, 0), (0, 100), (-50, 50), (-7, -3)]:
        got = _pairs(range_join(left, right, "l_ts", "r_ts", lower, upper))
        want = _pairs(_naive(left, right, lower, upper))
        assert got == want, (lower, upper)


def test_boundaries_inclusive_and_no_duplicates(spark):
    span = 100
    # right rows exactly on lower bound, upper bound, and bin edges
    left, right = _frames(
        spark,
        [(1, 1000)],
        [(1, 900), (2, 1000), (3, 899), (4, 1001), (5, 999)],
    )
    out = range_join(left, right, "l_ts", "r_ts", -span, 0)
    assert _pairs(out) == [(1, 1), (1, 2), (1, 5)]
    # no pair appears twice even though the left window spans two bins
    assert out.count() == out.distinct().count() == 3


def test_equi_keys_restrict(spark):
    left = spark.createDataFrame(
        [(1, 10, BASE), (2, 20, BASE)], "lid long, user_id long, l_ts timestamp"
    )
    right = spark.createDataFrame(
        [(7, 10, BASE), (8, 20, BASE), (9, 30, BASE)],
        "rid long, user_id long, r_ts timestamp",
    )
    out = range_join(left, right, "l_ts", "r_ts", -10, 10, keys=("user_id",))
    assert _pairs(out) == [(1, 7), (2, 8)]
    # keys are emitted once
    assert out.columns.count("user_id") == 1


def test_registry_query_zero_view_purchases_kept(spark):
    from map_reduce_sf_crime_spark.plans.registry import REGISTRY

    out = REGISTRY["range_join_events"].spark(spark, "/root/testdata/sf0.001")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    n_purchases = ev.filter(F.col("event_type") == "purchase").count()
    assert out.count() == n_purchases
    assert out.filter(F.col("n_views") == 0).count() > 0
