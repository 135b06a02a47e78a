"""K2/K3 JDBC sink exercised for real against embedded Derby (the
JDBC driver Spark ships for its Hive metastore) — batched writes +
overwrite-as-truncate, then read back and compare."""

from __future__ import annotations

import os
import shutil

from map_reduce_sf_crime_spark.operators.star import star_tables
from map_reduce_sf_crime_spark.plans.crimes_view import incidents
from map_reduce_sf_crime_spark.sources.jdbc import write_star

from .conftest import SF_SMOKE

DB = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch", "derbydb"
)


def test_star_jdbc_roundtrip(spark):
    shutil.rmtree(DB, ignore_errors=True)
    url = f"jdbc:derby:{DB};create=true"
    t = star_tables(incidents(spark, SF_SMOKE))
    dims = {"category": t["category"], "district": t["district"], "fact": t["fact"]}
    write_star(dims, jdbc_url=url)
    # overwrite twice: K4 truncate-reload must be idempotent
    write_star(dims, jdbc_url=url)
    for name, df in dims.items():
        back = spark.read.jdbc(url, name)
        assert sorted(back.columns) == sorted(df.columns)
        assert {tuple(r) for r in back.collect()} == {tuple(r) for r in df.collect()}, name


def teardown_module(module):
    shutil.rmtree(DB, ignore_errors=True)
