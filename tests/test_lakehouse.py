"""Physical-plan guarantees of the lakehouse layouts: partition
pruning actually prunes, bucketed joins actually skip the shuffle."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from map_reduce_sf_crime_spark.plans.crimes_view import incidents
from map_reduce_sf_crime_spark.sources.lakehouse import (
    read_partitioned,
    write_bucketed,
    write_partitioned,
)
from map_reduce_sf_crime_spark.sources.parquet import load_table

from .conftest import SF_SMOKE

SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch", "lakehouse")


def _formatted_plan(df):
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_partition_pruning(spark):
    path = os.path.join(SCRATCH, "inc_by_month")
    inc = incidents(spark, SF_SMOKE).withColumn("month", F.month("d"))
    write_partitioned(inc, path, ["month"])
    # hive-style layout on disk
    assert any(p.startswith("month=") for p in os.listdir(path))

    sliced = read_partitioned(spark, path).filter(F.col("month") == 2)
    plan = _formatted_plan(sliced)
    pf = plan.split("PartitionFilters:")[1].splitlines()[0]
    assert "month" in pf  # predicate reached the partition index
    # pruning is real: only the matching partition's rows are read
    assert sliced.count() == inc.filter(F.col("month") == 2).count()
    files = [r[0] for r in sliced.select(F.input_file_name()).distinct().collect()]
    assert files and all("month=2" in f for f in files)


def test_bucketed_join_no_shuffle(spark):
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("b_orders", "b_customer"):
        spark.sql(f"drop table if exists {t}")
        # the in-memory catalog resets per session but the warehouse
        # directory persists — clear both or saveAsTable refuses
        shutil.rmtree(os.path.join(warehouse, t), ignore_errors=True)
    orders = load_table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    customer = load_table(spark, SF_SMOKE, "customer").select("c_custkey", "c_name")
    write_bucketed(orders, "b_orders", "o_custkey", n_buckets=8)
    write_bucketed(customer.withColumnRenamed("c_custkey", "o_custkey"), "b_customer", "o_custkey", n_buckets=8)

    joined = spark.table("b_orders").join(spark.table("b_customer"), "o_custkey")
    # disable auto-broadcast so the test exercises the bucketed path
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _formatted_plan(joined)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, "bucketed join must not shuffle"
    # and it is still correct
    expected = orders.join(
        customer.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey"
    ).count()
    assert joined.count() == expected


def teardown_module(module):
    shutil.rmtree(SCRATCH, ignore_errors=True)


def test_merge_upsert_rewrites_only_touched_partitions(spark):
    """CDC merge must be partition-granular copy-on-write: a change
    batch confined to month=2 leaves every other partition's files
    byte-identical (same names, same mtimes) and applies
    update/insert/delete semantics exactly."""
    from map_reduce_sf_crime_spark.sources.lakehouse import merge_upsert

    path = os.path.join(SCRATCH, "merge_fact")
    shutil.rmtree(path, ignore_errors=True)
    daily = (
        incidents(spark, SF_SMOKE)
        .groupBy(F.month("d").alias("month"), "d", "category", "district")
        .agg(F.count(F.lit(1)).alias("crimes"))
    )
    write_partitioned(daily, path, ["month"])

    def snapshot(part):
        d = os.path.join(path, f"month={part}")
        return {
            f: os.path.getmtime(os.path.join(d, f))
            for f in os.listdir(d)
            if f.endswith(".parquet")
        }

    before = {m: snapshot(m) for m in (1, 3)}
    m2 = read_partitioned(spark, path).filter(F.col("month") == 2)
    one_key = m2.orderBy("d", "category", "district").limit(1).collect()[0]
    changes = spark.createDataFrame(
        [
            # update: bump the chosen key's count to 999
            (2, one_key.d, one_key.category, one_key.district, 999, False),
            # insert: a brand-new key in the same partition
            (2, one_key.d, "NEW-CAT", one_key.district, 7, False),
            # delete: every row of one other category
        ],
        "month int, d date, category string, district string, crimes long, _delete boolean",
    ).unionByName(
        m2.filter(F.col("category") != one_key.category)
        .limit(3)
        .withColumn("_delete", F.lit(True))
    )
    deleted_keys = {
        (r.d, r.category, r.district)
        for r in changes.filter("_delete").collect()
    }
    merge_upsert(
        spark,
        path,
        changes,
        key_cols=["d", "category", "district"],
        partition_cols=["month"],
        delete_col="_delete",
    )
    # untouched partitions: byte-identical files
    assert {m: snapshot(m) for m in (1, 3)} == before
    after = read_partitioned(spark, path).filter(F.col("month") == 2)
    rows = {
        (r.d, r.category, r.district): r.crimes for r in after.collect()
    }
    assert rows[(one_key.d, one_key.category, one_key.district)] == 999
    assert rows[(one_key.d, "NEW-CAT", one_key.district)] == 7
    assert not deleted_keys & set(rows)
    # other partitions' row counts unchanged
    full = read_partitioned(spark, path)
    assert full.filter(F.col("month") == 1).count() == daily.filter(
        F.col("month") == 1
    ).count()
