"""Filters, semi/anti joins, set ops, top-k, windows.

Covers SURVEY §2 rows P5 (regex row filter), P6 (value-IN filter),
the J1 dropped-rows audit (anti join), §2.6 top-k and §2.7 set ops
(absent in the reference, first-class here), and §2.5 windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from .crimes_view import INCIDENTS_SQL, incidents
from .registry import register

@register(
    "join_audit",
    """
    with y95 as (select distinct o_custkey from orders
                 where year(o_orderdate) = 1995),
         y96 as (select distinct o_custkey from orders
                 where year(o_orderdate) = 1996)
    select 'dropped' as check, c_mktsegment as key, count(*) as n
    from customer
    where not exists (select 1 from orders
                      where o_custkey = c_custkey
                        and year(o_orderdate) = 1995)
    group by c_mktsegment
    union all
    select 'active' as check, c_mktsegment as key, count(*) as n
    from customer
    where exists (select 1 from orders where o_custkey = c_custkey)
    group by c_mktsegment
    union all
    select 'set_only_1995' as check, 'custkeys' as key, count(*) as n
    from (select * from y95 except select * from y96) a
    union all
    select 'set_both' as check, 'custkeys' as key, count(*) as n
    from (select * from y95 intersect select * from y96) b
    union all
    select 'set_either' as check, 'custkeys' as key, count(*) as n
    from (select * from y95 union select * from y96) c
    """,
    survey_ids=("J1", "SET"),
)
def join_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-membership audits in one tagged entry. J1's
    dropped-with-warning path (SanFranciscoCrimePrepOlap.java:179-184):
    the left ANTI join (rows whose key misses the dimension — the
    distributed, observable version of the warning log) and the left
    SEMI join (rows that survive). Plus §2.7 set operations (absent
    in the reference, built-in here): except / intersect / union over
    distinct yearly customer-key sets."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    orders95 = (
        orders.filter(F.year("o_orderdate") == 1995).select("o_custkey")
    )
    dropped = (
        customer.join(orders95, customer.c_custkey == orders95.o_custkey, "left_anti")
        .groupBy(F.col("c_mktsegment").alias("key"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("dropped").alias("check"), "key", "n")
    )
    active = (
        customer.join(
            orders.select("o_custkey"),
            customer.c_custkey == F.col("o_custkey"),
            "left_semi",
        )
        .groupBy(F.col("c_mktsegment").alias("key"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("active").alias("check"), "key", "n")
    )
    y95 = orders95.distinct()
    y96 = (
        orders.filter(F.year("o_orderdate") == 1996).select("o_custkey").distinct()
    )
    sets = [
        ("set_only_1995", y95.exceptAll(y95.intersect(y96))),
        ("set_both", y95.intersect(y96)),
        ("set_either", y95.union(y96).distinct()),
    ]
    out = dropped.unionByName(active)
    for name, df in sets:
        leg = df.agg(F.count(F.lit(1)).alias("n")).select(
            F.lit(name).alias("check"), F.lit("custkeys").alias("key"), "n"
        )
        out = out.unionByName(leg)
    return out


@register(
    "topk_categories_per_district",
    f"""
    select district, category, total, rk
    from (
      select district, category, count(*) as total,
             row_number() over (partition by district
                                order by count(*) desc, category) as rk
      from {INCIDENTS_SQL} t
      group by district, category
    ) ranked
    where rk <= 3
    """,
    survey_ids=("TOPK",),
)
def topk_categories_per_district(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 top-k (absent in reference): top-3 categories per district.
    Window row_number after a pre-aggregation — the agg shrinks the
    data before the window shuffle, so the sort is over #district ×
    #category rows, never raw facts; deterministic tie-break on name."""
    agg = (
        incidents(spark, sf_dir)
        .groupBy("district", "category")
        .agg(F.count(F.lit(1)).alias("total"))
    )
    w = Window.partitionBy("district").orderBy(F.desc("total"), F.asc("category"))
    return agg.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 3)


@register(
    "window_running_total",
    f"""
    select district, day, daily,
           cast(sum(daily) over (partition by district order by day
                            rows between unbounded preceding and current row)
             as bigint) as running
    from (
      select district, strftime(d, '%Y/%m/%d') as day, count(*) as daily
      from {INCIDENTS_SQL} t
      group by district, d
    ) g
    """,
    survey_ids=("W1",),
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.5 windows (absent in reference): per-district running total
    of daily counts — partitioned window over pre-aggregated rows."""
    daily = (
        incidents(spark, sf_dir)
        .groupBy("district", F.date_format("d", "yyyy/MM/dd").alias("day"))
        .agg(F.count(F.lit(1)).alias("daily"))
    )
    w = (
        Window.partitionBy("district")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return daily.withColumn("running", F.sum("daily").over(w))
