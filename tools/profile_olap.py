"""Phase profile of the olap_rollups BUILD (r12, VERDICT item 6):
replicates the registry body with timers around each phase so the
~4 s/rep fresh-build cost can be attributed — star build+checkpoint,
Column construction (grouping sets / geo / MDX parse / MDX compile),
and the final checkpoint action (Catalyst walk + execution).

    SPARK_GRAFT_SF_DIR=... python tools/profile_olap.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from map_reduce_sf_crime_spark.session import get_spark  # noqa: E402


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile_olap")

    from pyspark.sql import functions as F

    from map_reduce_sf_crime_spark.functions.caching import (
        plan_checkpoint,
        release_plan_caches,
    )
    from map_reduce_sf_crime_spark.mdx import mdx_cells_many, parse_mdx
    from map_reduce_sf_crime_spark.plans import olap_queries as oq

    # warm the JVM once
    from map_reduce_sf_crime_spark.plans.registry import REGISTRY

    REGISTRY["awk_totals"].spark(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    for rep in range(reps):
        release_plan_caches()
        t = {}
        t0 = time.perf_counter()
        star = oq._star_join(spark, sf_dir)
        sj = plan_checkpoint(star, release_after=(star,))
        t["star+ckpt"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        gs = sj.groupingSets(
            [
                ["category"],
                ["district"],
                ["year", "month", "week"],
                ["year", "month"],
                ["year"],
                [],
            ],
            "category",
            "district",
            "year",
            "month",
            "week",
        ).agg(
            F.sum("crimes").alias("crimes"),
            F.grouping("category").alias("gc"),
            F.grouping("district").alias("gd"),
        )
        is_cat, is_dist = F.col("gc") == 0, F.col("gd") == 0
        tagged = gs.select(
            F.when(is_cat, F.lit("mdx_category"))
            .when(is_dist, F.lit("mdx_district"))
            .otherwise(F.lit("time"))
            .alias("hierarchy"),
            F.when(is_cat, F.col("category"))
            .when(is_dist, F.col("district"))
            .otherwise(
                F.coalesce(F.col("year").cast("string"), F.lit("(all)"))
            )
            .alias("l1"),
            F.when(is_cat | is_dist, F.lit("(all)"))
            .otherwise(
                F.coalesce(F.col("month").cast("string"), F.lit("(all)"))
            )
            .alias("l2"),
            F.when(is_cat | is_dist, F.lit("(all)"))
            .otherwise(
                F.coalesce(F.col("week").cast("string"), F.lit("(all)"))
            )
            .alias("l3"),
            "crimes",
        )
        geo = (
            sj.filter(F.col("year") == 1995)
            .rollup("district", "category")
            .agg(F.sum("crimes").alias("crimes"))
            .select(
                F.lit("geo").alias("hierarchy"),
                F.coalesce("district", F.lit("(all)")).alias("l1"),
                F.coalesce("category", F.lit("(all)")).alias("l2"),
                F.lit("(all)").alias("l3"),
                "crimes",
            )
        )
        t["gs+geo cols"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        parsed = [
            (tag, parse_mdx(text)) for tag, text in oq._MDX_VERBATIM.items()
        ]
        parsed_nav = [
            (tag, parse_mdx(text))
            for tag, text in oq._MDX_NAV_VERBATIM.items()
        ]
        t["mdx parse"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        cells = mdx_cells_many(sj, parsed).select(
            F.lit("mdx_verbatim").alias("hierarchy"),
            F.col("row_member").alias("l1"),
            F.col("col_member").alias("l2"),
            F.concat_ws(
                "#", F.col("tag"), F.col("row_ordinal").cast("string")
            ).alias("l3"),
            "crimes",
        )
        t["cells compile"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        nav_cells = mdx_cells_many(sj, parsed_nav).select(
            F.lit("mdx_verbatim").alias("hierarchy"),
            F.col("row_member").alias("l1"),
            F.col("col_member").alias("l2"),
            F.col("tag").alias("l3"),
            F.col("crimes").cast("bigint").alias("crimes"),
        )
        t["nav compile"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        final = plan_checkpoint(
            tagged.unionByName(geo).unionByName(cells).unionByName(nav_cells),
            release_after=(sj,),
        )
        t["final ckpt (action)"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        final.write.format("noop").mode("overwrite").save()
        t["serve noop"] = time.perf_counter() - t0

        total = sum(t.values())
        print(
            f"rep {rep}: total {total:.3f}s  "
            + "  ".join(f"{k}={v:.3f}" for k, v in t.items())
        )
    spark.stop()


if __name__ == "__main__":
    main()
