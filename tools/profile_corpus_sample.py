"""In-harness profiling of corpus_sample (round-7, VERDICT item #1):
replicates bench.py's exact rep loop and attributes the per-rep cost —
build (registry memo hit/miss), first collect (cache fill), warm
collects (steady state) — then times each pipeline leg's warm
re-execution separately so the expensive leg is named, not guessed.

    python tools/profile_corpus_sample.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from map_reduce_sf_crime_spark.plans.registry import REGISTRY
from map_reduce_sf_crime_spark.session import get_spark


def noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("profile")
    # JVM warmup exactly like bench.py
    noop(REGISTRY["awk_totals"].spark(spark, sf_dir))
    spark.catalog.clearCache()

    # ---- bench-identical rep loop, phases separated ----
    t0 = time.perf_counter()
    df = REGISTRY["corpus_sample"].spark(spark, sf_dir)
    build_cold = time.perf_counter() - t0
    first = noop(df)
    warms = []
    for _ in range(4):
        t0 = time.perf_counter()
        df2 = REGISTRY["corpus_sample"].spark(spark, sf_dir)  # memo hit
        build = time.perf_counter() - t0
        warms.append((build, noop(df2)))
    print(f"build_cold={build_cold:.3f}s first_collect={first:.3f}s")
    for b, w in warms:
        print(f"  warm rep: build(memo)={b:.4f}s collect={w:.3f}s")

    # ---- per-leg warm re-execution (frames already cached) ----
    # NOTE: this block hand-mirrors corpus_sample's pipeline wiring so
    # each leg can be timed in isolation — if plans/pipeline_queries.py
    # changes the query (new carry column, different cap params), keep
    # this in sync or the attribution names a different pipeline.
    from pyspark.sql import functions as F

    from map_reduce_sf_crime_spark.functions.caching import plan_cache
    from map_reduce_sf_crime_spark.operators import export, sampling
    from map_reduce_sf_crime_spark.plans.pipeline_queries import (
        CAP_PER_SOURCE,
        N_SHARDS,
        TOKEN_BUDGET,
    )
    from map_reduce_sf_crime_spark.sources.parquet import load_table

    docs = load_table(spark, sf_dir, "documents")
    weights = sampling.temperature_mix_weights(docs).transform(plan_cache)
    quotas = sampling.token_budget_quotas(weights, TOKEN_BUDGET).select(
        "lang", F.col("token_quota").alias("lang_token_quota")
    )
    flags = (
        sampling.stratified_sample_flags(docs, carry=("source", "n_chars"))
        .join(F.broadcast(weights), "lang")
        .join(F.broadcast(quotas), "lang")
    )
    capped = sampling.per_group_cap_flags(
        flags, CAP_PER_SOURCE, group_col="source", score_col="n_chars",
        lo=0.0, hi=1024.0,
        carry=("lang", "kept", "mix_weight_ppm", "lang_token_quota",
               "n_chars"),
        flag_name="cap_kept",
    ).drop("source").transform(plan_cache)
    pos = sampling.with_global_shuffle_pos(capped).transform(plan_cache)
    budgeted = sampling.with_prefix_sum(
        pos, "lang", "shuffle_pos", "n_chars", out_col="cum_lang_chars"
    ).withColumn(
        "budget_kept",
        (F.col("cum_lang_chars") <= F.col("lang_token_quota")).cast("int"),
    ).transform(plan_cache)
    final = export.shard_assignments(budgeted, N_SHARDS)

    legs = [
        ("flags(SM1+MX1+MX2 joins)", flags),
        ("capped(SM2, cached)", capped),
        ("pos(SH1, cached)", pos),
        ("budgeted(MX3, cached)", budgeted),
        ("final(EX1)", final),
    ]
    for name, frame in legs:
        noop(frame)  # fill/warm
        times = [noop(frame) for _ in range(3)]
        print(f"leg {name}: warm min={min(times):.3f}s {['%.3f' % t for t in times]}")
    spark.stop()


if __name__ == "__main__":
    main()
