"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Per-query time is wall-clock for plan construction + execution to a
count-style action (foreach-noop via ``write.format('noop')``), the
closest analog to "query finished, results materialized" without
paying driver-side collect serialization for large outputs.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from map_reduce_sf_crime_spark.plans.registry import REGISTRY
from map_reduce_sf_crime_spark.session import get_spark

#: Benchmarked queries: the reference-parity headliners + one from
#: each north-star family. (The full registry is correctness-gated;
#: bench tracks the representative hot paths.)
BENCH_QUERIES = [
    "pricing_summary",
    "revenue_by_nation",
    "weekly_report",
    "daily_cat_dist",
    "star_fact",
    "olap_rollups",
    "topk_categories_per_district",
    "dedup_near_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "text_profile",
    "knn_bruteforce",
    "embedding_near_pairs",
    "stream_window_counts",
    "multimodal_profile",
    "corpus_clean_stats",
    "corpus_pack",
    "corpus_sample",
    "token_doc_freq",
]


# 5 reps: the host shows heavy run-to-run variance (co-tenant noise;
# single reps of the same query spread 1.5-7x), and a median of 5 is
# materially more robust than of 3 at ~30 s extra suite cost.
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "5"))


def run_query(spark, name: str, sf_dir: str) -> float:
    t0 = time.perf_counter()
    df = REGISTRY[name].spark(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def median_time(spark, name: str, sf_dir: str) -> float:
    """Median of REPS runs (BASELINE.md measurement plan) — each rep
    rebuilds the plan from the registry; Spark's canonicalized-plan
    cache lookup means intra-query caches behave as in a warm service."""
    runs = sorted(run_query(spark, name, sf_dir) for _ in range(REPS))
    return runs[len(runs) // 2]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark("bench")
    # warm the JVM/codegen once with the cheapest query
    run_query(spark, "awk_totals", sf_dir)
    times: dict[str, float] = {}
    for name in BENCH_QUERIES:
        # drop the previous query's cached intermediates: cross-query
        # cache accumulation (queries cache per-plan intermediates and
        # plans differ per query, so nothing is ever reused across
        # queries) only adds GC/memory pressure that pollutes later
        # measurements. Reps of ONE query still share their cache —
        # the warm-service reading BASELINE.md documents.
        spark.catalog.clearCache()
        times[name] = round(median_time(spark, name, sf_dir), 3)
    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_sec_headline_queries",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
