"""Cache lifecycle: plan-internal caches are scoped to one registry
query — building the next query must release the previous one's
blocks (functions/caching.py), so the 50-query gate session never
accumulates cached data."""

from __future__ import annotations

from map_reduce_sf_crime_spark.functions import caching
from map_reduce_sf_crime_spark.plans.registry import REGISTRY

from .conftest import SF_CHECK


def test_plan_caches_released_at_next_query_build(spark):
    caching.release_plan_caches()
    d1 = REGISTRY["dedup_near_jaccard"].spark(spark, SF_CHECK)
    d1.collect()  # materializes the PPJoin plan's tracked caches
    held = list(caching._TRACKED)
    assert held, "expected the near-dup plan to register plan caches"
    assert any(df.storageLevel.useMemory for df in held)

    # re-building the SAME query is NOT a release boundary — bench
    # reps and retries keep their warm caches
    REGISTRY["dedup_near_jaccard"].spark(spark, SF_CHECK)
    assert any(df.storageLevel.useMemory for df in held)

    # building a DIFFERENT registry query is the release boundary
    REGISTRY["corpus_sample"].spark(spark, SF_CHECK)
    for df in held:
        assert not df.storageLevel.useMemory, "previous query's cache leaked"
    # and an explicit release empties the tracker entirely
    caching.release_plan_caches()
    assert not caching._TRACKED
