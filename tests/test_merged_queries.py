"""Invariants of the round-2 merged registry entries that the
value-hash oracle can't express: cross-leg consistency, bound
semantics, and equivalence of the concurrent streaming form with the
sequential single-query operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from map_reduce_sf_crime_spark.plans.registry import REGISTRY

from .conftest import SF_SMOKE


def test_ann_recall_bounds_all_pass(spark):
    rows = REGISTRY["ann_recall_check"].spark(spark, SF_SMOKE).collect()
    assert {r.method for r in rows} == {"lsh", "ivf", "ivf_refined"}
    assert all(r.ok == 1 for r in rows), rows


def test_dedup_exact_flags_kept_equals_distinct_hashes(spark):
    from map_reduce_sf_crime_spark.sources.parquet import load_table

    flags = REGISTRY["dedup_exact_flags"].spark(spark, SF_SMOKE)
    docs = load_table(spark, SF_SMOKE, "documents")
    n_docs = docs.count()
    n_unique = docs.select(F.md5("text")).distinct().count()
    agg = flags.agg(
        F.count(F.lit(1)).alias("n"), F.sum("kept").alias("kept")
    ).first()
    assert agg.n == n_docs
    assert agg.kept == n_unique
    # exactly one representative per duplicate group, never zero or two
    per_hash = (
        flags.join(docs.select("doc_id", F.md5("text").alias("h")), "doc_id")
        .groupBy("h")
        .agg(F.sum("kept").alias("k"))
        .select(F.min("k").alias("lo"), F.max("k").alias("hi"))
        .first()
    )
    assert per_hash.lo == 1 and per_hash.hi == 1


def test_doc_signatures_complete_and_doc_keyed(spark):
    from map_reduce_sf_crime_spark.sources.parquet import load_table

    sigs = REGISTRY["doc_signatures"].spark(spark, SF_SMOKE)
    n_docs = load_table(spark, SF_SMOKE, "documents").count()
    assert sigs.count() == n_docs
    assert sigs.select("doc_id").distinct().count() == n_docs
    missing = sigs.filter(
        F.col("minhash_sig").isNull()
        | F.col("simhash").isNull()
        | F.col("fingerprint").isNull()
    ).count()
    assert missing == 0  # every fixture doc has text → every leg joined


def test_multimodal_profile_paths_agree(spark):
    prof = REGISTRY["multimodal_profile"].spark(spark, SF_SMOKE)
    assert prof.filter(F.col("paths_agree") != 1).count() == 0


def test_concurrent_window_counts_equal_sequential(spark):
    from map_reduce_sf_crime_spark.streaming import windows

    merged = REGISTRY["stream_window_counts"].spark(spark, SF_SMOKE)
    tumb_seq = windows.tumbling_counts(spark, SF_SMOKE, "1 hour")
    tumb_leg = merged.filter(F.col("kind") == "tumbling").drop("kind")
    assert tumb_leg.exceptAll(tumb_seq).count() == 0
    assert tumb_seq.exceptAll(tumb_leg).count() == 0
