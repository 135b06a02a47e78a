"""Empty-input robustness: every non-trivial operator must return an
empty (or correctly-degenerate) result on empty input, not crash —
at 100 TB some partition/filter combination WILL be empty."""

from __future__ import annotations

from pyspark.sql import functions as F

from map_reduce_sf_crime_spark.operators import dedup, multimodal, similarity, textops
from map_reduce_sf_crime_spark.sources.parquet import load_table

from .conftest import SF_SMOKE


def _empty_docs(spark):
    return load_table(spark, SF_SMOKE, "documents").filter(F.col("doc_id") < 0)


def _empty_emb(spark):
    return load_table(spark, SF_SMOKE, "embeddings").filter(F.col("vec_id") < 0)


def test_dedup_ops_on_empty(spark):
    docs = _empty_docs(spark)
    assert dedup.exact_dedup_stats(docs).count() == 0
    assert dedup.near_dup_pairs_exact(docs).count() == 0
    assert dedup.lsh_near_dup_pairs(docs).count() == 0
    assert dedup.simhash_near_pairs(docs).count() == 0
    assert dedup.minhash_signatures(docs).count() == 0


def test_cluster_on_empty_pairs(spark):
    pairs = spark.createDataFrame([], "doc_a long, doc_b long, jaccard double")
    assert dedup.dup_clusters(pairs).count() == 0


def test_similarity_ops_on_empty(spark):
    emb = _empty_emb(spark)
    assert similarity.cosine_near_pairs(emb, 0.4).count() == 0
    assert similarity.knn_bruteforce(emb, [0, 1], k=3).count() == 0
    assert similarity.plane_signatures(emb).count() == 0


def test_text_and_multimodal_on_empty(spark):
    docs = _empty_docs(spark)
    assert textops.quality_scores(docs).count() == 0
    assert textops.lang_id(docs).count() == 0
    media = multimodal.with_payload(docs)
    assert multimodal.extract_features(media).count() == 0
    assert multimodal.sample_frames(media).count() == 0
