"""Similarity-search queries over ``embeddings`` (north-star ANN
operators). ``ann_lsh_topk`` is genuinely approximate → no SQL oracle
(rows-only check); its recall against brute force is asserted in
tests/test_similarity.py instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import similarity
from ..sources.parquet import fan_out, load_table
from .registry import register

QUERY_IDS = [0, 1, 2, 3, 4]
K = 3
NEAR_THRESHOLD = 0.4


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    # vector math is CPU-bound per row — spread scan-side work
    return fan_out(load_table(spark, sf_dir, "embeddings"))


@register(
    "knn_bruteforce",
    similarity.knn_bruteforce_sql(QUERY_IDS, K),
    survey_ids=("ANN1",),
)
def knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.knn_bruteforce(_emb(spark, sf_dir), QUERY_IDS, K)


@register(
    "embedding_near_pairs",
    similarity.cosine_near_pairs_sql(NEAR_THRESHOLD),
    survey_ids=("ANN2", "DD5"),
)
def embedding_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (exact all-pairs baseline)."""
    return similarity.cosine_near_pairs(_emb(spark, sf_dir), NEAR_THRESHOLD)


@register(
    "lsh_plane_signatures",
    similarity.plane_signatures_sql(),
    survey_ids=("ANN3",),
)
def lsh_plane_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic random-hyperplane signatures — exact oracle since
    hyperplane weights are seeded md5, reproduced bit-for-bit in SQL."""
    return similarity.plane_signatures(_emb(spark, sf_dir))


@register("ann_lsh_topk", None, survey_ids=("ANN3",))
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate banded-LSH top-k (no oracle: probabilistic recall)."""
    return similarity.ann_lsh_topk(_emb(spark, sf_dir), QUERY_IDS, K)


@register(
    "ivf_assignments",
    similarity.ivf_assignments_sql(),
    survey_ids=("ANN4",),
)
def ivf_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse-quantizer assignment — exact oracle (deterministic
    centroids, bit-identical cosine fold, identical tie-break)."""
    return similarity.ivf_assignments(_emb(spark, sf_dir))


@register("ivf_topk", None, survey_ids=("ANN4",))
def ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF probe-and-rerank top-k (no oracle: approximate by design;
    recall vs knn_bruteforce asserted in tests/test_similarity.py)."""
    return similarity.ivf_topk(_emb(spark, sf_dir), QUERY_IDS, K)


@register("ivf_kmeans_topk", None, survey_ids=("ANN4",))
def ivf_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with the Lloyd-refined quantizer (iterative algorithm ⇒
    genuinely non-SQL-expressible, rows-only check; recall asserted
    in tests)."""
    return similarity.ivf_topk(_emb(spark, sf_dir), QUERY_IDS, K, refine=True)
