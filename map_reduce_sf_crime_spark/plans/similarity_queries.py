"""Similarity-search queries over ``embeddings`` (north-star ANN
operators). ``ann_lsh_topk`` is genuinely approximate → no SQL oracle
(rows-only check); its recall against brute force is asserted in
tests/test_similarity.py instead.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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


@register(
    "embedding_norms",
    """
    select vec_id,
           round(sqrt(list_sum(list_transform(range(1, 65),
                 i -> embedding[i]::double * embedding[i]::double))), 6) as l2
    from embeddings
    """,
    survey_ids=("UDF1",),
)
def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar ``@pandas_udf`` surface (Arrow-vectorized, SURVEY §2.10):
    L2 norm per embedding. The UDF accumulates one dimension at a time
    in float64 — the SQL fold order — so sqrt+round match bit-for-bit;
    rounding happens JVM-side with F.round like every other query."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def l2(vecs: pd.Series) -> pd.Series:
        out = []
        for v in vecs:
            m = np.asarray(v, dtype=np.float64)
            acc = 0.0
            for d in range(m.shape[0]):
                acc += m[d] * m[d]
            out.append(float(np.sqrt(acc)))
        return pd.Series(out)

    emb = _emb(spark, sf_dir)
    return emb.select("vec_id", F.round(l2("embedding"), 6).alias("l2"))


@register(
    "label_centroid_d1",
    """
    select label, round(avg(embedding[1]::double), 6) as mean_d1
    from embeddings group by label
    """,
    survey_ids=("UDF2",),
)
def label_centroid_d1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg ``@pandas_udf`` (custom UDAF surface): mean of the
    first embedding dimension per label, computed in pandas per group.
    pandas Series.mean over float64 equals SQL avg (sum/count in
    double) for these magnitudes at 6dp."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def mean_d1(first_dims: pd.Series) -> float:
        return float(first_dims.mean())

    emb = _emb(spark, sf_dir)
    return (
        emb.select("label", F.col("embedding").getItem(0).cast("double").alias("d1"))
        .groupBy("label")
        .agg(F.round(mean_d1("d1"), 6).alias("mean_d1"))
    )


@register("ivf_kmeans_topk", None, survey_ids=("ANN4",))
def ivf_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with the Lloyd-refined quantizer (iterative algorithm ⇒
    genuinely non-SQL-expressible, rows-only check; recall asserted
    in tests)."""
    return similarity.ivf_topk(_emb(spark, sf_dir), QUERY_IDS, K, refine=True)
