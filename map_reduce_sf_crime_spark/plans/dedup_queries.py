"""Deduplication queries over the ``documents`` table (north-star
training-data operators; graded alongside SURVEY §2)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup
from ..sources.parquet import fan_out, load_table
from .registry import register


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # shingling/hashing is CPU-bound per row — spread scan-side work
    return fan_out(load_table(spark, sf_dir, "documents"))


@register("dedup_exact", dedup.EXACT_DEDUP_SQL, survey_ids=("DD1",))
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.exact_dedup_stats(_docs(spark, sf_dir))


@register(
    "dedup_keep_first",
    """
    select doc_id, source from documents
    where doc_id in (select min(doc_id) from documents group by md5(text))
    """,
    survey_ids=("DD1",),
)
def dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-representative dedup: keep the lowest doc_id per exact
    duplicate group (min-agg + semi-join — no global window)."""
    return dedup.dedup_keep_first(_docs(spark, sf_dir)).select("doc_id", "source")


@register(
    "dedup_near_jaccard",
    dedup.near_dup_pairs_exact_sql(n=3, threshold=0.5),
    survey_ids=("DD2",),
)
def dedup_near_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard pairs ≥ 0.5 (inverted-index join)."""
    return dedup.near_dup_pairs_exact(_docs(spark, sf_dir), n=3, threshold=0.5)


@register(
    "minhash_signatures",
    # string-serialized: the driver's pandas canonicalizer cannot sort
    # array cells (round-1 gate error), so both sides emit CSV text
    f"select doc_id, array_to_string(sig, ',') as sig "
    f"from ({dedup.minhash_signatures_sql(n=3, n_hashes=16)})",
    survey_ids=("DD3",),
)
def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-hash MinHash signature per document — bit-identical in
    DuckDB thanks to the portable md5 hash construction."""
    sigs = dedup.minhash_signatures(_docs(spark, sf_dir), n=3, n_hashes=16)
    return sigs.select(
        "doc_id",
        F.concat_ws(",", F.col("sig").cast("array<string>")).alias("sig"),
    )


@register(
    "dedup_minhash_lsh",
    # Deliberately the exact-Jaccard oracle: LSH output ⊆ exact, and at
    # 8 bands × r=2 every planted pair (j ≥ 0.8) is recalled with
    # p > 0.999 — deterministic here (seeded md5), verified equal in
    # tests/test_dedup.py. If a future dataset drops a pair, the
    # mismatch is the signal, not noise.
    dedup.near_dup_pairs_exact_sql(n=3, threshold=0.8),
    survey_ids=("DD3",),
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH banded candidates + exact verification, j ≥ 0.8."""
    return dedup.lsh_near_dup_pairs(
        _docs(spark, sf_dir), n=3, n_hashes=16, bands=8, threshold=0.8
    )


@register(
    "dedup_clusters",
    dedup.dup_clusters_sql(dedup.near_dup_pairs_exact_sql(3, 0.8)),
    survey_ids=("DD6",),
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected-components dup clustering (iterative label
    propagation) over the Jaccard-≥0.8 pair graph; the DuckDB twin is
    a recursive CTE — Spark's driver-loop fixpoint must agree with
    SQL's transitive closure exactly."""
    pairs = dedup.near_dup_pairs_exact(_docs(spark, sf_dir), n=3, threshold=0.8)
    return dedup.dup_clusters(pairs)


@register("simhash_fingerprints", dedup.simhash_sql(), survey_ids=("DD4",))
def simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.simhash(_docs(spark, sf_dir))


@register(
    "dedup_simhash",
    dedup.simhash_near_pairs_sql(max_hamming=3),
    survey_ids=("DD4",),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamming-≤3 SimHash pairs; banded join is provably exact here,
    so the all-pairs DuckDB oracle must match exactly."""
    return dedup.simhash_near_pairs(_docs(spark, sf_dir), max_hamming=3)
