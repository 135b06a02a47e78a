"""Deduplication queries over the ``documents`` table (north-star
training-data operators; graded alongside SURVEY §2)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import (
    dataquality,
    dedup,
    langmodel,
    packing,
    retrieval,
    similarity,
    textops,
)
from ..sources.parquet import fan_out, load_table
from .registry import register


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # shingling/hashing is CPU-bound per row — spread scan-side work
    return fan_out(load_table(spark, sf_dir, "documents"))


@register(
    "dedup_exact_flags",
    """
    select doc_id, source,
           cast(doc_id in (select min(doc_id) from documents
                           group by md5(text)) as int) as kept
    from documents
    """,
    survey_ids=("DD1",),
)
def dedup_exact_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact (md5) dedup with canonical representatives: every doc
    flagged kept=1 iff it is the lowest doc_id of its duplicate group
    (min-agg + join — no window over the corpus). Per-source dup
    stats are derivable (sum(kept) = n_unique), so this one entry
    carries the whole DD1 surface."""
    docs = _docs(spark, sf_dir)
    kept = dedup.dedup_keep_first(docs).select("doc_id").withColumn(
        "kept", F.lit(1)
    )
    return (
        docs.select("doc_id", "source")
        .join(kept, "doc_id", "left")
        .select("doc_id", "source", F.coalesce("kept", F.lit(0)).alias("kept"))
    )


@register(
    "dedup_near_jaccard",
    dedup.near_dup_pairs_exact_sql(n=3, threshold=0.5),
    survey_ids=("DD2",),
)
def dedup_near_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard pairs ≥ 0.5 (inverted-index join)."""
    return dedup.near_dup_pairs_exact(_docs(spark, sf_dir), n=3, threshold=0.5)


#: BM25 gate leg: one fixed keyword query over the corpus vocabulary
#: (frequent + rare terms so idf separation is non-trivial), top-k
#: deep enough that rank boundaries exercise tie-breaks.
BM25_QUERY = {0: "spark window merge dup"}
BM25_K = 25

#: HY1 gate leg: the semantic list fused with BM25 is the exact top-k
#: cosine ranking around this embedding (vec_id aligns with doc_id in
#: the fixture corpus — and even where it wouldn't, both engines rank
#: the identical id stream, so the hash stays meaningful).
RRF_QUERY_VEC = 0

#: DQ5 gate leg: k-anonymity under the (lang, source) quasi-identifier
#: pair with n_chars as the sensitive column — k=5 splits the fixture
#: corpus into flagged singletons/small classes AND safe big ones, so
#: both branches of the at_risk predicate are hash-checked.
KANON_QUASI = ["lang", "source"]
KANON_K = 5


@register(
    "doc_signatures",
    # arrays string-serialized: the driver's pandas canonicalizer
    # cannot sort array cells (round-1 gate error)
    f"""
    with mh as (select doc_id, array_to_string(sig, ',') as minhash_sig
                from ({dedup.minhash_signatures_sql(n=3, n_hashes=16)})),
         sh as ({dedup.simhash_sql()}),
         fp as (select doc_id,
                       array_to_string(fingerprint, ',') as fingerprint,
                       n_grams
                from ({textops.fingerprints_sql()})),
         ds as ({textops.dup_span_sql()}),
         dx as ({dedup.duplicate_span_stats_sql(n=8)}),
         cc as ({packing.cdc_chunk_count_sql()}),
         lm as ({langmodel.bigram_lm_scores_sql("lang = 'en'")}),
         bm as ({retrieval.bm25_topk_sql(BM25_QUERY, k=BM25_K)}),
         kn as (select vec_id as doc_id, rk as rank
                from ({similarity.knn_bruteforce_sql([RRF_QUERY_VEC], BM25_K)})),
         rr0 as (
           select doc_id,
                  cast(sum(1000000000 // (60 + rank)) as bigint)
                    as rrf_score_nano
           from (select doc_id, rank from bm
                 union all
                 select doc_id, rank from kn)
           group by doc_id
         ),
         rr as (
           select doc_id, rrf_score_nano, rrf_rank from (
             select doc_id, rrf_score_nano,
                    cast(row_number() over (
                      order by rrf_score_nano desc, doc_id
                    ) as int) as rrf_rank
             from rr0
           ) where rrf_rank <= {BM25_K}
         ),
         ka as ({dataquality.k_anonymity_flags_sql(
             KANON_QUASI, k=KANON_K, sensitive_col="n_chars")}),
         gp as ({textops.gopher_stats_sql()})
    select d.doc_id, mh.minhash_sig, sh.simhash, fp.fingerprint, fp.n_grams,
           ds.n_span_grams, ds.dup_span_frac,
           dx.n_dup_grams, dx.dup_token_frac, cc.n_cdc_chunks,
           lm.lm_n_trans, lm.lm_logp_unat,
           bm.rank as bm25_rank, bm.score_unat as bm25_score_unat,
           rr.rrf_rank, rr.rrf_score_nano,
           ka.class_size as kanon_class_size,
           ka.class_l_div as kanon_l_div,
           ka.at_risk as kanon_at_risk,
           gp.g_n_words, gp.mean_word_len, gp.top_trigram_ratio,
           gp.dup_2gram_mass, gp.gopher_ok
    from documents d
    left join mh using (doc_id)
    left join sh using (doc_id)
    left join fp using (doc_id)
    left join ds using (doc_id)
    left join dx using (doc_id)
    left join cc using (doc_id)
    join lm using (doc_id)
    left join bm using (doc_id)
    left join rr using (doc_id)
    join ka using (doc_id)
    join gp using (doc_id)
    """,
    survey_ids=(
        "DD3", "DD4", "TX4", "DS1", "DD7", "CH2", "QL1", "TF3", "HY1",
        "DQ5", "TX7",
    ),
)
def doc_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document signature catalog in one entry: 16-hash MinHash
    (DD3, bit-identical in DuckDB via the portable md5 construction),
    32-bit SimHash (DD4), winnowing fingerprint + distinct-gram
    count (TX4), and the cross-document duplicated-span fraction
    (DS1, operators/textops.dup_span_stats — the n-gram form of
    exact-substring dedup, catching boilerplate and partial copies
    that doc-level dedup misses), and the content-defined chunk count
    (CH2, operators/packing.chunk_documents_cdc — rolling-hash
    boundaries whose edit-stability is unit-tested), plus the
    INTERVAL-MERGED duplicated-span coverage (DD7,
    operators/dedup.duplicate_span_stats — Lee et al. 2022's span
    form: every 8-token window hashed, corpus-frequency ≥ 2 flags a
    span, overlapping spans merged so a run of k duplicated tokens
    counts k, not k·8; gate-promoted round 5 beside the simpler
    positional form), and the bigram-LM log-likelihood under the
    stored-lang target slice (QL1, operators/langmodel — stupid
    backoff, integer micro-nat weights; this entry is gate-only, so
    the legs cost no bench time). One doc-keyed join of per-doc
    projections — co-partitioned on the doc key at scale."""
    docs = _docs(spark, sf_dir)
    mh = dedup.minhash_signatures(docs, n=3, n_hashes=16).select(
        "doc_id",
        F.concat_ws(",", F.col("sig").cast("array<string>")).alias("minhash_sig"),
    )
    sh = dedup.simhash(docs)
    fp = textops.fingerprints(docs).select(
        "doc_id",
        F.concat_ws(",", F.col("fingerprint").cast("array<string>")).alias(
            "fingerprint"
        ),
        "n_grams",
    )
    ds = textops.dup_span_stats(docs)
    dx = dedup.duplicate_span_stats(docs, n=8).select(
        "doc_id", "n_dup_grams", "dup_token_frac"
    )
    cc = packing.cdc_chunk_counts(docs)
    joined = (
        docs.select("doc_id")
        .join(mh, "doc_id", "left")
        .join(sh, "doc_id", "left")
        .join(fp, "doc_id", "left")
        .join(ds, "doc_id", "left")
        .join(dx, "doc_id", "left")
        .join(cc, "doc_id", "left")
    )
    # QL1 (round 5): bigram-LM log-likelihood under the stored-lang
    # target slice — the signature frame is the scorer's spine (base=)
    scored = langmodel.bigram_lm_scores(
        docs, target=F.col("lang") == F.lit("en"), base=joined
    )
    # TF3 (round 5): the fixed keyword query's BM25 rank/score per doc
    # (null outside the top-k) — gates the retrieval tier end-to-end
    bm_ranked = retrieval.bm25_topk(docs, BM25_QUERY, k=BM25_K)
    bm = bm_ranked.select(
        "doc_id",
        F.col("rank").alias("bm25_rank"),
        F.col("score_unat").alias("bm25_score_unat"),
    )
    # HY1 (round 6): RRF fusion of the lexical (BM25) list with the
    # exact-cosine semantic list around RRF_QUERY_VEC — the hybrid
    # retrieval shape, integer-division-exact (operators/retrieval.
    # rrf_fuse). Both lists share query_id 0; top-BM25_K fused.
    knn = similarity.knn_bruteforce(
        load_table(spark, sf_dir, "embeddings"), [RRF_QUERY_VEC], BM25_K
    ).select(
        "query_id",
        F.col("vec_id").alias("doc_id"),
        F.col("rk").alias("rank"),
    )
    rrf = retrieval.rrf_fuse(
        bm_ranked.select("query_id", "doc_id", "rank"), knn, k=BM25_K
    ).select("doc_id", F.col("rank").alias("rrf_rank"), "rrf_score_nano")
    # DQ5 (round 6): per-doc k-anonymity class size / l-diversity /
    # at-risk flag under the (lang, source) quasi-identifier pair —
    # one groupBy + one null-safe join back, no window
    # (operators/dataquality.k_anonymity_flags).
    ka = dataquality.k_anonymity_flags(
        docs, KANON_QUASI, k=KANON_K, sensitive_col="n_chars"
    ).select(
        "doc_id",
        F.col("class_size").alias("kanon_class_size"),
        F.col("class_l_div").alias("kanon_l_div"),
        F.col("at_risk").alias("kanon_at_risk"),
    )
    # TX7 (round 6): the Gopher quality-rule columns — row-local like
    # the signature legs, so the join stays the only cost
    gp = textops.gopher_stats(docs)
    return (
        scored.join(bm, "doc_id", "left")
        .join(rrf, "doc_id", "left")
        .join(ka, "doc_id")
        .join(gp, "doc_id")
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


#: Incremental-batch membership rule: every 5th doc is "today's
#: crawl", the rest are the existing catalog. Deterministic doc_id
#: rule so the oracle partitions identically.
_INC_PRED = "doc_id % 5 = 4"


#: sf_dir → (buckets_table, shingles_table) of the persisted signature
#: catalog — written once per process, reused by every later call, the
#: build-once/probe-daily production contract.
_CATALOG_TABLES: dict[str, tuple[str, str]] = {}


def _signature_catalog(
    spark: SparkSession, sf_dir: str, docs: DataFrame
) -> tuple[str, str]:
    import hashlib

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    bt, st = f"sig_cat_buckets_{tag}", f"sig_cat_shingles_{tag}"
    # the cache is process-scoped but the tables are SESSION-catalog
    # scoped: a later session in the same process (previous one
    # stopped) would hit the cache and then fail to resolve the
    # tables — verify they exist in THIS session's catalog too
    if sf_dir not in _CATALOG_TABLES or not (
        spark.catalog.tableExists(bt) and spark.catalog.tableExists(st)
    ):
        import os
        import shutil
        # a previous PROCESS may have left the managed-table location
        # on disk without this session's in-memory catalog knowing it —
        # saveAsTable(overwrite) then fails with LOCATION_ALREADY_EXISTS,
        # so drop both the entry and the stale location first
        warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix(
            "file:"
        )
        for t in (bt, st):
            spark.sql(f"drop table if exists {t}")
            shutil.rmtree(os.path.join(warehouse, t), ignore_errors=True)
        dedup.write_signature_catalog(
            docs.filter(~((F.col("doc_id") % 5) == 4)), bt, st, n=3
        )
        _CATALOG_TABLES[sf_dir] = (bt, st)
    return _CATALOG_TABLES[sf_dir]


@register(
    "dedup_incremental",
    dedup.incremental_exact_sql(_INC_PRED, n=3, threshold=0.8),
    survey_ids=("IC1",),
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental (new-batch-vs-catalog) near-dedup, j ≥ 0.8: each
    incoming doc flagged with its catalog match count and best
    Jaccard — banded-minhash candidates verified exactly, never
    comparing incoming docs to each other. This runs the CATALOGED
    production form (operators/dedup.py::incremental_lsh_flags_cataloged):
    the catalog side's band buckets and shingle sets are PERSISTED
    once (write_signature_catalog — key-bucketed so the daily probe
    shuffles only the new batch) and read back here, so the gate
    watches the path a 100 TB deployment runs daily; output is pinned
    identical to the recompute form (tests/test_dedup.py). Oracle =
    the exact incoming×catalog inverted-index join."""
    docs = _docs(spark, sf_dir)
    bt, st = _signature_catalog(spark, sf_dir, docs)
    return dedup.incremental_lsh_flags_cataloged(
        spark,
        docs.filter((F.col("doc_id") % 5) == 4),
        bt,
        st,
        n=3,
        threshold=0.8,
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


@register(
    "dedup_simhash",
    dedup.simhash_near_pairs_sql(max_hamming=3),
    survey_ids=("DD4",),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamming-≤3 SimHash pairs; banded join is provably exact here,
    so the all-pairs DuckDB oracle must match exactly."""
    return dedup.simhash_near_pairs(_docs(spark, sf_dir), max_hamming=3)
