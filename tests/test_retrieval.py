"""BM25 ranked retrieval (TF3): relevance semantics on a controlled
fixture, exact-integer score discipline, and bit-equality with the
DuckDB twin over the real documents table."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from map_reduce_sf_crime_spark.operators import retrieval
from map_reduce_sf_crime_spark.sources.parquet import load_table

from .conftest import SF_SMOKE


def _fixture(spark):
    rows = [
        # doc 0: both query terms, repeated, short -> top hit
        (0, "solar panel solar panel solar"),
        # doc 1: both terms once, longer
        (1, "solar panel installed on the roof of the long building"),
        # doc 2: one term only
        (2, "panel of judges convened for the annual review session"),
        # doc 3: no query terms -> absent from results
        (3, "completely unrelated text about gardening and soil"),
        # doc 4: same tf as doc 1 but much longer -> length-normalized below it
        (4, "solar panel " + "filler " * 40),
        (5, ""),
        (6, None),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bm25_relevance_semantics(spark):
    docs = _fixture(spark)
    out = retrieval.bm25_topk(docs, {7: "Solar PANEL"}, k=10).collect()
    by_rank = {r.rank: r for r in out}
    ids = [by_rank[i].doc_id for i in sorted(by_rank)]
    # docs without any query term never appear
    assert set(ids) <= {0, 1, 2, 4}
    # term-dense short doc first; both-terms docs beat the one-term doc
    assert ids[0] == 0
    assert ids.index(1) < ids.index(2)
    # length normalization: same tf, longer doc ranks below
    assert ids.index(1) < ids.index(4)
    # ranks contiguous from 1, n_terms_hit correct
    assert sorted(by_rank) == list(range(1, len(ids) + 1))
    hits = {r.doc_id: r.n_terms_hit for r in out}
    assert hits[0] == 2 and hits[1] == 2 and hits[2] == 1


def test_bm25_k_truncates_and_ties_break_on_doc_id(spark):
    docs = spark.createDataFrame(
        [(i, "alpha beta") for i in range(10)], "doc_id long, text string"
    )
    out = retrieval.bm25_topk(docs, {0: "alpha"}, k=3).collect()
    # identical docs -> identical integer scores -> doc_id ascending
    assert [(r.rank, r.doc_id) for r in sorted(out, key=lambda r: r.rank)] == [
        (1, 0),
        (2, 1),
        (3, 2),
    ]
    assert len({r.score_unat for r in out}) == 1


def test_bm25_idf_downweights_ubiquitous_terms(spark):
    # 'the' is in every doc (idf ~ ln(1 + 0.5/(N+0.5)) ~ 0); 'zebra' rare
    rows = [(i, "the common filler line") for i in range(20)]
    rows.append((20, "the zebra"))
    rows.append((21, "the the the the the the"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = retrieval.bm25_topk(docs, {0: "the zebra"}, k=3).collect()
    top = min(out, key=lambda r: r.rank)
    assert top.doc_id == 20
    # doc 21 spams the zero-idf term and must not beat the zebra doc
    spam = [r for r in out if r.doc_id == 21]
    assert not spam or spam[0].score_unat < top.score_unat


def test_bm25_rejects_empty_queries(spark):
    docs = _fixture(spark)
    with pytest.raises(ValueError):
        retrieval.bm25_topk(docs, {0: "   "})


def test_bm25_matches_duckdb_twin(spark):
    """Every emitted column is bit-identical to the DuckDB twin on the
    real documents table — the integer-score discipline, checked."""
    queries = {0: "spark window merge", 1: "dup table", 2: "query the"}
    docs = load_table(spark, SF_SMOKE, "documents")
    got = {
        tuple(r)
        for r in retrieval.bm25_topk(docs, queries, k=12)
        .select("query_id", "doc_id", "rank", "score_unat", "n_terms_hit")
        .collect()
    }
    con = duckdb.connect()
    con.sql(
        f"create view documents as select * from "
        f"read_parquet('{SF_SMOKE}/documents.parquet')"
    )
    want = {tuple(r) for r in con.sql(retrieval.bm25_topk_sql(queries, k=12)).fetchall()}
    assert got == want
    # all three queries returned a full k (the corpus is big enough)
    for q in queries:
        assert sum(1 for t in got if t[0] == q) == 12


def test_bm25_sql_twin_escapes_quotes(spark):
    """Regression: a query term with an apostrophe must not break the
    generated oracle SQL — both engines tokenize and score it the
    same way."""
    docs = spark.createDataFrame(
        [
            (0, "don't stop believing"),
            (1, "don't don't don't"),
            (2, "stop right there"),
            (3, "nothing relevant here"),
        ],
        "doc_id long, text string",
    )
    queries = {0: "Don't stop"}
    got = {
        tuple(r)
        for r in retrieval.bm25_topk(docs, queries, k=10)
        .select("query_id", "doc_id", "rank", "score_unat", "n_terms_hit")
        .collect()
    }
    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    want = {
        tuple(r) for r in con.sql(retrieval.bm25_topk_sql(queries, k=10)).fetchall()
    }
    assert got == want
    assert {t[1] for t in got} == {0, 1, 2}


def test_bm25_indexed_equals_live_and_prunes_buckets(spark):
    """The persisted postings index serves bit-identical results to
    the live scorer, and the query-term filter actually prunes the
    token-bucketed scan (SelectedBucketsCount in the plan)."""
    tbl = "bm25_postings_test"
    spark.sql(f"drop table if exists {tbl}")
    spark.sql(f"drop table if exists {tbl}_stats")
    docs = load_table(spark, SF_SMOKE, "documents")
    retrieval.write_postings_index(docs, tbl)
    queries = {0: "spark window merge", 1: "dup table"}
    live = {
        tuple(r)
        for r in retrieval.bm25_topk(docs, queries, k=15).collect()
    }
    served = retrieval.bm25_topk_indexed(spark, tbl, queries, k=15)
    got = {tuple(r) for r in served.collect()}
    assert got == live and got
    plan = served._jdf.queryExecution().executedPlan().toString()
    scan_lines = [l for l in plan.splitlines() if tbl in l]
    assert scan_lines and "SelectedBucketsCount" in "\n".join(scan_lines)
    spark.sql(f"drop table if exists {tbl}")
    spark.sql(f"drop table if exists {tbl}_stats")


def test_rrf_fuse_matches_python_mirror(spark):
    """RRF fusion equals the definition computed in python: exact
    integer nano-contributions, missing-list docs contribute nothing,
    ties break on doc_id."""
    import math

    a = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2), (0, 12, 3), (1, 20, 1)],
        "query_id int, doc_id long, rank int",
    )
    b = spark.createDataFrame(
        [(0, 12, 1), (0, 13, 2), (1, 20, 1), (1, 21, 2)],
        "query_id int, doc_id long, rank int",
    )
    got = {
        (r.query_id, r.doc_id): (r.rank, r.rrf_score_nano)
        for r in retrieval.rrf_fuse(a, b, k=10).collect()
    }
    contribs = {}
    for df in (a, b):
        for r in df.collect():
            key = (r.query_id, r.doc_id)
            contribs[key] = contribs.get(key, 0) + 1_000_000_000 // (60 + r.rank)
    want = {}
    for qid in (0, 1):
        qdocs = sorted(
            (d for (q, d) in contribs if q == qid),
            key=lambda d: (-contribs[(qid, d)], d),
        )
        for i, d in enumerate(qdocs):
            want[(qid, d)] = (i + 1, contribs[(qid, d)])
    assert got == want
    # doc 12 (in both lists) outranks doc 10 (rank-1 in one list only)
    assert got[(0, 12)][0] == 1 and got[(0, 12)][1] > got[(0, 10)][1]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="c must"):
        retrieval.rrf_fuse(a, b, c=0)
    # invalid ranks raise at execution instead of silently corrupting
    bad = spark.createDataFrame(
        [(0, 10, 0)], "query_id int, doc_id long, rank int"
    )
    with _pytest.raises(Exception, match="rank must be >= 1"):
        retrieval.rrf_fuse(a, bad).collect()
    nullr = spark.createDataFrame(
        [(0, 10, None)], "query_id int, doc_id long, rank int"
    )
    with _pytest.raises(Exception, match="rank must be >= 1"):
        retrieval.rrf_fuse(a, nullr).collect()


def test_rrf_hybrid_bm25_plus_semantic(spark):
    """End-to-end hybrid: fuse the BM25 lexical ranking with a
    semantic ranking (knn over embeddings, vec_id treated as doc_id)
    — the fused top-k is dominated by docs both tiers agree on."""
    from map_reduce_sf_crime_spark.operators import similarity

    docs = load_table(spark, SF_SMOKE, "documents")
    emb = load_table(spark, SF_SMOKE, "embeddings")
    lex = retrieval.bm25_topk(docs, {0: "spark window merge"}, k=20)
    sem = (
        similarity.knn_bruteforce(emb, [0], k=20)
        .select(
            F.lit(0).cast("int").alias("query_id"),
            F.col("vec_id").alias("doc_id"),
            F.col("rk").cast("int").alias("rank"),
        )
    )
    fused = retrieval.rrf_fuse(lex, sem, k=10).collect()
    assert len(fused) == 10
    assert [r.rank for r in sorted(fused, key=lambda r: r.rank)] == list(
        range(1, 11)
    )


def test_bm25_index_change_feed_fold(spark):
    """The postings index is a maintained artifact: a DOCTORED base
    build (held-out docs missing, phantom docs injected, texts
    corrupted) repaired by ONE change-feed fold serves bit-identically
    to the live scorer on the true corpus; a replayed fold collapses."""
    tbl = "bm25_postings_fold"
    spark.sql(f"drop table if exists {tbl}")
    spark.sql(f"drop table if exists {tbl}_stats")
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    held = F.col("doc_id") % 5 == 4
    corrupt = ~held & (F.col("doc_id") % 17 == 5)
    doctored = docs.filter(~held).withColumn(
        "text",
        F.when(corrupt, F.concat(F.col("text"), F.lit(" zzzdriftzzz")))
        .otherwise(F.col("text")),
    )
    junk = docs.filter(F.col("doc_id") % 17 == 3).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        # phantom docs CONTAIN the query terms, so a dead fold leaves
        # them polluting the top-k
        F.concat(F.lit("spark window merge dup "), F.col("text")).alias("text"),
    )
    retrieval.write_postings_index(doctored.unionByName(junk), tbl)
    changes = (
        junk.withColumn("_change_type", F.lit("delete"))
        .unionByName(
            doctored.filter(corrupt).withColumn(
                "_change_type", F.lit("update_preimage")
            )
        )
        .unionByName(
            docs.filter(corrupt).withColumn(
                "_change_type", F.lit("update_postimage")
            )
        )
        .unionByName(
            docs.filter(held).withColumn("_change_type", F.lit("insert"))
        )
        .localCheckpoint()
    )
    retrieval.apply_changes_to_postings_index(spark, changes, tbl, gen=1)
    queries = {0: "spark window merge dup", 1: "query the"}
    live = {
        tuple(r) for r in retrieval.bm25_topk(docs, queries, k=15).collect()
    }
    got = {
        tuple(r)
        for r in retrieval.bm25_topk_indexed(spark, tbl, queries, k=15).collect()
    }
    assert got == live and got
    # no phantom survives the fold
    assert all(t[1] < 10_000_000 for t in got)
    # replayed fold: byte-identical rows collapse
    retrieval.apply_changes_to_postings_index(spark, changes, tbl, gen=1)
    again = {
        tuple(r)
        for r in retrieval.bm25_topk_indexed(spark, tbl, queries, k=15).collect()
    }
    assert again == live
    import pytest as _pytest

    with _pytest.raises(ValueError, match="gen must"):
        retrieval.apply_changes_to_postings_index(spark, changes, tbl, gen=0)
    spark.sql(f"drop table if exists {tbl}")
    spark.sql(f"drop table if exists {tbl}_stats")


def test_bm25_rejects_individually_empty_query(spark):
    """One whitespace-only query among valid ones raises (it would be
    silently absent from the output otherwise)."""
    docs = _fixture(spark)
    with pytest.raises(ValueError, match="query 1 tokenizes to zero"):
        retrieval.bm25_topk(docs, {0: "spark", 1: " \t "})
