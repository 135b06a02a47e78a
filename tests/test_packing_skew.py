"""Packing under source skew: the two-phase sub-sharded running total
must (1) split a pathologically single-source corpus across many
window tasks instead of one straggler, and (2) produce bit-identical
assignments to the naive one-window-per-source form on any data."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from map_reduce_sf_crime_spark.operators import packing
from map_reduce_sf_crime_spark.sources.parquet import load_table

from .conftest import SF_SMOKE

BUDGET = 64


def _naive_pack(docs, budget):
    """The single-window reference form (the pre-sub-sharding
    implementation): one window task per source."""
    from map_reduce_sf_crime_spark.functions.text import tokens_col

    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sized = docs.select(
        "doc_id", "source", F.size(tokens_col(F.col("text"))).alias("n_tok")
    )
    return sized.withColumn(
        "bin_id", F.floor((F.sum("n_tok").over(w) - F.col("n_tok")) / budget)
    )


def test_single_source_corpus_spreads_across_shards(spark):
    """All docs in ONE source with a tiny shard width: the sub-sharded
    form must fan the window across many (source, shard) groups — no
    single task ever holds the whole corpus — while matching the naive
    single-window assignment exactly."""
    docs = load_table(spark, SF_SMOKE, "documents").withColumn(
        "source", F.lit("the_one_giant_crawl")
    )
    shard_rows = 64
    got = packing.pack_documents(docs, BUDGET, shard_rows=shard_rows)
    want = {tuple(r) for r in _naive_pack(docs, BUDGET).collect()}
    assert {tuple(r) for r in got.collect()} == want

    # operational skew check: count distinct shards the window actually
    # partitioned by (recompute the shard id the operator uses)
    shift = max(0, shard_rows.bit_length() - 1)
    n_shards = (
        docs.select(F.shiftright("doc_id", shift).alias("s")).distinct().count()
    )
    n_docs = docs.count()
    assert n_shards > 1, "shard width did not split the single source"
    # every shard is a contiguous doc_id range of bounded width
    per_shard = (
        docs.select(F.shiftright("doc_id", shift).alias("s"))
        .groupBy("s")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    assert per_shard <= shard_rows
    assert n_shards >= n_docs // shard_rows


def test_sub_sharded_matches_naive_multi_source(spark):
    """On the natural multi-source corpus (and at chunk granularity)
    the sub-sharded default must be indistinguishable from the naive
    form — packing output is a contract, sharding only a physical
    strategy."""
    docs = load_table(spark, SF_SMOKE, "documents")
    naive = {tuple(r) for r in _naive_pack(docs, BUDGET).collect()}
    got = {
        tuple(r)
        for r in packing.pack_documents(docs, BUDGET, shard_rows=32).collect()
    }
    assert got == naive

    chunks = packing.chunk_documents(docs, 32)
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id", "chunk_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    naive_c = {
        tuple(r)
        for r in chunks.withColumn(
            "bin_id",
            F.floor((F.sum("n_tok").over(w) - F.col("n_tok")) / BUDGET),
        ).collect()
    }
    got_c = {
        tuple(r)
        for r in packing.pack_chunks(chunks, BUDGET, shard_rows=32).collect()
    }
    assert got_c == naive_c


def test_null_doc_id_keeps_position(spark):
    """A NULL doc_id must survive the sub-sharded path in the same
    position the naive window gives it (Spark NULLS FIRST): the NULL
    lands in the dedicated smallest shard, and the offsets join key is
    the non-null sentinel, so the row can never be dropped."""
    df = spark.createDataFrame(
        [(None, "s", "a b c"), (1, "s", "d e"), (2, "s", "f")],
        "doc_id long, source string, text string",
    )
    got = {tuple(r) for r in packing.pack_documents(df, 4).collect()}
    want = {tuple(r) for r in _naive_pack(df, 4).collect()}
    assert got == want
    assert len(got) == 3


def test_null_source_rows_survive(spark):
    """Regression (review-confirmed data loss): the offsets join must
    be null-safe on source — NULL-source docs form a regular window
    partition in the naive form and must pack identically here."""
    df = spark.createDataFrame(
        [(1, None, "a b c"), (2, None, "d e"), (3, "s", "f")],
        "doc_id long, source string, text string",
    )
    got = {tuple(r) for r in packing.pack_documents(df, 4).collect()}
    want = {tuple(r) for r in _naive_pack(df, 4).collect()}
    assert got == want
    assert len(got) == 3
