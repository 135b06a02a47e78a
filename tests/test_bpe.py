"""TOK1 learned-BPE tokenizer: the canonical Sennrich fixture pins the
merge sequence and encoding closed-form; round-trip and cap guards on
the real corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from map_reduce_sf_crime_spark.operators import bpe
from map_reduce_sf_crime_spark.functions.text import tokens_col
from map_reduce_sf_crime_spark.sources.parquet import load_table

from .conftest import SF_SMOKE


def _paper_fixture(spark):
    """The BPE paper's worked example as documents: low×5, lower×2,
    newest×6, widest×3."""
    rows = [
        (0, "low low low low low"),
        (1, "lower lower"),
        (2, "newest newest newest newest newest newest"),
        (3, "widest widest widest"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_train_bpe_matches_paper_example(spark):
    merges = bpe.train_bpe(_paper_fixture(spark), n_merges=5)
    assert merges == [
        ("e", "s"),
        ("es", "t"),
        ("est", bpe.EOW),
        ("l", "o"),
        ("lo", "w"),
    ]


def test_bpe_encode_closed_form(spark):
    docs = _paper_fixture(spark)
    merges = bpe.train_bpe(docs, n_merges=5)
    out = bpe.bpe_encode(
        spark.createDataFrame(
            [(0, "lowest"), (1, "zq"), (2, None)],
            "doc_id long, text string",
        ),
        merges,
    )
    got = {r.doc_id: r.bpe_tokens for r in out.collect()}
    # the paper's classic result: unseen word segments into learned units
    assert got[0] == ["low", "est" + bpe.EOW]
    # fully OOV characters fall back to character symbols
    assert got[1] == ["z", "q", bpe.EOW]
    assert got[2] is None


def test_bpe_round_trips_the_real_corpus(spark):
    """detokenize(encode(text)) reproduces the whitespace-tokenizer's
    view of every document (ascii-folded, single-spaced)."""
    docs = load_table(spark, SF_SMOKE, "documents")
    merges = bpe.train_bpe(docs, n_merges=50)
    assert len(merges) == 50
    enc = bpe.bpe_encode(docs, merges)
    bad = enc.select(
        F.coalesce(bpe.detokenize_col(F.col("bpe_tokens")), F.lit("")).alias("rt"),
        F.coalesce(
            F.array_join(tokens_col(F.col("text")), " "), F.lit("")
        ).alias("want"),
        F.size("bpe_tokens").alias("n_bpe"),
        F.size(tokens_col(F.col("text"))).alias("n_words"),
    )
    assert bad.filter(F.col("rt") != F.col("want")).count() == 0
    # merges genuinely compress: fewer BPE tokens than characters,
    # at least as many as words
    stats = bad.agg(
        F.sum("n_bpe").alias("b"), F.sum("n_words").alias("w")
    ).collect()[0]
    assert stats.b >= stats.w > 0


def test_train_bpe_rejects_unbounded_collect(spark):
    docs = _paper_fixture(spark)
    with pytest.raises(ValueError, match="MAX_VOCAB_COLLECT"):
        bpe.train_bpe(docs, vocab_cap=bpe.MAX_VOCAB_COLLECT + 1)
    with pytest.raises(ValueError, match="n_merges"):
        bpe.train_bpe(docs, n_merges=-1)


def test_bpe_feeds_packing_pipeline(spark):
    """Composition: the learned tokens ride chunk_documents' schema
    (a doc's BPE sequence chunks like any token array)."""
    docs = load_table(spark, SF_SMOKE, "documents").limit(50)
    merges = bpe.train_bpe(docs, n_merges=30)
    enc = bpe.bpe_encode(docs, merges).select(
        "doc_id", "source", F.array_join("bpe_tokens", " ").alias("text")
    )
    from map_reduce_sf_crime_spark.operators import packing

    chunks = packing.chunk_documents(enc, 16)
    per_doc = chunks.groupBy("doc_id").agg(F.sum("n_tok").alias("s"))
    want = enc.select("doc_id", F.size(F.split("text", " ")).alias("w"))
    assert per_doc.join(want, "doc_id").filter(
        F.col("s") != F.col("w")
    ).count() == 0
