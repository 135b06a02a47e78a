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
    # EOW is a newline (whitespace, collision-proof) — map it to a
    # visible marker so the re-joined stream is whitespace-tokenizable
    # with one symbol per BPE token
    enc = bpe.bpe_encode(docs, merges).select(
        "doc_id",
        "source",
        F.array_join(
            F.transform(
                "bpe_tokens",
                lambda s: F.replace(s, F.lit(bpe.EOW), F.lit("¶")),
            ),
            " ",
        ).alias("text"),
    )
    from map_reduce_sf_crime_spark.operators import packing

    chunks = packing.chunk_documents(enc, 16)
    per_doc = chunks.groupBy("doc_id").agg(F.sum("n_tok").alias("s"))
    want = enc.select("doc_id", F.size(F.split("text", " ")).alias("w"))
    assert per_doc.join(want, "doc_id").filter(
        F.col("s") != F.col("w")
    ).count() == 0


def test_bpe_model_ids_are_stable_and_unk_safe(spark):
    docs = _paper_fixture(spark)
    model = bpe.train_bpe_model(docs, n_merges=5)
    assert model.vocab[0] == bpe.UNK
    assert model.merges == tuple(bpe.train_bpe(docs, n_merges=5))
    # string and id encodings correspond symbol-for-symbol via vocab
    probe = spark.createDataFrame(
        [(0, "lowest"), (1, "ωe")], "doc_id long, text string"
    )
    toks = {r.doc_id: r.bpe_tokens for r in bpe.bpe_encode(probe, model.merges).collect()}
    ids = {r.doc_id: r.token_ids for r in bpe.bpe_encode_ids(probe, model).collect()}
    lookup = model.ids()
    assert ids[0] == [lookup[s] for s in toks[0]]
    # the greek char is outside the training alphabet -> UNK id 0,
    # while in-alphabet symbols keep their real ids
    assert ids[1][0] == 0 and 0 not in ids[0]


def test_bpe_ids_feed_trainer_shards(spark, tmp_path):
    """The full trainer-ready chain: learned ids -> deterministic
    shuffle order -> physical shard export -> verified read-back."""
    import glob
    import os

    import pyarrow.parquet as pq

    from map_reduce_sf_crime_spark.operators import export, sampling

    docs = load_table(spark, SF_SMOKE, "documents").limit(200)
    model = bpe.train_bpe_model(docs, n_merges=40)
    ids = bpe.bpe_encode_ids(docs, model).select("doc_id", "token_ids")
    ordered = sampling.with_global_shuffle_pos(ids)
    out = str(tmp_path / "shards")
    export.write_training_shards(ordered, out, 4, "shuffle_pos")
    manifest = export.verify_training_shards(spark, out, "shuffle_pos")
    assert manifest.count() == 4
    seen = 0
    for k in range(4):
        f = glob.glob(os.path.join(out, f"shard_id={k}", "*.parquet"))
        assert len(f) == 1
        t = pq.read_table(f[0])
        arrs = t.column("token_ids").to_pylist()
        assert all(a is not None and len(a) > 0 for a in arrs)
        vmax = len(model.vocab)
        assert all(0 <= i < vmax for a in arrs for i in a)
        seen += len(arrs)
    assert seen == 200


def test_bpe_tokenizer_matches_corpus_whitespace_class(spark):
    """Regression: Python's bare str.split() also splits on Unicode
    whitespace (NBSP...) where the corpus tokenizer's Java \\s+ does
    not — training and encoding must see the SAME words."""
    text = "foo bar foo bar baz"
    docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
    merges = bpe.train_bpe(docs, n_merges=10)
    enc = bpe.bpe_encode(docs, merges)
    rt = enc.select(
        bpe.detokenize_col(F.col("bpe_tokens")).alias("rt"),
        F.array_join(tokens_col(F.col("text")), " ").alias("want"),
        F.size(
            F.filter("bpe_tokens", lambda s: s.endswith(bpe.EOW))
        ).alias("n_words"),
    ).collect()[0]
    # round-trip reproduces the corpus tokenizer's view: 3 words, the
    # NBSP word intact (not split into 'foo' and 'bar')
    assert rt.rt == rt.want
    assert rt.n_words == 3


def test_bpe_eow_marker_cannot_collide_with_text(spark):
    """EOW is whitespace, so no token can contain it — text bearing
    the PAPER's literal '</w>' marker round-trips unharmed."""
    docs = spark.createDataFrame(
        [(0, "a</w>b a</w>b x</w> x</w>")], "doc_id long, text string"
    )
    merges = bpe.train_bpe(docs, n_merges=20)
    out = bpe.bpe_encode(docs, merges).select(
        bpe.detokenize_col(F.col("bpe_tokens")).alias("rt")
    ).collect()[0]
    assert out.rt == "a</w>b a</w>b x</w> x</w>"
