"""Multimodal plumbing: schema, batch shapes, stubbed decoder gating."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from map_reduce_sf_crime_spark.operators import multimodal
from map_reduce_sf_crime_spark.sources.parquet import load_table

from .conftest import SF_SMOKE


def _docs(spark):
    return load_table(spark, SF_SMOKE, "documents")


def test_payload_schema(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    media = multimodal.with_payload(docs)
    kinds = dict(media.dtypes)
    assert kinds["payload"] == "binary"
    assert kinds["n_bytes"] == "int"
    r = media.filter(F.col("doc_id") == 0).first()
    assert r.n_bytes == len(r.payload)


def test_real_decoder_is_gated(spark):
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x89PNG")


def test_feature_extraction_batches(spark):
    docs = load_table(spark, SF_SMOKE, "documents").limit(50)
    feats = multimodal.extract_features(multimodal.with_payload(docs))
    rows = feats.collect()
    assert len(rows) == 50
    assert feats.schema == multimodal.FEATURE_SCHEMA
    r = {x.doc_id: x for x in rows}
    docs_rows = {x.doc_id: x.text for x in docs.collect()}
    for did, row in list(r.items())[:5]:
        payload = docs_rows[did].encode()
        assert row.n_bytes == len(payload)
        assert row.n_frames == len(payload) // 100 + 1
        assert abs(row.mean_byte - round(sum(payload) / len(payload), 6)) < 1e-6


def test_frame_sampling_conservation(spark):
    """Every 3rd fixed-size frame is emitted: per doc, sampled frame
    count == ceil(ceil(n/100)/3), and frame 0 is always present."""
    from pyspark.sql import functions as F

    from map_reduce_sf_crime_spark.operators import multimodal

    media = multimodal.with_payload(_docs(spark))
    frames = multimodal.sample_frames(media, every_n=3)
    per_doc = frames.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("k"), F.min("frame_idx").alias("first")
    )
    joined = media.select("doc_id", "n_bytes").join(per_doc, "doc_id").collect()
    assert joined
    for r in joined:
        total = -(-r.n_bytes // 100)
        assert r.k == -(-total // 3)
        assert r.first == 0


def test_resize_deterministic_and_bounded(spark):
    from map_reduce_sf_crime_spark.operators import multimodal

    media = multimodal.with_payload(_docs(spark))
    a = {(r.doc_id, r.n_bytes, bytes(r.payload)) for r in
         multimodal.resize_binary(media, 256).collect()}
    b = {(r.doc_id, r.n_bytes, bytes(r.payload)) for r in
         multimodal.resize_binary(media, 256).collect()}
    assert a == b
    assert all(n <= 256 and n > 0 for _, n, _ in a)
