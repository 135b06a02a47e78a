"""Multimodal plumbing: schema, batch shapes, stubbed decoder gating."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from map_reduce_sf_crime_spark.operators import multimodal
from map_reduce_sf_crime_spark.sources.parquet import load_table

from .conftest import SF_SMOKE


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
