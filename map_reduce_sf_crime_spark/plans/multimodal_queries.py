"""Multimodal plumbing queries (binary columns + Pandas-UDF features)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import multimodal
from ..sources.parquet import fan_out, load_table
from .registry import register


@register(
    "multimodal_profile",
    f"""
    select f.*, 1 as paths_agree, dh.dhash
    from ({multimodal.FEATURES_SQL}) f
    join ({multimodal.dhash_sql()}) dh using (doc_id)
    """,
    survey_ids=("MM1", "MM2", "MM4"),
)
def multimodal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata (MM1, JVM-side) and mapInPandas feature
    extraction (MM2, deterministic fake decoder — codecs are stubbed
    in this environment, plumbing is real) in one entry. The two
    paths are joined on doc_id and ``paths_agree`` asserts the
    JVM-computed byte-count/checksum equals the Arrow-batch-computed
    one — a cross-path integrity check the oracle expects to be all
    ones.

    Round 6 promotes MM4 into the hard gate: the perceptual dHash
    (operators/multimodal.image_dhash — one Arrow-batched hashing
    pass over the fake-decoder grid) is hash-checked against a full
    SQL reimplementation of the same integer box-average + gradient-
    bit arithmetic (``dhash_sql``), bit for bit including the signed
    64-bit conversion — 500/500 distinct values on the fixture."""
    docs = load_table(spark, sf_dir, "documents")
    meta = multimodal.with_payload(docs).select(
        "doc_id",
        F.col("n_bytes").cast("int").alias("meta_n_bytes"),
        F.col("checksum").alias("meta_checksum"),
    )
    media = multimodal.with_payload(fan_out(docs))
    # r11: features + dhash in ONE Arrow pass (was extract_features ⋈
    # image_dhash — a second payload decode pass and a doc_id join;
    # guide §4.1/§4.2), numpy-vectorized batch math, bit-identical
    # (pinned in tests/test_multimodal.py::test_features_with_dhash_*)
    feats = multimodal.features_with_dhash(media)
    return feats.join(meta, "doc_id").select(
        "doc_id",
        "n_bytes",
        "checksum",
        "n_frames",
        "mean_byte",
        (
            (F.col("n_bytes") == F.col("meta_n_bytes"))
            & (F.col("checksum") == F.col("meta_checksum"))
        )
        .cast("int")
        .alias("paths_agree"),
        "dhash",
    )


@register(
    "multimodal_frame_sample",
    multimodal.sample_frames_sql(every_n=3),
    survey_ids=("MM3",),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling stage: 1 binary row → K sampled-frame rows
    through mapInPandas; frame checksums hash-match the oracle."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    return multimodal.sample_frames(multimodal.with_payload(docs), every_n=3)


@register("multimodal_resize", multimodal.resize_sql(), survey_ids=("MM3",))
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-in → binary-out resize stand-in. The operator emits the
    resized binary payload; the gate entry hashes it (md5) so the
    driver's string canonicalizer can compare it against the DuckDB
    character-stride twin — raw-binary determinism is additionally
    asserted in tests/test_multimodal.py."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    resized = multimodal.resize_binary(multimodal.with_payload(docs))
    return resized.select(
        "doc_id", F.md5("payload").alias("payload_md5"), "n_bytes"
    )
