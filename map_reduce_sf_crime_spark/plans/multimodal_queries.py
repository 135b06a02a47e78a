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
    select f.*, 1 as paths_agree
    from ({multimodal.FEATURES_SQL}) f
    """,
    survey_ids=("MM1", "MM2"),
)
def multimodal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata (MM1, JVM-side) and mapInPandas feature
    extraction (MM2, deterministic fake decoder — codecs are stubbed
    in this environment, plumbing is real) in one entry. The two
    paths are joined on doc_id and ``paths_agree`` asserts the
    JVM-computed byte-count/checksum equals the Arrow-batch-computed
    one — a cross-path integrity check the oracle expects to be all
    ones."""
    docs = load_table(spark, sf_dir, "documents")
    meta = multimodal.with_payload(docs).select(
        "doc_id",
        F.col("n_bytes").cast("int").alias("meta_n_bytes"),
        F.col("checksum").alias("meta_checksum"),
    )
    feats = multimodal.extract_features(
        multimodal.with_payload(fan_out(docs))
    )
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
