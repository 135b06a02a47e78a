"""Multimodal plumbing queries (binary columns + Pandas-UDF features)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import multimodal
from ..sources.parquet import fan_out, load_table
from .registry import register


@register(
    "multimodal_meta",
    """
    select doc_id, octet_length(encode(text)) as n_bytes, md5(text) as checksum
    from documents
    """,
    survey_ids=("MM1",),
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over the opaque binary payload — JVM-side only."""
    docs = load_table(spark, sf_dir, "documents")
    return multimodal.with_payload(docs).select(
        "doc_id", F.col("n_bytes").cast("long").alias("n_bytes"), "checksum"
    )


@register("multimodal_features", multimodal.FEATURES_SQL, survey_ids=("MM2",))
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas feature extraction (deterministic fake decoder —
    codecs are stubbed in this environment, plumbing is real)."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    return multimodal.extract_features(multimodal.with_payload(docs))


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


@register("multimodal_resize", None, survey_ids=("MM3",))
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-in → binary-out resize stand-in (rows-only check: the
    oracle hash compare has no binary-column support; determinism is
    asserted in tests/test_multimodal.py)."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    return multimodal.resize_binary(multimodal.with_payload(docs))
