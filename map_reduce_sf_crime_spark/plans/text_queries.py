"""Text-analysis queries over ``documents`` (north-star operators)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import textops
from ..sources.parquet import fan_out, load_table
from .registry import register


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # token/regex expressions are CPU-bound per row — spread scan work
    return fan_out(load_table(spark, sf_dir, "documents"))


@register("text_token_stats", textops.TOKEN_STATS_SQL, survey_ids=("TX1",))
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.token_stats(_docs(spark, sf_dir))


@register("text_quality", textops.quality_scores_sql(), survey_ids=("TX2",))
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.quality_scores(_docs(spark, sf_dir))


@register("text_lang_id", textops.LANG_ID_SQL, survey_ids=("TX3",))
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.lang_id(_docs(spark, sf_dir))


@register(
    "text_fingerprints",
    # string-serialized: the driver's pandas canonicalizer cannot sort
    # array cells (round-1 gate error), so both sides emit CSV text
    f"select doc_id, array_to_string(fingerprint, ',') as fingerprint, "
    f"n_grams from ({textops.fingerprints_sql()})",
    survey_ids=("TX4",),
)
def text_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    fp = textops.fingerprints(_docs(spark, sf_dir))
    return fp.select(
        "doc_id",
        F.concat_ws(",", F.col("fingerprint").cast("array<string>")).alias(
            "fingerprint"
        ),
        "n_grams",
    )
