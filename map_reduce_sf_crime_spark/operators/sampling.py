"""Deterministic stratified sampling — per-stratum keep rates applied
with the portable seeded hash, the corpus-mixture step of a training
pipeline ("90% of English, 25% of zh, 10% of everything else").

``kept`` is a pure function of ``(seed, doc_id)``: reproducible across
runs, engines, and cluster sizes — no RNG state, no partition
sensitivity (the classic failure of ``df.sample`` for corpus builds is
that it resamples differently per execution plan). A 100 TB scan
applies it as a codegen'd filter with zero shuffle; changing the
mixture is a metadata-only change.

No reference counterpart (SURVEY §2.11 SM1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import hash64_col, hash64_sql

#: per-mille keep rates by language stratum; default applies to any
#: stratum not listed (forward-compatible with new corpus languages)
MIXTURE_RATES = {"en": 900, "de": 500, "es": 500, "fr": 500, "zh": 250}
DEFAULT_RATE = 100
SAMPLE_SEED = "sample"


def _rate_col(rates: dict[str, int], default: int) -> Column:
    whens = [F.when(F.col("lang") == k, F.lit(v)) for k, v in rates.items()]
    return F.coalesce(*whens, F.lit(default))


def stratified_sample_flags(
    docs: DataFrame,
    rates: dict[str, int] = MIXTURE_RATES,
    default: int = DEFAULT_RATE,
    seed: str = SAMPLE_SEED,
) -> DataFrame:
    """Per-doc sampling decision: (doc_id, lang, kept)."""
    h = F.pmod(
        hash64_col(F.col("doc_id").cast("string"), seed=seed), F.lit(1000)
    )
    return docs.select(
        "doc_id",
        "lang",
        (h < _rate_col(rates, default)).cast("int").alias("kept"),
    )


def stratified_sample_sql(
    rates: dict[str, int] = MIXTURE_RATES,
    default: int = DEFAULT_RATE,
    seed: str = SAMPLE_SEED,
) -> str:
    cases = " ".join(f"when lang = '{k}' then {v}" for k, v in rates.items())
    h = hash64_sql("doc_id::varchar", seed=seed)
    return f"""
    select doc_id, lang,
           cast(({h} % 1000) < (case {cases} else {default} end) as int)
             as kept
    from documents
    """
