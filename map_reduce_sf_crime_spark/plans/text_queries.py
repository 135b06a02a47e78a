"""Text-analysis queries over ``documents`` (north-star operators)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import contamination as contam
from ..operators import sampling, termstats, textops
from ..sources.parquet import fan_out, load_table
from .registry import register


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # token/regex expressions are CPU-bound per row — spread scan work
    return fan_out(load_table(spark, sf_dir, "documents"))


#: Deterministic stand-in benchmark: every 23rd doc_id is the "eval
#: set", the rest are the training corpus being decontaminated.
_EVAL_MOD = 23
_EVAL_SQL = f"select doc_id, text from documents where doc_id % {_EVAL_MOD} = 0"
_TRAIN_SQL = f"select doc_id, text from documents where doc_id % {_EVAL_MOD} != 0"


@register(
    "contamination_check",
    contam.contamination_sql(_TRAIN_SQL, _EVAL_SQL),
    survey_ids=("CT1",),
)
def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (operators/contamination.py): per
    training document, the fraction of its distinct word 5-grams that
    appear anywhere in the (broadcast) eval set's n-gram set, plus
    the drop/audit flag. Eval membership is a deterministic doc_id
    rule so the oracle partitions identically."""
    docs = _docs(spark, sf_dir)
    is_eval = (F.col("doc_id") % _EVAL_MOD) == 0
    return contam.contamination(
        docs.filter(~is_eval).select("doc_id", "text"),
        docs.filter(is_eval).select("doc_id", "text"),
    )


@register(
    "text_profile",
    f"""
    with ts as ({textops.TOKEN_STATS_SQL}),
         q as ({textops.quality_scores_sql()}),
         l as ({textops.LANG_ID_SQL}),
         p as ({textops.pii_scrub_sql()}),
         r as ({textops.repetition_stats_sql()}),
         uc as ({termstats.unigram_commonness_sql(min_df=50)}),
         ds as ({sampling.dsir_scores_sql()}),
         dk as ({sampling.dsir_flags_sql("select * from ds")})
    select ts.doc_id, ts.n_chars, ts.n_tokens, ts.n_bpe_tokens,
           ts.n_unique_tokens,
           q.stopword_ratio, q.punct_ratio, q.unique_ratio, q.quality,
           l.lang_pred, l.lang_label, l.agree,
           p.n_email, p.n_phone, p.n_ssn, p.redacted_md5,
           r.n_bigrams, r.top_bigram_ratio,
           uc.mean_tf_ppm, uc.oov_frac,
           dk.dsir_score_unat, dk.dsir_kept
    from ts
    join q using (doc_id)
    join l using (doc_id)
    join p using (doc_id)
    join r using (doc_id)
    join uc using (doc_id)
    join dk using (doc_id)
    """,
    survey_ids=("TX1", "TX2", "TX3", "TX5", "TX6", "TF2", "SM3"),
)
def text_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document text analysis in one entry: whitespace/BPE-ish
    token counts (TX1), heuristic quality score from length /
    punctuation / stopword / repetition ratios (TX2),
    stopword-profile language ID with agreement flag (TX3), and the
    PII redaction pass — per-class match counts plus the md5 of the
    redacted text (TX5, actual-redaction behavior unit-tested with
    planted PII in tests/test_text_functions.py), and intra-document
    repetition (TX6, the Gopher/C4 "repetitious text" signal: share
    of all word bigrams taken by the most frequent one). The
    row-local analyses are one zero-shuffle projection over one scan
    (operators/textops.py::text_profile); the DuckDB oracle keeps
    the per-analysis joined form — identical values, independently
    derived. Round 5 adds the CORPUS-ADAPTIVE commonness/OOV score
    (TF2, operators/termstats.unigram_commonness — mean collection
    frequency + below-min-df occurrence mass per doc, the model-free
    stand-in for a perplexity filter), joined back on doc_id; unlike
    the row-local columns it reads a corpus-global vocabulary, so
    the entry now also gate-checks the Zipfian-key join shape
    (repeat occurrences collapsed before the join, AQE skew-split's
    case).

    The ``dsir_score_unat``/``dsir_kept`` columns (round 5, SM3) are
    DSIR-style importance resampling (operators/sampling.dsir_scores
    — Xie et al. 2023): per-doc hashed-n-gram log-likelihood ratio
    against the stored-``lang='en'`` target slice, quantized to
    integer micro-nats per BUCKET so the per-doc sums are exact
    integers on both engines, and the top-1/5 keep flag via the
    fractional two-phase cap (constant group — no global window, no
    driver count job). The profile frame is the scorer's spine
    (base=), so the whole entry still carries exactly one
    doc_id-keyed join per corpus-global leg."""
    docs = _docs(spark, sf_dir)
    # min_df sized to the synthetic corpus's 31-token vocabulary
    # (min df 25 of 500 docs): the production default of 2 makes
    # oov_frac identically zero here, i.e. a dead gate column.
    # The row-local profile IS the spine (base=); round 6 fuses the
    # TF2 commonness and SM3 DSIR legs into ONE tokenize/explode +
    # ONE doc-keyed aggregate + ONE spine join
    # (sampling.commonness_dsir_scores — bit-equal to the unfused
    # composition, pytest-pinned), where the round-5 form paid two of
    # each on the same corpus.
    scored = sampling.commonness_dsir_scores(
        docs,
        target=F.col("lang") == F.lit("en"),
        min_df=50,
        base=textops.text_profile(docs),
    ).drop("n_toks")
    carry = tuple(
        c for c in scored.columns if c not in ("doc_id", "dsir_score_unat")
    )
    return sampling.dsir_flags(scored, carry=carry)
