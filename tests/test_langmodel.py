"""QL1 bigram-LM perplexity scoring: stupid-backoff semantics on a
controlled fixture and bit-equality with the DuckDB twin."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from map_reduce_sf_crime_spark.operators import langmodel
from map_reduce_sf_crime_spark.sources.parquet import load_table

from .conftest import SF_SMOKE


def _fixture(spark):
    rows = [
        # target slice: a consistent phrase distribution
        (0, "the quick brown fox jumps over the lazy dog", 1),
        (1, "the quick brown fox runs past the lazy dog", 1),
        (2, "the lazy dog watches the quick brown fox", 1),
        # scored only:
        (3, "the quick brown fox jumps over the lazy dog", 0),  # fluent
        (4, "dog lazy the over jumps fox brown quick the", 0),  # shuffled
        (5, "zqx wvk pplm qqrs blorp zzv", 0),                  # OOV junk
        (6, "fox dog", 0),  # seen unigrams, unseen bigram (backoff)
        (7, "single", 0),   # <2 tokens -> (0, 0)
        (8, "", 0),
        (9, None, 0),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, tgt int")


def test_bigram_lm_fluency_ordering(spark):
    docs = _fixture(spark)
    out = {
        r.doc_id: (r.lm_n_trans, r.lm_logp_unat)
        for r in langmodel.bigram_lm_scores(
            docs, target=F.col("tgt") == 1
        ).collect()
    }
    assert len(out) == 10
    # same length, same unigrams: fluent transitions beat shuffled ones
    assert out[3][0] == out[4][0] == 8
    assert out[3][1] > out[4][1]
    # per-transition: backoff over seen unigrams beats OOV junk
    mean6 = out[6][1] / out[6][0]
    mean5 = out[5][1] / out[5][0]
    assert mean6 > mean5
    # degenerate docs: no transitions -> exactly (0, 0)
    assert out[7] == (0, 0) and out[8] == (0, 0) and out[9] == (0, 0)
    # the fluent doc's transitions were all seen -> strictly better
    # per-transition than the backoff-only doc
    assert out[3][1] / out[3][0] > mean6


def test_bigram_lm_empty_target_fails_loudly(spark):
    """A target slice with no tokens must never silently score the
    corpus — ANSI mode turns the OOV constant's 1/(R+V) into a
    DIVIDE_BY_ZERO at execution."""
    import pytest

    docs = _fixture(spark)
    with pytest.raises(Exception, match="DIVIDE_BY_ZERO"):
        langmodel.bigram_lm_scores(docs, target=F.lit(False)).collect()


def test_bigram_lm_matches_duckdb_twin(spark):
    """Integer micro-nat scores are bit-identical to the DuckDB twin
    on the real documents table, LM trained on the lang='en' slice."""
    docs = load_table(spark, SF_SMOKE, "documents")
    got = {
        (r.doc_id, r.lm_n_trans, r.lm_logp_unat)
        for r in langmodel.bigram_lm_scores(
            docs, target=F.col("lang") == F.lit("en")
        ).collect()
    }
    con = duckdb.connect()
    con.sql(
        f"create view documents as select * from "
        f"read_parquet('{SF_SMOKE}/documents.parquet')"
    )
    want = {
        tuple(r)
        for r in con.sql(
            langmodel.bigram_lm_scores_sql("lang = 'en'")
        ).fetchall()
    }
    assert got == want
    # sanity: scoring did real work (negative log-likelihoods)
    assert sum(1 for _, n, s in got if n > 0 and s < 0) > 400


def test_bigram_lm_self_scoring_default_target(spark):
    """target=None trains on the whole corpus (self-scoring); every
    transition is then seen, so no doc should be backoff-dominated —
    all scores strictly better than an OOV-only estimate."""
    docs = _fixture(spark).filter(F.col("doc_id") <= 4)
    out = {
        r.doc_id: (r.lm_n_trans, r.lm_logp_unat)
        for r in langmodel.bigram_lm_scores(docs).collect()
    }
    assert all(n > 0 and s < 0 for n, s in out.values())
