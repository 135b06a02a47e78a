"""Benchmark decontamination — n-gram overlap between a training
corpus and a held-out evaluation set (no reference counterpart; the
standard LLM-pipeline hygiene pass described in public training
reports: flag training documents sharing word n-grams with the
benchmark so they can be dropped or audited).

Scale shape: the eval side is a BENCHMARK — thousands of documents,
not billions — so its distinct n-gram set is broadcast and the whole
check is a map-side semi-join over the training corpus: one pass,
zero shuffle of the (huge) training side before the per-doc
aggregate. The corpus side never materializes an n-gram index; each
document's distinct n-grams are exploded, probed against the
broadcast set, and folded back to one row per document. At 100 TB of
training data the plan is unchanged; only if the eval set itself
outgrew the broadcast threshold (~GBs of n-grams) would the join
degrade to a shuffled semi-join, which ``contamination()`` leaves to
AQE by expressing the probe declaratively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import shingles_col, shingles_sql, tokens_col, tokens_sql

#: Word n-gram order for the overlap check (8-13 in public reports;
#: 5 here because the synthetic docs are ~50 words).
NGRAM_N = 5
#: A doc with >= this fraction of its distinct n-grams in the eval
#: set is flagged contaminated.
THRESHOLD = 0.2


def contamination(
    train: DataFrame,
    eval_docs: DataFrame,
    n: int = NGRAM_N,
    threshold: float = THRESHOLD,
) -> DataFrame:
    """Per-training-document overlap with the eval set's n-gram set:
    ``(doc_id, n_ngrams, n_contaminated, contam_frac, contaminated)``.
    Both inputs need (doc_id, text). Documents too short to have any
    n-gram report 0/0 → frac 0.0, not contaminated."""
    ngrams = lambda df: df.select(  # noqa: E731
        "doc_id",
        F.explode(
            F.array_distinct(shingles_col(tokens_col(F.col("text")), n))
        ).alias("ng"),
    )
    eval_set = ngrams(eval_docs).select("ng").distinct()
    probed = (
        ngrams(train)
        .join(F.broadcast(eval_set.withColumn("_hit", F.lit(1))), "ng", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.count("_hit").alias("n_contaminated"),
        )
    )
    return (
        train.select("doc_id")
        .join(probed, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_ngrams", F.lit(0)).alias("n_ngrams"),
            F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"),
        )
        .withColumn(
            "contam_frac",
            F.when(F.col("n_ngrams") == 0, F.lit(0.0)).otherwise(
                F.col("n_contaminated") / F.col("n_ngrams")
            ),
        )
        .withColumn("contaminated", F.col("contam_frac") >= F.lit(threshold))
    )


def contamination_sql(
    train_sql: str,
    eval_sql: str,
    n: int = NGRAM_N,
    threshold: float = THRESHOLD,
) -> str:
    """DuckDB twin over the same (doc_id, text) relations."""
    ng = shingles_sql(tokens_sql("text"), n)
    return f"""
    with ev as (
      select distinct unnest(list_distinct({ng})) as ng
      from ({eval_sql})
    ),
    dn as (
      select doc_id, unnest(list_distinct({ng})) as ng
      from ({train_sql})
    ),
    agg as (
      select dn.doc_id,
             cast(count(*) as bigint) as n_ngrams,
             cast(count(ev.ng) as bigint) as n_contaminated
      from dn left join ev on dn.ng = ev.ng
      group by dn.doc_id
    )
    select t.doc_id,
           coalesce(agg.n_ngrams, 0) as n_ngrams,
           coalesce(agg.n_contaminated, 0) as n_contaminated,
           case when coalesce(agg.n_ngrams, 0) = 0 then 0.0
                else agg.n_contaminated / cast(agg.n_ngrams as double)
           end as contam_frac,
           (case when coalesce(agg.n_ngrams, 0) = 0 then 0.0
                 else agg.n_contaminated / cast(agg.n_ngrams as double)
            end) >= {threshold} as contaminated
    from ({train_sql}) t left join agg on t.doc_id = agg.doc_id
    """
