"""Corpus-global term statistics — document frequency and collection
term frequency per token, the discovery pass behind boilerplate
removal, stopword induction, and IDF weighting in corpus prep.

Shape at scale: explode → groupBy(token) is the canonical wordcount —
map-side partial aggregation means the shuffle carries one partial
row per (task, token), and hot tokens (the exact ones this query
exists to find) are absorbed by the combiner, not shuffled row-by-row.
The top-k is an ``orderBy(...).limit(k)`` — Spark plans TakeOrdered
(per-partition heap + driver merge of k-row heads), never a global
sort. Deterministic tie-break on the token itself.

No reference counterpart (SURVEY §2.11 TF1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens_col, tokens_sql


def token_doc_freq(docs: DataFrame, top_k: int = 50) -> DataFrame:
    """Top-``top_k`` tokens by document frequency:
    (token, df, tf, df_ppm) — df = #docs containing it, tf = total
    count, df_ppm = documents-per-million containing it.

    ``df_ppm`` is the IDF input in IEEE-exact integer form:
    idf = ln(1e6 / df_ppm) is derivable downstream, but ``ln`` itself
    is NOT emitted because transcendental libm results differ in the
    last ulp between the JVM and DuckDB (measured: 477/500 of the
    values in this corpus's df range) — floor of a product/quotient of
    small integers is correctly-rounded IEEE arithmetic on both
    engines, so it hash-matches. Same discipline as the QZ1
    quantization (operators/quantize.py).

    The corpus total rides in as a broadcast one-row cross join —
    one plan, no driver round-trip."""
    tok = docs.select(
        "doc_id", F.explode(tokens_col(F.col("text"))).alias("token")
    )
    stats = tok.groupBy("token").agg(
        F.countDistinct("doc_id").alias("df"),
        F.count(F.lit(1)).alias("tf"),
    )
    total = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        stats.crossJoin(F.broadcast(total))
        .withColumn(
            "df_ppm",
            F.floor(F.col("df") * 1000000.0 / F.col("n_docs")).cast("long"),
        )
        .drop("n_docs")
        .orderBy(F.desc("df"), F.desc("tf"), F.asc("token"))
        .limit(top_k)
    )


def unigram_commonness(docs: DataFrame, min_df: int = 2) -> DataFrame:
    """Corpus-adaptive document quality score — the APPLICATION of the
    TF1 term statistics: score each document by how "common" its
    tokens are in this corpus (the cheap, model-free stand-in for the
    CCNet-style LM-perplexity filter: gibberish and OCR noise score
    low, boilerplate scores very high, both tails are filter
    candidates). Per doc:

    - ``n_toks`` — token count;
    - ``mean_tf_ppm`` — mean corpus collection-frequency (ppm) of its
      tokens (occurrence-weighted): high = built from frequent
      tokens;
    - ``oov_frac`` — fraction of token occurrences whose document
      frequency is below ``min_df`` (corpus-derived out-of-vocabulary
      mass: near-1 = tokens that appear nowhere else).

    Both ratios divide exact integer sums, so the values are
    IEEE-identical on any engine (the same discipline as ``df_ppm`` —
    no transcendental ``ln`` in the output; idf-style log-weighting is
    derivable downstream).

    Scale shape: the per-(doc, token) count collapses repeats BEFORE
    the vocabulary join, so a hot token ("the") joins once per
    CONTAINING DOC, never once per occurrence, and the join's build
    side carries one row per distinct token. Zipfian join keys are
    exactly what AQE skew-split handles (enabled in session.py); the
    final aggregate is map-side combined on doc_id. Empty/token-less
    docs are preserved with zeroed stats via the left join back."""
    from ..functions.caching import plan_cache

    tok = docs.select(
        "doc_id", F.explode(tokens_col(F.col("text"))).alias("token")
    )
    # both the vocabulary and the per-doc aggregate read dt, and both
    # the ppm projection and the corpus total read stats — cache each
    # so the corpus is tokenized once, not once per consumer
    dt = tok.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).alias("k")
    ).transform(plan_cache)
    stats = dt.groupBy("token").agg(
        F.sum("k").alias("tf"), F.count(F.lit(1)).alias("df")
    ).transform(plan_cache)
    total = stats.agg(F.sum("tf").alias("total_tf"))
    vocab = stats.crossJoin(F.broadcast(total)).select(
        "token",
        F.floor(F.col("tf") * 1000000.0 / F.col("total_tf"))
        .cast("long")
        .alias("tf_ppm"),
        "df",
    )
    per_doc = (
        dt.join(vocab, "token")
        .groupBy("doc_id")
        .agg(
            F.sum("k").alias("n_toks"),
            F.round(
                F.sum(F.col("k") * F.col("tf_ppm")) / F.sum("k"), 6
            ).alias("mean_tf_ppm"),
            F.round(
                F.sum(
                    F.when(F.col("df") < min_df, F.col("k")).otherwise(0)
                )
                / F.sum("k"),
                6,
            ).alias("oov_frac"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_toks", F.lit(0)).cast("long").alias("n_toks"),
            F.coalesce("mean_tf_ppm", F.lit(0.0)).alias("mean_tf_ppm"),
            F.coalesce("oov_frac", F.lit(0.0)).alias("oov_frac"),
        )
    )


def unigram_commonness_sql(min_df: int = 2) -> str:
    """DuckDB twin of :func:`unigram_commonness`."""
    return f"""
    with tok as (
      select doc_id, unnest({tokens_sql('text')}) as token
      from documents
    ),
    dt as (
      select doc_id, token, count(*) as k from tok group by doc_id, token
    ),
    stats as (
      select token, sum(k) as tf, count(*) as df from dt group by token
    ),
    vocab as (
      select token,
             cast(floor(tf * 1000000.0 / (select sum(tf) from stats))
                  as bigint) as tf_ppm,
             df
      from stats
    ),
    per_doc as (
      select dt.doc_id,
             sum(k) as n_toks,
             round(sum(k * tf_ppm) * 1.0 / sum(k), 6) as mean_tf_ppm,
             round(sum(case when df < {min_df} then k else 0 end) * 1.0
                   / sum(k), 6) as oov_frac
      from dt join vocab using (token)
      group by dt.doc_id
    )
    select d.doc_id,
           cast(coalesce(p.n_toks, 0) as bigint) as n_toks,
           coalesce(p.mean_tf_ppm, 0.0) as mean_tf_ppm,
           coalesce(p.oov_frac, 0.0) as oov_frac
    from documents d left join per_doc p using (doc_id)
    """


def token_doc_freq_sql(top_k: int = 50) -> str:
    return f"""
    with tok as (
      select doc_id, unnest({tokens_sql('text')}) as token
      from documents
    )
    select token, count(distinct doc_id) as df, count(*) as tf,
           cast(floor(count(distinct doc_id) * 1000000.0
                / (select count(*) from documents)) as bigint) as df_ppm
    from tok
    group by token
    order by df desc, tf desc, token asc
    limit {top_k}
    """
