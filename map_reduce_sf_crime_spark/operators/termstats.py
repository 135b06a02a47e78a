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
