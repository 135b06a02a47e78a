"""Token-budget sequence packing — assign documents to fixed-budget
bins, the standard prep step before concatenating training corpora
into fixed-length model sequences.

Semantics: within each ``source`` (the natural sharding key of a
training corpus), documents are taken in deterministic ``doc_id``
order and assigned to bin ``floor(tokens_before_this_doc / budget)``
— contiguous running-total packing. Every bin except the last holds
at least ``budget`` tokens once its boundary is crossed; documents
are never split. This is the streaming-friendly packing discipline
(one pass, no bin lookback), not best-fit bin packing (NP-hard and
order-unstable — wrong for reproducible corpus builds).

Scale shape: one window partitioned on ``source`` — the shuffle key
is the corpus shard key, so packing parallelizes across shards. At
100 TB a single giant source would be sub-sharded first (e.g.
``source × crawl-date``); the window itself never sees more than one
shard's rows. No reference counterpart (SURVEY §2.11 PK1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens_col, tokens_sql


def pack_documents(docs: DataFrame, budget: int) -> DataFrame:
    """Per-doc packing assignment: (doc_id, source, n_tok, bin_id)."""
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sized = docs.select(
        "doc_id",
        "source",
        F.size(tokens_col(F.col("text"))).alias("n_tok"),
    )
    return sized.withColumn(
        "bin_id",
        F.floor((F.sum("n_tok").over(w) - F.col("n_tok")) / budget),
    )


def pack_documents_sql(budget: int) -> str:
    return f"""
    with t as (
      select doc_id, source, len({tokens_sql('text')}) as n_tok
      from documents
    )
    select doc_id, source, n_tok,
           cast(floor((sum(n_tok) over (partition by source order by doc_id
                 rows between unbounded preceding and current row)
                 - n_tok) * 1.0 / {budget}) as bigint) as bin_id
    from t
    """
