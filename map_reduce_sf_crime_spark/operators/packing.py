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


def chunk_documents(
    docs: DataFrame, chunk_tokens: int, overlap: int = 0
) -> DataFrame:
    """Token-window chunking (CH1): split each document into windows
    of ``chunk_tokens`` tokens with ``overlap`` tokens shared between
    consecutive windows — the step that turns variable-length
    documents into model-sized pieces before packing. Documents are
    never merged here (that's packing) and windows are per-document,
    so the explode is row-local: a 100 TB scan chunks with zero
    shuffle. Empty documents emit one zero-token chunk so every doc
    stays represented downstream.

    Returns (doc_id, chunk_id, source, n_tok) where n_tok counts the
    tokens in the chunk (the final window may be short)."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    sized = docs.select(
        "doc_id",
        "source",
        F.size(tokens_col(F.col("text"))).alias("doc_tok"),
    )
    # windows covering doc_tok tokens at this stride:
    # max(ceil((doc_tok - overlap) / stride), 1)
    n_chunks = F.greatest(
        F.ceil((F.col("doc_tok") - overlap) / stride), F.lit(1)
    )
    return (
        sized.withColumn(
            "chunk_id",
            F.explode(F.sequence(F.lit(0), (n_chunks - 1).cast("int"))),
        )
        .withColumn(
            "n_tok",
            F.least(
                F.lit(chunk_tokens),
                F.col("doc_tok") - F.col("chunk_id") * stride,
            ).cast("int"),
        )
        .select("doc_id", "chunk_id", "source", "n_tok")
    )


def pack_chunks(chunks: DataFrame, budget: int) -> DataFrame:
    """Packing assignment at chunk granularity: same running-total
    discipline as :func:`pack_documents`, ordered by
    (doc_id, chunk_id) within each source so a document's chunks stay
    contiguous in the packed sequence stream."""
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id", "chunk_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return chunks.withColumn(
        "bin_id",
        F.floor((F.sum("n_tok").over(w) - F.col("n_tok")) / budget),
    )


def chunk_pack_sql(chunk_tokens: int, budget: int) -> str:
    """DuckDB twin of ``pack_chunks(chunk_documents(docs))`` with
    overlap=0 (the registry configuration)."""
    return f"""
    with sized as (
      select doc_id, source, len({tokens_sql('text')}) as doc_tok
      from documents
    ),
    c as (
      select doc_id, source, doc_tok,
             unnest(generate_series(0,
               cast(greatest(ceil(doc_tok * 1.0 / {chunk_tokens}), 1)
                    as bigint) - 1)) as chunk_id
      from sized
    ),
    chunks as (
      select doc_id, cast(chunk_id as int) as chunk_id, source,
             cast(least({chunk_tokens},
                        doc_tok - chunk_id * {chunk_tokens}) as int)
               as n_tok
      from c
    )
    select doc_id, chunk_id, source, n_tok,
           cast(floor((sum(n_tok) over (partition by source
                 order by doc_id, chunk_id
                 rows between unbounded preceding and current row)
                 - n_tok) * 1.0 / {budget}) as bigint) as bin_id
    from chunks
    """


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
