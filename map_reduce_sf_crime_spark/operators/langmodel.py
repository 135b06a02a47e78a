"""Bigram language-model perplexity scoring — the CCNet-shaped
quality filter itself (Wenzek et al. 2020 score documents with a
target-domain LM and keep the low-perplexity tail; TF2's commonness
score is the model-FREE stand-in, this is the model): train a bigram
LM with stupid backoff (Brants et al. 2007, public — the standard
web-scale smoothing: no discount bookkeeping, one backoff constant)
on a trusted TARGET slice, score every document by its total token
log-likelihood.

    S(w2 | w1) = c2(w1 w2) / c1(w1)            if the bigram was seen
               = 0.4 · (c1(w2) + 1) / (R + V)   otherwise (backoff to
                                                the add-one unigram)
    doc score  = Σ_transitions ln S             (higher = more fluent
                                                under the target LM)

Cross-engine exactness (the df_ppm/DSIR/BM25 discipline): ``ln`` is
quantized ONCE per SEEN BIGRAM and once per vocabulary unigram to
integer micro-nats — the float risk is confined to (pair-vocabulary +
vocabulary + 1) floor(ln) calls per corpus, each fed an identically-
computed correctly-rounded double — and every per-document score is
an EXACT INTEGER sum of quantized weights, order-free.

Scale shape:

- training aggregates are vocabulary-sized (unigrams) and
  pair-vocabulary-sized (bigrams) — map-side combined wordcounts,
  hot pairs absorbed by the combiner;
- per-(doc, bigram) transition counts collapse repeats BEFORE any
  join (the house TF2 pattern — a hot bigram joins once per
  containing doc);
- the unigram/backoff weight table broadcasts; the bigram weight
  join is pair-keyed — Zipfian, exactly AQE skew-split's case (the
  session enables it), and the build side is the pair VOCABULARY,
  never the corpus;
- corpus totals (R, V, the OOV constant) ride a broadcast one-row
  cross join. No driver-side collect anywhere.

No reference counterpart (SURVEY §2.11 QL1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.caching import plan_cache
from ..functions.text import shingles_col, shingles_sql, tokens_col, tokens_sql

#: stupid backoff's single constant (Brants et al. use 0.4; it is a
#: heuristic weight, not a normalized probability). Parses to the
#: identical IEEE double on both engines.
BACKOFF = 0.4


def _pairs_col(text: Column) -> Column:
    """Adjacent-token transition strings "w1 w2" (tokens cannot
    contain whitespace by construction, so the joined string IS the
    pair key), NULL-proofed to an empty list like DSIR's grams."""
    tok = tokens_col(text)
    empty = F.array().cast("array<string>")
    return F.coalesce(shingles_col(tok, 2), empty)


def bigram_lm_scores(
    docs: DataFrame,
    target: Column | None = None,
    base: DataFrame | None = None,
) -> DataFrame:
    """Per-document stupid-backoff bigram log-likelihood under the
    ``target``-slice LM: ``(…, lm_n_trans, lm_logp_unat)`` — the
    micro-nat integer sum described in the module docstring (more
    negative per transition = less fluent; divide by ``lm_n_trans``
    downstream for a length-normalized per-token score, the exact
    analog of perplexity). ``target`` defaults to the whole corpus
    (self-scoring); docs with <2 tokens score (0, 0). A target slice
    with NO tokens makes the OOV constant's ``1/(R+V)`` divide by
    zero, which ANSI mode (Spark 4's default) raises LOUDLY at
    execution — a junk LM can't silently score everything zero
    (pytest-pinned). ``base``: spine contract as
    unigram_commonness/dsir_scores."""
    tgt = F.coalesce(target, F.lit(False)) if target is not None else F.lit(True)
    train = docs.filter(tgt)
    uni = (
        train.select(F.explode(tokens_col(F.col("text"))).alias("_w"))
        .groupBy("_w")
        .agg(F.count(F.lit(1)).alias("_c1"))
        .transform(plan_cache)
    )
    totals = uni.agg(
        F.coalesce(F.sum("_c1"), F.lit(0)).alias("_R"),
        F.count(F.lit(1)).alias("_V"),
    )
    big = (
        train.select(F.explode(_pairs_col(F.col("text"))).alias("_p"))
        .groupBy("_p")
        .agg(F.count(F.lit(1)).alias("_c2"))
    )
    # seen-bigram weights: ln(c2 / c1(w1)), one division, quantized
    w1 = F.split(F.col("_p"), " ").getItem(0)
    pair_w = big.withColumn("_w", w1).join(uni, "_w").select(
        "_p",
        F.floor(
            F.lit(1000000.0)
            * F.log(F.col("_c2").cast("double") / F.col("_c1").cast("double"))
        )
        .cast("long")
        .alias("_lp2"),
    )
    # backoff weights: ln(0.4 · (c1(w2)+1) / (R+V)), vocabulary-sized
    uni_w = uni.crossJoin(F.broadcast(totals)).select(
        F.col("_w").alias("_w2"),
        F.floor(
            F.lit(1000000.0)
            * F.log(
                F.lit(BACKOFF)
                * (
                    (F.col("_c1") + 1).cast("double")
                    / (F.col("_R") + F.col("_V")).cast("double")
                )
            )
        )
        .cast("long")
        .alias("_lp1"),
    )
    # OOV constant: ln(0.4 · 1 / (R+V)) — rides the totals row
    oov = totals.select(
        F.floor(
            F.lit(1000000.0)
            * F.log(
                F.lit(BACKOFF)
                * (
                    F.lit(1).cast("double")
                    / (F.col("_R") + F.col("_V")).cast("double")
                )
            )
        )
        .cast("long")
        .alias("_lp0")
    )
    # per-(doc, bigram) transition counts, collapsed before the joins
    dt = (
        docs.select(
            "doc_id", F.explode(_pairs_col(F.col("text"))).alias("_p")
        )
        .groupBy("doc_id", "_p")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    lp = F.coalesce(F.col("_lp2"), F.col("_lp1"), F.col("_lp0"))
    # uni_w is NOT hint-broadcast: it is vocabulary-sized, and a
    # web-corpus vocabulary can exceed the broadcast limit — a forced
    # hint would fail the whole job there. AQE broadcasts it anyway
    # whenever it measures small (the sf-scale case), and falls back
    # to a shuffled join when it doesn't — exactly the right behavior
    # at both scales.
    scored = (
        dt.join(pair_w, "_p", "left")
        .withColumn("_w2", F.split(F.col("_p"), " ").getItem(1))
        .join(uni_w, "_w2", "left")
        .crossJoin(F.broadcast(oov))
        .groupBy("doc_id")
        .agg(
            F.sum("_c").alias("lm_n_trans"),
            F.sum(F.col("_c") * lp).alias("lm_logp_unat"),
        )
    )
    spine = docs.select("doc_id") if base is None else base
    joined = spine.join(scored, "doc_id", "left")
    # a join MISS means "no transitions" -> (0, 0); a HIT with a NULL
    # score (empty target slice) must stay NULL, so only the count
    # column's (pre-fill) nullity drives BOTH fills — one select, so
    # the miss test can't see an already-coalesced count
    miss = F.col("lm_n_trans").isNull()
    return joined.select(
        *[c for c in joined.columns if c not in ("lm_n_trans", "lm_logp_unat")],
        F.coalesce(F.col("lm_n_trans"), F.lit(0)).cast("long").alias("lm_n_trans"),
        F.when(miss, F.lit(0))
        .otherwise(F.col("lm_logp_unat"))
        .cast("long")
        .alias("lm_logp_unat"),
    )


def bigram_lm_scores_sql(
    target_sql: str = "true", table: str = "documents"
) -> str:
    """DuckDB twin of :func:`bigram_lm_scores` — same counts, same
    quantization, same operation order, same miss-vs-NULL fill."""
    tok = tokens_sql("text")
    pairs = f"coalesce({shingles_sql(tok, 2)}, [])"
    return f"""
    with _lm_train as (
      select text from {table} where coalesce({target_sql}, false)
    ),
    _lm_uni as (
      select _w, cast(count(*) as bigint) as _c1
      from (select unnest({tok}) as _w from _lm_train) group by _w
    ),
    _lm_tot as (
      select cast(coalesce(sum(_c1), 0) as bigint) as _R,
             cast(count(*) as bigint) as _V
      from _lm_uni
    ),
    _lm_big as (
      select _p, cast(count(*) as bigint) as _c2
      from (select unnest({pairs}) as _p from _lm_train) group by _p
    ),
    _lm_pw as (
      select b._p,
             cast(floor(1000000.0 * ln(b._c2::double / u._c1::double))
                  as bigint) as _lp2
      from _lm_big b join _lm_uni u on string_split(b._p, ' ')[1] = u._w
    ),
    _lm_uw as (
      select _w as _w2,
             cast(floor(1000000.0 * ln({BACKOFF!r} *
               ((_c1 + 1)::double / (_R + _V)::double))) as bigint) as _lp1
      from _lm_uni cross join _lm_tot
    ),
    _lm_oov as (
      select cast(floor(1000000.0 * ln({BACKOFF!r} *
               (1::double / (_R + _V)::double))) as bigint) as _lp0
      from _lm_tot
    ),
    _lm_dt as (
      select doc_id, _p, cast(count(*) as bigint) as _c
      from (select doc_id, unnest({pairs}) as _p from {table})
      group by doc_id, _p
    ),
    _lm_s as (
      select dt.doc_id,
             cast(sum(dt._c) as bigint) as lm_n_trans,
             cast(sum(dt._c * coalesce(pw._lp2, uw._lp1, o._lp0)) as bigint)
               as lm_logp_unat
      from _lm_dt dt
      left join _lm_pw pw using (_p)
      left join _lm_uw uw on string_split(dt._p, ' ')[2] = uw._w2
      cross join _lm_oov o
      group by dt.doc_id
    )
    select d.doc_id,
           cast(coalesce(s.lm_n_trans, 0) as bigint) as lm_n_trans,
           cast(case when s.lm_n_trans is null then 0
                     else s.lm_logp_unat end as bigint) as lm_logp_unat
    from {table} d left join _lm_s s using (doc_id)
    """
