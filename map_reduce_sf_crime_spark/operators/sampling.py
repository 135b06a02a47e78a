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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import HEX_DIGITS, hash64_col, hash64_sql
from ..functions.caching import plan_cache

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
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """Per-doc sampling decision: (doc_id, lang, kept). ``carry``
    names extra input columns to pass through — a composed pipeline
    (corpus_sample) keeps its downstream inputs on the SAME projection
    instead of re-scanning the corpus and joining on doc_id later."""
    h = F.pmod(
        hash64_col(F.col("doc_id").cast("string"), seed=seed), F.lit(1000)
    )
    return docs.select(
        "doc_id",
        "lang",
        *carry,
        (h < _rate_col(rates, default)).cast("int").alias("kept"),
    )


def temperature_mix_weights(docs: DataFrame) -> DataFrame:
    """Temperature-balanced corpus mixture weights (UniMax-style,
    public) at temperature α=0.5: per-language weight ∝ √(corpus
    share), damping head languages and boosting the tail — the
    data-derived counterpart of MIXTURE_RATES' hand-set per-mille
    table. Returns (lang, mix_weight_ppm), weights summing to ≤1e6.

    α is fixed at 0.5 deliberately: √ is IEEE-correctly-rounded on
    every engine while ``pow``/``ln`` are not (they diverge in the
    last ulp between the JVM and DuckDB), and the cross-language
    total folds a lang-sorted list sequentially — the same
    fold-order discipline as the cosine kernel — so the oracle
    hash-matches bit-for-bit.

    Scale shape: one count-aggregate over the corpus (map-side
    combined, #languages rows out — cached, since both the total fold
    and the weight projection read it; without the cache the corpus
    would be scanned twice), a driver-free fold over that tiny
    aggregate, and a broadcast join back."""
    counts = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_lang")
    ).transform(plan_cache)
    # Fold order must match the oracle's sort exactly: a NULL lang
    # would sort FIRST in Spark's sort_array but LAST in DuckDB's
    # list(... order by lang), permuting the float summation and
    # potentially flipping floor() one ulp — so both engines fold over
    # the ''-coalesced key. The sort is TOTAL on both sides: Spark's
    # struct comparison falls through to n_lang, and the SQL orders by
    # (coalesce(lang,''), n_lang) — covering the corner where a NULL
    # and a literal-'' stratum coexist with different counts.
    tot = counts.agg(
        F.aggregate(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.coalesce(F.col("lang"), F.lit("")).alias("lang"),
                        "n_lang",
                    )
                )
            ),
            F.lit(0.0),
            lambda acc, s: acc + F.sqrt(s["n_lang"].cast("double")),
        ).alias("tot")
    )
    return counts.crossJoin(F.broadcast(tot)).select(
        "lang",
        F.floor(
            F.lit(1000000.0)
            * F.sqrt(F.col("n_lang").cast("double"))
            / F.col("tot")
        )
        .cast("long")
        .alias("mix_weight_ppm"),
    )


MIX_WEIGHT_SQL = """
with c as (select lang, count(*) as n_lang from documents group by lang),
t as (select list_sum(list_transform(
            list(n_lang order by coalesce(lang, ''), n_lang),
            x -> sqrt(x::double))) as tot from c)
select lang,
       cast(floor(1000000.0 * sqrt(n_lang::double) / t.tot) as bigint)
         as mix_weight_ppm
from c cross join t
"""


SHUFFLE_SEED = "shuffle"


def _default_buckets(df: DataFrame) -> int:
    """Next power of two ≥ 4× the cluster parallelism (floor 64):
    each bucket is one sort task, so the count follows the cluster,
    and because buckets are CONTIGUOUS hash ranges the emitted
    positions are identical for ANY power-of-two choice — sizing is
    a pure performance knob, not a semantics knob."""
    p = df.sparkSession.sparkContext.defaultParallelism * 4
    return max(64, 1 << (p - 1).bit_length())


def with_global_shuffle_pos(
    df: DataFrame,
    key: str = "doc_id",
    seed: str = SHUFFLE_SEED,
    buckets: int | None = None,
) -> DataFrame:
    """Append ``shuffle_pos``: the row's 0-based position in a
    deterministic pseudorandom global order (seeded-hash order,
    key-tiebroken) — the "shuffle the corpus into training order"
    operator, reproducible across runs, engines, and cluster sizes.

    A naive ``row_number() over (order by hash)`` is a SINGLE-PARTITION
    window — the whole corpus through one task. This is the scalable
    two-phase form of the same semantics:

    1. range-bucket each row by the hash's top bits (buckets are
       CONTIGUOUS hash ranges, so bucket order == hash order; the
       60-bit hash is uniform, so buckets are balanced — no sampled
       range boundaries needed),
    2. rank within each bucket (distributed window, one sort per
       bucket), and compute each bucket's global offset from the
       per-bucket counts — a ``buckets``-row aggregate whose own
       window is bounded by the bucket count, never by data size,
    3. broadcast-join the offsets back: pos = offset + local_rank - 1.

    Equivalent to zipWithIndex-after-sort without leaving the
    DataFrame API."""
    if buckets is None:
        buckets = _default_buckets(df)
    if buckets & (buckets - 1):
        raise ValueError("buckets must be a power of two")
    shift = HEX_DIGITS * 4 - buckets.bit_length() + 1
    # NULL-proof the hash input: md5(NULL) is NULL, which would give a
    # NULL bucket whose rows silently vanish through the offsets join
    # while the oracle's window keeps them. NULL keys coalesce to ''
    # (oracle twin does the same); rows sharing that sentinel get an
    # arbitrary-but-present relative order, same as in SQL.
    h = hash64_col(
        F.coalesce(F.col(key).cast("string"), F.lit("")), seed=seed
    )
    hashed = df.withColumn("_h", h).withColumn(
        "_bucket", F.shiftright(F.col("_h"), shift)
    )
    # Tie-break on the SAME NULL-coalesced string as the hash input:
    # Spark sorts NULLs first, DuckDB last, so ordering by the raw key
    # would give >1 NULL-key rows (all hashing the '' sentinel, hence
    # tied on _h) an engine-divergent relative order. CONTRACT: full
    # run-to-run/engine determinism requires distinct (hash, key)
    # pairs — i.e. unique keys; rows that tie on BOTH columns
    # (duplicate keys, >1 NULL key) occupy a deterministic contiguous
    # block of positions but their order within it is arbitrary (no
    # further column exists to totalize the sort). The positions
    # OUTSIDE the tied block are unaffected either way.
    local = F.row_number().over(
        Window.partitionBy("_bucket").orderBy(
            "_h", F.coalesce(F.col(key).cast("string"), F.lit(""))
        )
    )
    counts = hashed.groupBy("_bucket").agg(F.count(F.lit(1)).alias("_n"))
    offsets = counts.withColumn(
        "_off",
        F.coalesce(
            F.sum("_n").over(
                Window.orderBy("_bucket").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ),
    ).select("_bucket", "_off")
    return (
        hashed.withColumn("_r", local)
        .join(F.broadcast(offsets), "_bucket")
        .withColumn("shuffle_pos", (F.col("_off") + F.col("_r") - 1))
        .drop("_h", "_bucket", "_r", "_off")
    )


def global_shuffle_pos_sql(
    inner_sql: str, key: str = "doc_id", seed: str = SHUFFLE_SEED
) -> str:
    """DuckDB twin: the single-window form (fine for an oracle; the
    Spark side exists precisely because this shape doesn't scale)."""
    h = hash64_sql(f"coalesce({key}::varchar, '')", seed=seed)
    return f"""
    select *, row_number() over (order by {h}, coalesce({key}::varchar, ''))
              - 1 as shuffle_pos
    from ({inner_sql})
    """


#: Fixed-width score buckets for the two-phase per-group cap. Purely
#: a performance knob: the kept set is identical for any count (see
#: per_group_cap_flags), finer buckets just shrink each in-bucket
#: rank window.
CAP_BUCKETS = 256


def per_group_cap_flags(
    docs: DataFrame,
    cap: int,
    group_col: str = "source",
    score_col: str = "score",
    lo: float = 0.0,
    hi: float = 1.0,
    buckets: int = CAP_BUCKETS,
    carry: tuple[str, ...] = (),
    flag_name: str = "kept",
) -> DataFrame:
    """Per-group quota cap — "keep at most ``cap`` documents per
    source/domain, preferring the highest-scoring ones" (the
    RefinedWeb/CCNet-style domain cap that stops a handful of giant
    domains from dominating a web corpus). Keeps the top ``cap`` rows
    per ``group_col`` under the total order ``(score desc, doc_id
    asc)``; returns ``(doc_id, <group_col>, kept)``.

    The naive form — ``row_number() over (partition by group order by
    score desc)`` — funnels each group through ONE task: a 100 TB
    corpus with a few giant sources is exactly where it dies. This is
    the scalable two-phase decomposition of the same semantics:

    1. Each row maps to a fixed-width score bucket over ``[lo, hi]``
       (scores are bounded by construction here — textops quality is
       0..1; pass ``lo``/``hi`` for other ranges; out-of-range scores
       clamp monotonically into the end buckets). Floor-bucketing
       preserves the score order BETWEEN buckets, so per
       ``(group, bucket)`` COUNTS — a tiny map-side-combined
       aggregate — give every bucket its remaining quota from a
       running total over that aggregate alone.
    2. Ranks are only ever computed WITHIN a bucket: the one window
       over the data is ``partitionBy(group, bucket)`` — bounded by
       the bucket's width, not the group's size, and it reuses the
       quota join's partitioning (no extra exchange). ``kept`` is
       simply ``in-bucket rank <= bucket quota``, which resolves
       wholly-kept, wholly-dropped, and straddling buckets in one
       expression. (Degenerate worst case: every row of a group
       carries the SAME score, collapsing it to one bucket and
       re-creating the per-group window; cap on a richer score or
       pre-salt in that regime.)

    The kept set is IDENTICAL to the naive form for any bucket count:
    equal scores always share a bucket, inter-bucket order refines
    score order, and the within-bucket tie-break (``doc_id`` asc)
    matches the naive window's. NULL scores sort below ``lo`` (kept
    only after every scored row). One corpus exchange total — the
    ``(group, bucket)`` join both phases share.

    ``carry`` passes extra input columns through unchanged (so a
    composed pipeline never re-joins on doc_id to recover them);
    ``flag_name`` renames the emitted keep flag when the caller
    already carries a column named ``kept``."""
    if cap < 0:
        raise ValueError(f"cap must be >= 0, got {cap}")
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi}]")
    reserved = {"doc_id", "_g", "_b", "_s", "_r", "_n", "_quota", "_prior"}
    bad = [c for c in carry if c in reserved or c in (group_col, flag_name)]
    if bad:
        raise ValueError(f"carry columns collide with internals: {bad}")
    width = (hi - lo) / buckets
    # NULL → bucket -1: below every real score, still cappable
    b = F.when(F.col("_s").isNull(), F.lit(-1)).otherwise(
        F.least(
            F.lit(buckets - 1),
            F.greatest(
                F.lit(0),
                F.floor((F.col("_s") - F.lit(lo)) / F.lit(width)).cast("int"),
            ),
        )
    )
    rows = docs.select(
        "doc_id",
        F.col(group_col).alias("_g"),
        F.col(score_col).alias("_s"),
        *carry,
    ).withColumn("_b", b)
    counts = rows.groupBy("_g", "_b").agg(F.count(F.lit(1)).alias("_n"))
    # prior = rows in STRICTLY better buckets of the same group; the
    # window runs over the (groups × ≤buckets+1)-row aggregate only
    wcum = Window.partitionBy("_g").orderBy(F.desc("_b"))
    decided = counts.withColumn(
        "_prior",
        F.coalesce(
            F.sum("_n").over(wcum.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ),
    ).select(
        "_g",
        "_b",
        # quota left when this bucket starts; <=0 → drop all, >=_n →
        # keep all, else exact-rank the straddling bucket
        (F.lit(cap) - F.col("_prior")).alias("_quota"),
        "_n",
    )
    # null-safe on the group: a NULL source is a real group (the
    # naive window and the SQL twin both rank it) — a plain equi-join
    # would silently drop its rows
    tagged = rows.alias("r").join(
        decided.alias("d"),
        F.col("r._g").eqNullSafe(F.col("d._g"))
        & (F.col("r._b") == F.col("d._b")),
    ).select(
        F.col("r.doc_id").alias("doc_id"),
        F.col("r._g").alias("_g"),
        F.col("r._b").alias("_b"),
        F.col("r._s").alias("_s"),
        *[F.col(f"r.{c}").alias(c) for c in carry],
        F.col("d._quota").alias("_quota"),
    )
    # ONE pass decides everything: the in-bucket rank (every window
    # partition is one (group, bucket) — bounded by bucket width, and
    # it reuses the join's (_g, _b) partitioning, no extra exchange)
    # against the bucket's remaining quota. Whole-kept buckets satisfy
    # _r <= _quota for all rows, whole-dropped ones for none, the
    # straddling bucket for exactly its quota — no branch split, no
    # union re-reading the corpus twice.
    win = Window.partitionBy("_g", "_b").orderBy(
        F.desc_nulls_last("_s"), F.asc("doc_id")
    )
    return tagged.withColumn("_r", F.row_number().over(win)).select(
        "doc_id",
        F.col("_g").alias(group_col),
        *carry,
        (F.col("_r") <= F.col("_quota")).cast("int").alias(flag_name),
    )


def per_group_cap_naive(
    docs: DataFrame,
    cap: int,
    group_col: str = "source",
    score_col: str = "score",
) -> DataFrame:
    """The one-window-per-group reference form (equality oracle for
    :func:`per_group_cap_flags`; do not run at scale — the per-group
    window is the straggler the two-phase form exists to avoid)."""
    w = Window.partitionBy(group_col).orderBy(
        F.desc_nulls_last(score_col), F.asc("doc_id")
    )
    return docs.select(
        "doc_id", group_col, F.row_number().over(w).alias("_r")
    ).select(
        "doc_id", group_col, (F.col("_r") <= cap).cast("int").alias("kept")
    )


def per_group_cap_sql(
    cap: int, group_col: str = "source", score_sql: str = "score"
) -> str:
    """DuckDB twin (single-window form, oracle-only)."""
    return f"""
    select doc_id, {group_col},
           cast(row_number() over (
                  partition by {group_col}
                  order by {score_sql} desc nulls last, doc_id
                ) <= {cap} as int) as kept
    from documents
    """


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
