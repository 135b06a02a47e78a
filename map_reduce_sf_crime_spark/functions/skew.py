"""Skew mitigation: salted two-phase aggregation.

AQE's skew-join splitting (enabled in session.py) handles skewed JOIN
partitions at runtime; for skewed AGGREGATION keys the standard
technique is salting — spread one hot key over ``n_salts`` reducers,
then combine:

    groupBy(key, salt) partial-agg  →  groupBy(key) final-agg

Spark's map-side partial aggregation already absorbs most skew for
algebraic aggregates (count/sum/min/max): each map task pre-combines
its rows regardless of key distribution, so the reduce side sees at
most ``#map_tasks`` rows per key. Salting matters when map-side
combine is ineffective — high-cardinality composite values per key
(e.g. ``collect_set``, exact distinct counts) or extreme single-key
skew — which is why it lives here as an explicit, opt-in transform
rather than a default.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key: str,
    partial: list[Column],
    final: list[Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation over a salted key.

    ``partial`` aggregates run per (key, salt); ``final`` aggregates
    combine the per-salt rows per key and must be the algebraic
    re-combination of ``partial`` (e.g. partial ``count(1) as c`` →
    final ``sum(c) as c``). The salt mixes a per-row id into the hash
    of the full row: a hash of the columns alone is a pure function of
    the VALUES, so fully-duplicate rows (or a key-only projection) —
    exactly the hot-key shapes salting exists for — would all land on
    one salt and not spread at all.

    REQUIRES Spark >= 3.3: the id is nondeterministic across task
    retries, and a nondeterministic expression feeding a shuffle key
    is only safe under indeterminate-stage handling (SPARK-38388),
    which rolls back and recomputes the WHOLE downstream stage on a
    fetch failure instead of mixing partials fetched under two
    different salt assignments (double-count/loss). With that
    machinery the final aggregate is invariant to how rows are
    partitioned among salts; on older Spark, pre-materialize the salt
    (e.g. checkpoint after withColumn) before aggregating."""
    salt = F.pmod(
        F.xxhash64(*df.columns, F.monotonically_increasing_id()),
        F.lit(n_salts),
    ).alias("_salt")
    phase1 = df.withColumn("_salt", salt).groupBy(key, "_salt").agg(*partial)
    return phase1.groupBy(key).agg(*final)


def salted_count(df: DataFrame, key: str, n_salts: int = 16) -> DataFrame:
    """Salted ``groupBy(key).count()`` — result-identical, skew-proof."""
    return salted_agg(
        df,
        key,
        partial=[F.count(F.lit(1)).alias("_c")],
        final=[F.sum("_c").alias("count")],
    )
