"""Custom mergeable sketches (SK2) — the hand-built tier next to the
built-in HLL/percentile sketches (`sketch_event_stats`): a
distributed Misra–Gries heavy-hitters summary (Misra & Gries 1982;
mergeability per Agarwal et al., "Mergeable Summaries", PODS 2012 —
both public).

The production heavy-hitter shape at 100 TB:

1. ONE Arrow-batched pass builds a k-counter Misra–Gries summary PER
   PARTITION (``mapInPandas`` — the summary is k rows regardless of
   partition size, and per batch the update is a vectorized pandas
   value_counts fold, not a per-row Python loop);
2. summaries merge on the driver (bounded: k × n_partitions rows,
   loudly capped) with the PODS-2012 rule — add counters, subtract
   the (k+1)-th largest, drop non-positives — which preserves the MG
   guarantee ``est ≤ true ≤ est + D`` with D the total decremented
   mass;
3. every value with ``est + D ≥ threshold`` is a CANDIDATE — the MG
   guarantee makes this a SUPERSET of the true heavy hitters — and
   one cheap filtered exact pass (``isin(candidates)`` pushed to the
   scan) confirms true counts. The emitted answer is therefore
   EXACT, while the corpus-sized work stays one summary pass + one
   candidate-filtered count — never a full groupBy materializing
   every distinct value when only the ≥threshold tail is wanted.

No reference counterpart (SURVEY §2.11 SK2).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: loud ceiling for the driver-side summary collect (k × partitions)
MAX_SUMMARY_ROWS = 2_000_000


def _mg_update(counters: dict, value, weight: int, k: int) -> int:
    """Textbook MG update generalized to weighted items; returns the
    decremented mass this update caused."""
    if value in counters:
        counters[value] += weight
        return 0
    if len(counters) < k:
        counters[value] = weight
        return 0
    # decrement all by the smallest of (new weight, current min)
    m = min(counters.values())
    d = min(weight, m)
    for key in list(counters):
        counters[key] -= d
        if counters[key] <= 0:
            del counters[key]
    if weight > d:
        counters[value] = weight - d
    return d


def _merge_summaries(
    rows: list[tuple], k: int
) -> tuple[dict, int]:
    """PODS-2012 merge: add counters, then subtract the (k+1)-th
    largest and drop non-positives. Returns (counters, total
    decremented mass D — the one-sided error bound)."""
    counters: dict = {}
    decremented = 0
    for value, count, d in rows:
        counters[value] = counters.get(value, 0) + count
        decremented += d
    if len(counters) > k:
        cut = sorted(counters.values(), reverse=True)[k]
        decremented += cut  # every kept counter lost `cut`
        counters = {
            v: c - cut for v, c in counters.items() if c - cut > 0
        }
    return counters, decremented


_MG_SCHEMA = T.StructType(
    [
        T.StructField("value", T.StringType()),
        T.StructField("count", T.LongType()),
        T.StructField("decremented", T.LongType()),
    ]
)


def mg_summaries(df: DataFrame, col: str, k: int = 64) -> DataFrame:
    """Per-partition Misra–Gries summaries of ``col`` (cast to
    string; NULLs are counted under the empty-string sentinel like
    every hashed path): ≤ ``k`` rows per partition, each
    ``(value, count, decremented)`` where ``decremented`` rides only
    the partition's FIRST emitted row (it is a per-partition scalar,
    not per-value)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        dec = 0
        for pdf in it:
            vals = pdf[col].astype("string").fillna("")
            # vectorized pre-aggregation: one value_counts per Arrow
            # batch, then k-bounded MG updates over DISTINCT values
            for value, cnt in vals.value_counts().items():
                dec += _mg_update(counters, value, int(cnt), k)
        out = pd.DataFrame(
            {
                "value": list(counters.keys()),
                "count": [int(c) for c in counters.values()],
                "decremented": [0] * len(counters),
            }
        )
        if len(out):
            out.loc[0, "decremented"] = dec
        elif dec:
            out = pd.DataFrame(
                {"value": [""], "count": [0], "decremented": [dec]}
            )
        yield out

    return df.select(F.col(col).cast("string").alias(col)).mapInPandas(
        _batches, _MG_SCHEMA
    )


def heavy_hitters(
    df: DataFrame, col: str, threshold: int, k: int = 64
) -> DataFrame:
    """EXACT values of ``col`` occurring ≥ ``threshold`` times,
    as ``(value, n)`` — via the sketch-then-confirm shape described
    in the module docstring. Correctness does not depend on ``k``
    (the MG bound makes the candidate set a superset for ANY k);
    ``k`` only sizes the confirm pass — undersized k inflates D and
    admits more candidates, it can never drop a true heavy hitter.
    Raises loudly if the summary collect would exceed
    ``MAX_SUMMARY_ROWS`` or if ``threshold ≤ D/1`` makes the
    candidate set unbounded (threshold must exceed the error mass
    for the sketch to prune anything)."""
    if threshold < 1:
        raise ValueError(f"threshold must be >= 1, got {threshold}")
    # materialize the summaries DISTRIBUTED first (localCheckpoint:
    # one sketch pass, rows stay on executors), so the size check runs
    # BEFORE anything reaches the driver — a pathological k × partition
    # combination refuses loudly instead of OOMing the driver on the
    # very collect the guard exists to police
    summaries = mg_summaries(df, col, k).localCheckpoint()
    n_rows = summaries.count()
    if n_rows > MAX_SUMMARY_ROWS:
        raise ValueError(
            f"heavy_hitters: {n_rows} summary rows exceed "
            f"{MAX_SUMMARY_ROWS}; lower k or coalesce input partitions"
        )
    rows = summaries.collect()
    counters, dec = _merge_summaries(
        [(r["value"], r["count"], r["decremented"]) for r in rows], k
    )
    # MG guarantee: true(v) <= est(v) + dec, and any v absent from the
    # merged summary has true(v) <= dec. Candidates = possibly >= threshold.
    candidates = [v for v, c in counters.items() if c + dec >= threshold]
    if dec >= threshold:
        raise ValueError(
            f"heavy_hitters: error mass D={dec} >= threshold "
            f"{threshold} — EVERY value is a candidate; raise k "
            f"(candidate bound needs threshold > n/(k+1))"
        )
    if not candidates:
        return df.sparkSession.createDataFrame(
            [], "value string, n long"
        )
    # confirm pass: exact counts for the candidate set only — the
    # IN-list filter sits on the scan side of the one small groupBy
    return (
        df.select(F.coalesce(F.col(col).cast("string"), F.lit("")).alias("value"))
        .filter(F.col("value").isin(candidates))
        .groupBy("value")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= threshold)
    )


def heavy_hitters_sql(col: str, threshold: int, table: str) -> str:
    """DuckDB twin (brute-force definition form — the oracle)."""
    return f"""
    select coalesce({col}::varchar, '') as value,
           cast(count(*) as bigint) as n
    from {table}
    group by coalesce({col}::varchar, '')
    having count(*) >= {threshold}
    """
