"""Range (interval) join — the second custom time-series join the
brief's operator list calls out next to the as-of join (no reference
counterpart; the closest reference shape is the DBLookup equi-join,
dimensions.ktr:822-873, which has no temporal predicate).

Semantics: pair every left row with every right row whose timestamp
falls in ``[left.ts + lower, left.ts + upper]`` (bounds inclusive,
microsecond precision), optionally under extra equi-keys.

The naive formulation is a theta join — Spark can only execute it as
BroadcastNestedLoopJoin (quadratic, and impossible when neither side
fits in memory). The scalable form used here is the classic *binned*
range join: pick a bin width equal to the window span, so every left
row's window covers at most TWO consecutive bins. Explode the left
side to those (≤2) bin ids, map each right row to the single bin
containing its timestamp, hash-join on (bin, *keys), then refine with
the exact bounds. Each qualifying pair meets in exactly one bin (the
right row has one bin id; the left row's two ids are distinct), so no
dedup pass is needed. Cost: one 2×-inflated shuffle of the left side
+ an equi-join — the same plan shape at 100 TB, with AQE skew-join as
the backstop when event time itself is skewed (a hot bin splits).

Bin ids use integer ``div`` (truncating) on epoch-µs, exact where
``floor(x / span)`` on doubles can misbin near boundaries; truncating
vs flooring only differs for negative epochs, i.e. pre-1970
timestamps, which this operator documents as unsupported.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    lower_us: int,
    upper_us: int,
    keys: tuple[str, ...] = (),
) -> DataFrame:
    """Join rows where ``right.right_ts`` is within
    ``[left.left_ts + lower_us, left.left_ts + upper_us]`` (µs,
    inclusive) and any ``keys`` columns are equal. Column names must
    be disjoint between the two sides apart from ``keys`` (alias
    before calling). Returns left columns + right columns with the
    keys emitted once. Inner semantics; for outer/aggregating shapes,
    aggregate this result and re-join to the left side (one extra
    broadcast-or-bucketed equi-join — see
    plans/scale_queries.range_join_events)."""
    if upper_us <= lower_us:
        raise ValueError("range_join requires upper_us > lower_us")
    span = upper_us - lower_us

    l_us = F.unix_micros(F.col(left_ts))
    lo = (l_us + F.lit(lower_us)).alias("_lo_us")
    hi = (l_us + F.lit(upper_us)).alias("_hi_us")
    left_b = left.select("*", lo, hi).withColumn(
        "_bin",
        F.explode(
            F.array_distinct(
                F.array(
                    F.expr(f"_lo_us div {span}"),
                    F.expr(f"_hi_us div {span}"),
                )
            )
        ),
    )
    r_us = F.unix_micros(F.col(right_ts))
    right_b = right.withColumn("_r_us", r_us).withColumn(
        "_bin", F.expr(f"_r_us div {span}")
    )

    cond: Column = left_b["_bin"] == right_b["_bin"]
    for k in keys:
        cond = cond & (left_b[k] == right_b[k])
    cond = (
        cond
        & (right_b["_r_us"] >= left_b["_lo_us"])
        & (right_b["_r_us"] <= left_b["_hi_us"])
    )
    joined = left_b.join(right_b, cond, "inner")
    out_cols = [left_b[c] for c in left.columns] + [
        right_b[c] for c in right.columns if c not in keys
    ]
    return joined.select(*out_cols)


def range_join_sql(
    left_sql: str,
    right_sql: str,
    left_ts: str,
    right_ts: str,
    lower_us: int,
    upper_us: int,
    keys: tuple[str, ...] = (),
) -> str:
    """DuckDB twin: plain inequality join (DuckDB plans IEJoin for
    it, fine at oracle scale)."""
    eq = " and ".join(f"l.{k} = r.{k}" for k in keys)
    eq = f"{eq} and " if eq else ""
    r_cols = f"r.* exclude ({', '.join(keys)})" if keys else "r.*"
    return f"""
    select l.*, {r_cols}
    from ({left_sql}) l join ({right_sql}) r
      on {eq}epoch_us(r.{right_ts}) between epoch_us(l.{left_ts}) + ({lower_us})
         and epoch_us(l.{left_ts}) + ({upper_us})
    """
