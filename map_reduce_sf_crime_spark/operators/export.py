"""Training-shard export (EX1) — the SINK at the end of the corpus
pipeline: materialize the selected/mixed corpus as N shards in the
deterministic global training order, the layout a trainer's data
loader actually consumes (sequential reads per shard, shard count =
loader parallelism, order reproducible across exports).

Shards are CONTIGUOUS BLOCKS of the shuffle order: rows with
``shard_id = min(pos // ceil(total / n), n - 1)`` — block boundaries
are a pure function of (total, n), so the oracle reproduces them from
the same window arithmetic, and resuming a training run mid-corpus
maps to "start at shard k, offset j" with no index structure.

Scale shape: assignment is one broadcast one-row count; the write
hash-partitions on ``shard_id`` into exactly ``n_shards`` tasks, so
each shard directory holds ONE file written by one task in pos-sorted
order — no global sort, no single-partition window (the pos itself
comes from ``with_global_shuffle_pos``'s two-phase ranking). The
``_manifest`` summary (one row per shard: count + pos bounds) lands
under an underscore path, invisible to parquet readers of the shard
data, and ``verify_training_shards`` recomputes it from the data
files so a torn or partial export fails loudly instead of training on
a silently short corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def shard_assignments(
    df: DataFrame, n_shards: int, pos_col: str = "shuffle_pos"
) -> DataFrame:
    """Append ``shard_id`` (contiguous-block rule above) and
    ``shard_n_docs``. Because shards are contiguous blocks of a
    gapless 0..total-1 pos range, the per-shard size is PURE
    ARITHMETIC from (total, block) — no second aggregation, no
    count join; the only upstream work is the broadcast one-row
    count. (The physical manifest still measures REAL counts —
    write_training_shards/verify_training_shards — so the arithmetic
    and the bytes cross-check each other.)"""
    if n_shards <= 0:
        raise ValueError(f"n_shards must be > 0 (got {n_shards})")
    total = df.agg(F.count(F.lit(1)).alias("_total"))
    block = F.ceil(F.col("_total") / F.lit(n_shards))
    return (
        df.crossJoin(F.broadcast(total))
        .withColumn(
            "shard_id",
            F.least(
                F.floor(F.col(pos_col) / block),
                F.lit(n_shards - 1),
            ).cast("bigint"),
        )
        .withColumn(
            "shard_n_docs",
            (
                F.least(F.col("_total"), (F.col("shard_id") + 1) * block)
                - F.col("shard_id") * block
            ).cast("bigint"),
        )
        .drop("_total")
    )


def shard_assignments_sql(inner_sql: str, n_shards: int) -> str:
    """DuckDB twin over a subquery that already carries
    ``shuffle_pos`` — the same block arithmetic (the twin deliberately
    mirrors the closed form; a count-window form was measured ~2× the
    cost Spark-side and is provably equal on a gapless pos range)."""
    return f"""
    with g as ({inner_sql}),
    t as (select count(*) as n,
                 cast(ceil(count(*) * 1.0 / {n_shards}) as bigint) as b
          from g),
    s as (select g.*, t.n as _n, t.b as _b,
                 cast(least(floor(shuffle_pos / t.b), {n_shards} - 1)
                      as bigint) as shard_id
          from g, t)
    select * exclude (_n, _b),
           cast(least(_n, (shard_id + 1) * _b) - shard_id * _b
                as bigint) as shard_n_docs
    from s
    """


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    pos_col: str = "shuffle_pos",
) -> None:
    """Materialize the corpus as ``shard_id=K`` directories of ONE
    pos-sorted parquet file each, plus the ``_manifest`` summary.
    Overwrite semantics (an export is a whole artifact — re-export
    replaces it; the write is the plain truncate-reload this engine's
    K4 lineage started from, at shard granularity). The input is
    localCheckpoint-ed first: the count, the shard write, and the
    manifest aggregate would otherwise each re-run the whole upstream
    pipeline — and the manifest MUST summarize the same materialized
    rows the data write consumed, not an independent re-execution."""
    sharded = shard_assignments(df.localCheckpoint(), n_shards, pos_col)
    (
        sharded.drop("shard_n_docs")
        .repartition(n_shards, "shard_id")
        .sortWithinPartitions("shard_id", pos_col)
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .parquet(path)
    )
    (
        sharded.groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min(pos_col).cast("bigint").alias("min_pos"),
            F.max(pos_col).cast("bigint").alias("max_pos"),
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{path.rstrip('/')}/_manifest")
    )


def verify_training_shards(
    spark: SparkSession, path: str, pos_col: str = "shuffle_pos"
) -> DataFrame:
    """Recompute the per-shard summary from the DATA files and check
    it against the stored ``_manifest`` — plus the global invariants
    (shards partition a gapless 0..total-1 pos range into contiguous
    blocks). Raises on any mismatch; returns the verified manifest."""
    data = spark.read.parquet(path)
    got = (
        data.groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min(pos_col).cast("bigint").alias("min_pos"),
            F.max(pos_col).cast("bigint").alias("max_pos"),
        )
    )
    want = spark.read.parquet(f"{path.rstrip('/')}/_manifest")
    diff = got.exceptAll(want).unionByName(want.exceptAll(got))
    bad = diff.take(5)
    if bad:
        raise ValueError(
            f"training shards at {path} do not match their manifest "
            f"(torn or partial export): {bad}"
        )
    rows = sorted(map(tuple, got.collect()))
    expect_start = 0
    for shard_id, n_docs, min_pos, max_pos in rows:
        if min_pos != expect_start or max_pos - min_pos + 1 != n_docs:
            raise ValueError(
                f"shard {shard_id} is not a contiguous block: "
                f"[{min_pos}, {max_pos}] n={n_docs}, expected start "
                f"{expect_start}"
            )
        expect_start = max_pos + 1
    return want
