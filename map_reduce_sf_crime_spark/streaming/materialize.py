"""Continuous materialization: the streaming form of the reference's
PREP→LOAD pipeline (SanFranciscoCrimePrepOlap + LoadStarDB — batch
recompute + truncate-reload, runmapreduce.sh:6-8).

``foreachBatch`` + dynamic partition overwrite = incremental upsert on
plain parquet. foreachBatch is AT-LEAST-ONCE: after a crash the
checkpoint replays the failed micro-batch with the SAME batch_id, so
the sink must be idempotent per (batch_id, data). The previous
read-merge-overwrite form was not — a replay would re-add the batch's
counts to partitions its first attempt had already rewritten. This
version uses the standard **staged-delta** discipline instead:

1. The batch's per-day delta is written to a staging table
   ``{out_dir}_deltas`` hive-partitioned by ``(day, batch)``. A
   replay dynamically overwrites exactly its own ``(day, batch_id)``
   directories with identical content — idempotent by layout.
2. The serving table's affected day partitions are then REBUILT as a
   pure aggregate of all staged deltas for those days — a
   deterministic function of staging state, so re-running after any
   crash (mid-stage or mid-rebuild) converges; a torn serving write
   self-heals on the replay. Untouched days are never rewritten.

At 100 TB the nightly "reload the world" becomes a per-partition
delta. Staging growth is BOUNDED by periodic folding: every
``fold_every`` batches the active deltas consolidate into one
``batch = -B`` partition per day (ids < B are checkpoint-committed —
Structured Streaming replays only the last uncommitted batch — so
folding them is replay-safe), and the active view is PER DAY
``batch == -cmax_day OR batch >= cmax_day`` with fold points read
from the directory listing (per-day, because the fold write itself
is only per-partition atomic: a torn fold leaves some days on the
new point and others on the old, and each must keep reading its own
consistent set until the replayed fold catches the stragglers up);
superseded partitions become inert garbage that
``vacuum_staged_deltas`` reclaims. (A lakehouse
table format would replace this with MERGE INTO + its transaction
log; the pattern and costs are the same.) Replay-idempotence and
folding are pinned in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.lakehouse import _HIVE_NULL, _hfs

#: Consolidate staged deltas every N micro-batches: the rebuild then
#: reads ≤ N+1 partitions per day (one consolidated + the unfolded
#: tail) instead of one per batch since stream start.
FOLD_EVERY = 32


def _fold_points(spark: SparkSession, deltas_dir: str) -> dict[str, int]:
    """PER-DAY fold points from a directory LISTING (no Spark job):
    ``{day_dir_value: cmax}`` where partition ``batch = -cmax``
    consolidates that day's deltas with id < cmax (0 = never folded).

    Per-day — not global — on purpose: the fold write is a dynamic
    partition overwrite, atomic per partition only. A crash can land
    ``batch=-B`` for day X but not day Y; a single global fold point
    (max over all days) would then hide day Y's still-unfolded
    history from every rebuild AND from the replayed fold itself,
    losing those counts permanently. With per-day points each day's
    view stays internally consistent, and the replayed fold simply
    re-folds whichever days the crash left behind."""
    fs, jvm = _hfs(spark, deltas_dir)
    root = jvm.org.apache.hadoop.fs.Path(deltas_dir)
    points: dict[str, int] = {}
    if not fs.exists(root):
        return points
    for day_st in fs.listStatus(root):
        if not day_st.isDirectory():
            continue
        dname = day_st.getPath().getName()
        if not dname.startswith("day="):
            continue
        cmax = 0
        for b_st in fs.listStatus(day_st.getPath()):
            bname = b_st.getPath().getName()
            if bname.startswith("batch=-"):
                cmax = max(cmax, -int(bname.split("=", 1)[1]))
        points[dname.split("=", 1)[1]] = cmax
    return points


def _active(
    spark: SparkSession, deltas_dir: str, days: list | None = None
) -> DataFrame:
    """The live staged-delta view: per day, the latest consolidated
    partition (``batch == -cmax_day``) plus the unfolded tail
    (``batch >= cmax_day``). Fold points come from the directory
    listing and enter the plan as a LITERAL per-day predicate
    (``day == d AND (batch == -c OR batch >= c)`` disjunction, both
    partition columns vs literals) — statically partition-PRUNABLE,
    so the scan lists only active (day, batch) directories; a joined
    fold-point column would force reading every superseded partition
    and filtering rows after the fact. ``days`` (values as returned
    by collect; None member = the null day) restricts the view to the
    affected days — the rebuild's pruning rides the same predicate."""
    staged = spark.read.parquet(deltas_dir)
    points = _fold_points(spark, deltas_dir)
    wanted = None
    if days is not None:
        wanted = {_HIVE_NULL if d is None else str(d) for d in days}
    pred = None
    for day_str, cmax in points.items():
        if wanted is not None and day_str not in wanted:
            continue
        dcond = (
            F.col("day").isNull()
            if day_str == _HIVE_NULL
            else (F.col("day") == day_str)
        )
        cond = dcond & (
            (F.col("batch") == -cmax) | (F.col("batch") >= cmax)
        )
        pred = cond if pred is None else (pred | cond)
    return staged.filter(pred if pred is not None else F.lit(False))


def merge_daily_counts(
    spark: SparkSession, out_dir: str, fold_every: int = FOLD_EVERY
):
    """Returns a foreachBatch function maintaining a day-partitioned
    (day, event_type, n) aggregate under ``out_dir`` (staging under
    ``{out_dir}_deltas``), idempotent under micro-batch replay."""
    deltas_dir = out_dir.rstrip("/") + "_deltas"

    def _staging_exists() -> bool:
        fs, jvm = _hfs(spark, deltas_dir)
        return fs.exists(jvm.org.apache.hadoop.fs.Path(deltas_dir))

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        delta = (
            batch_df.withColumn("day", F.to_date("ts"))
            .groupBy("day", "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        days = [r["day"] for r in delta.select("day").distinct().collect()]
        if not days:
            return
        # fold BEFORE staging this batch: every staged id < batch_id
        # is checkpoint-committed, so consolidating them into one
        # (day, -batch_id) partition set is deterministic under
        # replay (the crashed attempt's own (day, batch_id) rows are
        # explicitly excluded, and per-day fold points mean a fold
        # that tore mid-write simply re-folds the days it missed)
        if batch_id > 0 and batch_id % fold_every == 0 and _staging_exists():
            folded = (
                _active(spark, deltas_dir)
                .filter(F.col("batch") < batch_id)
                .groupBy("day", "event_type")
                .agg(F.sum("n").alias("n"))
                .withColumn("batch", F.lit(-batch_id))
            )
            (
                folded.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("day", "batch")
                .parquet(deltas_dir)
            )
        (
            delta.withColumn("batch", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("day", "batch")
            .parquet(deltas_dir)
        )
        merged = (
            _active(spark, deltas_dir, days)  # partition-pruned scan
            .groupBy("day", "event_type")
            .agg(F.sum("n").alias("n"))
        )
        (
            merged.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("day")
            .parquet(out_dir)
        )

    return _merge


def vacuum_staged_deltas(spark: SparkSession, out_dir: str) -> int:
    """Reclaim staging partitions the active view can no longer read:
    per day, positives below that day's fold point and consolidated
    sets older than that day's latest. Returns the number of
    directories removed. Safe at any time — the active view is
    per-day and recomputed from what remains, so even a torn fold's
    days (whose points differ) vacuum consistently."""
    deltas_dir = out_dir.rstrip("/") + "_deltas"
    fs, jvm = _hfs(spark, deltas_dir)
    root = jvm.org.apache.hadoop.fs.Path(deltas_dir)
    if not fs.exists(root):
        return 0
    points = _fold_points(spark, deltas_dir)
    removed = 0
    for day_st in fs.listStatus(root):
        if not day_st.isDirectory():
            continue
        dname = day_st.getPath().getName()
        if not dname.startswith("day="):
            continue
        cmax = points.get(dname.split("=", 1)[1], 0)
        for b_st in fs.listStatus(day_st.getPath()):
            name = b_st.getPath().getName()
            if not name.startswith("batch="):
                continue
            b = int(name.split("=", 1)[1])
            if (0 <= b < cmax) or (b < 0 and b != -cmax):
                fs.delete(b_st.getPath(), True)
                removed += 1
    return removed


def run_materialization(
    stream: DataFrame, spark: SparkSession, out_dir: str
) -> None:
    """Drive the stream to completion into the materialized aggregate."""
    from .windows import STREAM_STATE_PARTITIONS

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(STREAM_STATE_PARTITIONS))
    try:
        q = (
            stream.writeStream.foreachBatch(merge_daily_counts(spark, out_dir))
            .option("checkpointLocation", out_dir + "_ckpt")
            .trigger(availableNow=True)
            .start()
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    q.awaitTermination()
