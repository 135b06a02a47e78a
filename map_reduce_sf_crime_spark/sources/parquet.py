"""Parquet loaders for the driver testdata tables.

The reference reads raw CSV (S1, SanFranciscoCrime.java:219); our
engine standardizes on columnar Parquet for everything analytic —
vectorized scan, predicate pushdown, column pruning and partition
pruning come free (SURVEY §2.1 "not present" row). CSV remains
supported for the raw-incident edge via sources/csv_crimes.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Defensive: every oracle comparison assumes UTC-naive timestamp
    # semantics (DuckDB). The harness session pins UTC, but queries may
    # run under a caller-built session — pin it at the data boundary so
    # date/timestamp renders can't shift with the host timezone.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def fan_out(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Round-robin repartition IF the source delivered fewer splits than
    cores — a single-row-group parquet file (like the local testdata) is
    one unsplittable scan task, serializing all per-row compute upstream
    of the first shuffle. On a real cluster the input arrives in
    thousands of splits and this is a no-op; locally it buys scan-side
    parallelism for CPU-heavy derivations (shingling, hashing, UDFs) at
    the cost of one small shuffle. Use on compute-bound paths, not plain
    scan→filter→agg where the shuffle would outweigh the win.

    Gating reads the plan's file inventory (``df.inputFiles()``), never
    ``df.rdd`` — the RDD conversion materializes a JavaRDD per query
    build, pure overhead on a cluster where this helper is a documented
    no-op. File count lower-bounds the scan's split count (Spark splits
    big files further by maxPartitionBytes; the only way a scan gets
    fewer tasks than files is small-file coalescing — exactly the case
    that WANTS fanning out), so ``files >= target -> no-op`` is safe on
    the cluster side; a non-file source (in-memory frame) reports no
    files and is left untouched — its partitioning was chosen by
    whoever built it.
    """
    spark = df.sparkSession
    target = min_parts or spark.sparkContext.defaultParallelism
    files = df.inputFiles()
    if not files or len(files) >= target:
        return df
    return df.repartition(target)


#: sf dirs whose LongType ts magnitude has already been validated —
#: one sampling job per directory per process, not per query build.
_TS_MAGNITUDE_CHECKED: set[str] = set()


def normalize_event_ts(df: DataFrame, check_key: str = "") -> DataFrame:
    """Normalize ``events.ts`` to a session-TZ (UTC-pinned) µs
    timestamp regardless of the physical layout the testdata
    generation used. Observed layouts across driver rounds:

    - TIMESTAMP(NANOS): Spark's reader rejects it
      ([PARQUET_TYPE_ILLEGAL]) unless read as long via the
      ``nanosAsLong`` legacy conf → arrives as LongType nanos;
      floor ns→µs exactly like DuckDB does.
    - TIMESTAMP_NTZ(µs): arrives as TimestampNTZType; cast to the
      session timestamp so downstream ``unix_micros``/watermark
      logic and oracle string renders are identical either way.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampType

    dtype = df.schema["ts"].dataType
    if isinstance(dtype, LongType):
        # Magnitude sanity before assuming nanoseconds: a 2000s-2100s
        # epoch is ~1e18-4e18 in ns but ~1e15-4e15 in µs. If a future
        # testdata layout stores raw µs int64, flooring div 1000 would
        # be silently 1000× off — fail loudly instead. One sampled row
        # (first non-null) is enough: layouts don't mix units, and
        # pre-1973 epochs (ns < 1e17) are out of contract for this
        # synthetic data. Memoized per check_key (the sf dir) so a
        # gate/bench session pays the sampling job once, not per query
        # build; a streaming frame can't be sampled — events_stream
        # reads the same file the batch loader validates.
        if not df.isStreaming and (
            not check_key or check_key not in _TS_MAGNITUDE_CHECKED
        ):
            sample = df.select("ts").filter(F.col("ts").isNotNull()).first()
            if sample is not None and abs(sample[0]) < 10**17:
                raise ValueError(
                    f"events.ts is LongType but sampled value {sample[0]} "
                    "is outside the nanosecond epoch range (|ts| < 1e17 — "
                    "microseconds?); update sources/parquet."
                    "normalize_event_ts for this layout instead of "
                    "dividing by 1000"
                )
            # memoize only keyed, successfully-sampled checks: an
            # anonymous call ('' key) must not waive validation for
            # other frames, and an empty frame proves nothing
            if check_key and sample is not None:
                _TS_MAGNITUDE_CHECKED.add(check_key)
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if not isinstance(dtype, TimestampType):
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch read of events.parquet with ts normalized (see
    :func:`normalize_event_ts`)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return normalize_event_ts(raw, check_key=sf_dir)


#: (path, mtime_ns, size, nanosAsLong) → parquet schema. Every
#: ``readStream`` needs the schema up front, and inferring it is a
#: driver-side footer read (~0.1 s) paid per stream build — a query
#: that starts two concurrent streams paid it twice per build (r11
#: measurement). Keyed on the file's identity, its mtime/size (a
#: rewritten file re-infers) and the schema-affecting conf (r12
#: ADVICE hardening); bounded to one live entry per path.
_STREAM_SCHEMAS: dict[tuple[str, int, int, str], "object"] = {}


def _events_schema(spark: SparkSession, sf_dir: str):
    path = os.path.join(sf_dir, "events.parquet")
    st = os.stat(path)
    # r12 (ADVICE): the inferred schema depends on nanosAsLong, so the
    # conf value rides the key — a future caller with a different
    # setting re-infers instead of being served a conf-mismatched
    # schema. One entry per path (rewritten files evict their stale
    # entry) bounds the dict.
    nanos = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
    abspath = os.path.abspath(path)
    key = (abspath, st.st_mtime_ns, st.st_size, nanos)
    schema = _STREAM_SCHEMAS.get(key)
    if schema is None:
        for stale in [k for k in _STREAM_SCHEMAS if k[0] == abspath]:
            del _STREAM_SCHEMAS[stale]
        schema = _STREAM_SCHEMAS[key] = spark.read.parquet(path).schema
    return schema


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``readStream`` over the static events parquet (file-source
    streaming wants a directory: stream the sf dir glob-filtered to
    the events file), ts normalized the same way as the batch loader
    so batch-replay oracles agree."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = (
        spark.readStream.schema(_events_schema(spark, sf_dir))
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return normalize_event_ts(raw)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
