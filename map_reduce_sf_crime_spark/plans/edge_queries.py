"""Edge-format queries: the reference's file interchange surface under
the oracle gate.

Covers the SURVEY §2 rows whose home is a source/sink rather than a
transform — exercised here as ROUND-TRIPS so the driver's hash compare
proves the serialization path, not just the compute:

- S1/P2/P3/F1: raw-crime CSV scan with header filter, malformed-row
  audit and two-format date parse (csv_crimes_roundtrip).
- S2/S3/S4/K1/K4/O3: ``key TAB csv(value)`` MR report files, written
  key-sorted + truncate-style overwrite, re-read with a typed schema
  (tsv_report_roundtrip).
- J3: Kettle DBLookup — probe ``timeperiod`` on (year, month, day)
  equi-keys returning ``time_id`` (dimensions.ktr:822-873).
- F2/F5/F6/F7/F8: the scalar-function surface in one plan
  (scalar_functions).

Round-trip scratch files live under ``.scratch/`` in the repo root
(driver containers may not share /tmp), keyed by scale factor so
concurrent gates don't collide.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.caching import plan_cache
from ..functions.calendar import N_WEEK_BUCKETS
from ..operators.star import timeperiod, timeperiod_sql
from ..operators.weekly import weekly_summary, weekly_summary_sql
from ..sources.csv_crimes import read_crimes_csv
from ..sources.tsv import read_report, write_report
from .crimes_view import CATEGORY_INCIDENTS_SQL, INCIDENTS_SQL, incidents
from .registry import register

_SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), ".scratch")


def _scratch(sf_dir: str, name: str) -> str:
    tag = os.path.basename(sf_dir.rstrip("/")) or "sf"
    return os.path.join(_SCRATCH, tag, name)


@register(
    "csv_crimes_roundtrip",
    f"""
    select category, count(*) as total,
           strftime(min(d), '%Y-%m-%d') as first_d,
           strftime(max(d), '%Y-%m-%d') as last_d
    from {INCIDENTS_SQL} t group by category
    """,
    survey_ids=("S1", "P2", "P3", "F1"),
    rebuild=True,
)
def csv_crimes_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serialize incidents to the reference's 12-column CSV shape
    (MM/dd/yyyy HH:mm dates, quoted strings), re-scan through the
    PERMISSIVE schema-on-read path (sources/csv_crimes.py), and
    aggregate on the re-parsed date — equality with the oracle proves
    the header filter, the quote handling, and the F1 date round-trip
    (MapReduceJobBase.java:73-80) end to end."""
    path = _scratch(sf_dir, "crimes_csv")
    inc = incidents(spark, sf_dir)
    (
        inc.select(
            F.monotonically_increasing_id().cast("string").alias("IncidntNum"),
            F.col("category").alias("Category"),
            F.lit("n/a").alias("Descript"),
            F.date_format("d", "EEEE").alias("DayOfWeek"),
            F.concat(F.date_format("d", "MM/dd/yyyy"), F.lit(" 12:34")).alias("Date"),
            F.lit("12:34").alias("Time"),
            F.col("district").alias("PdDistrict"),
            F.lit("NONE").alias("Resolution"),
            F.lit("0 Block").alias("Address"),
            F.lit(0.0).alias("X"),
            F.lit(0.0).alias("Y"),
            F.lit("(0, 0)").alias("Location"),
        )
        .write.mode("overwrite")  # K4 truncate-before-load semantics
        .option("header", True)
        .csv(path)
    )
    clean = read_crimes_csv(spark, path).clean
    # dates rendered as strings: a Spark DATE and a DuckDB TIMESTAMP
    # stringify differently in the driver's pandas canonicalizer
    return clean.groupBy(F.col("Category").alias("category")).agg(
        F.count(F.lit(1)).alias("total"),
        F.date_format(F.min("incident_date"), "yyyy-MM-dd").alias("first_d"),
        F.date_format(F.max("incident_date"), "yyyy-MM-dd").alias("last_d"),
    )


@register(
    "tsv_report_roundtrip",
    weekly_summary_sql(CATEGORY_INCIDENTS_SQL + " t", "category", "d"),
    survey_ids=("S2", "S3", "S4", "K1", "K4", "O3", "FMT1"),
    rebuild=True,
)
def tsv_report_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly report → ``key TAB csv(w0..w15)`` part files (key-sorted,
    overwrite = the reference's truncate-reload, LoadStarDB.java:202-217)
    → typed re-read (DataFile.java:43-57 / Kettle CsvInput
    dimensions.ktr:94-201), then chained through the secondary
    interchange formats (FMT1, sources/formats.py): JSON-lines write →
    explicit-schema read → ORC write → read. The final frame must
    still hash-equal the weekly oracle, so any type or value drift in
    ANY leg (text, JSON, ORC) fails the gate."""
    from ..sources.formats import read_json, read_orc, write_json, write_orc
    from .crimes_view import category_incidents

    path = _scratch(sf_dir, "weekly_tsv")
    weekly = weekly_summary(category_incidents(spark, sf_dir), "category", F.col("d"))
    wcols = [f"w{b}" for b in range(N_WEEK_BUCKETS)]
    write_report(weekly, "category", wcols, path)
    schema = T.StructType([T.StructField(c, T.LongType()) for c in wcols])
    tsv = read_report(spark, path, schema).withColumnRenamed("key", "category")
    jpath, opath = _scratch(sf_dir, "weekly_json"), _scratch(sf_dir, "weekly_orc")
    write_json(tsv, jpath)
    jschema = T.StructType(
        [T.StructField("category", T.StringType())]
        + [T.StructField(c, T.LongType()) for c in wcols]
    )
    write_orc(read_json(spark, jpath, jschema), opath)
    return read_orc(spark, opath)


#: CDC demo constants: the merge batch doubles one category's counts
#: and deletes another, within month 2 only.
_MERGE_UPD_CAT = "1-URGENT"
_MERGE_DEL_CAT = "5-LOW"


@register(
    "lakehouse_roundtrip",
    f"""
    with daily as (
      select month(d) as month, d, category, district, count(*) as crimes
      from {INCIDENTS_SQL} t
      group by month(d), d, category, district
    ),
    m2 as (select * from daily where month = 2)
    select category,
           cast(sum(crimes * case when category = '{_MERGE_UPD_CAT}'
                                  then 4 else 1 end) as bigint) as n,
           cast(sum(crimes * case when category = '{_MERGE_UPD_CAT}'
                                  then 2 else 1 end) as bigint) as n_asof0,
           cast(case when category = '{_MERGE_UPD_CAT}'
                     then 2 * count(*) else 0 end as bigint) as cf_upd_events,
           cast((select count(*) from m2
                 where category = '{_MERGE_DEL_CAT}') as bigint)
               as cf_del_events
    from m2
    where category <> '{_MERGE_DEL_CAT}'
    group by category
    """,
    survey_ids=("K3", "K4", "CDC1", "TT1", "CF1"),
    rebuild=True,
)
def lakehouse_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB form of K3/K4 truncate-and-reload PLUS the CDC loop,
    under the gate — now including TIME TRAVEL and the CHANGE FEED
    (round 5; pytest-only before). The daily fact lands as
    hive-partitioned parquet (``month=`` dirs, atomic overwrite —
    dimensions.ktr:611-650 at table granularity), then TWO archived
    merges commit against it, touching only month 2:

    - commit 0: {_MERGE_UPD_CAT} counts doubled;
    - commit 1: {_MERGE_UPD_CAT} doubled AGAIN and {_MERGE_DEL_CAT}
      deleted, in one combined batch (update + delete through the
      same partition-granular copy-on-write).

    Four hash-checked columns per surviving category:

    - ``n`` — the current table (partition-pruned scan): 4× for the
      updated category, delete applied;
    - ``n_asof0`` — ``read_as_of(path, 0)``: the snapshot BETWEEN the
      merges (2×, delete not yet applied), reconstructed from commit
      1's archived pre-images — a stale archive or a mis-fold
      hash-mismatches;
    - ``cf_upd_events`` — ``read_changes(0, 1)`` update events per
      category: exactly 2 per daily row of the updated category and
      ZERO for every other category in the same rewritten partition —
      the unchanged-rows-are-silent half of the CDF contract;
    - ``cf_del_events`` — the feed's delete-event total (the dropped
      category's daily rowcount), constant across rows.

    The scratch table is wiped per call so commit ids are
    deterministic (0, 1) for the time-travel addressing."""
    import shutil

    from ..sources.lakehouse import (
        merge_upsert,
        read_as_of,
        read_changes,
        read_partitioned,
        write_partitioned,
    )

    path = _scratch(sf_dir, "lakehouse_fact")
    shutil.rmtree(path, ignore_errors=True)
    daily = (
        incidents(spark, sf_dir)
        .groupBy(
            F.month("d").alias("month"), "d", "category", "district"
        )
        .agg(F.count(F.lit(1)).alias("crimes"))
    )
    write_partitioned(daily, path, ["month"])
    keys = ["d", "category", "district"]
    m2 = read_partitioned(spark, path).filter(F.col("month") == 2)
    merge_upsert(
        spark, path,
        m2.filter(F.col("category") == _MERGE_UPD_CAT)
        .withColumn("crimes", F.col("crimes") * 2)
        .localCheckpoint(),
        key_cols=keys, partition_cols=["month"], archive=True,
    )
    cur2 = read_partitioned(spark, path).filter(F.col("month") == 2)
    changes = (
        cur2.filter(F.col("category") == _MERGE_UPD_CAT)
        .withColumn("crimes", F.col("crimes") * 2)
        .withColumn("_delete", F.lit(False))
        .unionByName(
            cur2.filter(F.col("category") == _MERGE_DEL_CAT).withColumn(
                "_delete", F.lit(True)
            )
        )
        .localCheckpoint()
    )
    merge_upsert(
        spark, path, changes,
        key_cols=keys, partition_cols=["month"], delete_col="_delete",
        archive=True,
    )
    back = read_partitioned(spark, path).filter(F.col("month") == 2)
    final = back.groupBy("category").agg(
        F.sum("crimes").cast("long").alias("n")
    )
    asof0 = (
        read_as_of(spark, path, 0)
        .filter(F.col("month") == 2)
        .groupBy("category")
        .agg(F.sum("crimes").cast("long").alias("n_asof0"))
    )
    feed = read_changes(spark, path, 0, 1, keys).transform(plan_cache)
    upd_ev = (
        feed.filter(
            F.col("_change_type").isin("update_preimage", "update_postimage")
        )
        .groupBy("category")
        .agg(F.count(F.lit(1)).cast("long").alias("cf_upd_events"))
    )
    del_ev = feed.filter(F.col("_change_type") == "delete").agg(
        F.count(F.lit(1)).cast("long").alias("cf_del_events")
    )
    return (
        final.join(asof0, "category")
        .join(upd_ev, "category", "left")
        .fillna(0, subset=["cf_upd_events"])
        .crossJoin(F.broadcast(del_ev))
    )


@register(
    "scalar_functions",
    f"""
    select strftime(d, '%Y/%m/%d') as day,
           '"' || district || '","' || category || '"' as pair,
           cast(string_split(category, '-')[1] as int) as pri,
           (lower(category) = 'category') as is_header,
           count(*) as n
    from {INCIDENTS_SQL} t
    group by 1, 2, 3, 4
    """,
    survey_ids=("F2", "F5", "F6", "F7", "F8"),
)
def scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scalar surface in one plan: F2 two-format date render
    (MapReduceJobBase.java:65), F5 string split (DataFile.java:48),
    F6 quote-wrap composite value (SanFranciscoCrimePrepOlap.java:
    106-114), F7 case-insensitive header compare
    (SanFranciscoCrime.java:83), F8 int parse (LoadStarDB.java:255-257).
    All whole-stage-codegen built-ins — no UDFs."""
    return (
        incidents(spark, sf_dir)
        .select(
            F.date_format("d", "yyyy/MM/dd").alias("day"),
            F.concat(
                F.lit('"'), F.col("district"), F.lit('","'), F.col("category"), F.lit('"')
            ).alias("pair"),
            F.split(F.col("category"), "-").getItem(0).cast("int").alias("pri"),
            (F.lower(F.col("category")) == "category").alias("is_header"),
        )
        .groupBy("day", "pair", "pri", "is_header")
        .agg(F.count(F.lit(1)).alias("n"))
    )
