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
    select category,
           cast(sum(case when category = '{_MERGE_UPD_CAT}' then 2 else 1 end)
                as bigint) as n
    from {INCIDENTS_SQL} t
    where month(d) = 2 and category <> '{_MERGE_DEL_CAT}'
    group by category
    """,
    survey_ids=("K3", "K4", "CDC1"),
)
def lakehouse_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB form of K3/K4 truncate-and-reload PLUS a CDC merge,
    under the gate: the daily fact is written as hive-partitioned
    parquet (``month=`` directories, atomic overwrite —
    dimensions.ktr:611-650 at table granularity), then a change batch
    (update: {_MERGE_UPD_CAT} counts doubled; delete: {_MERGE_DEL_CAT}
    rows dropped — month 2 only) is MERGEd copy-on-write: only the
    month=2 partition is read and rewritten
    (sources/lakehouse.py::merge_upsert; partition-granular rewrite is
    plan- and mtime-asserted in tests/test_lakehouse.py). The merged
    table is read back through a partition-pruned scan and
    hash-matched against the oracle's post-merge expectation."""
    from ..sources.lakehouse import (
        merge_upsert,
        read_partitioned,
        write_partitioned,
    )

    path = _scratch(sf_dir, "lakehouse_fact")
    daily = (
        incidents(spark, sf_dir)
        .groupBy(
            F.month("d").alias("month"), "d", "category", "district"
        )
        .agg(F.count(F.lit(1)).alias("crimes"))
    )
    write_partitioned(daily, path, ["month"])
    m2 = read_partitioned(spark, path).filter(F.col("month") == 2)
    changes = (
        m2.filter(F.col("category") == _MERGE_UPD_CAT)
        .withColumn("crimes", F.col("crimes") * 2)
        .withColumn("_delete", F.lit(False))
        .unionByName(
            m2.filter(F.col("category") == _MERGE_DEL_CAT).withColumn(
                "_delete", F.lit(True)
            )
        )
    )
    merge_upsert(
        spark,
        path,
        changes,
        key_cols=["d", "category", "district"],
        partition_cols=["month"],
        delete_col="_delete",
    )
    back = read_partitioned(spark, path).filter(F.col("month") == 2)
    return back.groupBy("category").agg(
        F.sum("crimes").cast("long").alias("n")
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
