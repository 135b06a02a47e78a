"""S1 — raw SF-crime CSV scan with observable drop semantics.

Reference: hand-rolled per-line OpenCSV parse (DataFile.java:65-70)
with log-and-drop of malformed rows (SanFranciscoCrime.java:81,90-99 —
rows with <7 columns; SanFranciscoCrimePrepOlap.java:116-128 —
unparseable dates) and a value-compare header filter
(SanFranciscoCrime.java:83).

Spark-first rewrite: one PERMISSIVE schema-on-read pass. The header is
handled by ``header=True`` (SURVEY §7.3.3 — uniformly, unlike the
reference whose header check only fires on date-valued columns);
structurally bad rows land in a ``_corrupt_record`` column and
date-parse failures become NULLs — both **counted, not silently
dropped** (SURVEY §7.3.4). Quoted fields (categories with commas) are
honored by Spark's CSV reader exactly like OpenCSV.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Positional schema of the public SFPD export (MapReduceJobBase.java:40-55
#: reads indices 1/3/4/6; the rest ride along untyped-but-declared).
CRIMES_SCHEMA = T.StructType(
    [
        T.StructField("IncidntNum", T.StringType()),
        T.StructField("Category", T.StringType()),
        T.StructField("Descript", T.StringType()),
        T.StructField("DayOfWeek", T.StringType()),
        T.StructField("Date", T.StringType()),  # "MM/dd/yyyy HH:mm"
        T.StructField("Time", T.StringType()),
        T.StructField("PdDistrict", T.StringType()),
        T.StructField("Resolution", T.StringType()),
        T.StructField("Address", T.StringType()),
        T.StructField("X", T.DoubleType()),
        T.StructField("Y", T.DoubleType()),
        T.StructField("Location", T.StringType()),
        T.StructField("_corrupt_record", T.StringType()),
    ]
)


@dataclass
class CrimesScan:
    """Clean frame plus the drop audit the reference only logged."""

    clean: DataFrame
    corrupt_count: int
    bad_date_count: int


def read_crimes_csv(spark: SparkSession, path: str) -> CrimesScan:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw = spark.read.csv(
        path,
        schema=CRIMES_SCHEMA,
        header=True,
        quote='"',
        escape='"',
        mode="PERMISSIVE",
        columnNameOfCorruptRecord="_corrupt_record",
    )
    # A malformed row (<12 fields) parses with trailing NULLs; the
    # reference's test is "< 7 columns" (SanFranciscoCrime.java:81) ≡
    # PdDistrict (index 6) absent.
    structurally_bad = F.col("_corrupt_record").isNotNull() | F.col(
        "PdDistrict"
    ).isNull()
    parsed = raw.withColumn(
        "incident_date",
        # F1: split on space, date-only parse MM/dd/yyyy
        # (MapReduceJobBase.java:73-80). try_to_date: unparseable →
        # NULL (counted below) instead of ANSI-mode exception, matching
        # the reference's log-and-skip (ParseException catch,
        # SanFranciscoCrime.java:188-190).
        F.try_to_date(F.split(F.col("Date"), " ").getItem(0), "MM/dd/yyyy"),
    )
    # ONE full-schema pass for the audit: the frame is cached before
    # counting so _corrupt_record reflects the FULL row parse — a
    # pruned counting scan would never attempt the X/Y double
    # conversions and undercount corrupt rows (the documented Spark
    # corrupt-column caveat) — and `clean` reads the same cache. The
    # two audit categories + clean partition the input exactly:
    # structurally bad | date absent-or-unparseable | clean.
    from ..functions.caching import plan_cache

    parsed = parsed.transform(plan_cache)
    counts = parsed.agg(
        F.coalesce(F.sum(structurally_bad.cast("long")), F.lit(0)).alias("nc"),
        F.coalesce(
            F.sum(
                (~structurally_bad & F.col("incident_date").isNull()).cast("long")
            ),
            F.lit(0),
        ).alias("nd"),
    ).collect()[0]
    clean = (
        parsed.filter(~structurally_bad & F.col("incident_date").isNotNull())
        .drop("_corrupt_record")
    )
    return CrimesScan(
        clean=clean,
        corrupt_count=int(counts["nc"]),
        bad_date_count=int(counts["nd"]),
    )
