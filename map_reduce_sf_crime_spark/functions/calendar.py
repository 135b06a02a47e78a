"""Calendar expressions reproducing ``java.util.Calendar`` semantics.

The reference buckets incidents by ``month0 * 5 + WEEK_OF_MONTH``
(SanFranciscoCrime.java:178-182, LoadStarDB.java:134-141) where:

- ``month0`` is the Java 0-based month (``Calendar.MONTH``),
- ``WEEK_OF_MONTH`` uses the default US locale: weeks start on
  **Sunday** and ``minimalDaysInFirstWeek = 1``, so the week containing
  the 1st of the month is week 1 regardless of its length.

Closed form (Sunday=1 .. Saturday=7 day-of-week convention):

    wom(d) = floor((dayofmonth(d) + dow(first_of_month(d)) - 2) / 7) + 1

Derivation: the first calendar week of the month holds
``8 - dow(first)`` days; every later week holds 7. This matches
``Calendar.WEEK_OF_MONTH`` for every date (golden-tested in
tests/test_calendar.py against values precomputed from java.util).

Pure column expressions — no UDF, stays inside whole-stage codegen.
The SQL twins use DuckDB's ``dayofweek`` (Sunday=0) shifted by +1 to
the Spark/Java Sunday=1 convention.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: The reference pre-seeds 16 week buckets: 3 months x 5 weeks + 1
#: (SanFranciscoCrime.java:170-173). Dates outside the quarter would
#: overflow; we keep the fixed 0..15 domain (SURVEY §7.3.2).
N_WEEK_BUCKETS = 16


def week_of_month_col(d: Column) -> Column:
    """``Calendar.WEEK_OF_MONTH`` (US locale) as a Spark column.

    Spark's ``dayofweek`` is already Sunday=1..Saturday=7, same as
    ``java.util.Calendar.DAY_OF_WEEK``.
    """
    first = F.trunc(d, "month")
    return F.floor((F.dayofmonth(d) + F.dayofweek(first) - 2) / 7) + 1


def week_of_month_sql(d: str) -> str:
    """DuckDB SQL twin of :func:`week_of_month_col`.

    DuckDB ``dayofweek`` is Sunday=0..Saturday=6 → ``+1`` aligns it
    with the Java convention used in the closed form.
    """
    first = f"date_trunc('month', {d})"
    return f"(cast(floor((dayofmonth({d}) + dayofweek({first}) + 1 - 2) / 7) as bigint) + 1)"


def month0_col(d: Column) -> Column:
    """Java ``Calendar.MONTH`` — 0-based (SanFranciscoCrime.java:181)."""
    return F.month(d) - 1


def month0_sql(d: str) -> str:
    return f"(month({d}) - 1)"


def week_bucket_col(d: Column) -> Column:
    """``bucket = month0 * 5 + week_of_month`` (SanFranciscoCrime.java:182).

    For a single quarter starting at month0=0 this lands in 0..15
    (bucket 16 = month0 2, week 6 cannot occur: a 31-day month starting
    on Saturday peaks at week 6 only via month0*5 overflowing into the
    next month's range — the reference accepts the same aliasing).
    """
    return month0_col(d) * 5 + week_of_month_col(d)


def week_bucket_sql(d: str) -> str:
    return f"({month0_sql(d)} * 5 + {week_of_month_sql(d)})"
