"""A6/O2 — dictionary encode: sorted distinct names → dense surrogate ids.

Reference: ``DataFile.extractKeys`` collects sorted distinct keys
(DataFile.java:43-57) and ``LoadStarDB.setup`` inserts them 1-by-1 so
MySQL auto_increment assigns ids in sorted order (LoadStarDB.java:
186-195). Net semantics: **id = 1-based rank of the name in sorted
order** — reproduced here with ``row_number()`` over a name-ordered
window, which is deterministic because names are distinct.

Scale note: the window has no partition key, so Spark funnels rows
through one task — fine for dimensions (dozens-to-thousands of
distinct names after the distinct() shuffle reduced the data), wrong
for facts. Fact-side surrogate assignment at 100 TB should use
``zipWithIndex``-style or hash ids instead; the reference only ever
dictionary-encodes small dims, so this mirrors its surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dictionary_encode(df: DataFrame, name_col: str, id_col: str) -> DataFrame:
    """(id, name) dimension with 1-based sorted-order surrogate keys."""
    return (
        df.select(F.col(name_col).alias("name"))
        .distinct()
        .select(
            F.row_number().over(Window.orderBy("name")).alias(id_col),
            "name",
        )
    )


def dictionary_encode_sql(table_expr: str, name_col: str, id_col: str) -> str:
    """DuckDB twin of :func:`dictionary_encode`."""
    return (
        f"select row_number() over (order by name) as {id_col}, name\n"
        f"from (select distinct {name_col} as name from {table_expr} t)"
    )
