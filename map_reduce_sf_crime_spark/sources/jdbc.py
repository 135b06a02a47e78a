"""K2/K3 — JDBC star-schema sink, exercised end-to-end against
embedded Derby (the driver Spark ships for its metastore) in
tests/test_jdbc.py; any warehouse URL works the same way.

Reference: row-at-a-time hand-built INSERT strings (LoadStarDB.java:
86-103,301-346) with truncate-before-load (LoadStarDB.java:202-217,
dimensions.ktr:625-707) and client-side simulated PKs.

Spark-first: ``df.write.jdbc(mode="overwrite")`` — truncate/reload
becomes an atomic overwrite, batched inserts replace per-row
statements, and surrogate keys are computed in the plan (operators/
dims.py) instead of assumed from auto_increment. ``write_star``
defaults to Parquet (the engine's serving layer); pass a JDBC URL to
target a warehouse.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def write_star(
    tables: dict[str, DataFrame],
    out_dir: str | None = None,
    jdbc_url: str | None = None,
    jdbc_props: dict[str, str] | None = None,
) -> None:
    """Persist the four star tables (K3 truncate-before-load ≡ overwrite)."""
    for name, df in tables.items():
        if jdbc_url is not None:
            df.write.jdbc(jdbc_url, name, mode="overwrite", properties=jdbc_props or {})
        else:
            assert out_dir is not None, "need out_dir or jdbc_url"
            df.write.mode("overwrite").parquet(os.path.join(out_dir, name))
