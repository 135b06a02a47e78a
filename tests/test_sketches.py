"""SK2 Misra–Gries heavy hitters: exactness of the sketch-then-confirm
answer against the brute-force definition, the superset guarantee
under tiny k, the hypothesis property, and loud guards."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from map_reduce_sf_crime_spark.operators import sketches
from map_reduce_sf_crime_spark.sources.parquet import load_table

from .conftest import SF_SMOKE


def _zipf_df(spark):
    # value i appears ~ 3000/i times: a long Zipfian tail with a
    # handful of genuine heavy hitters
    rows = []
    rid = 0
    for i in range(1, 200):
        for _ in range(3000 // i):
            rows.append((rid, f"v{i}"))
            rid += 1
    rows.append((rid, None))  # NULL counts under the '' sentinel
    return spark.createDataFrame(rows, "id long, val string").repartition(16)


def test_heavy_hitters_exact_vs_bruteforce(spark):
    # k sized to the threshold (the usage contract: the MG error mass
    # is ~n/(k+1), so lower thresholds need larger summaries; k=256
    # exceeds the fixture's 200 distinct values -> D=0 exactly)
    df = _zipf_df(spark)
    for threshold, k in ((100, 256), (500, 64), (1500, 64)):
        got = {
            (r.value, r.n)
            for r in sketches.heavy_hitters(df, "val", threshold, k=k).collect()
        }
        want = {
            (r.val if r.val is not None else "", r.n)
            for r in df.groupBy("val")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") >= threshold)
            .collect()
        }
        assert got == want, f"threshold={threshold}"
        assert got  # the fixture genuinely has hitters at every threshold


def test_heavy_hitters_tiny_k_still_exact(spark):
    """Correctness never depends on k (while the error-mass guard
    holds): an undersized k=24 summary inflates the candidate set
    but the confirm pass keeps the answer exact."""
    df = _zipf_df(spark)
    got = {
        (r.value, r.n)
        for r in sketches.heavy_hitters(df, "val", 1500, k=24).collect()
    }
    want = {
        (r.val, r.n)
        for r in df.groupBy("val")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 1500)
        .collect()
    }
    assert got == want


def test_heavy_hitters_error_mass_guard_is_loud(spark):
    """A threshold at or below the merged error mass means the sketch
    prunes nothing — refuse loudly instead of degenerating into a
    full groupBy."""
    df = _zipf_df(spark)
    with pytest.raises(ValueError, match="error mass"):
        sketches.heavy_hitters(df, "val", 2, k=2)
    with pytest.raises(ValueError, match="threshold"):
        sketches.heavy_hitters(df, "val", 0)
    with pytest.raises(ValueError, match="k must"):
        sketches.mg_summaries(df, "val", 0)


def test_mg_merge_bound_property():
    """Pure-python property: for random streams split across
    'partitions', merged MG estimates satisfy
    est(v) <= true(v) <= est(v) + D for every value."""
    import random

    rng = random.Random(7)
    for trial in range(20):
        k = rng.choice([4, 8, 16])
        n_parts = rng.randint(1, 6)
        stream = [
            f"x{rng.randint(1, rng.choice([5, 30, 200]))}"
            for _ in range(rng.randint(50, 2000))
        ]
        true = {}
        for v in stream:
            true[v] = true.get(v, 0) + 1
        # split into partitions, build per-partition summaries
        parts = [stream[i::n_parts] for i in range(n_parts)]
        rows = []
        for p in parts:
            counters: dict = {}
            dec = 0
            for v in p:
                dec += sketches._mg_update(counters, v, 1, k)
            first = True
            for v, c in counters.items():
                rows.append((v, c, dec if first else 0))
                first = False
            if not counters and dec:
                rows.append(("", 0, dec))
        merged, d = sketches._merge_summaries(rows, k)
        for v, t in true.items():
            est = merged.get(v, 0)
            assert est <= t <= est + d, (trial, v, est, t, d)


def test_heavy_hitters_matches_duckdb_twin(spark):
    """Exact answer equals the DuckDB brute-force twin on the real
    documents table (source column: ~20 hitters at low thresholds)."""
    docs = load_table(spark, SF_SMOKE, "documents")
    got = {
        (r.value, r.n)
        for r in sketches.heavy_hitters(docs, "source", 20, k=32).collect()
    }
    con = duckdb.connect()
    con.sql(
        f"create view documents as select * from "
        f"read_parquet('{SF_SMOKE}/documents.parquet')"
    )
    want = {
        tuple(r)
        for r in con.sql(
            sketches.heavy_hitters_sql("source", 20, "documents")
        ).fetchall()
    }
    assert got == want and got
