"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB over the same sf dir, compares row count, column names, and
an order-insensitive value hash (columns sorted by name, rows sorted,
values stringified). Use while iterating:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import duckdb

from map_reduce_sf_crime_spark.plans.registry import REGISTRY
from map_reduce_sf_crime_spark.sources.parquet import TABLES
from map_reduce_sf_crime_spark.session import get_spark


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = f"{v:.6g}"
            vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or list(REGISTRY)
    spark = get_spark("check_oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"create view {t} as select * from '{sf_dir}/{t}.parquet'"
        )
    failed = []
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        print(f"unknown queries: {unknown}; known: {sorted(REGISTRY)}")
        return 2
    for name in names:
        spec = REGISTRY[name]
        sdf = spec.spark(spark, sf_dir)
        srows = sdf.collect()
        scols = sdf.columns
        if spec.oracle is None:
            print(f"{name}: rows-only check, {len(srows)} rows "
                  f"({'OK' if len(srows) >= 0 else 'FAIL'})")
            continue
        try:
            ores = con.sql(spec.oracle)
            ocols = [c for c in ores.columns]
            orows = ores.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ORACLE SQL ERROR: {e}")
            failed.append(name)
            continue
        ok = True
        if sorted(scols) != sorted(ocols):
            print(f"{name}: COLUMN MISMATCH spark={sorted(scols)} duck={sorted(ocols)}")
            ok = False
        elif len(srows) != len(orows):
            print(f"{name}: ROWCOUNT MISMATCH spark={len(srows)} duck={len(orows)}")
            ok = False
        else:
            sn = normalize([tuple(r) for r in srows], scols)
            on = normalize(orows, ocols)
            if sn != on:
                diff = [i for i, (a, b) in enumerate(zip(sn, on)) if a != b][:3]
                print(f"{name}: VALUE MISMATCH at sorted rows {diff}")
                for i in diff[:2]:
                    print(f"   spark: {sn[i]}\n   duck : {on[i]}")
                ok = False
        if ok:
            print(f"{name}: OK ({len(srows)} rows)")
        else:
            failed.append(name)
    spark.stop()
    if failed:
        print("FAILED:", failed)
        return 1
    print("all green")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
