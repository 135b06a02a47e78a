"""Build an N×-replicated copy of the sf0.1 testdata (ALL tables,
join-consistent key shifts) under .scratch and optionally run bench.py
against it — the end-to-end growth-curve point BASELINE.md records
next to the sf0.1 table (the per-operator scale_probe covers operator
shapes; this covers whole headline queries).

Key consistency: every foreign key is shifted by the same stride as
its referenced primary key (lineitem.l_orderkey tracks
orders.o_orderkey, orders.o_custkey tracks customer.c_custkey, ...),
so join cardinalities scale exactly linearly. The nation/region dims
are NOT replicated — dims stay dims, as they would at a real sf1.0.

Caveat inherited from replication (same as tools/scale_probe.py):
every document/embedding gains N-1 exact twins, so NEAR-DUP PAIR
OUTPUT grows ~N²·base — pair-emitting queries are expected to track
their (recorded) output size, linear operators must track input size.

    python tools/scale_bench.py [N=10] [--bench]
"""

from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

BASE = "/root/testdata/sf0.1"

#: column → stride: one stride per key FAMILY so references stay
#: consistent across tables. Strides are comfortably above each key's
#: sf0.1 maximum (and round, for debuggability).
STRIDES = {
    "o_orderkey": 1_000_000,
    "l_orderkey": 1_000_000,
    "c_custkey": 100_000,
    "o_custkey": 100_000,
    "s_suppkey": 10_000,
    "l_suppkey": 10_000,
    "p_partkey": 100_000,
    "l_partkey": 100_000,
    "event_id": 1_000_000,
    "user_id": 10_000,
    "doc_id": 100_000,
    "vec_id": 100_000,
}

REPLICATED = (
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
DIMS = ("region", "nation")


def replicate(n: int) -> str:
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scratch",
        f"bench_x{n}",
    )
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    def stale(dst: str, table: str) -> bool:
        # The driver regenerates /root/testdata between rounds: a
        # replica older than its base would silently bench last
        # round's fixtures (or mix old and new tables). Rebuild on
        # base-newer-than-replica, reuse otherwise. A base table that
        # vanished entirely (schema change between rounds) fails at
        # the copy with a clear path error rather than here.
        if not os.path.exists(dst):
            return True
        src = os.path.join(BASE, f"{table}.parquet")
        if os.path.exists(src) and os.path.getmtime(src) > os.path.getmtime(dst):
            os.remove(dst)
            return True
        return False

    for table in DIMS:
        dst = os.path.join(out, f"{table}.parquet")
        if stale(dst, table):
            con.execute(
                f"copy (select * from '{BASE}/{table}.parquet') to '{dst}'"
                " (format parquet)"
            )
    for table in REPLICATED:
        dst = os.path.join(out, f"{table}.parquet")
        if not stale(dst, table):
            continue
        cols = duckdb.sql(
            f"select * from '{BASE}/{table}.parquet' limit 0"
        ).columns
        proj = ", ".join(
            f"{c} + {STRIDES[c]}*r as {c}" if c in STRIDES else c for c in cols
        )
        con.execute(
            f"copy (select {proj} from '{BASE}/{table}.parquet', range({n}) t(r)) "
            f"to '{dst}' (format parquet, row_group_size 262144)"
        )
    return out


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 10
    out = replicate(n)
    print(f"replicated x{n} at {out}")
    if "--bench" in sys.argv:
        env = dict(os.environ, SPARK_GRAFT_SF_DIR=out)
        # growth-curve point: 3 reps keep the run affordable at 10×
        # (bench.py reports min-of-reps; medians ride along in the JSON)
        env.setdefault("SPARK_GRAFT_BENCH_REPS", "3")
        subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(__file__), "..", "bench.py")],
            env=env,
            check=True,
        )


if __name__ == "__main__":
    main()
