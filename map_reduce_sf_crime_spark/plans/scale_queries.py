"""Heavy-scan analytical queries over the largest fixture tables.

The reference's workload is small-dimensional; these queries are the
engine's big-data exercise — full scans and multi-way shuffle joins
over ``lineitem`` (the 6M-rows-per-SF TPC-H fact), shaped like TPC-H
Q1/Q5 so the physical plans (map-side partial agg, broadcast vs
shuffle join selection, AQE) are probed at the largest local scale.

Float note: aggregate sums run in double on both engines with
different accumulation orders; the driver's %.6g value compare
absorbs the ~1e-12 relative difference. Averages are additionally
rounded to 4dp on both sides to keep the hash stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dataquality, sketches
from ..operators.asof import asof_join, asof_join_sql
from ..operators.rangejoin import range_join, range_join_sql
from ..sources.parquet import load_events, load_table
from .registry import register

SHIP_CUTOFF = "1998-09-01"


#: Gap that starts a new session (batch sessionization, SES1).
SESSION_GAP_US = 1_800_000_000  # 30 minutes


#: Ordered funnel steps (FN1): first-occurrence sequence matching —
#: each step's timestamp must be strictly after the previous step's.
FUNNEL_STEPS = ("signup", "view", "click", "purchase")


def _funnel_ctes() -> tuple[str, str]:
    """(CTE block, stage CASE expression) for the funnel oracle."""
    ctes, prev = [], None
    for i, step in enumerate(FUNNEL_STEPS, start=1):
        if prev is None:
            ctes.append(
                f"f{i} as (select user_id, min(ts) as t{i} from events "
                f"where event_type = '{step}' group by user_id)"
            )
        else:
            ctes.append(
                f"f{i} as (select e.user_id, min(e.ts) as t{i} "
                f"from events e join f{prev} using (user_id) "
                f"where e.event_type = '{step}' and e.ts > f{prev}.t{prev} "
                f"group by e.user_id)"
            )
        prev = i
    case = " ".join(
        f"when f{i}.t{i} is not null then {i}"
        for i in range(len(FUNNEL_STEPS), 0, -1)
    )
    return ",\n    ".join(ctes), f"cast(case {case} else 0 end as bigint)"


_FUNNEL_CTES, _FUNNEL_STAGE = _funnel_ctes()


@register(
    "user_gap_stats",
    f"""
    with g as (
      select user_id,
             epoch_us(ts) - lag(epoch_us(ts))
               over (partition by user_id order by ts) as gap
      from events
    ),
    base as (
      select user_id, count(*) as n_events, max(gap) as max_gap_us,
             avg(gap) as avg_gap_us,
             cast(count(*) filter (gap is null or gap > {SESSION_GAP_US})
                  as bigint) as n_sessions
      from g group by user_id
    ),
    {_FUNNEL_CTES}
    select b.user_id, b.n_events, b.max_gap_us, b.avg_gap_us,
           b.n_sessions, {_FUNNEL_STAGE} as funnel_stage
    from base b
    {' '.join(f'left join f{i} using (user_id)'
              for i in range(1, len(FUNNEL_STEPS) + 1))}
    """,
    survey_ids=("SC5", "SES1", "FN1"),
)
def user_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map ``applyInPandas`` (the per-group custom-logic UDF
    surface, SURVEY §2.10): per-user inter-event gaps computed with
    pandas inside each group, shuffled once on user_id. Gaps are
    integer microseconds so the pandas arithmetic is exact and
    hash-matches the SQL window-lag oracle. The mean is emitted
    UNROUNDED: gap sums are integers < 2^53 so sum and division are
    bit-exact doubles in both engines, whereas round-to-4dp diverges
    at .xxxx5 boundaries (Python half-even vs DuckDB half-up).

    Also carries batch sessionization (SES1): ``n_sessions`` counts
    gap-rule session starts (first event, or gap > 30 min) — the
    batch twin of the streaming ``session_window`` operator — and the
    ordered funnel stage (FN1): how far through
    signup → view → click → purchase the user progressed, each step's
    FIRST occurrence strictly after the previous step's
    (sequence-pattern matching, the match_recognize shape). All three
    analyses ride the same single user_id shuffle: inside the group
    the events are already together, so the funnel scan is a local
    pass, not four self-joins."""
    import pandas as pd

    def gaps(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts", kind="mergesort")
        us = pdf["ts"].astype("int64") // 1000
        d = us.diff().dropna()
        stage, t = 0, None
        for step in FUNNEL_STEPS:
            sel = pdf[pdf["event_type"] == step]
            if t is not None:
                sel = sel[sel["ts"] > t]
            if sel.empty:
                break
            t = sel["ts"].iloc[0]  # sorted ⇒ first row is the min
            stage += 1
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_events": [len(pdf)],
                "max_gap_us": [int(d.max()) if len(d) else None],
                "avg_gap_us": [float(d.sum()) / len(d) if len(d) else None],
                "n_sessions": [1 + int((d > SESSION_GAP_US).sum())],
                "funnel_stage": [stage],
            }
        )

    ev = load_events(spark, sf_dir).select("user_id", "ts", "event_type")
    return ev.groupBy("user_id").applyInPandas(
        gaps,
        "user_id long, n_events long, max_gap_us long, avg_gap_us double, "
        "n_sessions long, funnel_stage long",
    )


@register(
    "pricing_summary",
    f"""
    select l_returnflag, l_linestatus,
           sum(l_quantity) as sum_qty,
           sum(l_extendedprice) as sum_base_price,
           sum(l_extendedprice * (1 - l_discount)) as sum_disc_price,
           round(avg(l_quantity), 4) as avg_qty,
           round(avg(l_extendedprice), 4) as avg_price,
           count(*) as count_order
    from lineitem
    where l_shipdate < timestamp '{SHIP_CUTOFF} 00:00:00'
    group by l_returnflag, l_linestatus
    """,
    survey_ids=("SC1",),
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: one full scan of the biggest table, 6 aggregates,
    2-key group-by. The shuffle moves only #(flag×status) pre-combined
    rows per map task — the canonical map-side-partial-agg showcase.
    The ship-date filter pushes to the parquet scan."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") < F.lit(SHIP_CUTOFF)
    )
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty"),
        F.sum("l_extendedprice").alias("sum_base_price"),
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "sum_disc_price"
        ),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.count(F.lit(1)).alias("count_order"),
    )


@register(
    "forecast_revenue",
    """
    select round(sum(l_extendedprice * l_discount), 4) as revenue
    from lineitem
    where l_shipdate >= timestamp '1994-01-01 00:00:00'
      and l_shipdate <  timestamp '1995-01-01 00:00:00'
      and l_discount between 0.05 and 0.07
      and l_quantity < 24
    """,
    survey_ids=("SC3",),
)
def forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter+agg with range predicates (the
    theta/range row SURVEY §2.2 marks "not present" in the reference)
    — every predicate pushes to the parquet scan, the agg is a single
    global sum with map-side partials; the fastest possible shape for
    a 100 TB scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1994-01-01"))
            & (F.col("l_shipdate") < F.lit("1995-01-01"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4
            ).alias("revenue")
        )
    )


#: DQ1 gate leg: the profiled (column, kind) pairs of the events
#: table. Every integer-exact statistic of every column is folded
#: into ONE canonical string (sorted per-column entries, "_" for
#: NULL), so the whole profile is hash-checked as a constant column
#: riding each daily row. Floats (null_frac, mean_num) stay out of
#: the string — they are pytest-checked; min/max_num enter via
#: floor→bigint, exact on both engines.
_PROF_COLS = [
    ("event_id", "num"),
    ("ts", "other"),
    ("user_id", "num"),
    ("event_type", "str"),
    ("value", "num"),
    ("props", "str"),
]


@register(
    "events_daily_profile",
    f"""
    with _v as ({dataquality.volume_anomaly_sql('''
        select strftime(cast(ts as date), '%Y-%m-%d') as day,
               count(*) as n,
               count(distinct user_id) as n_users,
               round(median(value), 4) as median_value,
               array_to_string(list_sort(list_distinct(list(event_type))), ',')
                 as types,
               cast(coalesce(sum(cast(json_extract_string(props, '$.k') as bigint)), 0)
                    as bigint) as sum_props_k,
               cast(count(*) filter (json_extract_string(props, '$.k') is null)
                    as bigint) as n_props_missing
        from events
        group by 1
        ''')}),
    _prof as ({dataquality.column_profile_sql("events", _PROF_COLS)}),
    _entries as (
      select col || ':' || cast(n_rows as varchar)
                 || ':' || cast(n_null as varchar)
                 || ':' || cast(n_distinct as varchar)
                 || ':' || cast(approx_ok as varchar)
                 || ':' || coalesce(
                      cast(cast(floor(min_num) as bigint) as varchar), '_')
                 || ':' || coalesce(
                      cast(cast(floor(max_num) as bigint) as varchar), '_')
                 || ':' || coalesce(min_str, '_')
                 || ':' || coalesce(max_str, '_') as e
      from _prof
    ),
    _sig as (select string_agg(e, '|' order by e) as profile_sig
             from _entries)
    select _v.*, _sig.profile_sig from _v cross join _sig
    """,
    survey_ids=("SC4", "JS1", "DQ4", "DQ1"),
)
def events_daily_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.4's "not present in reference, built-in in Spark"
    aggregate surface, exercised for real: exact distinct count
    (expands to a two-phase agg), exact median, an order-stable
    collected set (sort_array(collect_set) — the only deterministic
    form of a collected column, and the one that hash-compares), and
    the semi-structured surface (JS1): ``get_json_object`` extraction
    from the JSON ``props`` column aggregated per day — extraction is
    a row-local codegen expression on the scan side of the shuffle,
    with missing keys surfacing as NULLs counted separately.

    Round 5 adds the DQ4 ingest-anomaly leg
    (operators/dataquality.volume_anomaly): each day's event volume
    z-scored against its 7 trailing days, hash-checked against the
    identical DuckDB window — the "did yesterday's crawl silently
    halve?" tripwire a daily-ingest pipeline alarms on. The window
    runs over the per-day AGGREGATE (30 rows here, years × 365 in
    production) — dim-sized by construction.

    Round 6 promotes DQ1 (operators/dataquality.column_profile) into
    the hard gate: the full-table column profile — every column's row
    / null / exact-distinct counts, the HLL self-check, floor'd
    numeric min/max and string min/max — is canonicalized into one
    sorted ``profile_sig`` string and cross-joined onto every daily
    row, hash-checked against the DuckDB brute-force profile. The
    profile itself is the operator's single melted pass (one scan,
    zero pre-aggregate shuffle); the fold to one row is profile-sized."""
    ev = load_table(spark, sf_dir, "events")
    prof = dataquality.column_profile(ev, [c for c, _ in _PROF_COLS])
    sig = prof.select(
        F.concat_ws(
            ":",
            "col",
            F.col("n_rows").cast("string"),
            F.col("n_null").cast("string"),
            F.col("n_distinct").cast("string"),
            F.col("approx_ok").cast("string"),
            F.coalesce(
                F.floor("min_num").cast("long").cast("string"), F.lit("_")
            ),
            F.coalesce(
                F.floor("max_num").cast("long").cast("string"), F.lit("_")
            ),
            F.coalesce("min_str", F.lit("_")),
            F.coalesce("max_str", F.lit("_")),
        ).alias("e")
    ).agg(
        F.concat_ws("|", F.sort_array(F.collect_list("e"))).alias(
            "profile_sig"
        )
    )
    k = F.get_json_object("props", "$.k").cast("long")
    # day/types rendered as strings: driver canon can't sort array
    # cells, and DATE vs TIMESTAMP stringify differently (round 1)
    return (
        ev.groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.median("value"), 4).alias("median_value"),
            F.concat_ws(",", F.sort_array(F.collect_set("event_type"))).alias(
                "types"
            ),
            F.coalesce(F.sum(k), F.lit(0)).cast("long").alias("sum_props_k"),
            F.count(F.when(k.isNull(), 1)).cast("long").alias(
                "n_props_missing"
            ),
        )
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n",
            "n_users",
            "median_value",
            "types",
            "sum_props_k",
            "n_props_missing",
        )
        .transform(dataquality.volume_anomaly)
        .crossJoin(F.broadcast(sig))
    )


@register(
    "asof_last_view_before_purchase",
    asof_join_sql(
        "select user_id, ts from events where event_type = 'purchase'",
        "select user_id, ts from events where event_type = 'view'",
        "user_id",
        "ts",
    ),
    survey_ids=("AJ1",),
)
def asof_last_view_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for every purchase, the user's most recent view at
    or before it (union + carry-forward window — one shuffle, no
    theta join; operators/asof.py). Oracle = DuckDB native ASOF."""
    ev = load_events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts")
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts")
    return asof_join(purchases, views, "user_id", "ts")


_RJ_WINDOW_US = 600_000_000  # views within 10 minutes before the purchase
_RJ_P_SQL = (
    "select event_id as purchase_id, ts as p_ts from events "
    "where event_type = 'purchase'"
)
_RJ_V_SQL = (
    "select ts as v_ts, value as v_value from events "
    "where event_type = 'view'"
)


@register(
    "range_join_events",
    f"""
    with pairs as ({range_join_sql(_RJ_P_SQL, _RJ_V_SQL, "p_ts", "v_ts",
                                   -_RJ_WINDOW_US, 0)}),
    agg as (
      select purchase_id, cast(count(*) as bigint) as n_views,
             max(v_value) as mx
      from pairs group by purchase_id
    )
    select p.purchase_id, coalesce(agg.n_views, 0) as n_views,
           coalesce(agg.mx, 0) as max_view_value
    from ({_RJ_P_SQL}) p left join agg using (purchase_id)
    """,
    survey_ids=("RJ1",),
)
def range_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range/interval join (operators/rangejoin.py): every view by ANY
    user in the 10 minutes before each purchase — the global temporal
    correlation shape with no equi-key, where a naive theta join
    degenerates to BroadcastNestedLoopJoin. The binned plan is a plain
    hash join on the bin id + exact refine; the aggregating outer
    shape (purchases with zero nearby views kept at n=0) is the inner
    join grouped per purchase and re-joined to the purchase side."""
    ev = load_events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), F.col("ts").alias("p_ts")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("ts").alias("v_ts"), F.col("value").alias("v_value")
    )
    pairs = range_join(purchases, views, "p_ts", "v_ts", -_RJ_WINDOW_US, 0)
    agg = pairs.groupBy("purchase_id").agg(
        F.count(F.lit(1)).alias("n_views"), F.max("v_value").alias("mx")
    )
    return purchases.join(agg, "purchase_id", "left").select(
        "purchase_id",
        F.coalesce("n_views", F.lit(0)).alias("n_views"),
        F.coalesce("mx", F.lit(0.0)).alias("max_view_value"),
    )


#: SK2 gate leg: EXACT heavy hitters of user_id via the Misra–Gries
#: sketch-then-confirm path. k=4096 counters dominate the fixture's
#: distinct-user counts (150 at sf0.01, 1500 at sf0.1), so the MG
#: error mass D stays far under the threshold (bound: n/(k+1) ≈ 24 at
#: sf0.1 < 70) and the candidate superset is tight at every tested SF.
HH_THRESHOLD = 70
HH_K = 4096


@register(
    "sketch_event_stats",
    f"""
    with hh as (
      select coalesce(user_id::varchar, '') as value,
             cast(count(*) as bigint) as n
      from events group by 1 having count(*) >= {HH_THRESHOLD}
    ),
    hs as (
      select cast(count(*) as bigint) as n_hh_users,
             cast(coalesce(max(n), 0) as bigint) as hh_max_n,
             cast(coalesce(sum(n), 0) as bigint) as hh_sum_n
      from hh
    )
    select event_type, count(*) as n, 1 as users_ok, 1 as median_ok,
           hs.n_hh_users, hs.hh_max_n, hs.hh_sum_n
    from events cross join hs
    group by event_type, hs.n_hh_users, hs.hh_max_n, hs.hh_sum_n
    """,
    survey_ids=("SC6", "SK2"),
)
def sketch_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregates (SURVEY §2.4 "approx distinct … built-in"):
    HyperLogLog++ distinct users and an approximate median per event
    type. Sketches are mergeable ⇒ map-side partial aggregation works
    and the shuffle carries fixed-size state — the ONLY viable
    distinct-count shape at 100 TB. Engine-specific sketch values
    can't be SQL-oracled directly, so the entry emits driver-checkable
    error bounds instead: ``users_ok`` (HLL++ within 3×rsd of the
    exact distinct count) and ``median_ok`` (approx median within 5%
    of the exact median), both computed against exact Spark aggregates
    and expected all-1 by the oracle.

    Round 6 promotes SK2 (operators/sketches.heavy_hitters) into the
    hard gate: the exact user_id heavy hitters (≥ HH_THRESHOLD events)
    are computed through the Misra–Gries sketch → candidate superset →
    IN-filtered confirm pass, summarized to three hash-checked columns
    (count / max / total of the heavy hitters' exact counts) riding
    every output row via a broadcast one-row cross join. A sketch that
    drops a true heavy hitter, or a confirm pass that miscounts,
    hash-mismatches against DuckDB's brute-force group-by-having."""
    ev = load_events(spark, sf_dir)
    hh = sketches.heavy_hitters(ev, "user_id", HH_THRESHOLD, k=HH_K)
    hh_sum = hh.agg(
        F.count(F.lit(1)).cast("long").alias("n_hh_users"),
        F.coalesce(F.max("n"), F.lit(0)).cast("long").alias("hh_max_n"),
        F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("hh_sum_n"),
    )
    agg = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.percentile_approx("value", 0.5, 10_000).alias("approx_median"),
        F.countDistinct("user_id").alias("exact_users"),
        F.median("value").alias("exact_median"),
        F.count(F.lit(1)).alias("n"),
    )
    return agg.select(
        "event_type",
        "n",
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            <= 0.06 * F.col("exact_users")
        )
        .cast("int")
        .alias("users_ok"),
        (
            F.abs(F.col("approx_median") - F.col("exact_median"))
            <= 0.05 * F.abs(F.col("exact_median"))
        )
        .cast("int")
        .alias("median_ok"),
    ).crossJoin(F.broadcast(hh_sum))


@register(
    "revenue_by_nation",
    """
    select n_name as nation,
           sum(l_extendedprice * (1 - l_discount)) as revenue,
           count(*) as n_items
    from lineitem
    join orders on l_orderkey = o_orderkey
    join customer on o_custkey = c_custkey
    join nation on c_nationkey = n_nationkey
    group by n_name
    """,
    survey_ids=("SC2",),
)
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: the big-join exercise — lineitem⋈orders is a
    genuine shuffle join on the fact keys (AQE may pick broadcast at
    small SF; at 100 TB it stays sort-merge on co-partitioned keys —
    the bucketed layout in sources/lakehouse.py makes it shuffle-free),
    customer⋈nation is an explicit broadcast."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )
