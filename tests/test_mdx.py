"""The reference's MDX surface, run VERBATIM through the MDX
front-end (mdx.py) and checked cell-for-cell against direct star
aggregations — bycategory.mdx, bydistrict.mdx, mondrian.jsp:6-9, and
the drill-down shapes JPivot issues against them."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from map_reduce_sf_crime_spark.mdx import MdxError, mdx_query, parse_mdx
from map_reduce_sf_crime_spark.plans.crimes_view import incidents
from map_reduce_sf_crime_spark.operators.star import star_tables

from .conftest import SF_SMOKE

BYCATEGORY = """select {([Measures].[crimes], [Time].[2013])} ON COLUMNS,
  {[Category].[All Categories]} ON ROWS
from [sfcrime]
where [District].[All Districts]
"""

BYDISTRICT = """select {([Measures].[crimes], [Time].[2013])} ON COLUMNS,
  {[District].[All Districts]} ON ROWS
from [sfcrime]
where [Category].[All Categories]
"""

JSP_QUERY = """select {[Measures].[crimes]} ON COLUMNS,
  {([District].[All Districts], [Category].[All Categories])} ON ROWS
from [sfcrime]
where [Time].[2013]
"""


def _year_total(spark, year: int) -> int:
    inc = incidents(spark, SF_SMOKE)
    return (
        inc.filter(F.year("d") == year).count()
    )  # each incident contributes 1 crime


def _fixture_year(spark) -> int:
    return incidents(spark, SF_SMOKE).select(F.year("d")).distinct().collect()[0][0]


def _patch_year(q: str, year: int) -> str:
    # the fixture corpus may not be 2013; the reference query text is
    # exercised verbatim once, then re-run with the fixture's year for
    # the value assertions
    return q.replace("[Time].[2013]", f"[Time].[{year}]")


def test_reference_queries_verbatim_parse(spark):
    for q in (BYCATEGORY, BYDISTRICT, JSP_QUERY):
        parsed = parse_mdx(q)
        assert parsed.cube == "sfcrime"


def test_bycategory_and_bydistrict_totals(spark):
    year = _fixture_year(spark)
    want = _year_total(spark, year)
    for q, row_caption in (
        (BYCATEGORY, "All Categories"),
        (BYDISTRICT, "All Districts"),
    ):
        rows = mdx_query(spark, SF_SMOKE, _patch_year(q, year)).collect()
        assert len(rows) == 1
        (r,) = rows
        assert r.row_member == row_caption
        assert r.col_member == f"crimes, {year}"
        assert r.crimes == want


def test_jsp_grand_total(spark):
    year = _fixture_year(spark)
    rows = mdx_query(spark, SF_SMOKE, _patch_year(JSP_QUERY, year)).collect()
    assert len(rows) == 1
    (r,) = rows
    assert r.row_member == "All Districts, All Categories"
    assert r.col_member == "crimes"
    assert r.crimes == _year_total(spark, year)


def test_children_drilldown_matches_groupby(spark):
    """JPivot drill-down: [District].[All Districts].Children enumerates
    one row per district with its sum — must equal a direct groupBy on
    the star join, and sum back to the slicer total."""
    year = _fixture_year(spark)
    q = f"""select {{[Measures].[crimes]}} ON COLUMNS,
      {{[District].[All Districts].Children}} ON ROWS
    from [sfcrime] where [Time].[{year}]"""
    got = {
        r.row_member: r.crimes for r in mdx_query(spark, SF_SMOKE, q).collect()
    }
    inc = incidents(spark, SF_SMOKE).filter(F.year("d") == year)
    want = {
        r.district: r.n
        for r in inc.groupBy("district").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == want
    assert sum(got.values()) == _year_total(spark, year)


def test_time_path_and_crossed_enumerations(spark):
    """[Time].[year].Children on COLUMNS crossed with category
    children on ROWS: one cell per (category, month) with month
    0-based exactly as the timeperiod dim stores Calendar.MONTH."""
    year = _fixture_year(spark)
    q = f"""select {{([Measures].[crimes], [Time].[{year}].Children)}} ON COLUMNS,
      {{[Category].[All Categories].Children}} ON ROWS
    from [sfcrime]"""
    got = {
        (r.row_member, r.col_member): r.crimes
        for r in mdx_query(spark, SF_SMOKE, q).collect()
    }
    inc = incidents(spark, SF_SMOKE).filter(F.year("d") == year)
    want = {
        (r.category, f"crimes, {year}, {r.m}"): r.n
        for r in inc.select(
            "category", (F.month("d") - 1).alias("m")
        )
        .groupBy("category", "m")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_point_member_filter(spark):
    """An explicit level-1 member ([District].[<name>]) filters."""
    year = _fixture_year(spark)
    inc = incidents(spark, SF_SMOKE)
    district = inc.select("district").distinct().orderBy("district").collect()[0][0]
    q = f"""select {{[Measures].[crimes]}} ON COLUMNS,
      {{[District].[{district}]}} ON ROWS
    from [sfcrime] where [Time].[{year}]"""
    rows = mdx_query(spark, SF_SMOKE, q).collect()
    assert len(rows) == 1
    assert rows[0].row_member == district
    assert rows[0].crimes == inc.filter(
        (F.col("district") == district) & (F.year("d") == year)
    ).count()


def test_multi_tuple_axis(spark):
    """A set of several tuples on one axis yields one cell per tuple."""
    year = _fixture_year(spark)
    q = f"""select {{[Measures].[crimes]}} ON COLUMNS,
      {{[District].[All Districts], [Category].[All Categories]}} ON ROWS
    from [sfcrime] where [Time].[{year}]"""
    rows = mdx_query(spark, SF_SMOKE, q).collect()
    want = _year_total(spark, year)
    assert {(r.row_member, r.crimes) for r in rows} == {
        ("All Districts", want),
        ("All Categories", want),
    }


def test_parse_errors():
    for bad in (
        "select {[Measures].[crimes]} ON COLUMNS from [sfcrime]",  # one axis
        BYCATEGORY.replace("sfcrime", "adventureworks"),  # unknown cube
        BYCATEGORY.replace("[Measures].[crimes]", "[Measures].[profit]"),
        BYCATEGORY.replace("[Category].[All Categories]",
                           "[Category].[All Categories].[x].[y]"),  # too deep
        BYCATEGORY.replace("[District].[All Districts]",
                           "[District].[All Districts].Children"),  # enum slicer
    ):
        with pytest.raises(MdxError):
            parse_mdx(bad)


def test_verbatim_reference_files_run(spark):
    """The exact on-disk reference MDX strings execute end-to-end
    (values asserted in the year-patched tests above; here the 2013
    literal simply yields an empty or matching frame without error)."""
    for q in (BYCATEGORY, BYDISTRICT, JSP_QUERY):
        df = mdx_query(spark, SF_SMOKE, q)
        assert df.columns == [
            "row_member", "col_member", "crimes", "row_ordinal",
            "col_ordinal",
        ]
        df.collect()


def test_unique_name_path_below_all_captions_as_member(spark):
    """[District].[All Districts].[<name>] (the Mondrian unique-name
    form) filters like [District].[<name>] and captions as the member
    alone — children and deeper paths don't inherit the All caption."""
    year = _fixture_year(spark)
    inc = incidents(spark, SF_SMOKE)
    district = inc.select("district").distinct().orderBy("district").collect()[0][0]
    q = f"""select {{[Measures].[crimes]}} ON COLUMNS,
      {{[District].[All Districts].[{district}]}} ON ROWS
    from [sfcrime] where [Time].[{year}]"""
    rows = mdx_query(spark, SF_SMOKE, q).collect()
    assert len(rows) == 1 and rows[0].row_member == district


def test_empty_cells_emit_no_rows(spark):
    """A slicer matching zero facts yields an EMPTY frame, not a
    NULL-crimes row (one row per populated cell)."""
    q = """select {[Measures].[crimes]} ON COLUMNS,
      {[Category].[All Categories]} ON ROWS
    from [sfcrime] where [Time].[1899]"""
    assert mdx_query(spark, SF_SMOKE, q).count() == 0


def test_bare_time_hierarchy_rejected():
    """[Time] has no All member (hasAll=false): a bare hierarchy
    reference is an error, not a silent aggregate-everything."""
    with pytest.raises(MdxError):
        parse_mdx(
            "select {[Measures].[crimes]} ON COLUMNS, {[Time]} ON ROWS from [sfcrime]"
        )


def test_crossjoin_and_non_empty(spark):
    """Crossjoin of two enumerations equals the two-key groupBy, and
    NON EMPTY parses as a (semantic no-op) prefix — the tidy contract
    already emits populated cells only."""
    year = _fixture_year(spark)
    q = f"""select {{[Measures].[crimes]}} ON COLUMNS,
      NON EMPTY Crossjoin({{[District].[All Districts].Children}},
                          {{[Category].[All Categories].Children}}) ON ROWS
    from [sfcrime] where [Time].[{year}]"""
    got = {
        r.row_member: r.crimes for r in mdx_query(spark, SF_SMOKE, q).collect()
    }
    inc = incidents(spark, SF_SMOKE).filter(F.year("d") == year)
    want = {
        f"{r.district}, {r.category}": r.n
        for r in inc.groupBy("district", "category")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want
    # NON EMPTY is real pruning: only populated pairs appear
    n_dist = inc.select("district").distinct().count()
    n_cat = inc.select("category").distinct().count()
    assert len(got) <= n_dist * n_cat


def test_on_disk_reference_mdx_files_run(spark):
    """The actual files shipped in the reference checkout parse and
    execute byte-verbatim (no transcription drift between the strings
    pinned above and the on-disk artifacts)."""
    import pathlib

    ref = pathlib.Path("/root/reference/src/main/etc")
    if not ref.exists():
        pytest.skip("reference checkout not present")
    for name in ("bycategory.mdx", "bydistrict.mdx"):
        text = (ref / name).read_text()
        df = mdx_query(spark, SF_SMOKE, text)
        assert df.columns == [
            "row_member", "col_member", "crimes", "row_ordinal",
            "col_ordinal",
        ]
        df.collect()


def test_default_time_member_implicit_slicer(spark):
    """Mondrian evaluates hierarchies absent from every axis and the
    slicer at their DEFAULT member; the cube pins [Time]'s default to
    [2013].[1].[1] (hasAll=false, sfcrime.xml:19). A query that never
    names [Time] must therefore slice to that member — with the
    cube's literal 2013 default the 1995 fixture has no cells — and an
    overridden fixture-appropriate default must equal the direct
    (year, month, week) filtered aggregate."""
    from map_reduce_sf_crime_spark.plans.olap_queries import _star_join

    q = """select {[Measures].[crimes]} ON COLUMNS,
      {[District].[All Districts]} ON ROWS
    from [sfcrime]"""
    assert mdx_query(spark, SF_SMOKE, q).count() == 0  # 2013 default

    sj = _star_join(spark, SF_SMOKE)
    first = (
        sj.select("year", "month", "week")
        .orderBy("year", "month", "week")
        .limit(1)
        .collect()[0]
    )
    default = (first.year, first.month, first.week)
    rows = mdx_query(spark, SF_SMOKE, q, time_default=default).collect()
    want = (
        sj.filter(
            (F.col("year") == default[0])
            & (F.col("month") == default[1])
            & (F.col("week") == default[2])
        )
        .agg(F.sum("crimes"))
        .collect()[0][0]
    )
    assert len(rows) == 1
    assert rows[0].row_member == "All Districts"
    assert rows[0].crimes == want


def test_leaf_preaggregation_path_matches_direct(spark):
    """A matrix with >= MDX_LEAF_MIN_PAIRS ENUMERATING pairs (the
    switch counts enum pairs, not all pairs — scalar cells batch into
    one conditional aggregation regardless) routes every pair's
    groupBy through the leaf pre-aggregate; values must equal the
    direct filtered counts — sum-of-sums reassociativity."""
    from map_reduce_sf_crime_spark.mdx import MDX_LEAF_MIN_PAIRS

    year = _fixture_year(spark)
    inc = incidents(spark, SF_SMOKE).filter(F.year("d") == year)
    d1, d2 = [
        r.district
        for r in inc.select("district").distinct().orderBy("district").limit(2).collect()
    ]
    # the column tuple enumerates [Time].[year].Children, so EVERY
    # pair of the 1×4 matrix is an enumerating pair
    q = f"""select {{([Measures].[crimes], [Time].[{year}].Children)}} ON COLUMNS,
      {{[District].[{d1}], [District].[{d2}],
        [District].[All Districts], [Category].[All Categories]}} ON ROWS
    from [sfcrime]"""
    parsed = parse_mdx(q)
    enum_pairs = [
        (ct, rt)
        for ct in parsed.columns
        for rt in parsed.rows
        if any(m.enum_col for m in ct + rt)
    ]
    assert len(enum_pairs) >= MDX_LEAF_MIN_PAIRS  # leaf branch engaged
    got = {
        (r.row_member, r.col_member): r.crimes
        for r in mdx_query(spark, SF_SMOKE, q).collect()
    }
    by_month = {
        r.m: r.n
        for r in inc.select((F.month("d") - 1).alias("m"))
        .groupBy("m")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    want = {}
    for m in by_month:
        col = f"crimes, {year}, {m}"
        for d in (d1, d2):
            n = inc.filter(
                (F.col("district") == d) & (F.month("d") - 1 == m)
            ).count()
            if n:
                want[(d, col)] = n
        want[("All Districts", col)] = by_month[m]
        want[("All Categories", col)] = by_month[m]
    assert got == want


# --------------------------------------------------------------- round 6:
# the JPivot sort/filter grammar (Order / TopCount / Filter on ROWS)


def _district_totals(spark, year: int) -> dict[str, int]:
    """Independent per-district totals for the fixture year (direct
    star aggregation, no MDX)."""
    t = star_tables(incidents(spark, SF_SMOKE))
    sj = (
        t["fact"]
        .join(t["district"].withColumnRenamed("name", "district"), "district_id")
        .join(t["timeperiod"].select("time_id", "year"), "time_id")
        .filter(F.col("year") == year)
        .groupBy("district")
        .agg(F.sum("crimes").alias("crimes"))
    )
    return {r.district: r.crimes for r in sj.collect()}


def _cells(spark, q: str):
    from map_reduce_sf_crime_spark.mdx import mdx_cells_many
    from map_reduce_sf_crime_spark.plans.olap_queries import _star_join

    return mdx_cells_many(
        _star_join(spark, SF_SMOKE), [("q", parse_mdx(q))]
    ).collect()


def test_order_bdesc_attaches_ordinals(spark):
    """The JPivot sort action: Order(children, measure, BDESC) emits
    1-based row ordinals by value descending, caption-ascending ties —
    membership unchanged vs the unsorted drill."""
    year = _fixture_year(spark)
    q = f"""select {{([Measures].[crimes], [Time].[{year}])}} ON COLUMNS,
  Order({{[District].[All Districts].Children}},
        ([Measures].[crimes], [Time].[{year}]), BDESC) ON ROWS
from [sfcrime]
"""
    rows = _cells(spark, q)
    want = _district_totals(spark, year)
    assert {r.row_member: r.crimes for r in rows} == want
    # ordinal order == value desc, caption asc on ties
    expect = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))
    got = sorted(rows, key=lambda r: r.row_ordinal)
    assert [r.row_member for r in got] == [d for d, _ in expect]
    assert [r.row_ordinal for r in got] == list(range(1, len(want) + 1))


def test_order_asc_reverses(spark):
    year = _fixture_year(spark)
    q = f"""select {{([Measures].[crimes], [Time].[{year}])}} ON COLUMNS,
  Order({{[District].[All Districts].Children}},
        ([Measures].[crimes], [Time].[{year}]), ASC) ON ROWS
from [sfcrime]
"""
    rows = sorted(_cells(spark, q), key=lambda r: r.row_ordinal)
    vals = [r.crimes for r in rows]
    assert vals == sorted(vals)


def test_topcount_keeps_top_n_members(spark):
    year = _fixture_year(spark)
    q = f"""select {{([Measures].[crimes], [Time].[{year}])}} ON COLUMNS,
  TopCount({{[District].[All Districts].Children}}, 3,
           ([Measures].[crimes], [Time].[{year}])) ON ROWS
from [sfcrime]
"""
    rows = _cells(spark, q)
    want = _district_totals(spark, year)
    top3 = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert {r.row_member: r.crimes for r in rows} == dict(top3)
    assert all(r.row_ordinal is None for r in rows)


def test_filter_keeps_matching_members(spark):
    year = _fixture_year(spark)
    want = _district_totals(spark, year)
    cut = sorted(want.values())[len(want) // 2]
    q = f"""select {{([Measures].[crimes], [Time].[{year}])}} ON COLUMNS,
  Filter({{[District].[All Districts].Children}},
         ([Measures].[crimes], [Time].[{year}]) >= {cut}) ON ROWS
from [sfcrime]
"""
    rows = _cells(spark, q)
    assert {r.row_member: r.crimes for r in rows} == {
        d: c for d, c in want.items() if c >= cut
    }


def test_composed_filter_then_order(spark):
    """JPivot composes: Order(Filter(...), ...) — membership from the
    inner Filter, ordinals from the outer Order."""
    year = _fixture_year(spark)
    want = _district_totals(spark, year)
    cut = sorted(want.values())[len(want) // 2]
    q = f"""select {{([Measures].[crimes], [Time].[{year}])}} ON COLUMNS,
  Order(Filter({{[District].[All Districts].Children}},
               ([Measures].[crimes], [Time].[{year}]) >= {cut}),
        ([Measures].[crimes], [Time].[{year}]), BDESC) ON ROWS
from [sfcrime]
"""
    rows = sorted(_cells(spark, q), key=lambda r: r.row_ordinal)
    kept = {d: c for d, c in want.items() if c >= cut}
    assert [r.row_member for r in rows] == [
        d for d, _ in sorted(kept.items(), key=lambda kv: (-kv[1], kv[0]))
    ]


def test_set_function_parse_errors():
    for q, msg in [
        (
            "select {[Measures].[crimes]} ON COLUMNS,"
            " Order({[District].[All Districts].Children},"
            " [District].[All Districts]) ON ROWS from [sfcrime]",
            "exactly one measure",
        ),
        (
            "select {[Measures].[crimes]} ON COLUMNS,"
            " TopCount({[District].[All Districts].Children}, 0) ON ROWS"
            " from [sfcrime]",
            "positive int",
        ),
        (
            "select {[Measures].[crimes]} ON COLUMNS,"
            " Crossjoin(Order({[District].[All Districts].Children},"
            " [Measures].[crimes]), {[Category].[All Categories].Children})"
            " ON ROWS from [sfcrime]",
            "wrap Crossjoin",
        ),
    ]:
        with pytest.raises(MdxError, match=msg):
            parse_mdx(q)


def test_composed_order_then_filter_keeps_ordinals(spark):
    """The review-flagged direction: Filter(Order(...)) must keep the
    inner Order's ordinals (with gaps where members were filtered
    away — relative order preserved), not silently drop the sort."""
    year = _fixture_year(spark)
    want = _district_totals(spark, year)
    cut = sorted(want.values())[len(want) // 2]
    q = f"""select {{([Measures].[crimes], [Time].[{year}])}} ON COLUMNS,
  Filter(Order({{[District].[All Districts].Children}},
               ([Measures].[crimes], [Time].[{year}]), BDESC),
         ([Measures].[crimes], [Time].[{year}]) >= {cut}) ON ROWS
from [sfcrime]
"""
    rows = _cells(spark, q)
    kept = {d: c for d, c in want.items() if c >= cut}
    assert {r.row_member: r.crimes for r in rows} == kept
    # ordinals present, strictly increasing in value-desc order, with
    # gaps allowed (they index the PRE-filter sort)
    by_ord = sorted(rows, key=lambda r: r.row_ordinal)
    full_order = [
        d for d, _ in sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))
    ]
    assert [r.row_member for r in by_ord] == [
        d for d in full_order if d in kept
    ]
    assert all(r.row_ordinal == full_order.index(r.row_member) + 1
               for r in rows)


# ---------------------------------------------------------------- round 7:
# COLUMNS-axis set functions, WITH MEMBER calculated members, and the
# left-join missing-value policy for chained ops.


def test_columns_axis_order_attaches_col_ordinals(spark):
    """The JPivot COLUMN sort (round 7 — the symmetric case of the
    round-6 ROWS shapes): Order on the COLUMNS axis attaches 1-based
    col_ordinal by value descending, caption-ascending ties;
    row_ordinal stays NULL."""
    year = _fixture_year(spark)
    q = f"""select Order({{[District].[All Districts].Children}},
        ([Measures].[crimes], [Time].[{year}]), BDESC) ON COLUMNS,
  {{([Measures].[crimes], [Time].[{year}])}} ON ROWS
from [sfcrime]
"""
    rows = _cells(spark, q)
    want = _district_totals(spark, year)
    assert {r.col_member: r.crimes for r in rows} == want
    expect = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))
    got = sorted(rows, key=lambda r: r.col_ordinal)
    assert [r.col_member for r in got] == [d for d, _ in expect]
    assert [r.col_ordinal for r in got] == list(range(1, len(want) + 1))
    assert all(r.row_ordinal is None for r in rows)


def test_columns_axis_topcount_and_filter(spark):
    year = _fixture_year(spark)
    want = _district_totals(spark, year)
    cut = sorted(want.values())[len(want) // 2]
    q = f"""select Filter({{[District].[All Districts].Children}},
        ([Measures].[crimes], [Time].[{year}]) >= {cut}) ON COLUMNS,
  {{([Measures].[crimes], [Time].[{year}])}} ON ROWS
from [sfcrime]
"""
    rows = _cells(spark, q)
    assert {r.col_member: r.crimes for r in rows} == {
        d: c for d, c in want.items() if c >= cut
    }
    q2 = f"""select TopCount({{[District].[All Districts].Children}}, 3,
        ([Measures].[crimes], [Time].[{year}])) ON COLUMNS,
  {{([Measures].[crimes], [Time].[{year}])}} ON ROWS
from [sfcrime]
"""
    rows2 = _cells(spark, q2)
    top3 = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert {r.col_member: r.crimes for r in rows2} == dict(top3)


def test_ops_on_both_axes_resolve_independently(spark):
    """Rows Order + columns Filter in one query: each axis's
    membership/ordinals come from the ORIGINAL cells (Mondrian
    resolves axes independently), and both ordinal columns land."""
    year = _fixture_year(spark)
    inc = incidents(spark, SF_SMOKE).filter(F.year("d") == year)
    cat_tot = {
        r.category: r.n
        for r in inc.groupBy("category").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    dist_tot = _district_totals(spark, year)
    cut = sorted(cat_tot.values())[len(cat_tot) // 2]
    q = f"""select Filter({{[Category].[All Categories].Children}},
        ([Measures].[crimes], [Time].[{year}]) >= {cut}) ON COLUMNS,
  Order({{[District].[All Districts].Children}},
        ([Measures].[crimes], [Time].[{year}]), BDESC) ON ROWS
from [sfcrime] where [Time].[{year}]
"""
    rows = _cells(spark, q)
    kept_cats = {c for c, n in cat_tot.items() if n >= cut}
    assert {r.col_member for r in rows} == kept_cats
    assert {r.row_member for r in rows} <= set(dist_tot)
    # row ordinals follow the district totals (NOT the filtered-column
    # subtotals): the Order expression context is the year, axes
    # independent of the column Filter
    by_dist = {}
    for r in rows:
        by_dist.setdefault(r.row_member, r.row_ordinal)
        assert r.row_ordinal == by_dist[r.row_member]
    order = sorted(by_dist, key=lambda d: by_dist[d])
    expect = [d for d, _ in sorted(dist_tot.items(), key=lambda kv: (-kv[1], kv[0]))
              if d in by_dist]
    assert order == expect


def test_with_member_ratio_enumerating(spark):
    """The canonical JPivot ratio member: per-district share of the
    all-district total, alongside the base measure — multi-measure
    COLUMNS (two tuples), calc cells double, base cells ride along."""
    year = _fixture_year(spark)
    want = _district_totals(spark, year)
    total = sum(want.values())
    q = f"""WITH MEMBER [Measures].[share] AS
  '[Measures].[crimes] / ([Measures].[crimes], [District].[All Districts])'
select {{[Measures].[crimes], [Measures].[share]}} ON COLUMNS,
  {{[District].[All Districts].Children}} ON ROWS
from [sfcrime] where [Time].[{year}]
"""
    rows = _cells(spark, q)
    crimes = {r.row_member: r.crimes for r in rows if r.col_member == "crimes"}
    share = {r.row_member: r.crimes for r in rows if r.col_member == "share"}
    assert crimes == {d: float(c) for d, c in want.items()}
    assert share == {d: c / total for d, c in want.items()}


def test_with_member_scalar_ratio(spark):
    """A scalar calc cell (no enumeration) folds into the one-pass
    conditional aggregation: one district's share of the total."""
    year = _fixture_year(spark)
    want = _district_totals(spark, year)
    district = sorted(want)[0]
    q = f"""WITH MEMBER [Measures].[share] AS
  '([Measures].[crimes], [District].[{district}]) / [Measures].[crimes]'
select {{[Measures].[share]}} ON COLUMNS,
  {{[Category].[All Categories]}} ON ROWS
from [sfcrime] where [Time].[{year}]
"""
    rows = _cells(spark, q)
    assert len(rows) == 1
    assert rows[0].crimes == want[district] / sum(want.values())


def test_with_member_arithmetic_and_literals(spark):
    """Precedence and literals: a + b * 2 binds the product first;
    parenthesized sub-expressions override."""
    year = _fixture_year(spark)
    total = sum(_district_totals(spark, year).values())
    q = f"""WITH MEMBER [Measures].[x] AS
  '[Measures].[crimes] + [Measures].[crimes] * 2'
select {{[Measures].[x]}} ON COLUMNS,
  {{[District].[All Districts]}} ON ROWS
from [sfcrime] where [Time].[{year}]
"""
    rows = _cells(spark, q)
    assert rows[0].crimes == float(total + total * 2)
    q2 = f"""WITH MEMBER [Measures].[y] AS
  '([Measures].[crimes] + [Measures].[crimes]) * 2'
select {{[Measures].[y]}} ON COLUMNS,
  {{[District].[All Districts]}} ON ROWS
from [sfcrime] where [Time].[{year}]
"""
    assert _cells(spark, q2)[0].crimes == float((total + total) * 2)


def test_with_member_sort_rows_by_ratio_column(spark):
    """JPivot sort on a calculated column: Order(rows, [Measures].[share])
    rides the shortcut (the expression IS the single column tuple) —
    no recomputation, ordinals follow the ratio descending."""
    year = _fixture_year(spark)
    want = _district_totals(spark, year)
    q = f"""WITH MEMBER [Measures].[share] AS
  '[Measures].[crimes] / ([Measures].[crimes], [District].[All Districts])'
select {{[Measures].[share]}} ON COLUMNS,
  Order({{[District].[All Districts].Children}}, [Measures].[share], BDESC) ON ROWS
from [sfcrime] where [Time].[{year}]
"""
    rows = sorted(_cells(spark, q), key=lambda r: r.row_ordinal)
    expect = [d for d, _ in sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))]
    assert [r.row_member for r in rows] == expect


def test_with_member_format_string_property_ignored(spark):
    """Mondrian formatting properties after the expression parse and
    are ignored — formatting is a client concern."""
    year = _fixture_year(spark)
    q = f"""WITH MEMBER [Measures].[dbl] AS '[Measures].[crimes] * 2',
  FORMAT_STRING = '#,##0.00'
select {{[Measures].[dbl]}} ON COLUMNS,
  {{[District].[All Districts]}} ON ROWS
from [sfcrime] where [Time].[{year}]
"""
    total = sum(_district_totals(spark, year).values())
    assert _cells(spark, q)[0].crimes == float(total * 2)


def test_with_member_parse_errors():
    year = 1995
    base = (
        "select {{[Measures].[{m}]}} ON COLUMNS, "
        "{{[District].[All Districts]}} ON ROWS from [sfcrime]"
    )
    for q, msg in [
        (
            "WITH MEMBER [Measures].[a] AS '[Measures].[crimes]' "
            "MEMBER [Measures].[b] AS '[Measures].[a] * 2' "
            + base.format(m="b"),
            "other calculated",
        ),
        (
            "WITH MEMBER [Measures].[crimes] AS '1' " + base.format(m="crimes"),
            "redefines",
        ),
        (
            "WITH MEMBER [Measures].[a] AS [Measures].[crimes] "
            + base.format(m="a"),
            "quoted",
        ),
        (
            "WITH MEMBER [District].[a] AS '1' " + base.format(m="a"),
            r"\[Measures\]",
        ),
        (
            "WITH MEMBER [Measures].[a] AS "
            "'([Measures].[crimes], [District].[All Districts].Children)' "
            + base.format(m="a"),
            "enumerate",
        ),
        (
            "WITH MEMBER [Measures].[a] AS '[District].[All Districts]' "
            + base.format(m="a"),
            "exactly one",
        ),
    ]:
        with pytest.raises(MdxError, match=msg):
            parse_mdx(q)


def test_chained_op_missing_value_keeps_member_nulls_last(spark):
    """The ADVICE-flagged policy: a member kept by an earlier op but
    ABSENT from a later op's expression context survives the (left)
    join — Order sorts it LAST (caption-asc among missing), Filter
    treats its NULL value as non-matching."""
    year = _fixture_year(spark)
    want = _district_totals(spark, year)
    # find a (year, month, week, day) leaf with data for SOME but not
    # all districts — the later op's value frame misses the rest
    t = star_tables(incidents(spark, SF_SMOKE))
    leaf = (
        t["fact"]
        .join(t["district"].withColumnRenamed("name", "district"), "district_id")
        .join(t["timeperiod"], "time_id")
        .filter(F.col("year") == year)
        .groupBy("year", "month", "week", "day")
        .agg(
            F.countDistinct("district").alias("nd"),
            F.sum("crimes").alias("n"),
        )
        .filter(F.col("nd") < len(want))
        .orderBy(F.desc("nd"))
        .limit(1)
        .collect()
    )
    if not leaf:
        pytest.skip("fixture has every district on every day")
    y, m, w, d = leaf[0].year, leaf[0].month, leaf[0].week, leaf[0].day
    day_tot = {
        r.district: r.n
        for r in t["fact"]
        .join(t["district"].withColumnRenamed("name", "district"), "district_id")
        .join(t["timeperiod"], "time_id")
        .filter((F.col("year") == y) & (F.col("month") == m)
                & (F.col("week") == w) & (F.col("day") == d))
        .groupBy("district")
        .agg(F.sum("crimes").alias("n"))
        .collect()
    }
    q = f"""select {{([Measures].[crimes], [Time].[{year}])}} ON COLUMNS,
  Order(Filter({{[District].[All Districts].Children}},
               ([Measures].[crimes], [Time].[{year}]) > 0),
        ([Measures].[crimes], [Time].[{y}].[{m}].[{w}].[{d}]), BDESC) ON ROWS
from [sfcrime]
"""
    rows = _cells(spark, q)
    # membership: NO member lost to the day-leaf context (all have
    # year data, so Filter kept them all)
    assert {r.row_member for r in rows} == set(want)
    by_ord = sorted(rows, key=lambda r: r.row_ordinal)
    with_val = [d_ for d_, _ in sorted(
        day_tot.items(), key=lambda kv: (-kv[1], kv[0]))]
    missing = sorted(set(want) - set(day_tot))
    assert [r.row_member for r in by_ord] == with_val + missing


def test_filter_missing_value_non_matching(spark):
    """Filter(*, expr > 0) over a context where a member has NO value
    drops that member (NULL is non-matching) — pinned divergence-free
    with Mondrian's NULL-comparison semantics."""
    year = _fixture_year(spark)
    want = _district_totals(spark, year)
    t = star_tables(incidents(spark, SF_SMOKE))
    leaf = (
        t["fact"]
        .join(t["district"].withColumnRenamed("name", "district"), "district_id")
        .join(t["timeperiod"], "time_id")
        .filter(F.col("year") == year)
        .groupBy("year", "month", "week", "day")
        .agg(F.countDistinct("district").alias("nd"))
        .filter(F.col("nd") < len(want))
        .orderBy(F.desc("nd"))
        .limit(1)
        .collect()
    )
    if not leaf:
        pytest.skip("fixture has every district on every day")
    y, m, w, d = leaf[0].year, leaf[0].month, leaf[0].week, leaf[0].day
    q = f"""select {{([Measures].[crimes], [Time].[{year}])}} ON COLUMNS,
  Filter(Filter({{[District].[All Districts].Children}},
                ([Measures].[crimes], [Time].[{year}]) > 0),
         ([Measures].[crimes], [Time].[{y}].[{m}].[{w}].[{d}]) > 0) ON ROWS
from [sfcrime]
"""
    rows = _cells(spark, q)
    t2 = star_tables(incidents(spark, SF_SMOKE))
    day_districts = {
        r.district
        for r in t2["fact"]
        .join(t2["district"].withColumnRenamed("name", "district"), "district_id")
        .join(t2["timeperiod"], "time_id")
        .filter((F.col("year") == y) & (F.col("month") == m)
                & (F.col("week") == w) & (F.col("day") == d))
        .select("district").distinct().collect()
    }
    assert {r.row_member for r in rows} == day_districts


def test_with_member_context_override_keeps_members_base_leaves_empty(spark):
    """Round-7 review fix: a calc member whose context overrides the
    implicit [Time] default must keep axis members that have NO base
    data under that default — the member spine is the dimension
    universe under the enumerating member's own path, and NON EMPTY
    prunes on the CALC value. Here the cube default ([2013].[1].[1])
    matches nothing in the fixture at all: the base-measure spine
    would drop every district; the calc values are the 1995 totals."""
    year = _fixture_year(spark)
    want = _district_totals(spark, year)
    q = f"""WITH MEMBER [Measures].[y] AS
  '([Measures].[crimes], [Time].[{year}])'
select {{[Measures].[y]}} ON COLUMNS,
  {{[District].[All Districts].Children}} ON ROWS
from [sfcrime]
"""
    rows = _cells(spark, q)
    assert {r.row_member: r.crimes for r in rows} == {
        d: float(c) for d, c in want.items()
    }


def test_with_member_typoed_hierarchy_error_not_masked():
    """Round-7 review fix: a typo'd hierarchy inside a value tuple
    surfaces as its own error, not the arithmetic path's misleading
    "expected ')'" after backtracking."""
    with pytest.raises(MdxError, match="unknown hierarchy"):
        parse_mdx(
            "WITH MEMBER [Measures].[x] AS "
            "'([Measures].[crimes], [Distrct].[MISSION])' "
            "select {[Measures].[x]} ON COLUMNS, "
            "{[District].[All Districts]} ON ROWS from [sfcrime]"
        )


# ------------------------------------------------------------- round 8:
# WITH SET named sets + unary minus in calculated members.


def test_with_set_named_set_equals_inlined(spark):
    """A WITH SET reference compiles to exactly the inlined set: same
    cells, same values, same captions."""
    year = _fixture_year(spark)
    named = f"""WITH SET [MyRows] AS '{{[District].[All Districts].Children}}'
select {{([Measures].[crimes], [Time].[{year}])}} ON COLUMNS,
  [MyRows] ON ROWS
from [sfcrime]
"""
    inlined = f"""select {{([Measures].[crimes], [Time].[{year}])}} ON COLUMNS,
  {{[District].[All Districts].Children}} ON ROWS
from [sfcrime]
"""
    got = sorted(map(tuple, _cells(spark, named)))
    want = sorted(map(tuple, _cells(spark, inlined)))
    assert got == want


def test_with_set_wrapped_by_order_and_reused(spark):
    """Each reference to a named set gets its OWN copy: wrapping one
    reference in Order() attaches ordinals there without leaking the
    op into a second, unwrapped reference of the same set — and a set
    defined WITH its own TopCount keeps it at every reference."""
    year = _fixture_year(spark)
    want = _district_totals(spark, year)
    q = f"""WITH SET [D] AS '{{[District].[All Districts].Children}}'
select {{[Measures].[crimes]}} ON COLUMNS,
  Order([D], [Measures].[crimes], BDESC) ON ROWS
from [sfcrime] where [Time].[{year}]
"""
    rows = sorted(_cells(spark, q), key=lambda r: r.row_ordinal)
    expect = [d for d, _ in sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))]
    assert [r.row_member for r in rows] == expect
    # a set DEFINED with a set function carries it to the reference
    q2 = f"""WITH SET [Top2] AS
  'TopCount({{[District].[All Districts].Children}}, 2, [Measures].[crimes])'
select {{[Measures].[crimes]}} ON COLUMNS,
  [Top2] ON ROWS
from [sfcrime] where [Time].[{year}]
"""
    rows2 = {r.row_member for r in _cells(spark, q2)}
    assert rows2 == set(expect[:2])


def test_with_set_on_both_axes_and_member_combo(spark):
    """Named sets resolve on either axis, compose with WITH MEMBER in
    one WITH clause, and a bracketed token followed by '.' stays a
    member path (no false capture of [District].[x] as a set name)."""
    year = _fixture_year(spark)
    want = _district_totals(spark, year)
    total = sum(want.values())
    q = f"""WITH SET [D] AS '{{[District].[All Districts].Children}}'
  MEMBER [Measures].[share] AS
  '[Measures].[crimes] / ([Measures].[crimes], [District].[All Districts])'
select {{[Measures].[share]}} ON COLUMNS,
  [D] ON ROWS
from [sfcrime] where [Time].[{year}]
"""
    share = {r.row_member: r.crimes for r in _cells(spark, q)}
    assert share == {d: c / total for d, c in want.items()}


def test_with_set_parse_errors():
    for q, msg in [
        (
            "WITH SET [S] AS '{[District].[All Districts]}' "
            "SET [S] AS '{[Category].[All Categories]}' "
            "select {[Measures].[crimes]} ON COLUMNS, [S] ON ROWS "
            "from [sfcrime]",
            "defined twice",
        ),
        (
            "WITH SET [S] AS {[District].[All Districts]} "
            "select {[Measures].[crimes]} ON COLUMNS, [S] ON ROWS "
            "from [sfcrime]",
            "must be quoted",
        ),
        (
            "select {[Measures].[crimes]} ON COLUMNS, [NoSuchSet] ON ROWS "
            "from [sfcrime]",
            "unknown",
        ),
    ]:
        with pytest.raises(MdxError, match=msg):
            parse_mdx(q)


def test_with_member_unary_minus(spark):
    """ADVICE r7: '-[Measures].[crimes]' and '-1 * x' parse; unary
    minus binds the factor (so '-a + b' is (-a) + b) and '+x' is a
    tolerated no-op."""
    year = _fixture_year(spark)
    total = sum(_district_totals(spark, year).values())
    q = f"""WITH MEMBER [Measures].[neg] AS '-[Measures].[crimes]'
select {{[Measures].[neg]}} ON COLUMNS,
  {{[District].[All Districts]}} ON ROWS
from [sfcrime] where [Time].[{year}]
"""
    assert _cells(spark, q)[0].crimes == float(-total)
    q2 = f"""WITH MEMBER [Measures].[x] AS '-1 * [Measures].[crimes] + [Measures].[crimes] * 2'
select {{[Measures].[x]}} ON COLUMNS,
  {{[District].[All Districts]}} ON ROWS
from [sfcrime] where [Time].[{year}]
"""
    assert _cells(spark, q2)[0].crimes == float(-total + 2 * total)
    q3 = f"""WITH MEMBER [Measures].[p] AS '+[Measures].[crimes] - -[Measures].[crimes]'
select {{[Measures].[p]}} ON COLUMNS,
  {{[District].[All Districts]}} ON ROWS
from [sfcrime] where [Time].[{year}]
"""
    assert _cells(spark, q3)[0].crimes == float(2 * total)


def test_scalar_calc_slots_memoized(spark):
    """ADVICE r7: repeated value references with the SAME context in
    scalar calc cells register ONE conditional-agg slot (keyed on the
    sorted filter set), not one per occurrence — checked structurally
    on the compiled plan (the single scalar pass carries exactly the
    distinct-context aggregate count) and by value."""
    from map_reduce_sf_crime_spark.mdx import mdx_cells_many
    from map_reduce_sf_crime_spark.plans.olap_queries import _star_join

    year = _fixture_year(spark)
    want = _district_totals(spark, year)
    a, b = sorted(want)[:2]
    # three cells, each dividing by the SAME all-district denominator:
    # distinct contexts = {A-num, B-num, denominator, A+B-sum-parts}
    q = f"""WITH MEMBER [Measures].[sa] AS
  '([Measures].[crimes], [District].[{a}]) / [Measures].[crimes]'
  MEMBER [Measures].[sb] AS
  '([Measures].[crimes], [District].[{b}]) / [Measures].[crimes]'
  MEMBER [Measures].[sab] AS
  '(([Measures].[crimes], [District].[{a}]) + ([Measures].[crimes], [District].[{b}])) / [Measures].[crimes]'
select {{[Measures].[sa], [Measures].[sb], [Measures].[sab]}} ON COLUMNS,
  {{[Category].[All Categories]}} ON ROWS
from [sfcrime] where [Time].[{year}]
"""
    df = mdx_cells_many(_star_join(spark, SF_SMOKE), [("q", parse_mdx(q))])
    total = sum(want.values())
    vals = {r.col_member: r.crimes for r in df.collect()}
    assert vals == {
        "sa": want[a] / total,
        "sb": want[b] / total,
        "sab": (want[a] + want[b]) / total,
    }
    # structural: 3 distinct contexts (A, B, denominator) — the three
    # denominator references and the repeated A/B numerators dedup; 7
    # references would otherwise make 7 slots
    import re as _re

    plan = df._jdf.queryExecution().analyzed().toString()
    slots = {m for m in _re.findall(r"_c\d+", plan)}
    assert len(slots) == 3, sorted(slots)


# ------------------------------------------------------------- round 8:
# Hierarchize (the wrapper JPivot puts around a drill's parent∪children).


def test_hierarchize_parent_first_then_children_native_order(spark):
    """Hierarchize sorts a drill union into hierarchy order REGARDLESS
    of parse order: the All member first, children after it in the
    level's native (name) order — the set is written children-first to
    prove the reorder is real."""
    year = _fixture_year(spark)
    want = _district_totals(spark, year)
    q = f"""select {{[Measures].[crimes]}} ON COLUMNS,
  Hierarchize({{[District].[All Districts].Children, [District].[All Districts]}}) ON ROWS
from [sfcrime] where [Time].[{year}]
"""
    rows = sorted(_cells(spark, q), key=lambda r: r.row_ordinal)
    assert rows[0].row_member == "All Districts"
    assert rows[0].crimes == sum(want.values())
    assert [r.row_member for r in rows[1:]] == sorted(want)


def test_hierarchize_post_puts_parent_after_subtree(spark):
    year = _fixture_year(spark)
    want = _district_totals(spark, year)
    q = f"""select {{[Measures].[crimes]}} ON COLUMNS,
  Hierarchize({{[District].[All Districts], [District].[All Districts].Children}}, POST) ON ROWS
from [sfcrime] where [Time].[{year}]
"""
    rows = sorted(_cells(spark, q), key=lambda r: r.row_ordinal)
    assert [r.row_member for r in rows[:-1]] == sorted(want)
    assert rows[-1].row_member == "All Districts"


def test_hierarchize_time_numeric_not_string_order(spark):
    """Time members order by NUMERIC level values: a day-level drill
    must place day 10 after day 2 (string order would not). Also pins
    parent-before-children across two levels in one set."""
    year = _fixture_year(spark)
    # find a (month, week) with >= 10 distinct days in the fixture
    from map_reduce_sf_crime_spark.plans.olap_queries import _star_join

    star = _star_join(spark, SF_SMOKE)
    # WEEK_OF_MONTH buckets hold <= 7 days, so look for a week whose
    # days STRADDLE the single/double-digit boundary (e.g. 8, 9, 10):
    # string order would put "10" before "8"
    mw = (
        star.filter(F.col("year") == year)
        .groupBy("month", "week")
        .agg(
            F.countDistinct("day").alias("n"),
            F.min("day").alias("lo"),
            F.max("day").alias("hi"),
        )
        .filter((F.col("n") >= 3) & (F.col("lo") <= 9) & (F.col("hi") >= 10))
        .orderBy("month", "week")
        .first()
    )
    assert mw is not None, "fixture has no week straddling day 9/10"
    m, w = mw["month"], mw["week"]
    q = f"""select {{[Measures].[crimes]}} ON COLUMNS,
  Hierarchize({{[Time].[{year}].[{m}].[{w}].Children, ([Time].[{year}].[{m}].[{w}])}}) ON ROWS
from [sfcrime]
"""
    rows = sorted(_cells(spark, q), key=lambda r: r.row_ordinal)
    assert rows[0].row_member == f"{year}, {m}, {w}"
    days = [int(r.row_member.split(", ")[-1]) for r in rows[1:]]
    assert days == sorted(days), days
    assert any(d >= 10 for d in days)


def test_hierarchize_mixed_dimensions_and_named_set(spark):
    """Dimension rank orders mixed sets (district before category —
    cube declaration order), and Hierarchize composes with WITH SET."""
    year = _fixture_year(spark)
    q = f"""WITH SET [Mix] AS
  '{{[Category].[All Categories], [District].[All Districts]}}'
select {{[Measures].[crimes]}} ON COLUMNS,
  Hierarchize([Mix]) ON ROWS
from [sfcrime] where [Time].[{year}]
"""
    rows = sorted(_cells(spark, q), key=lambda r: r.row_ordinal)
    assert [r.row_member for r in rows] == ["All Districts", "All Categories"]


def test_hierarchize_parse_errors():
    with pytest.raises(MdxError, match="Hierarchize flag"):
        parse_mdx(
            "select {[Measures].[crimes]} ON COLUMNS, "
            "Hierarchize({[District].[All Districts]}, SIDEWAYS) ON ROWS "
            "from [sfcrime]"
        )


def test_union_drill_shape_and_dedup(spark):
    """Union(parent, children) equals the braces twin; duplicate
    definitions dedup (Mondrian default) unless ALL; the canonical
    JPivot drill expression Hierarchize(Union(...)) works end-to-end."""
    year = _fixture_year(spark)
    want = _district_totals(spark, year)
    u = f"""select {{[Measures].[crimes]}} ON COLUMNS,
  Union({{[District].[All Districts]}}, {{[District].[All Districts].Children}}) ON ROWS
from [sfcrime] where [Time].[{year}]
"""
    braces = f"""select {{[Measures].[crimes]}} ON COLUMNS,
  {{[District].[All Districts], [District].[All Districts].Children}} ON ROWS
from [sfcrime] where [Time].[{year}]
"""
    assert sorted(map(tuple, _cells(spark, u))) == sorted(
        map(tuple, _cells(spark, braces))
    )
    # duplicate definition dedups...
    d = f"""select {{[Measures].[crimes]}} ON COLUMNS,
  Union({{[District].[All Districts]}}, {{[District].[All Districts]}}) ON ROWS
from [sfcrime] where [Time].[{year}]
"""
    assert len(_cells(spark, d)) == 1
    # ...unless ALL keeps both cells
    dall = d.replace("]})", "]}, ALL)")
    assert len(_cells(spark, dall)) == 2
    # the canonical JPivot drill: Hierarchize(Union(parent, children))
    hz = f"""select {{[Measures].[crimes]}} ON COLUMNS,
  Hierarchize(Union({{[District].[All Districts].Children}}, {{[District].[All Districts]}})) ON ROWS
from [sfcrime] where [Time].[{year}]
"""
    rows = sorted(_cells(spark, hz), key=lambda r: r.row_ordinal)
    assert rows[0].row_member == "All Districts"
    assert [r.row_member for r in rows[1:]] == sorted(want)
    with pytest.raises(MdxError, match="Union flag"):
        parse_mdx(
            "select {[Measures].[crimes]} ON COLUMNS, "
            "Union({[District].[All Districts]}, "
            "{[Category].[All Categories]}, SOME) ON ROWS from [sfcrime]"
        )


def test_named_set_spliced_inside_braces(spark):
    """{[S]} and {[S], tuple} splice the named set in place (Mondrian
    accepts braces around named sets); a named set carrying set
    functions refuses to splice (its ops cannot attach to a subset)."""
    year = _fixture_year(spark)
    q = f"""WITH SET [S] AS '{{[District].[All Districts].Children}}'
select {{[Measures].[crimes]}} ON COLUMNS,
  {{[S], [Category].[All Categories]}} ON ROWS
from [sfcrime] where [Time].[{year}]
"""
    rows = {r.row_member for r in _cells(spark, q)}
    want = set(_district_totals(spark, year)) | {"All Categories"}
    assert rows == want
    with pytest.raises(MdxError, match="spliced inside"):
        parse_mdx(
            "WITH SET [S] AS "
            "'TopCount({[District].[All Districts].Children}, 2)' "
            "select {[Measures].[crimes]} ON COLUMNS, {[S]} ON ROWS "
            "from [sfcrime]"
        )


def test_hierarchize_measure_only_tuple_orders_last(spark):
    """Pinned policy: a measure-only tuple (the Measures 'hierarchy')
    hierarchizes AFTER every cube dimension's members, in both PRE and
    POST modes."""
    year = _fixture_year(spark)
    for mode in ("", ", POST"):
        q = f"""select {{[Time].[{year}]}} ON COLUMNS,
  Hierarchize({{[Measures].[crimes], [District].[All Districts]}}{mode}) ON ROWS
from [sfcrime]
"""
        rows = sorted(_cells(spark, q), key=lambda r: r.row_ordinal)
        assert [r.row_member for r in rows] == ["All Districts", "crimes"], mode


def test_bottomcount_keeps_bottom_n_members(spark):
    """BottomCount is TopCount's ascending mirror: lowest n values,
    caption-ascending on ties, membership-only (no ordinals)."""
    year = _fixture_year(spark)
    q = f"""select {{([Measures].[crimes], [Time].[{year}])}} ON COLUMNS,
  BottomCount({{[District].[All Districts].Children}}, 3,
              ([Measures].[crimes], [Time].[{year}])) ON ROWS
from [sfcrime]
"""
    rows = _cells(spark, q)
    want = _district_totals(spark, year)
    bot3 = sorted(want.items(), key=lambda kv: (kv[1], kv[0]))[:3]
    assert {r.row_member: r.crimes for r in rows} == dict(bot3)
    assert all(r.row_ordinal is None for r in rows)


def test_except_explicit_member_subtracts_from_enumeration(spark):
    """Except(enumeration, {explicit}) — the JPivot hide-member shape:
    the named member drops at the DATA level (no definition match
    exists), everything else survives with its value intact."""
    year = _fixture_year(spark)
    want = _district_totals(spark, year)
    victim = sorted(want)[0]
    q = f"""select {{([Measures].[crimes], [Time].[{year}])}} ON COLUMNS,
  Except({{[District].[All Districts].Children}},
         {{[District].[{victim}]}}) ON ROWS
from [sfcrime]
"""
    rows = _cells(spark, q)
    assert {r.row_member: r.crimes for r in rows} == {
        d: c for d, c in want.items() if d != victim
    }


def test_except_definition_match_subtracts_at_parse_time(spark):
    """Identical definitions subtract without any data-level op, and
    the survivor keeps its cell."""
    year = _fixture_year(spark)
    want = _district_totals(spark, year)
    keep, drop = sorted(want)[:2]
    q = f"""select {{([Measures].[crimes], [Time].[{year}])}} ON COLUMNS,
  Except({{[District].[{keep}], [District].[{drop}]}},
         {{[District].[{drop}]}}) ON ROWS
from [sfcrime]
"""
    rows = _cells(spark, q)
    assert {r.row_member: r.crimes for r in rows} == {keep: want[keep]}


def test_except_composes_under_order(spark):
    """Order(Except(...)) — membership from Except, ordinals from the
    outer Order over the survivors only."""
    year = _fixture_year(spark)
    want = _district_totals(spark, year)
    victim = sorted(want, key=lambda d: -want[d])[0]  # drop the top one
    q = f"""select {{([Measures].[crimes], [Time].[{year}])}} ON COLUMNS,
  Order(Except({{[District].[All Districts].Children}},
               {{[District].[{victim}]}}),
        ([Measures].[crimes], [Time].[{year}]), BDESC) ON ROWS
from [sfcrime]
"""
    rows = sorted(_cells(spark, q), key=lambda r: r.row_ordinal)
    kept = {d: c for d, c in want.items() if d != victim}
    assert [r.row_member for r in rows] == [
        d for d, _ in sorted(kept.items(), key=lambda kv: (-kv[1], kv[0]))
    ]
    assert [r.row_ordinal for r in rows] == list(range(1, len(kept) + 1))


def test_except_and_bottomcount_parse_errors():
    from map_reduce_sf_crime_spark.mdx import MdxError, parse_mdx

    import pytest

    cases = [
        (
            # wrong-hierarchy second argument: standard MDX rejects
            # the dimensionality mismatch at parse time (round 9 —
            # previously fell through to caption matching and, for
            # explicit members, silently removed nothing)
            "select {[Measures].[crimes]} ON COLUMNS,"
            " Except({[District].[All Districts].Children},"
            " {[Category].[All Categories].Children}) ON ROWS"
            " from [sfcrime]",
            "dimensionality",
        ),
        (
            # same mismatch with an EXPLICIT member — the silent
            # no-op case the round-8 review flagged
            "select {[Measures].[crimes]} ON COLUMNS,"
            " Except({[District].[All Districts].Children},"
            " {[Category].[ARSON]}) ON ROWS from [sfcrime]",
            "dimensionality",
        ),
        (
            # arity mismatch: a 2-tuple b against 1-tuple a rows
            "select {[Measures].[crimes]} ON COLUMNS,"
            " Except({[District].[All Districts].Children},"
            " {([District].[MISSION], [Category].[ARSON])}) ON ROWS"
            " from [sfcrime]",
            "dimensionality",
        ),
        (
            # unmatched enumerated second argument over the RIGHT
            # hierarchy: nothing to subtract by definition, captions
            # unknowable — loud
            "select {[Measures].[crimes]} ON COLUMNS,"
            " Except({[District].[MISSION]},"
            " {[District].[All Districts].Children}) ON ROWS"
            " from [sfcrime]",
            "enumerated second argument",
        ),
        (
            "select {[Measures].[crimes]} ON COLUMNS,"
            " Except(Order({[District].[All Districts].Children},"
            " [Measures].[crimes]), {[District].[X]}) ON ROWS"
            " from [sfcrime]",
            "must wrap Except",
        ),
        (
            "select {[Measures].[crimes]} ON COLUMNS,"
            " BottomCount({[District].[All Districts].Children}, 0)"
            " ON ROWS from [sfcrime]",
            "positive int",
        ),
        (
            "select {[Measures].[crimes]} ON COLUMNS,"
            " Except({[District].[A]}, {[District].[A]}, SOMEFLAG)"
            " ON ROWS from [sfcrime]",
            "unknown Except flag",
        ),
    ]
    for q, msg in cases:
        with pytest.raises(MdxError, match=msg):
            parse_mdx(q)


def test_descendants_at_week_level_matches_inlined_enumeration(spark):
    """Descendants([Time].[Y], [Time].[week]) spans TWO levels below
    the member (month, week ride enum_path + enum_col): one row per
    distinct (month, week) path under the year, each captioned with
    its full path and valued exactly like the inlined (month, week)
    groupBy twin; the rows sum back to the year total."""
    year = _fixture_year(spark)
    q = f"""select {{[Measures].[crimes]}} ON COLUMNS,
      Descendants([Time].[{year}], [Time].[week]) ON ROWS
    from [sfcrime]"""
    got = {
        r.row_member: r.crimes for r in mdx_query(spark, SF_SMOKE, q).collect()
    }
    from map_reduce_sf_crime_spark.plans.olap_queries import _star_join

    star = _star_join(spark, SF_SMOKE).filter(F.col("year") == year)
    want = {
        f"{year}, {r.month}, {r.week}": r.n
        for r in star.groupBy("month", "week")
        .agg(F.sum("crimes").alias("n"))
        .collect()
    }
    assert got == want and got
    assert sum(got.values()) == _year_total(spark, year)


def test_descendants_one_level_equals_children(spark):
    """Descendants(m, <next level>) is exactly .Children; on an All
    member it is exactly the hierarchy's .Children enumeration with
    identical captions (the all-caption must not leak into labels)."""
    year = _fixture_year(spark)
    pairs = [
        (
            f"""select {{[Measures].[crimes]}} ON COLUMNS,
            Descendants([District].[All Districts], [District].[name])
            ON ROWS from [sfcrime] where [Time].[{year}]""",
            f"""select {{[Measures].[crimes]}} ON COLUMNS,
            {{[District].[All Districts].Children}} ON ROWS
            from [sfcrime] where [Time].[{year}]""",
        ),
        (
            f"""select {{[Measures].[crimes]}} ON COLUMNS,
            Descendants([Time].[{year}], [Time].[month]) ON ROWS
            from [sfcrime]""",
            f"""select {{[Measures].[crimes]}} ON COLUMNS,
            {{[Time].[{year}].Children}} ON ROWS from [sfcrime]""",
        ),
    ]
    for q_desc, q_children in pairs:
        got = {
            r.row_member: r.crimes
            for r in mdx_query(spark, SF_SMOKE, q_desc).collect()
        }
        want = {
            r.row_member: r.crimes
            for r in mdx_query(spark, SF_SMOKE, q_children).collect()
        }
        assert got == want and got


def test_descendants_self_and_hierarchize_ordering(spark):
    """SELF at the member's own level returns the member itself;
    Hierarchize over a union of a parent and its Descendants sorts
    parents before their multi-level subtrees (enum_path values join
    the typed ordinal key)."""
    year = _fixture_year(spark)
    q_self = f"""select {{[Measures].[crimes]}} ON COLUMNS,
      Descendants([Time].[{year}], [Time].[year], SELF) ON ROWS
    from [sfcrime]"""
    rows = mdx_query(spark, SF_SMOKE, q_self).collect()
    assert len(rows) == 1 and rows[0].row_member == str(year)
    assert rows[0].crimes == _year_total(spark, year)
    q_h = f"""select {{[Measures].[crimes]}} ON COLUMNS,
      Hierarchize(Union({{[Time].[{year}]}},
        Descendants([Time].[{year}], [Time].[week]))) ON ROWS
    from [sfcrime]"""
    hrows = mdx_query(spark, SF_SMOKE, q_h).collect()
    ordered = sorted(hrows, key=lambda r: r.row_ordinal)
    assert ordered[0].row_member == str(year), ordered[0]
    # subtree rows follow in (month, week) path order
    paths = [
        tuple(int(x) for x in r.row_member.split(", ")[1:])
        for r in ordered[1:]
    ]
    assert paths == sorted(paths) and paths


def test_descendants_parse_errors(spark):
    """Loud failures: missing level arg, level above the member,
    unknown level, cross-hierarchy level, unsupported flags, measure
    or enumerated first argument."""
    cases = [
        (
            "Descendants([Time].[2013].[1], [Time].[year])",
            "ABOVE the member",
        ),
        ("Descendants([Time].[2013], [Time].[quarter])", "unknown level"),
        (
            "Descendants([Time].[2013], [District].[name])",
            "does not match the member's hierarchy",
        ),
        (
            "Descendants([Time].[2013], [Time].[week], SELF_AND_MAYBE)",
            "not supported",
        ),
        (
            "Descendants([Time].[2013], [Time].[day], AFTER)",
            "selects no levels",
        ),
        ("Descendants([Measures].[crimes], [Time].[week])", "dimension member"),
        (
            "Descendants([Time].[2013].Children, [Time].[week])",
            "plain member",
        ),
    ]
    for frag, msg in cases:
        q = (
            "select {[Measures].[crimes]} ON COLUMNS, "
            f"{frag} ON ROWS from [sfcrime]"
        )
        with pytest.raises(MdxError, match=msg):
            parse_mdx(q)


def test_generate_currentmember_children_matches_inlined_union(spark):
    """Round 10: Generate(set, {[H].CurrentMember.Children}) over
    explicit months equals the inlined Union of each month's
    .Children (same captions, same values); the CurrentMember body
    re-resolves through the one member resolver, so Descendants over
    CurrentMember works too."""
    year = _fixture_year(spark)
    inc = incidents(spark, SF_SMOKE).filter(F.year("d") == year)
    months = sorted(
        r.m
        for r in inc.select((F.month("d") - 1).alias("m")).distinct().collect()
    )[:2]
    assert len(months) == 2, "fixture needs two months for this pin"
    m1, m2 = months
    q_gen = f"""select {{[Measures].[crimes]}} ON COLUMNS,
      Generate({{[Time].[{year}].[{m1}], [Time].[{year}].[{m2}]}},
               {{[Time].CurrentMember.Children}}) ON ROWS
    from [sfcrime]"""
    q_union = f"""select {{[Measures].[crimes]}} ON COLUMNS,
      Union({{[Time].[{year}].[{m1}].Children}},
            {{[Time].[{year}].[{m2}].Children}}) ON ROWS
    from [sfcrime]"""
    got = {
        r.row_member: r.crimes
        for r in mdx_query(spark, SF_SMOKE, q_gen).collect()
    }
    want = {
        r.row_member: r.crimes
        for r in mdx_query(spark, SF_SMOKE, q_union).collect()
    }
    assert got == want and got
    # Descendants under CurrentMember: weeks below each month ≡ the
    # per-month Descendants union
    q_gd = f"""select {{[Measures].[crimes]}} ON COLUMNS,
      Generate({{[Time].[{year}].[{m1}], [Time].[{year}].[{m2}]}},
        Descendants([Time].CurrentMember, [Time].[week])) ON ROWS
    from [sfcrime]"""
    q_dd = f"""select {{[Measures].[crimes]}} ON COLUMNS,
      Union(Descendants([Time].[{year}].[{m1}], [Time].[week]),
            Descendants([Time].[{year}].[{m2}], [Time].[week])) ON ROWS
    from [sfcrime]"""
    got = {
        r.row_member: r.crimes
        for r in mdx_query(spark, SF_SMOKE, q_gd).collect()
    }
    want = {
        r.row_member: r.crimes
        for r in mdx_query(spark, SF_SMOKE, q_dd).collect()
    }
    assert got == want and got


def test_generate_identity_dedup_and_all(spark):
    """A CurrentMember-identity body returns the input set; duplicate
    DEFINITIONS collapse (Union discipline) unless ALL; a
    constant body (no CurrentMember) collapses to one copy without
    ALL — all checked at parse level where duplicates are visible."""
    q = """select {[Measures].[crimes]} ON COLUMNS,
      Generate({[District].[BAYVIEW], [District].[MISSION],
                [District].[BAYVIEW]},
               {[District].CurrentMember}) ON ROWS
    from [sfcrime]"""
    rows = parse_mdx(q).rows
    caps = [", ".join(m.caption[0] for m in tp) for tp in rows]
    assert caps == ["BAYVIEW", "MISSION"]
    q_all = q.replace("CurrentMember}", "CurrentMember}, ALL")
    caps = [
        ", ".join(m.caption[0] for m in tp)
        for tp in parse_mdx(q_all).rows
    ]
    assert caps == ["BAYVIEW", "MISSION", "BAYVIEW"]
    q_const = """select {[Measures].[crimes]} ON COLUMNS,
      Generate({[District].[BAYVIEW], [District].[MISSION]},
               {[Category].[All Categories]}) ON ROWS
    from [sfcrime]"""
    assert len(parse_mdx(q_const).rows) == 1


def test_generate_parse_errors():
    """Loud boundaries: CurrentMember outside Generate or for an
    unbound hierarchy, enumerated/measure first argument, ops-wrapped
    arguments, unknown flag."""
    cases = [
        (
            "{[District].CurrentMember}",
            "no bound member",
        ),
        (
            "Generate({[District].[BAYVIEW]}, {[Time].CurrentMember})",
            "no bound member",
        ),
        (
            "Generate({[District].[All Districts].Children},"
            " {[District].CurrentMember})",
            "enumerated first argument",
        ),
        (
            "Generate({[Measures].[crimes]}, {[District].[BAYVIEW]})",
            "not measures",
        ),
        (
            "Generate(Order({[District].[BAYVIEW]}, [Measures].[crimes]),"
            " {[District].CurrentMember})",
            "must wrap Generate",
        ),
        (
            "Generate({[District].[BAYVIEW]},"
            " Order({[District].CurrentMember}, [Measures].[crimes]))",
            "must wrap Generate",
        ),
        (
            "Generate({[District].[BAYVIEW]},"
            " {[District].CurrentMember}, FOO)",
            "unknown Generate flag",
        ),
        (
            "{[District].[BAYVIEW].CurrentMember}",
            "applies to a hierarchy reference",
        ),
    ]
    for frag, msg in cases:
        q = (
            "select {[Measures].[crimes]} ON COLUMNS, "
            f"{frag} ON ROWS from [sfcrime]"
        )
        with pytest.raises(MdxError, match=msg):
            parse_mdx(q)


@pytest.mark.slow
def test_descendants_mixed_level_flags_match_per_level_unions(spark):
    """Round 10: the mixed-level Descendants flags compile to unions
    of single-level descents — each pinned cell-for-cell against the
    inlined Union of per-level SELF Descendants; LEAVES is the leaf
    level; BEFORE includes the member itself (standard MDX)."""
    year = _fixture_year(spark)
    pairs = [
        (
            f"Descendants([Time].[{year}], [Time].[week], SELF_AND_BEFORE)",
            f"Union(Union({{[Time].[{year}]}},"
            f" Descendants([Time].[{year}], [Time].[month])),"
            f" Descendants([Time].[{year}], [Time].[week]))",
        ),
        (
            f"Descendants([Time].[{year}], [Time].[month], BEFORE)",
            f"{{[Time].[{year}]}}",
        ),
        (
            f"Descendants([Time].[{year}], [Time].[month], AFTER)",
            f"Union(Descendants([Time].[{year}], [Time].[week]),"
            f" Descendants([Time].[{year}], [Time].[day]))",
        ),
        (
            f"Descendants([Time].[{year}], [Time].[week], SELF_AND_AFTER)",
            f"Union(Descendants([Time].[{year}], [Time].[week]),"
            f" Descendants([Time].[{year}], [Time].[day]))",
        ),
        # one-argument form = the member and ALL its descendants
        (
            f"Descendants([Time].[{year}])",
            f"Descendants([Time].[{year}], [Time].[year],"
            " SELF_BEFORE_AFTER)",
        ),
        (
            f"Descendants([Time].[{year}], [Time].[year],"
            " SELF_BEFORE_AFTER)",
            f"Union(Union(Union({{[Time].[{year}]}},"
            f" Descendants([Time].[{year}], [Time].[month])),"
            f" Descendants([Time].[{year}], [Time].[week])),"
            f" Descendants([Time].[{year}], [Time].[day]))",
        ),
        (
            f"Descendants([Time].[{year}], [Time].[year], LEAVES)",
            f"Descendants([Time].[{year}], [Time].[day])",
        ),
        # District rides a Time slicer (a query with no Time
        # reference resolves the default Time member, which this
        # fixture's timeperiod dim does not populate)
        (
            "Descendants([District].[All Districts], [District].[name],"
            f" SELF_AND_BEFORE) ON ROWS from [sfcrime]"
            f" where [Time].[{year}]",
            "Union({[District].[All Districts]},"
            " {[District].[All Districts].Children}) ON ROWS"
            f" from [sfcrime] where [Time].[{year}]",
        ),
    ]
    for frag, twin in pairs:
        if "from [sfcrime]" not in frag:
            frag += " ON ROWS from [sfcrime]"
            twin += " ON ROWS from [sfcrime]"
        q = f"select {{[Measures].[crimes]}} ON COLUMNS, {frag}"
        qt = f"select {{[Measures].[crimes]}} ON COLUMNS, {twin}"
        got = {
            r.row_member: r.crimes
            for r in mdx_query(spark, SF_SMOKE, q).collect()
        }
        want = {
            r.row_member: r.crimes
            for r in mdx_query(spark, SF_SMOKE, qt).collect()
        }
        assert got == want and got, frag


def test_generate_empty_first_set_and_before_own_level_loud():
    """Round-10 review fixes: Generate over a first argument that
    compiled to the empty set names the real condition (not a
    misleading token error), and BEFORE at the member's own level —
    standard MDX's empty set — raises the empty-set error instead of
    silently returning the member."""
    with pytest.raises(MdxError, match="EMPTY set"):
        parse_mdx(
            "select {[Measures].[crimes]} ON COLUMNS, "
            "Generate(Except({[District].[BAYVIEW]},"
            " {[District].[BAYVIEW]}), {[District].CurrentMember})"
            " ON ROWS from [sfcrime]"
        )
    with pytest.raises(MdxError, match="selects no levels"):
        parse_mdx(
            "select {[Measures].[crimes]} ON COLUMNS, "
            "Descendants([Time].[2013], [Time].[year], BEFORE)"
            " ON ROWS from [sfcrime]"
        )


# ------------------------------------------------------------------
# round 11: calculated-member time navigation — PrevMember /
# NextMember / Lag / Lead / ParallelPeriod / PeriodsToDate / Ytd
# inside WITH MEMBER value tuples (the period-over-period and
# running-total idioms, VERDICT round-10 next-#1). Every value pin
# runs against an inlined window-function twin or hand-computed
# expectation on a synthetic multi-year star (the SF fixture is
# single-year, so cross-parent navigation needs its own corpus).
# ------------------------------------------------------------------

#: (year, month) -> per-district base count; 1995-month-3 exists for
#: CENTRAL only (the YTD carry-forward hole)
_NAV_DATA = {
    (1994, 0): 3,
    (1994, 1): 4,
    (1994, 10): 5,
    (1994, 11): 7,
    (1995, 0): 11,
    (1995, 1): 13,
    (1995, 2): 17,
}


def _nav_star(spark):
    rows = []
    for (y, m), n in _NAV_DATA.items():
        for d_i, dist in enumerate(["MISSION", "CENTRAL"]):
            rows.append((n + d_i, "THEFT", dist, y, m, 1, 1))
    rows.append((100, "THEFT", "CENTRAL", 1995, 3, 1, 1))
    return spark.createDataFrame(
        rows,
        "crimes long, category string, district string, "
        "year int, month int, week int, day int",
    )


def _nav_cells(spark, q):
    from map_reduce_sf_crime_spark.mdx import mdx_cells

    return sorted(
        (r.row_member, r.col_member, r.crimes)
        for r in mdx_cells(_nav_star(spark), parse_mdx(q)).collect()
    )


def _month_totals():
    # both districts: n + (n+1) = 2n+1; the CENTRAL-only month adds 100
    t = {(y, m): 2 * n + 1 for (y, m), n in _NAV_DATA.items()}
    t[(1995, 3)] = 100
    return t


def test_prevmember_month_over_month_crosses_year(spark):
    """The period-over-period idiom: delta = crimes - crimes(prev
    month), where PrevMember crosses the year boundary ([1995].[0]'s
    previous member is [1994].[11], not a missing sibling)."""
    q = """WITH MEMBER [Measures].[delta] AS
  '[Measures].[crimes] - ([Measures].[crimes], [Time].CurrentMember.PrevMember)'
select {[Measures].[crimes], [Measures].[delta]} ON COLUMNS,
  Descendants([Time].[1995], [Time].[month]) ON ROWS
from [sfcrime]
"""
    tot = _month_totals()
    order = sorted(tot)
    prev = {b: tot[a] for a, b in zip(order, order[1:])}
    want = []
    for (y, m) in order:
        if y != 1995:
            continue
        want.append((f"1995, {m}", "crimes", float(tot[(y, m)])))
        if (y, m) in prev:
            want.append(
                (f"1995, {m}", "delta", float(tot[(y, m)] - prev[(y, m)]))
            )
    assert _nav_cells(spark, q) == sorted(want)


def test_prevmember_fixture_matches_window_twin(spark):
    """On the real SF fixture: the MDX delta cells equal an inlined
    lag-window twin over the star join's month totals (the fixture
    is single-year, so the first month's delta cell is empty — the
    NULL-member edge)."""
    from pyspark.sql import Window
    from map_reduce_sf_crime_spark.plans.olap_queries import _star_join

    year = _fixture_year(spark)
    star = _star_join(spark, SF_SMOKE)
    mt = star.groupBy("year", "month").agg(F.sum("crimes").alias("c"))
    w = Window.orderBy("year", "month")
    twin = {
        f"{year}, {r.month}": float(r.c - r.p)
        for r in mt.withColumn("p", F.lag("c").over(w))
        .filter(F.col("year") == year)
        .collect()
        if r.p is not None
    }
    q = f"""WITH MEMBER [Measures].[delta] AS
  '[Measures].[crimes] - ([Measures].[crimes], [Time].CurrentMember.PrevMember)'
select {{[Measures].[delta]}} ON COLUMNS,
  Descendants([Time].[{year}], [Time].[month]) ON ROWS
from [sfcrime]
"""
    got = {
        r.row_member: r.crimes
        for r in mdx_query(spark, SF_SMOKE, q).collect()
    }
    assert got == twin and got


def test_nextmember_lag_lead_chains_and_identity(spark):
    """NextMember is lag(-1); Lag(2) == PrevMember.PrevMember ==
    ParallelPeriod at the member's own level with offset 2; a bare
    CurrentMember context member is the identity (the cell's own
    value); Lead(1) == NextMember."""
    q = """WITH MEMBER [Measures].[nxt] AS
  '([Measures].[crimes], [Time].CurrentMember.NextMember)'
MEMBER [Measures].[led] AS
  '([Measures].[crimes], [Time].CurrentMember.Lead(1))'
MEMBER [Measures].[lag2] AS
  '([Measures].[crimes], [Time].CurrentMember.Lag(2))'
MEMBER [Measures].[chain] AS
  '([Measures].[crimes], [Time].CurrentMember.PrevMember.PrevMember)'
MEMBER [Measures].[pp0] AS
  '([Measures].[crimes], ParallelPeriod([Time].[month], 2))'
MEMBER [Measures].[self] AS
  '([Measures].[crimes], [Time].CurrentMember)'
select {[Measures].[nxt], [Measures].[led], [Measures].[lag2],
        [Measures].[chain], [Measures].[pp0], [Measures].[self]} ON COLUMNS,
  Descendants([Time].[1995], [Time].[month]) ON ROWS
from [sfcrime]
"""
    cells = _nav_cells(spark, q)
    by_col = {}
    for row, col, v in cells:
        by_col.setdefault(col, {})[row] = v
    tot = _month_totals()
    assert by_col["self"] == {
        f"1995, {m}": float(v) for (y, m), v in tot.items() if y == 1995
    }
    assert by_col["nxt"] == by_col["led"]
    assert by_col["lag2"] == by_col["chain"] == by_col["pp0"]
    # spot values: nxt of (1995,2) is the CENTRAL-only month's 100;
    # lag2 of (1995,0) crosses into 1994 twice ((1994,10) = 11)
    assert by_col["nxt"]["1995, 2"] == 100.0
    assert "1995, 3" not in by_col["nxt"]  # lead off the data edge
    assert by_col["lag2"]["1995, 0"] == 11.0


def test_parallelperiod_year_over_year(spark):
    """ParallelPeriod([Time].[year], 1): the same month one year
    back; a month with no parallel sibling ((1995,2) — 1994 has no
    month 2) yields an EMPTY cell, not a wrong neighbor."""
    q = """WITH MEMBER [Measures].[yoy] AS
  '([Measures].[crimes], ParallelPeriod([Time].[year], 1))'
select {[Measures].[yoy]} ON COLUMNS,
  Descendants([Time].[1995], [Time].[month]) ON ROWS
from [sfcrime]
"""
    tot = _month_totals()
    assert _nav_cells(spark, q) == [
        ("1995, 0", "yoy", float(tot[(1994, 0)])),
        ("1995, 1", "yoy", float(tot[(1994, 1)])),
    ]


def test_periodstodate_ytd_running_total_with_hole(spark):
    """Sum(PeriodsToDate([Time].[year]), crimes): the YTD running
    total. Under a district slicer whose corpus skips a month, the
    empty month still carries the prior cumulative value (the set
    sums existing members — Mondrian's Sum-over-empty-cells), while
    the BASE measure cell for that month stays empty."""
    q = """WITH MEMBER [Measures].[ytd] AS
  'Sum(PeriodsToDate([Time].[year]), [Measures].[crimes])'
select {[Measures].[crimes], [Measures].[ytd]} ON COLUMNS,
  Descendants([Time].[1995], [Time].[month]) ON ROWS
from [sfcrime]
where [District].[MISSION]
"""
    # MISSION-only month totals for 1995: months 0..2 (month 3 is
    # CENTRAL-only)
    m = {k[1]: v for k, v in _NAV_DATA.items() if k[0] == 1995}
    cells = _nav_cells(spark, q)
    assert cells == sorted(
        [(f"1995, {k}", "crimes", float(v)) for k, v in m.items()]
        + [
            ("1995, 0", "ytd", float(m[0])),
            ("1995, 1", "ytd", float(m[0] + m[1])),
            ("1995, 2", "ytd", float(m[0] + m[1] + m[2])),
            ("1995, 3", "ytd", float(m[0] + m[1] + m[2])),
        ]
    )


def test_ytd_sugar_and_own_level_ptd(spark):
    """Ytd() == PeriodsToDate([Time].[year]); PeriodsToDate at the
    member's OWN level is the 1-member set {member} — the value is
    the cell's own measure."""
    q = """WITH MEMBER [Measures].[a] AS
  'Sum(Ytd(), [Measures].[crimes])'
MEMBER [Measures].[b] AS
  'Sum(PeriodsToDate([Time].[year]), [Measures].[crimes])'
MEMBER [Measures].[own] AS
  'Sum(PeriodsToDate([Time].[month]), [Measures].[crimes])'
select {[Measures].[a], [Measures].[b], [Measures].[own],
        [Measures].[crimes]} ON COLUMNS,
  Descendants([Time].[1995], [Time].[month]) ON ROWS
from [sfcrime]
"""
    by_col = {}
    for row, col, v in _nav_cells(spark, q):
        by_col.setdefault(col, {})[row] = v
    assert by_col["a"] == by_col["b"]
    assert by_col["own"] == by_col["crimes"]


def test_static_base_navigation_and_slicer_current(spark):
    """A navigated STATIC member ([Time].[1995].[0].PrevMember) works
    as a scalar cell context; CurrentMember resolves from the SLICER
    when the axis does not carry [Time]; explicit-member
    ParallelPeriod works without CurrentMember."""
    q1 = """WITH MEMBER [Measures].[prev] AS
  '([Measures].[crimes], [Time].[1995].[0].PrevMember)'
select {[Measures].[prev]} ON COLUMNS,
  {[District].[All Districts]} ON ROWS
from [sfcrime]
"""
    tot = _month_totals()
    assert _nav_cells(spark, q1) == [
        ("All Districts", "prev", float(tot[(1994, 11)]))
    ]
    q2 = """WITH MEMBER [Measures].[prev] AS
  '([Measures].[crimes], [Time].CurrentMember.PrevMember)'
select {[Measures].[prev]} ON COLUMNS,
  {[District].[All Districts]} ON ROWS
from [sfcrime]
where [Time].[1995].[1]
"""
    assert _nav_cells(spark, q2) == [
        ("All Districts", "prev", float(tot[(1995, 0)]))
    ]
    q3 = """WITH MEMBER [Measures].[pp] AS
  '([Measures].[crimes], ParallelPeriod([Time].[year], 1, [Time].[1995].[1]))'
select {[Measures].[pp]} ON COLUMNS,
  {[District].[All Districts]} ON ROWS
from [sfcrime]
"""
    assert _nav_cells(spark, q3) == [
        ("All Districts", "pp", float(tot[(1994, 1)]))
    ]


def test_district_prevmember_alphabetical(spark):
    """PrevMember on a NAME level orders by the level column's value
    (alphabetical) — the first member's cell is empty."""
    q = """WITH MEMBER [Measures].[prevd] AS
  '([Measures].[crimes], [District].CurrentMember.PrevMember)'
select {[Measures].[prevd]} ON COLUMNS,
  {[District].[All Districts].Children} ON ROWS
from [sfcrime]
where [Time].[1995].[1]
"""
    tot_by_d = {"MISSION": 13.0, "CENTRAL": 14.0}
    # CENTRAL < MISSION alphabetically: CENTRAL has no predecessor
    assert _nav_cells(spark, q) == [("MISSION", "prevd", tot_by_d["CENTRAL"])]


def test_navigation_error_boundaries(spark):
    """Navigation stays INSIDE calculated members, loudly: axes,
    slicers, set-function expressions, Generate's first argument and
    named sets all reject it; All-member CurrentMember, below-member
    ParallelPeriod levels, general Sum sets, doubled hierarchies,
    descending below CurrentMember, and fractional Lag offsets are
    parse/compile errors."""
    from map_reduce_sf_crime_spark.mdx import mdx_cells

    head = "select {[Measures].[crimes]} ON COLUMNS, "
    tail = " ON ROWS from [sfcrime]"
    for frag, pat in [
        ("{[Time].[1995].[0].PrevMember}", "only supported inside"),
        ("{[Time].CurrentMember}", "has no bound member"),
        (
            "Order({[District].[All Districts].Children}, "
            "([Measures].[crimes], [Time].[1995].PrevMember))",
            "only supported inside",
        ),
        (
            "Generate({[Time].[1995].[0].PrevMember}, "
            "{[Time].CurrentMember})",
            "cannot use CurrentMember/PrevMember",
        ),
    ]:
        with pytest.raises(MdxError, match=pat):
            parse_mdx(head + frag + tail)
    with pytest.raises(MdxError, match="only supported inside"):
        parse_mdx(
            head
            + "{[District].[MISSION]}"
            + tail.replace(
                "from [sfcrime]",
                "from [sfcrime] where [Time].[1995].[0].PrevMember",
            )
        )
    for body, pat in [
        ("'([Time].[1995].[0].PrevMember)'", "exactly one measure"),
        (
            "'([Measures].[crimes], [Time].[1995], "
            "[Time].CurrentMember.PrevMember)'",
            "one hierarchy twice",
        ),
        (
            "'([Measures].[crimes], [Time].CurrentMember.PrevMember.[3])'",
            "may follow a navigated member",
        ),
        (
            "'([Measures].[crimes], [Time].CurrentMember.[3])'",
            "cannot descend below CurrentMember",
        ),
        (
            "'([Measures].[crimes], [Time].CurrentMember.Children)'",
            "cannot enumerate below",
        ),
        (
            "'([Measures].[crimes], [Time].CurrentMember.Lag(1.5))'",
            "must be an integer",
        ),
        # NOTE: Sum over an EXPLICIT set became a supported set
        # aggregation later in round 11 (test_set_aggregations_*);
        # only data-driven sets stay loud:
        (
            "'Sum([Time].[1995].Children, [Measures].[crimes])'",
            "must be explicit",
        ),
        (
            "'([Measures].[crimes], "
            "ParallelPeriod([District].[name], 1, [Time].[1995]))'",
            "does not match the level's hierarchy",
        ),
    ]:
        with pytest.raises(MdxError, match=pat):
            parse_mdx(
                f"WITH MEMBER [Measures].[x] AS {body} "
                + head
                + "{[Measures].[x]}"
                + tail.replace(" ON ROWS", ", {[Category].[All Categories]} ON ROWS")
            )
    # WITH SET bodies may NOT bind the cell's CurrentMember
    with pytest.raises(MdxError, match="has no bound member"):
        parse_mdx(
            "WITH SET [s] AS '{[Time].CurrentMember.PrevMember}' "
            + head
            + "[s]"
            + tail
        )
    # compile-time: CurrentMember at the All member; ParallelPeriod
    # level below the member's level
    star = _nav_star(spark)
    for body, pat in [
        (
            "'([Measures].[crimes], [District].CurrentMember.PrevMember)'",
            "is the All member",
        ),
        (
            "'([Measures].[crimes], "
            "ParallelPeriod([Time].[month], 1, [Time].[1995]))'",
            "at or above the member's level",
        ),
        (
            "'Sum(PeriodsToDate([Time].[month], [Time].[1995]), "
            "[Measures].[crimes])'",
            "at or above the member's level",
        ),
    ]:
        q = (
            f"WITH MEMBER [Measures].[x] AS {body} "
            "select {[Measures].[x]} ON COLUMNS, "
            "{[Category].[All Categories]} ON ROWS from [sfcrime] "
            "where [Time].[1995].[1]"
        )
        with pytest.raises(MdxError, match=pat):
            mdx_cells(star, parse_mdx(q)).collect()


def test_prevmember_rides_generate_binding(spark):
    """Inside Generate's second argument, CurrentMember still splices
    the ITERATION binding (round-10 semantics win over the round-11
    cell marker): PrevMember over spliced members is static
    navigation, valid only inside WITH MEMBER — so the axis sweep
    rejects it, proving the binding resolved (not the cell marker)."""
    q = """select {[Measures].[crimes]} ON COLUMNS,
  Generate({[Time].[1995].[1]}, {[Time].CurrentMember.PrevMember}) ON ROWS
from [sfcrime]
"""
    with pytest.raises(MdxError, match="only supported inside"):
        parse_mdx(q)


def test_negative_offsets_and_static_base_ptd(spark):
    """Signed offsets: Lag(-1) == Lead(1) == NextMember;
    ParallelPeriod(level, -1) is the NEXT period. A STATIC member
    base for PeriodsToDate (no CurrentMember) gives one fixed
    cumulative value as a scalar cell."""
    q = """WITH MEMBER [Measures].[a] AS
  '([Measures].[crimes], [Time].CurrentMember.Lag(-1))'
MEMBER [Measures].[b] AS
  '([Measures].[crimes], [Time].CurrentMember.NextMember)'
MEMBER [Measures].[c] AS
  '([Measures].[crimes], ParallelPeriod([Time].[year], -1))'
select {[Measures].[a], [Measures].[b], [Measures].[c]} ON COLUMNS,
  Descendants([Time].[1994], [Time].[month]) ON ROWS
from [sfcrime]
"""
    by_col = {}
    for row, col, v in _nav_cells(spark, q):
        by_col.setdefault(col, {})[row] = v
    assert by_col["a"] == by_col["b"]
    tot = _month_totals()
    # next-year parallel of (1994, m): exists for m in {0, 1}
    assert by_col["c"] == {
        "1994, 0": float(tot[(1995, 0)]),
        "1994, 1": float(tot[(1995, 1)]),
    }
    q2 = """WITH MEMBER [Measures].[fixed] AS
  'Sum(PeriodsToDate([Time].[year], [Time].[1995].[2]), [Measures].[crimes])'
select {[Measures].[fixed]} ON COLUMNS,
  {[District].[All Districts]} ON ROWS
from [sfcrime]
"""
    want = float(sum(tot[(1995, m)] for m in (0, 1, 2)))
    assert _nav_cells(spark, q2) == [("All Districts", "fixed", want)]


def test_order_by_navigated_calc_member(spark):
    """The axis-function recursion composes with navigation: Order by
    a WITH MEMBER whose expression navigates (delta = crimes −
    crimes(PrevMember)) sorts the axis by the period-over-period
    value, ties breaking caption-ascending (the pinned policy)."""
    from map_reduce_sf_crime_spark.mdx import mdx_cells

    q = """WITH MEMBER [Measures].[delta] AS
  '[Measures].[crimes] - ([Measures].[crimes], [Time].CurrentMember.PrevMember)'
select {[Measures].[crimes]} ON COLUMNS,
  Order(Descendants([Time].[1995], [Time].[month]),
        [Measures].[delta], BDESC) ON ROWS
from [sfcrime]
"""
    rows = mdx_cells(_nav_star(spark), parse_mdx(q)).collect()
    ordered = [r.row_member for r in sorted(rows, key=lambda r: r.row_ordinal)]
    # deltas: m0=8, m1=4, m2=8, m3=65 → desc: m3, then the 8-tie
    # (m0 before m2 by caption), then m1
    assert ordered == ["1995, 3", "1995, 0", "1995, 2", "1995, 1"]


def _edge_star(spark):
    """Synthetic star with WEEK variation (the shared _NAV_DATA keeps
    week constant): months with different first/last weeks."""
    data = {
        (1994, 0, 1): 3,
        (1994, 11, 2): 7,
        (1995, 0, 1): 11,
        (1995, 0, 3): 2,
        (1995, 1, 1): 13,
        (1995, 1, 4): 5,
        (1995, 2, 2): 17,
    }
    rows = [
        (n, "THEFT", "MISSION", y, m, w, 1) for (y, m, w), n in data.items()
    ]
    return spark.createDataFrame(
        rows,
        "crimes long, category string, district string, "
        "year int, month int, week int, day int",
    )


def test_edge_navigation_children_siblings_periods(spark):
    """FirstChild/LastChild pick each member's min/max child path;
    First/LastSibling the min/max member under the same parent;
    OpeningPeriod/ClosingPeriod([Time].[week]) the first/last week
    under each month — all order statistics over the level universe
    (groupBy-min/max(struct))."""
    from map_reduce_sf_crime_spark.mdx import mdx_cells

    q = """WITH MEMBER [Measures].[fc] AS '([Measures].[crimes], [Time].CurrentMember.FirstChild)'
MEMBER [Measures].[lc] AS '([Measures].[crimes], [Time].CurrentMember.LastChild)'
MEMBER [Measures].[fs] AS '([Measures].[crimes], [Time].CurrentMember.FirstSibling)'
MEMBER [Measures].[ls] AS '([Measures].[crimes], [Time].CurrentMember.LastSibling)'
MEMBER [Measures].[op] AS '([Measures].[crimes], OpeningPeriod([Time].[week]))'
MEMBER [Measures].[cp] AS '([Measures].[crimes], ClosingPeriod([Time].[week]))'
select {[Measures].[fc], [Measures].[lc], [Measures].[fs], [Measures].[ls],
        [Measures].[op], [Measures].[cp]} ON COLUMNS,
  Descendants([Time].[1995], [Time].[month]) ON ROWS
from [sfcrime]
"""
    got = sorted(
        (r.row_member, r.col_member, r.crimes)
        for r in mdx_cells(_edge_star(spark), parse_mdx(q)).collect()
    )
    want = sorted(
        [
            # per-month first/last week values
            ("1995, 0", "fc", 11.0), ("1995, 0", "op", 11.0),
            ("1995, 0", "lc", 2.0), ("1995, 0", "cp", 2.0),
            ("1995, 1", "fc", 13.0), ("1995, 1", "op", 13.0),
            ("1995, 1", "lc", 5.0), ("1995, 1", "cp", 5.0),
            ("1995, 2", "fc", 17.0), ("1995, 2", "op", 17.0),
            ("1995, 2", "lc", 17.0), ("1995, 2", "cp", 17.0),
            # sibling edges under 1995: m0 total 13, m2 total 17
            ("1995, 0", "fs", 13.0), ("1995, 0", "ls", 17.0),
            ("1995, 1", "fs", 13.0), ("1995, 1", "ls", 17.0),
            ("1995, 2", "fs", 13.0), ("1995, 2", "ls", 17.0),
        ]
    )
    assert got == want


def test_edge_navigation_static_base_and_year_children(spark):
    """Edge navigation on STATIC members (explicit year tuples):
    FirstChild/LastChild of each year land on its first/last month;
    zero-argument OpeningPeriod() == [Time].CurrentMember.FirstChild."""
    from map_reduce_sf_crime_spark.mdx import mdx_cells

    q = """WITH MEMBER [Measures].[fc94] AS '([Measures].[crimes], [Time].[1994].FirstChild)'
MEMBER [Measures].[lc94] AS '([Measures].[crimes], [Time].[1994].LastChild)'
MEMBER [Measures].[op0] AS '([Measures].[crimes], OpeningPeriod())'
select {[Measures].[fc94], [Measures].[lc94], [Measures].[op0]} ON COLUMNS,
  {[Time].[1995].[0]} ON ROWS
from [sfcrime]
"""
    got = {
        r.col_member: r.crimes
        for r in mdx_cells(_edge_star(spark), parse_mdx(q)).collect()
    }
    # 1994 first month (0) = 3, last month (11) = 7; OpeningPeriod()
    # = first child of the CELL's member (1995, 0) = its first week = 11
    assert got == {"fc94": 3.0, "lc94": 7.0, "op0": 11.0}


def test_edge_navigation_errors(spark):
    """Loud boundaries: edge navigation below the leaf, OpeningPeriod
    at/above the member's level, chains onto edge navigation, and
    edge suffixes on a bare hierarchy."""
    from map_reduce_sf_crime_spark.mdx import mdx_cells

    star = _edge_star(spark)
    for body, pat in [
        (
            "'([Measures].[crimes], [Time].[1995].[0].[1].[1].FirstChild)'",
            "below the leaf",
        ),
        (
            "'([Measures].[crimes], OpeningPeriod([Time].[month], "
            "[Time].[1995].[0]))'",
            "BELOW the member's level",
        ),
    ]:
        q = (
            f"WITH MEMBER [Measures].[x] AS {body} "
            "select {[Measures].[x]} ON COLUMNS, "
            "{[Category].[All Categories]} ON ROWS from [sfcrime]"
        )
        with pytest.raises(MdxError, match=pat):
            mdx_cells(star, parse_mdx(q)).collect()
    for body, pat in [
        (
            "'([Measures].[crimes], [Time].[1995].FirstChild.PrevMember)'",
            "cannot chain",
        ),
        (
            "'([Measures].[crimes], [Time].[1995].FirstChild.FirstChild)'",
            "may follow a navigated member",
        ),
        (
            "'([Measures].[crimes], [Time].FirstChild)'",
            "applies to a member",
        ),
    ]:
        with pytest.raises(MdxError, match=pat):
            parse_mdx(
                f"WITH MEMBER [Measures].[x] AS {body} "
                "select {[Measures].[x]} ON COLUMNS, "
                "{[Category].[All Categories]} ON ROWS from [sfcrime]"
            )


def test_parent_and_ancestor_share_idiom(spark):
    """.Parent / Ancestor(member, level): share-of-parent ratios —
    the month's share of its year (both spellings equal), and a
    district's share of the All member (Parent at depth 0 = the
    no-filter context)."""
    from map_reduce_sf_crime_spark.mdx import mdx_cells

    q = """WITH MEMBER [Measures].[shr] AS
  '[Measures].[crimes] / ([Measures].[crimes], [Time].CurrentMember.Parent)'
MEMBER [Measures].[shra] AS
  '[Measures].[crimes] / ([Measures].[crimes], Ancestor([Time].CurrentMember, [Time].[year]))'
select {[Measures].[shr], [Measures].[shra]} ON COLUMNS,
  Descendants([Time].[1995], [Time].[month]) ON ROWS
from [sfcrime]
"""
    by_col = {}
    for r in mdx_cells(_edge_star(spark), parse_mdx(q)).collect():
        by_col.setdefault(r.col_member, {})[r.row_member] = r.crimes
    # _edge_star 1995 month totals 13/18/17, year total 48
    want = {"1995, 0": 13 / 48, "1995, 1": 18 / 48, "1995, 2": 17 / 48}
    assert by_col["shr"] == want
    assert by_col["shra"] == want
    q2 = """WITH MEMBER [Measures].[dshr] AS
  '[Measures].[crimes] / ([Measures].[crimes], [District].CurrentMember.Parent)'
select {[Measures].[dshr]} ON COLUMNS,
  {[District].[All Districts].Children} ON ROWS
from [sfcrime]
where [Time].[1995]
"""
    got = {
        r.row_member: r.crimes
        for r in mdx_cells(_nav_star(spark), parse_mdx(q2)).collect()
    }
    # _nav_star 1995: MISSION 11+13+17=41, CENTRAL 12+14+18+100=144
    assert got == {"MISSION": 41 / 185, "CENTRAL": 144 / 185}


def test_parent_ancestor_errors(spark):
    """Loud: Ancestor at a level below the member, .Parent above a
    hasAll=false hierarchy's top level, chains onto .Parent,
    hierarchy mismatch."""
    from map_reduce_sf_crime_spark.mdx import mdx_cells

    star = _edge_star(spark)
    for body, pat in [
        (
            "'([Measures].[crimes], Ancestor([Time].CurrentMember, "
            "[Time].[week]))'",
            "at or above the member's level",
        ),
        (
            "'([Measures].[crimes], [Time].CurrentMember.Parent)'",
            "has no All member",
        ),
    ]:
        # the second case binds CurrentMember at YEAR depth (d=1) so
        # Parent lands at depth 0 on the All-less [Time] hierarchy
        rows = (
            "Descendants([Time].[1995], [Time].[month])"
            if "week" in body
            else "{[Time].[1995]}"
        )
        q = (
            f"WITH MEMBER [Measures].[x] AS {body} "
            f"select {{[Measures].[x]}} ON COLUMNS, {rows} ON ROWS "
            "from [sfcrime]"
        )
        with pytest.raises(MdxError, match=pat):
            mdx_cells(star, parse_mdx(q)).collect()
    for body, pat in [
        (
            "'([Measures].[crimes], [Time].CurrentMember.Parent.Parent)'",
            "may follow a navigated member",
        ),
        (
            "'([Measures].[crimes], Ancestor([District].CurrentMember, "
            "[Time].[year]))'",
            "does not match",
        ),
    ]:
        with pytest.raises(MdxError, match=pat):
            parse_mdx(
                f"WITH MEMBER [Measures].[x] AS {body} "
                "select {[Measures].[x]} ON COLUMNS, "
                "{[Category].[All Categories]} ON ROWS from [sfcrime]"
            )


def test_set_aggregations_moving_window_and_count(spark):
    """Sum/Avg/Min/Max over EXPLICIT sets with navigated members —
    the moving-window idiom — plus Count (INCLUDEEMPTY = set size,
    EXCLUDEEMPTY = non-empty cells, 0 never NULL) and CoalesceEmpty.
    Mondrian empty-cell algebra: Sum/Avg skip empties; a window
    hanging off the data's edge averages over what exists."""
    from map_reduce_sf_crime_spark.mdx import mdx_cells

    rows = [
        (7, "THEFT", "MISSION", 1994, 11, 1, 1),
        (11, "THEFT", "MISSION", 1995, 0, 1, 1),
        (13, "THEFT", "MISSION", 1995, 1, 1, 1),
        (17, "THEFT", "MISSION", 1995, 2, 1, 1),
        (100, "THEFT", "CENTRAL", 1995, 3, 1, 1),
    ]
    star = spark.createDataFrame(
        rows,
        "crimes long, category string, district string, "
        "year int, month int, week int, day int",
    )
    q = """WITH MEMBER [Measures].[mov2] AS
  'Avg({[Time].CurrentMember.Lag(1), [Time].CurrentMember}, [Measures].[crimes])'
MEMBER [Measures].[agg2] AS
  'Aggregate({[Time].CurrentMember.Lag(1), [Time].CurrentMember}, [Measures].[crimes])'
MEMBER [Measures].[mx] AS
  'Max({[Time].CurrentMember.Lag(1), [Time].CurrentMember}, [Measures].[crimes])'
MEMBER [Measures].[nempty] AS
  'Count({([District].[MISSION]), ([District].[CENTRAL])}, EXCLUDEEMPTY)'
MEMBER [Measures].[setsz] AS
  'Count({([District].[MISSION]), ([District].[CENTRAL])})'
MEMBER [Measures].[coal] AS
  'CoalesceEmpty(([Measures].[crimes], [District].[CENTRAL]), -1)'
select {[Measures].[mov2], [Measures].[agg2], [Measures].[mx],
        [Measures].[nempty], [Measures].[setsz], [Measures].[coal]} ON COLUMNS,
  Descendants([Time].[1995], [Time].[month]) ON ROWS
from [sfcrime]
"""
    by_col = {}
    for r in mdx_cells(star, parse_mdx(q)).collect():
        by_col.setdefault(r.col_member, {})[r.row_member] = r.crimes
    m = {"1995, 0": 11, "1995, 1": 13, "1995, 2": 17, "1995, 3": 100}
    prev = {"1995, 0": 7, "1995, 1": 11, "1995, 2": 13, "1995, 3": 17}
    assert by_col["mov2"] == {
        k: (m[k] + prev[k]) / 2 for k in m
    }
    assert by_col["agg2"] == {k: float(m[k] + prev[k]) for k in m}
    assert by_col["mx"] == {k: float(max(m[k], prev[k])) for k in m}
    # exactly one district has data in any one month
    assert by_col["nempty"] == {k: 1.0 for k in m}
    assert by_col["setsz"] == {k: 2.0 for k in m}
    assert by_col["coal"] == {
        "1995, 0": -1.0, "1995, 1": -1.0, "1995, 2": -1.0,
        "1995, 3": 100.0,
    }


def test_set_aggregation_parse_errors():
    """Loud boundaries: enumerations inside explicit sets, measures
    as set members, Avg over PeriodsToDate, one-armed CoalesceEmpty,
    unknown Count flags."""
    head = (
        "select {[Measures].[x]} ON COLUMNS, "
        "{[Category].[All Categories]} ON ROWS from [sfcrime]"
    )
    for body, pat in [
        (
            "'Sum({[District].[All Districts].Children}, "
            "[Measures].[crimes])'",
            "must be explicit",
        ),
        (
            "'Sum({[Measures].[crimes]}, [Measures].[crimes])'",
            "must be dimension members",
        ),
        (
            "'Avg(Ytd(), [Measures].[crimes])'",
            "bakes SUM into its range join",
        ),
        ("'CoalesceEmpty([Measures].[crimes])'", "at least two"),
        (
            "'Count({([District].[MISSION])}, SOMETIMES)'",
            "unknown Count flag",
        ),
    ]:
        with pytest.raises(MdxError, match=pat):
            parse_mdx(f"WITH MEMBER [Measures].[x] AS {body} {head}")


def test_iif_isempty_null_guard_and_comparison(spark):
    """IIF + IsEmpty: the null-guard idiom — replace empty cells,
    guard divisions; Not IsEmpty swaps branches; a NULL comparison
    operand takes the else branch (three-valued IIF)."""
    from map_reduce_sf_crime_spark.mdx import mdx_cells

    rows = [
        (11, "THEFT", "MISSION", 1995, 0, 1, 1),
        (13, "THEFT", "MISSION", 1995, 1, 1, 1),
        (100, "THEFT", "CENTRAL", 1995, 2, 1, 1),
    ]
    star = spark.createDataFrame(
        rows,
        "crimes long, category string, district string, "
        "year int, month int, week int, day int",
    )
    q = """WITH MEMBER [Measures].[guarded] AS
  'IIF(IsEmpty(([Measures].[crimes], [District].[CENTRAL])), 0,
       ([Measures].[crimes], [District].[CENTRAL]))'
MEMBER [Measures].[ng] AS
  'IIF(Not IsEmpty(([Measures].[crimes], [District].[CENTRAL])), 1, 0)'
MEMBER [Measures].[big] AS
  'IIF([Measures].[crimes] > 50, 1, 0)'
MEMBER [Measures].[nullcmp] AS
  'IIF(([Measures].[crimes], [District].[CENTRAL]) > 0, 1, 0)'
select {[Measures].[guarded], [Measures].[ng], [Measures].[big],
        [Measures].[nullcmp]} ON COLUMNS,
  Descendants([Time].[1995], [Time].[month]) ON ROWS
from [sfcrime]
"""
    by_col = {}
    for r in mdx_cells(star, parse_mdx(q)).collect():
        by_col.setdefault(r.col_member, {})[r.row_member] = r.crimes
    ms = ["1995, 0", "1995, 1", "1995, 2"]
    assert by_col["guarded"] == {ms[0]: 0.0, ms[1]: 0.0, ms[2]: 100.0}
    assert by_col["ng"] == {ms[0]: 0.0, ms[1]: 0.0, ms[2]: 1.0}
    assert by_col["big"] == {ms[0]: 0.0, ms[1]: 0.0, ms[2]: 1.0}
    # CENTRAL cell NULL for months 0-1: unknown comparison → else
    assert by_col["nullcmp"] == {ms[0]: 0.0, ms[1]: 0.0, ms[2]: 1.0}
    # parse errors
    for body, pat in [
        ("'IIF([Measures].[crimes], 1, 0)'", "needs IsEmpty"),
        (
            "'IIF(Not [Measures].[crimes] > 1, 1, 0)'",
            "Not applies to IsEmpty",
        ),
    ]:
        with pytest.raises(MdxError, match=pat):
            parse_mdx(
                f"WITH MEMBER [Measures].[x] AS {body} "
                "select {[Measures].[x]} ON COLUMNS, "
                "{[Category].[All Categories]} ON ROWS from [sfcrime]"
            )


def test_set_aggregation_over_named_set(spark):
    """A WITH SET member list splices into a set aggregation —
    Sum([both], crimes) == the two districts' total."""
    from map_reduce_sf_crime_spark.mdx import mdx_cells

    q = """WITH SET [both] AS '{([District].[MISSION]), ([District].[CENTRAL])}'
MEMBER [Measures].[tot] AS 'Sum([both], [Measures].[crimes])'
select {[Measures].[tot]} ON COLUMNS,
  Descendants([Time].[1995], [Time].[month]) ON ROWS
from [sfcrime]
"""
    got = {
        r.row_member: r.crimes
        for r in mdx_cells(_nav_star(spark), parse_mdx(q)).collect()
    }
    tot = _month_totals()
    assert got == {
        f"1995, {m}": float(v) for (y, m), v in tot.items() if y == 1995
    }


def test_crossjoin_enumeration_with_navigation(spark):
    """Navigation composes with a TWO-hierarchy enumerated axis:
    Crossjoin(district.Children, months) × delta(PrevMember) — the
    lag join keys on the time path while the district enumeration
    rides along (lg), pinned against a per-district window twin."""
    from pyspark.sql import Window
    from map_reduce_sf_crime_spark.mdx import mdx_cells

    star = _nav_star(spark)
    q = """WITH MEMBER [Measures].[delta] AS
  '[Measures].[crimes] - ([Measures].[crimes], [Time].CurrentMember.PrevMember)'
select {[Measures].[delta]} ON COLUMNS,
  Crossjoin({[District].[All Districts].Children},
            Descendants([Time].[1995], [Time].[month])) ON ROWS
from [sfcrime]
"""
    got = {
        r.row_member: r.crimes
        for r in mdx_cells(star, parse_mdx(q)).collect()
    }
    # twin: PrevMember is a TIME navigation — the GLOBAL previous
    # month (all districts' months), and the cell's district then
    # looks its own value up there (possibly empty). A per-district
    # lag would be a different (wrong) semantics: it skips months
    # the district has no data for.
    months = sorted(
        (r.year, r.month)
        for r in star.select("year", "month").distinct().collect()
    )
    prev = {b: a for a, b in zip(months, months[1:])}
    vals = {
        (r.district, r.year, r.month): r.c
        for r in star.groupBy("district", "year", "month")
        .agg(F.sum("crimes").alias("c"))
        .collect()
    }
    want = {}
    for (d, y, m), c in vals.items():
        if y != 1995 or (y, m) not in prev:
            continue
        py, pm = prev[(y, m)]
        if (d, py, pm) in vals:
            want[f"{d}, 1995, {m}"] = float(c - vals[(d, py, pm)])
    assert got == want and got
