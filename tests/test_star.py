"""Star-schema invariants (SURVEY §5 / FIXTURES §2): FK integrity and
measure conservation."""

from __future__ import annotations

from pyspark.sql import functions as F

from map_reduce_sf_crime_spark.operators.star import star_tables
from map_reduce_sf_crime_spark.plans.crimes_view import incidents

from .conftest import SF_SMOKE


def test_star_invariants(spark):
    inc = incidents(spark, SF_SMOKE).cache()
    t = star_tables(inc)
    n_incidents = inc.count()

    # measure conservation: sum(fact.crimes) == clean incident count
    assert t["fact"].agg(F.sum("crimes")).first()[0] == n_incidents

    # every FK resolves (anti joins empty)
    for fk, dim in [
        ("category_id", t["category"]),
        ("district_id", t["district"]),
        ("time_id", t["timeperiod"]),
    ]:
        dangling = t["fact"].join(
            dim.select(F.col(dim.columns[0])), fk, "left_anti"
        )
        assert dangling.count() == 0, fk

    # surrogate ids are 1-based dense ranks in sorted order
    cats = t["category"].orderBy("category_id").collect()
    assert [c.category_id for c in cats] == list(range(1, len(cats) + 1))
    assert [c.name for c in cats] == sorted(c.name for c in cats)
    inc.unpersist()
