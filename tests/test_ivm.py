"""Incremental view maintenance (operators/ivm.py): delta-applied ==
full recompute, group birth/death, feed validation, dirty-group
refresh for non-additive aggregates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tp_integ_data_pipeline_spark.operators.ivm import (
    apply_delta,
    delta_aggregate,
    refresh_dirty_groups,
)

SCHEMA = "id long, grp string, amt long"
BASE = [
    (1, "a", 10),
    (2, "a", 20),
    (3, "b", 5),
    (4, "b", 7),
    (5, "c", 100),
]
# feed: insert into new group d, delete all of c (group death),
# update row 2 (a), insert another a
FEED = [
    (6, "d", 50, "insert"),
    (5, "c", 100, "delete"),
    (2, "a", 20, "update_preimage"),
    (2, "a", 25, "update_postimage"),
    (7, "a", 1, "insert"),
]
FEED_SCHEMA = "id long, grp string, amt long, _change_type string"


def _view(df):
    return df.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"), F.sum("amt").alias("total")
    )


def _final_rows():
    rows = {r[0]: r for r in BASE}
    del rows[5]
    rows[2] = (2, "a", 25)
    rows[6] = (6, "d", 50)
    rows[7] = (7, "a", 1)
    return list(rows.values())


def test_apply_delta_equals_full_recompute(spark):
    base = spark.createDataFrame(BASE, SCHEMA)
    feed = spark.createDataFrame(FEED, FEED_SCHEMA)
    delta = delta_aggregate(feed, ["grp"], {"total": "amt"}, count_col="n")
    got = (
        apply_delta(_view(base), delta, ["grp"], {"total": "amt"}, count_col="n")
        .toPandas()
        .set_index("grp")
        .sort_index()
    )
    want = (
        _view(spark.createDataFrame(_final_rows(), SCHEMA))
        .toPandas()
        .set_index("grp")
        .sort_index()
    )
    assert got["n"].to_dict() == want["n"].to_dict()
    assert got["total"].to_dict() == want["total"].to_dict()
    # group death: c is gone; group birth: d exists
    assert "c" not in got.index and "d" in got.index


def test_unknown_change_type_raises(spark):
    feed = spark.createDataFrame([(1, "a", 10, "upsert")], FEED_SCHEMA)
    delta = delta_aggregate(feed, ["grp"], {"total": "amt"}, count_col="n")
    with pytest.raises(Exception, match="unknown _change_type"):
        delta.collect()


def test_refresh_dirty_groups_minmax(spark):
    """min/max can't be decremented — dirty groups are recomputed from
    the new base, untouched groups pass through."""
    base_v2 = spark.createDataFrame(_final_rows(), SCHEMA)
    feed = spark.createDataFrame(FEED, FEED_SCHEMA)

    def agg(df):
        return df.groupBy("grp").agg(
            F.min("amt").alias("lo"), F.max("amt").alias("hi")
        )

    view_v1 = agg(spark.createDataFrame(BASE, SCHEMA))
    got = (
        refresh_dirty_groups(view_v1, base_v2, feed, ["grp"], agg)
        .toPandas()
        .set_index("grp")
        .sort_index()
    )
    want = agg(base_v2).toPandas().set_index("grp").sort_index()
    assert got["lo"].to_dict() == want["lo"].to_dict()
    assert got["hi"].to_dict() == want["hi"].to_dict()


def test_empty_feed_is_noop(spark):
    base = spark.createDataFrame(BASE, SCHEMA)
    feed = spark.createDataFrame([], FEED_SCHEMA)
    delta = delta_aggregate(feed, ["grp"], {"total": "amt"}, count_col="n")
    got = (
        apply_delta(_view(base), delta, ["grp"], {"total": "amt"}, count_col="n")
        .toPandas()
        .set_index("grp")
        .sort_index()
    )
    want = _view(base).toPandas().set_index("grp").sort_index()
    assert got["n"].to_dict() == want["n"].to_dict()
    assert got["total"].to_dict() == want["total"].to_dict()
