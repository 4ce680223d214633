"""Round-5 operators: salted shuffle join, skew report, CDC
compaction, linear interpolation, stratified sampling, DQ audit."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tp_integ_data_pipeline_spark.operators.change_feed import compact_cdc
from tp_integ_data_pipeline_spark.operators.quality_audit import (
    audit_checks,
    audit_reference,
    audit_uniqueness,
)
from tp_integ_data_pipeline_spark.operators.skew import salted_join, skew_report
from tp_integ_data_pipeline_spark.operators.timeseries import (
    interpolate_linear,
    stratified_sample,
)


# ---------------------------------------------------------------------------
# salted_join / skew_report
# ---------------------------------------------------------------------------
def _skewed(spark):
    # 60 rows on hot key 1 (with DUPLICATE payloads among them), the
    # rest spread; dim misses key 99 (tests inner-drop / left-null)
    rows = [(1, i % 7) for i in range(60)] + [(k, k) for k in range(2, 12)] + [(99, 0)]
    fact = spark.createDataFrame(rows, ["k", "payload"])
    dim = spark.createDataFrame([(k, f"attr{k}") for k in range(1, 12)], ["k", "attr"])
    return fact, dim


def test_salted_join_equals_plain_join(spark):
    fact, dim = _skewed(spark)
    for how in ("inner", "left"):
        plain = fact.join(dim, ["k"], how).groupBy("k", "payload", "attr").count()
        salted = salted_join(fact, dim, ["k"], n_salts=4, how=how).groupBy(
            "k", "payload", "attr"
        ).count()
        # exact multiset equality, including duplicate fact rows
        assert plain.exceptAll(salted).count() == 0
        assert salted.exceptAll(plain).count() == 0
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(fact, dim, ["k"], how="outer")


def test_salted_join_actually_spreads_hot_key(spark):
    fact, dim = _skewed(spark)
    salts = (
        salted_join(fact, dim, ["k"], n_salts=4)
        .filter(F.col("k") == 1)
        .select(F.pmod(F.xxhash64("k", "payload"), F.lit(4)).alias("s"))
        .distinct()
        .count()
    )
    # 60 hot rows over 7 payload values must hit >1 of the 4 salts
    assert salts > 1


def test_skew_report_counts_and_shares(spark):
    fact, _ = _skewed(spark)
    rep = skew_report(fact, ["k"], top=3).collect()
    assert rep[0]["k"] == 1 and rep[0]["n_rows"] == 60
    assert abs(rep[0]["share"] - 60 / 71) < 1e-6
    assert len(rep) == 3 and rep[1]["n_rows"] >= rep[2]["n_rows"]


# ---------------------------------------------------------------------------
# compact_cdc
# ---------------------------------------------------------------------------
def _feed(spark):
    rows = [
        # key 1: two upserts, latest wins
        (1, 10, 1, "upsert", 1.0),
        (1, 20, 2, "upsert", 2.0),
        # key 2: delete-terminated -> dropped
        (2, 10, 3, "upsert", 9.0),
        (2, 30, 4, "delete", None),
        # key 3: deleted then re-inserted -> present with the new value
        (3, 10, 5, "delete", None),
        (3, 40, 6, "upsert", 7.0),
        # key 4: timestamp TIE -> seq breaks it (seq 8 wins)
        (4, 50, 7, "upsert", 100.0),
        (4, 50, 8, "upsert", 200.0),
    ]
    return spark.createDataFrame(rows, "k long, ts long, seq long, op string, v double")


def test_compact_cdc_latest_state(spark):
    snap = {r["k"]: r for r in compact_cdc(_feed(spark), ["k"], "ts", "seq").collect()}
    assert set(snap) == {1, 3, 4}
    assert snap[1]["v"] == 2.0
    assert snap[3]["v"] == 7.0
    assert snap[4]["v"] == 200.0  # tie broken by seq, deterministically
    # payload columns carried; op dropped
    assert "op" not in snap[1].asDict() and snap[1]["ts"] == 20


def test_compact_cdc_null_op_is_upsert(spark):
    # convention (round-5 advice): a NULL op is an upsert, not a
    # three-valued-logic silent drop
    rows = [
        (1, 10, 1, None, 5.0),  # only event for key 1: NULL op -> kept
        (2, 10, 2, "upsert", 1.0),
        (2, 20, 3, None, 2.0),  # latest is NULL op -> kept with v=2.0
        (3, 10, 4, None, 9.0),
        (3, 20, 5, "delete", None),  # latest is delete -> dropped
    ]
    feed = spark.createDataFrame(rows, "k long, ts long, seq long, op string, v double")
    snap = {r["k"]: r for r in compact_cdc(feed, ["k"], "ts", "seq").collect()}
    assert set(snap) == {1, 2}
    assert snap[1]["v"] == 5.0 and snap[2]["v"] == 2.0


def test_compact_cdc_partition_invariant(spark):
    a = compact_cdc(_feed(spark).repartition(1), ["k"], "ts", "seq")
    b = compact_cdc(_feed(spark).repartition(13), ["k"], "ts", "seq")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


# ---------------------------------------------------------------------------
# interpolate_linear
# ---------------------------------------------------------------------------
def test_interpolate_linear_interior_and_edges(spark):
    rows = [
        # key a: values at t=0 (10) and t=3 (40): interior gap t=1,2
        ("a", 0, 10.0), ("a", 1, None), ("a", 2, None), ("a", 3, 40.0),
        # leading gap at t=-1 (backfills to 10), trailing at t=4 (LOCF 40)
        ("a", -1, None), ("a", 4, None),
        # key b: single anchor only
        ("b", 0, None), ("b", 1, 5.0), ("b", 2, None),
        # key c: no anchors at all
        ("c", 0, None),
    ]
    df = spark.createDataFrame(rows, "k string, t long, v double").repartition(5)
    got = {
        (r["k"], r["t"]): r["v_interp"]
        for r in interpolate_linear(df, "k", "t", "v").collect()
    }
    assert got[("a", 1)] == 20.0 and got[("a", 2)] == 30.0  # exact linear
    assert got[("a", -1)] == 10.0  # backfill from the only next anchor
    assert got[("a", 4)] == 40.0  # LOCF from the only prev anchor
    assert got[("a", 0)] == 10.0 and got[("a", 3)] == 40.0  # anchors kept
    assert got[("b", 0)] == 5.0 and got[("b", 2)] == 5.0
    assert got[("c", 0)] is None  # nothing to anchor on


def test_interpolate_linear_uneven_spacing(spark):
    # anchors at t=0 (0.0) and t=10 (100.0); gap at t=7 -> 70.0
    rows = [("k", 0, 0.0), ("k", 7, None), ("k", 10, 100.0)]
    df = spark.createDataFrame(rows, "k string, t long, v double")
    got = {r["t"]: r["v_interp"] for r in interpolate_linear(df, "k", "t", "v").collect()}
    assert got[7] == 70.0


# ---------------------------------------------------------------------------
# stratified_sample
# ---------------------------------------------------------------------------
def test_stratified_sample_exact_k_and_deterministic(spark):
    rows = [(i, "s1" if i < 40 else "s2") for i in range(43)]
    df = spark.createDataFrame(rows, "id long, g string")
    got = stratified_sample(df, ["g"], "id", 5)
    per = {r["g"]: r["n"] for r in got.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert per["s1"] == 5 and per["s2"] == 3  # stratum smaller than k: all kept
    a = sorted(r["id"] for r in got.collect())
    b = sorted(
        r["id"] for r in stratified_sample(df.repartition(17), ["g"], "id", 5).collect()
    )
    assert a == b  # deterministic under any partitioning


# ---------------------------------------------------------------------------
# audit_*
# ---------------------------------------------------------------------------
def test_audit_battery(spark):
    orders = spark.createDataFrame(
        [(1, 10, "O", 5.0), (2, None, "O", -1.0), (3, 11, "X", 2.0), (3, 12, "F", 3.0)],
        "ok long, cust long, status string, total double",
    )
    li = spark.createDataFrame([(1, 1.0), (3, 2.0), (9, 3.0)], "ok long, q double")
    checks = audit_checks(
        orders,
        {
            "null_cust": F.col("cust").isNull(),
            "bad_status": ~F.col("status").isin("O", "F"),
            "nonpositive": F.col("total") <= 0,
        },
    ).collect()
    got = {r["check"]: r["violations"] for r in checks}
    assert got == {"null_cust": 1, "bad_status": 1, "nonpositive": 1}
    uniq = audit_uniqueness(orders, ["ok"], "dup").first()
    assert uniq["violations"] == 1  # key 3 appears twice
    orph = audit_reference(li, orders, ["ok"], ["ok"], "orphan").first()
    assert orph["violations"] == 1  # lineitem ok=9 has no order
    # empty input: SUM over zero groups coalesces to 0, never NULL
    # (round-5 advice — downstream `violations > 0` rules stay sound)
    empty = audit_uniqueness(orders.limit(0), ["ok"], "dup").first()
    assert empty["violations"] == 0 and empty["violations"] is not None


# ---------------------------------------------------------------------------
# asof_join
# ---------------------------------------------------------------------------
def test_asof_join_semantics(spark):
    from tp_integ_data_pipeline_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("a", 5, 1), ("a", 10, 2), ("a", 20, 3), ("b", 7, 4)],
        "k string, t long, lid long",
    )
    right = spark.createDataFrame(
        [
            ("a", 10, 1, 100.0),   # tie with left t=10 -> matched (inclusive)
            ("a", 10, 2, 200.0),   # duplicate ts: higher seq wins
            ("a", 15, 3, 300.0),
            # key b has no right rows at all
        ],
        "k string, t long, seq long, v double",
    )
    got = {
        r["lid"]: r["v"]
        for r in asof_join(
            left, right, "k", "t", "t", "seq", ["v"]
        ).collect()
    }
    assert got[1] is None          # t=5: nothing at or before
    assert got[2] == 200.0         # t=10: inclusive tie, seq 2 beats seq 1
    assert got[3] == 300.0         # t=20: latest prior is t=15
    assert got[4] is None          # key with no right side


def test_asof_join_tolerance_and_columns(spark):
    from tp_integ_data_pipeline_spark.operators.asof import asof_join

    left = spark.createDataFrame([("a", 100, 1), ("a", 200, 2)], "k string, t long, lid long")
    right = spark.createDataFrame([("a", 95, 1, 7.0)], "k string, t long, seq long, v double")
    out = asof_join(left, right, "k", "t", "t", "seq", ["v"], tolerance=10)
    got = {r["lid"]: r["v"] for r in out.collect()}
    assert got[1] == 7.0           # 5 units old: within tolerance
    assert got[2] is None          # 105 units old: nulled out
    assert set(out.columns) == {"k", "t", "lid", "v"}  # left payload + right vals


# ---------------------------------------------------------------------------
# triangle_count
# ---------------------------------------------------------------------------
def test_triangle_count_known_graphs(spark):
    from tp_integ_data_pipeline_spark.operators.graph import triangle_count

    def tc(edges):
        df = spark.createDataFrame(edges, "src long, dst long")
        return triangle_count(df).first()["n_triangles"]

    # K4: C(4,3) = 4 triangles; mixed orientations + a duplicate + self-loop
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    noisy = k4 + [(3, 2), (1, 1), (0, 1)]  # reversed dup, loop, exact dup
    assert tc(k4) == 4 and tc(noisy) == 4
    # path graph: no triangles
    assert tc([(0, 1), (1, 2), (2, 3)]) == 0
    # celebrity hub: star + one rim edge -> exactly 1 triangle
    star = [(0, i) for i in range(1, 30)] + [(1, 2)]
    assert tc(star) == 1


# ---------------------------------------------------------------------------
# grouped_median / robust_outliers
# ---------------------------------------------------------------------------
def test_grouped_median_matches_statistics(spark):
    import statistics

    from tp_integ_data_pipeline_spark.operators.timeseries import grouped_median

    odd = [1.0, 9.0, 5.0]
    even = [4.0, 1.0, 3.0, 2.0]
    rows = [("odd", v) for v in odd] + [("even", v) for v in even]
    df = spark.createDataFrame(rows, "g string, v double").repartition(7)
    got = {r["g"]: r["m"] for r in grouped_median(df, ["g"], "v", "m").collect()}
    assert got["odd"] == statistics.median(odd)
    assert got["even"] == statistics.median(even)  # interpolated 2.5


def test_robust_outliers_planted(spark):
    from tp_integ_data_pipeline_spark.operators.timeseries import robust_outliers

    base = [("g", float(v)) for v in [10, 11, 9, 10, 12, 10, 11, 9]]
    planted = base + [("g", 1000.0), ("g", -500.0)]
    df = spark.createDataFrame(planted, "g string, v double")
    r = robust_outliers(df, ["g"], "v").first()
    assert r["n"] == 10 and r["n_outliers"] == 2 and r["med"] == 10.0
    # constant group: mad = 0 -> nothing flagged, by convention
    const = spark.createDataFrame([("c", 5.0)] * 6, "g string, v double")
    rc = robust_outliers(const, ["g"], "v").first()
    assert rc["mad"] == 0.0 and rc["n_outliers"] == 0


# ---------------------------------------------------------------------------
# inverted index search
# ---------------------------------------------------------------------------
def test_inverted_index_and_search(spark):
    from tp_integ_data_pipeline_spark.operators.search import (
        inverted_index,
        postings,
        search_all_terms,
    )

    docs = spark.createDataFrame(
        [
            (1, "join hash join scan"),   # repeated token: posting is distinct
            (2, "join filter"),
            (3, "filter sort"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    idx = {r["token"]: r for r in inverted_index(docs).collect()}
    assert idx["join"]["doc_ids"] == [1, 2] and idx["join"]["df"] == 2
    assert "" not in idx
    post = postings(docs)
    both = sorted(r["id"] for r in search_all_terms(post, ["join", "filter"]).collect())
    assert both == [2]
    assert search_all_terms(post, ["join", "nosuchtoken"]).count() == 0
    # duplicate terms in the query must not change the required count
    assert sorted(
        r["id"] for r in search_all_terms(post, ["join", "join"]).collect()
    ) == [1, 2]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        search_all_terms(post, [])
