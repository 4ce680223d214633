"""Round-6 operators: count-min sketch (build/estimate/merge),
k-anonymity report, BM25 ranking sanity, source novelty."""

from __future__ import annotations

from pyspark.sql import functions as F

from tp_integ_data_pipeline_spark.operators.privacy import k_anonymity_report
from tp_integ_data_pipeline_spark.operators.search import bm25_topk
from tp_integ_data_pipeline_spark.operators.sketches import cms_build, cms_estimate


def _tokens(spark, words):
    return spark.createDataFrame([(w,) for w in words], "key string")


def test_cms_never_undercounts_and_is_exact_when_sparse(spark):
    words = ["a"] * 7 + ["b"] * 3 + ["c"]
    sketch = cms_build(_tokens(spark, words), depth=4, width=256)
    probes = _tokens(spark, ["a", "b", "c", "absent"])
    est = {r["key"]: r["cms_est"] for r in cms_estimate(sketch, probes).collect()}
    truth = {"a": 7, "b": 3, "c": 1, "absent": 0}
    for k, t in truth.items():
        assert est[k] >= t  # CMS never under-counts
    # 3 keys in 256 buckets: collisions virtually impossible -> exact
    assert est == truth


def test_cms_sketch_is_reaggregable(spark):
    """Union of shard sketches re-summed == sketch of the union — the
    mergeable-partial-state property the sketch family shares."""
    s1 = cms_build(_tokens(spark, ["x"] * 4 + ["y"]), depth=4, width=64)
    s2 = cms_build(_tokens(spark, ["x"] * 2 + ["z"]), depth=4, width=64)
    merged = (
        s1.unionByName(s2).groupBy("row", "bucket").agg(F.sum("c").alias("c"))
    )
    direct = cms_build(_tokens(spark, ["x"] * 6 + ["y", "z"]), depth=4, width=64)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))


def test_cms_overcount_bounded_by_min_row(spark):
    """With width=2 collisions are forced; the estimate must still be
    >= truth for every key, and the depth-min must be <= any single
    row's counter (the min-reduction is doing its job)."""
    words = [c for c in "aaabbcddeeffgg"]
    sketch = cms_build(_tokens(spark, words), depth=4, width=2)
    probes = _tokens(spark, ["a", "g"])
    out = cms_estimate(sketch, probes, depth=4, width=2).collect()
    truth = {"a": 3, "g": 2}
    maxc = max(r["c"] for r in sketch.collect())
    for r in out:
        assert truth[r["key"]] <= r["cms_est"] <= maxc


def test_k_anonymity_classes_and_flags(spark):
    rows = [
        # class (1, 'A'): 3 rows, 2 sensitive values
        (1, "A", 10), (1, "A", 10), (1, "A", 20),
        # class (2, 'B'): 1 row -> at risk under k=2
        (2, "B", 30),
        # null quasi value forms its own class
        (None, "A", 40), (None, "A", 40),
    ]
    df = spark.createDataFrame(rows, "nat int, seg string, sens int")
    rep = {
        (r["nat"], r["seg"]): (r["class_size"], r["l_diversity"], r["at_risk"])
        for r in k_anonymity_report(df, ["nat", "seg"], "sens", k=2).collect()
    }
    assert rep[(1, "A")] == (3, 2, False)
    assert rep[(2, "B")] == (1, 1, True)
    assert rep[(None, "A")] == (2, 1, False)  # nulls group together


def test_bm25_ranks_term_dense_doc_first(spark):
    docs = spark.createDataFrame(
        [
            (0, "cat cat cat dog"),       # dense in 'cat'
            (1, "cat filler filler filler filler filler filler filler"),
            (2, "dog only here"),
            (3, "nothing relevant at all"),
        ],
        "doc_id long, text string",
    )
    out = bm25_topk(docs, ["cat"], k=3).collect()
    assert out[0]["id"] == 0  # highest tf, short doc
    ids = [r["id"] for r in out]
    assert 3 not in ids and 2 not in ids  # no 'cat' -> no score row
    assert all(r["score"] > 0 for r in out)


# ---------------------------------------------------------------------------
# KMV sketch
# ---------------------------------------------------------------------------
def test_kmv_exact_below_k_and_close_above(spark):
    from tp_integ_data_pipeline_spark.operators.sketches import kmv_estimate, kmv_sketch

    small = spark.createDataFrame([(i % 50,) for i in range(500)], "x long")
    r = kmv_estimate(kmv_sketch(small, "x", k=256), k=256).first()
    assert r["n_kept"] == 50 and r["est"] == 50.0  # < k distinct -> exact

    big = spark.createDataFrame([(i,) for i in range(20_000)], "x long")
    r = kmv_estimate(kmv_sketch(big, "x", k=256), k=256).first()
    assert r["n_kept"] == 256
    assert abs(r["est"] - 20_000) / 20_000 < 0.25  # ~1/sqrt(k) regime


def test_kmv_sketch_merges_by_union(spark):
    from pyspark.sql import functions as F
    from tp_integ_data_pipeline_spark.operators.sketches import kmv_sketch

    a = spark.createDataFrame([(i,) for i in range(0, 3000)], "x long")
    b = spark.createDataFrame([(i,) for i in range(1500, 4500)], "x long")
    merged = (
        kmv_sketch(a, "x", 128)
        .unionByName(kmv_sketch(b, "x", 128))
        .distinct()
        .orderBy("h")
        .limit(128)
    )
    direct = kmv_sketch(a.unionByName(b), "x", 128)
    assert [r["h"] for r in merged.collect()] == [r["h"] for r in direct.collect()]


# ---------------------------------------------------------------------------
# grouped_quantiles
# ---------------------------------------------------------------------------
def test_grouped_quantiles_percentile_disc_semantics(spark):
    import math
    from tp_integ_data_pipeline_spark.operators.timeseries import grouped_quantiles

    vals = list(range(1, 101))  # 1..100 in group 'g'
    df = spark.createDataFrame([("g", v) for v in vals], "k string, v long")
    got = {r["tenth"]: r["v"] for r in grouped_quantiles(df, ["k"], "v", [1, 5, 9]).collect()}
    # percentile_disc: value at rank ceil(q*n) = ceil(t*100/10)
    assert got == {1: 10, 5: 50, 9: 90}
    # odd n: ceil semantics (not interpolation)
    df7 = spark.createDataFrame([("g", v) for v in (3, 1, 4, 1, 5, 9, 2)], "k string, v long")
    got7 = {r["tenth"]: r["v"] for r in grouped_quantiles(df7, ["k"], "v", [5]).collect()}
    assert got7[5] == sorted((3, 1, 4, 1, 5, 9, 2))[math.ceil(0.5 * 7) - 1]


def test_grouped_quantiles_partition_invariant(spark):
    from tp_integ_data_pipeline_spark.operators.timeseries import grouped_quantiles

    rows = [("a", i * 7 % 53) for i in range(53)] + [("b", i) for i in range(11)]
    df = spark.createDataFrame(rows, "k string, v long")
    a = sorted(map(tuple, grouped_quantiles(df.repartition(1), ["k"], "v", [2, 8]).collect()))
    b = sorted(map(tuple, grouped_quantiles(df.repartition(13), ["k"], "v", [2, 8]).collect()))
    assert a == b


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------
def test_bloom_no_false_negatives_and_low_fp(spark):
    from pyspark.sql import functions as F
    from tp_integ_data_pipeline_spark.operators.sketches import (
        bloom_might_contain,
        bloom_words,
    )

    keys = spark.createDataFrame([(i * 3,) for i in range(400)], "k long")
    words = bloom_words(keys, "k", m_bits=65536)
    probe = spark.createDataFrame([(i,) for i in range(1200)], "k long")
    out = probe.select("k", bloom_might_contain("k", words, 65536).alias("hit"))
    member = out.filter(F.col("k") % 3 == 0)
    assert member.filter(~F.col("hit")).count() == 0  # NO false negatives
    fp = out.filter((F.col("k") % 3 != 0) & F.col("hit")).count()
    assert fp <= 24  # (1-e^(-3*400/65536))^3 ~ 6e-6 per probe; generous bound


def test_bloom_bit63_portable(spark):
    """A key whose placement lands on bit 63 must round-trip (the
    shiftleft sign-bit wrap the DuckDB oracle spells explicitly)."""
    from tp_integ_data_pipeline_spark.operators.sketches import (
        _BLOOM_SEEDS,
        _bloom_pos,
        bloom_might_contain,
        bloom_words,
    )
    from pyspark.sql import functions as F

    cand = spark.createDataFrame([(i,) for i in range(5000)], "k long")
    hit63 = cand.select(
        "k", *[_bloom_pos(F.col("k"), s, 65536).alias(f"p{s}") for s in range(_BLOOM_SEEDS)]
    ).filter(
        (F.col("p0") % 64 == 63) | (F.col("p1") % 64 == 63) | (F.col("p2") % 64 == 63)
    )
    some = [r["k"] for r in hit63.limit(5).collect()]
    assert some, "no candidate key placed on bit 63 in 5000 tries (hash broken?)"
    keys = spark.createDataFrame([(k,) for k in some], "k long")
    words = bloom_words(keys, "k", 65536)
    got = keys.select(bloom_might_contain("k", words, 65536).alias("hit")).collect()
    assert all(r["hit"] for r in got)


def test_kmv_intersection_estimates_overlap(spark):
    """Planted 50% overlap: the KMV Jaccard estimate must land near
    1/3 (|A∩B|/|A∪B| = 1000/3000) — the q171 machinery distilled."""
    from pyspark.sql import functions as F
    from tp_integ_data_pipeline_spark.operators.sketches import kmv_sketch

    a = spark.createDataFrame([(i,) for i in range(2000)], "k long")
    b = spark.createDataFrame([(i,) for i in range(1000, 3000)], "k long")
    sa, sb = kmv_sketch(a, "k", 256), kmv_sketch(b, "k", 256)
    u = sa.unionByName(sb).distinct().orderBy("h").limit(256)
    tagged = (
        u.join(sa.withColumn("__a", F.lit(1)), "h", "left")
        .join(sb.withColumn("__b", F.lit(1)), "h", "left")
    )
    r = tagged.agg(
        F.count(F.lit(1)).alias("k_used"),
        F.count(F.when(F.col("__a").isNotNull() & F.col("__b").isNotNull(), 1)).alias("c"),
        F.max("h").alias("theta"),
    ).first()
    jac = r["c"] / r["k_used"]
    est_union = (r["k_used"] - 1) / r["theta"]
    assert abs(jac - 1 / 3) < 0.15
    assert abs(est_union - 3000) / 3000 < 0.25


# ---------------------------------------------------------------------------
# image dHash (multimodal near-dup)
# ---------------------------------------------------------------------------
def test_image_dhash_identical_close_and_distinct(spark):
    from pyspark.sql import functions as F
    from tp_integ_data_pipeline_spark.operators.dedup import hamming_pairs
    from tp_integ_data_pipeline_spark.operators.multimodal import (
        image_dhash,
        synth_bmp_payload,
    )

    # ids 0 and 10 share residue mod 10 -> near-identical; 0 vs 3 distinct
    ids = spark.createDataFrame([(0,), (3,), (10,)], "doc_id long")
    payloads = synth_bmp_payload(ids, "doc_id", group_mod=10)
    sigs = {r["doc_id"]: r["dhash"] for r in image_dhash(payloads).collect()}
    assert len(sigs) == 3  # every synthetic BMP decodes
    ham = lambda a, b: bin((sigs[a] ^ sigs[b]) & ((1 << 64) - 1)).count("1")
    assert ham(0, 10) <= 3  # planted near-dup (+-1 pixel perturbation)
    assert ham(0, 3) > 10  # independent groups are far apart
    pairs = hamming_pairs(
        image_dhash(payloads), "dhash", max_hamming=3, id_col="doc_id"
    ).collect()
    assert [(r["a"], r["b"]) for r in pairs] == [(0, 10)]


def test_synth_bmp_deterministic_and_decodable(spark):
    from tp_integ_data_pipeline_spark.operators.multimodal import (
        decode_pixels,
        synth_bmp_payload,
    )

    ids = spark.createDataFrame([(7,), (7,)], "doc_id long")
    p1, p2 = [bytes(r["payload"]) for r in synth_bmp_payload(ids, "doc_id").collect()]
    assert p1 == p2  # content-deterministic
    px = decode_pixels(p1)
    assert px is not None and px.shape == (16, 16, 3)


# ---------------------------------------------------------------------------
# prefix-filtered set-similarity join
# ---------------------------------------------------------------------------
def test_prefix_join_exact_vs_bruteforce(spark):
    from itertools import combinations
    from pyspark.sql import functions as F
    from tp_integ_data_pipeline_spark.operators.dedup import set_similarity_join

    sets = {
        1: {"a", "b", "c", "d", "e"},
        2: {"a", "b", "c", "d", "f"},      # J(1,2)=4/6=0.667
        3: {"a", "b", "c", "d", "e"},      # J(1,3)=1.0
        4: {"x", "y", "z"},                # disjoint
        5: {"a", "x", "q", "r", "s", "t"}, # low overlap with all
        # EXACT boundary: J(6,7)=3/5=0.6 — guards the epsilon-ceil
        # prefix bound (FP puts t*n a hair above the integer)
        6: {"m", "n", "o", "u"},
        7: {"m", "n", "o", "w"},
    }
    rows = [(i, t) for i, s in sets.items() for t in s]
    toks = spark.createDataFrame(rows, "id long, tok string")
    got = {
        (r["a"], r["b"]): r["jaccard"]
        for r in set_similarity_join(toks, 0.6).collect()
    }
    expect = {}
    for a, b in combinations(sorted(sets), 2):
        j = len(sets[a] & sets[b]) / len(sets[a] | sets[b])
        if round(j, 6) >= 0.6:
            expect[(a, b)] = round(j, 6)
    assert got == expect  # exact: same pairs, same values


def test_prefix_join_positional_filter_keeps_boundary_pairs(spark):
    """PPJoin positional-filter completeness (round-7): randomized
    corpora where many qualifying pairs sit exactly at the threshold
    and first-common tokens land late in prefixes — the join must
    still return EXACTLY the brute-force pair set, proving the
    per-ROW positional prune never drops a qualifying PAIR."""
    import random
    from itertools import combinations

    from tp_integ_data_pipeline_spark.operators.dedup import set_similarity_join

    rng = random.Random(42)
    universe = [f"u{i}" for i in range(40)]
    sets = {}
    base = rng.sample(universe, 10)
    for i in range(25):
        # overlapping perturbations of a common base: lots of pairs
        # near/at the 0.6 boundary with varied set sizes (8..14)
        s = set(rng.sample(base, rng.randint(6, 10)))
        s |= set(rng.sample(universe, rng.randint(2, 4)))
        sets[i] = s
    rows = [(i, t) for i, s in sets.items() for t in s]
    toks = spark.createDataFrame(rows, "id long, tok string").distinct()
    got = {
        (r["a"], r["b"]): r["jaccard"]
        for r in set_similarity_join(toks, 0.6).collect()
    }
    expect = {}
    for a, b in combinations(sorted(sets), 2):
        j = len(sets[a] & sets[b]) / len(sets[a] | sets[b])
        if round(j, 6) >= 0.6:
            expect[(a, b)] = round(j, 6)
    assert got == expect and len(expect) > 0


def test_prefix_join_partition_invariant(spark):
    from pyspark.sql import functions as F
    from tp_integ_data_pipeline_spark.operators.dedup import set_similarity_join

    rows = [(i, f"t{j}") for i in range(30) for j in range(i % 7, i % 7 + 10)]
    toks = spark.createDataFrame(rows, "id long, tok string").distinct()
    a = sorted(map(tuple, set_similarity_join(toks.repartition(1), 0.5).collect()))
    b = sorted(map(tuple, set_similarity_join(toks.repartition(11), 0.5).collect()))
    assert a == b and len(a) > 0


def test_entity_resolution_groups_same_names(spark):
    """Catalog ER distilled: two masters share a name, a dirty variant
    links to both -> one entity; an unrelated name stays its own
    entity (via the q176 machinery: edit_distance_join + dup_clusters)."""
    from pyspark.sql import functions as F
    from tp_integ_data_pipeline_spark.operators.dedup import dup_clusters
    from tp_integ_data_pipeline_spark.operators.linkage import edit_distance_join

    master = spark.createDataFrame(
        [(1, "cold widget"), (2, "cold widget"), (3, "steel beam")],
        "pk long, name string",
    )
    dirty = spark.createDataFrame([(10, "cold widge"), (30, "steel bea")], "dk long, dname string")
    matches = edit_distance_join(
        dirty, master, left_key="dname", right_key="name", left_id="dk", right_id="pk"
    ).select((2 * F.col("pk")).alias("a"), (2 * F.col("dk") + 1).alias("b"))
    ent = {r["id"]: r["cluster"] for r in dup_clusters(matches).collect()}
    # masters 1 and 2 merge through the shared dirty variant; 3 separate
    assert ent[2 * 1] == ent[2 * 2] == ent[2 * 10 + 1]
    assert ent[2 * 3] == ent[2 * 30 + 1] and ent[2 * 3] != ent[2 * 1]


def test_weighted_median_hand_computed_and_invariant(spark):
    from tp_integ_data_pipeline_spark.operators.timeseries import grouped_weighted_median

    # weights: value 1 w=1, value 2 w=1, value 3 w=10 -> crossing at 3
    rows = [("g", 1.0, 1.0), ("g", 2.0, 1.0), ("g", 3.0, 10.0),
            # uniform weights reduce to the plain lower median (2 of 1,2,3)
            ("h", 1.0, 1.0), ("h", 2.0, 1.0), ("h", 3.0, 1.0)]
    df = spark.createDataFrame(rows, "k string, v double, w double")
    got = {r["k"]: r["wmedian"] for r in grouped_weighted_median(df, ["k"], "v", "w").collect()}
    assert got == {"g": 3.0, "h": 2.0}
    a = sorted(map(tuple, grouped_weighted_median(df.repartition(7), ["k"], "v", "w").collect()))
    assert a == sorted(got.items())


def test_audit_schema_contract(spark):
    from tp_integ_data_pipeline_spark.operators.quality_audit import audit_schema

    df = spark.createDataFrame([(1, "x", 2.0)], "a bigint, b string, c double")
    ok = audit_schema(df, {"a": "bigint", "b": "string", "c": "double"})
    assert ok.count() == 0
    bad = audit_schema(df, {"a": "int", "b": "string", "d": "date"})
    got = {(r["column"], r["status"]) for r in bad.collect()}
    assert got == {("a", "type_mismatch"), ("d", "missing"), ("c", "unexpected")}


def test_containment_join_exact_vs_bruteforce(spark):
    from pyspark.sql import functions as F
    from tp_integ_data_pipeline_spark.operators.dedup import containment_join

    qsets = {1: {"a", "b", "c", "d", "e"}, 2: {"p", "q"}}
    csets = {
        10: {"a", "b", "c", "d", "e", "x", "y", "z"},  # contains all of q1
        11: {"a", "b", "c", "d"},                      # 4/5 = 0.8 of q1
        12: {"a", "b", "x"},                           # 2/5 < t
        13: {"p", "z"},                                # 1/2 < t
        14: {"p", "q", "r"},                           # contains all of q2
    }
    q = spark.createDataFrame([(i, t) for i, s in qsets.items() for t in s], "id long, tok string")
    c = spark.createDataFrame([(i, t) for i, s in csets.items() for t in s], "id long, tok string")
    got = {
        (r["q_id"], r["c_id"]): r["containment"]
        for r in containment_join(q, c, 0.8).collect()
    }
    expect = {}
    for qi, qs in qsets.items():
        for ci, cs in csets.items():
            cont = round(len(qs & cs) / len(qs), 6)
            if cont >= 0.8:
                expect[(qi, ci)] = cont
    assert got == expect
    # no false negatives at the exact boundary (q1 vs 11 is exactly 0.8)
    assert (1, 11) in got


def test_psi_keeps_types_confined_to_one_half(spark, tmp_path):
    """q170: an event type whose rows all fall in ONE half of the time
    split must still appear in the report (empty half = 0 rows = the
    uniform Laplace floor pa = 1/BINS), identically in the Spark plan
    and the DuckDB oracle — the inner-join dropped it Spark-side
    before the round-6 ADVICE fix."""
    import datetime

    import duckdb

    from tp_integ_data_pipeline_spark.plans.registry import QUERIES, ORACLES

    before = datetime.datetime(2024, 1, 10)
    after = datetime.datetime(2024, 1, 20)
    rows = []
    for i in range(40):
        rows.append((i, before if i % 2 else after, i, "both", float(i % 7), "{}"))
    for i in range(40, 60):
        rows.append((i, before, i, "solo_first_half", float(i % 5), "{}"))
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).write.parquet(str(tmp_path / "events.parquet"))

    got = {
        r["event_type"]: r
        for r in QUERIES["q170_psi_drift"](spark, str(tmp_path)).collect()
    }
    assert "solo_first_half" in got
    solo = got["solo_first_half"]
    assert solo["n_a"] == 20 and solo["n_b"] == 0
    assert solo["psi"] is not None and solo["psi"] >= 0.0

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet/*.parquet'"
    )
    oracle = {
        r[0]: r for r in con.execute(ORACLES["q170_psi_drift"]).fetchall()
    }
    assert set(oracle) == set(got)
    for t, r in oracle.items():
        assert (r[1], r[2]) == (got[t]["n_a"], got[t]["n_b"]), t
        assert abs(r[3] - got[t]["psi"]) < 1e-9, t


def test_set_similarity_join_requires_input(spark):
    """Neither toks nor a precomputed ordered relation -> clear error,
    not an AttributeError deep in the plan builder."""
    import pytest as _pytest

    from tp_integ_data_pipeline_spark.operators.dedup import set_similarity_join

    with _pytest.raises(ValueError, match="ordered_token_sets"):
        set_similarity_join(None, 0.6)


def test_set_similarity_join_ordered_is_keyword_only(spark):
    """r8 ADVICE regression: ``ordered`` is the preferred alternate
    input and must be keyword-only — a positional third argument (an
    accidental threshold/ordered swap) fails fast as a TypeError."""
    import pytest as _pytest

    from tp_integ_data_pipeline_spark.operators.dedup import set_similarity_join

    with _pytest.raises(TypeError):
        set_similarity_join(None, 0.6, spark.range(1))  # noqa: B026
