"""Edit-distance join (operators/linkage.py): blocking completeness
vs naive levenshtein all-pairs on adversarial cases."""

from __future__ import annotations

import itertools

import pytest

from tp_integ_data_pipeline_spark.operators.linkage import edit_distance_join


def _naive(left, right, max_dist=1):
    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    return {
        (li, ri, lev(lk, rk))
        for li, lk in left
        for ri, rk in right
        if lev(lk, rk) <= max_dist
    }


LEFT = [
    (1, "kitten"),
    (2, "abc"),
    (3, "ab"),
    (4, "x"),
    (5, ""),
    (6, "naïve"),
    (7, "hello"),
    (8, "abc"),  # duplicate key text, distinct id
]
RIGHT = [
    (10, "sitten"),   # substitution of kitten
    (11, "kitte"),    # deletion
    (12, "kittens"),  # insertion
    (13, "ktiten"),   # transposition (ed 2) — must NOT match
    (14, "abc"),      # exact
    (15, "ba"),       # transposition of ab (ed 2) — must NOT match
    (16, "xy"),       # insertion on single char
    (17, ""),         # empty == empty (ed 0), "x" (ed 1)
    (18, "naive"),    # unicode substitution
    (19, "helo"),     # deletion
    (20, "zzzzz"),    # no match
]


def test_blocking_complete_vs_naive(spark):
    l = spark.createDataFrame(LEFT, "id long, key string")
    r = spark.createDataFrame(RIGHT, "rid long, rkey string")
    got = {
        (row["id"], row["rid"], row["dist"])
        for row in edit_distance_join(
            l, r, left_key="key", right_key="rkey", left_id="id", right_id="rid"
        ).collect()
    }
    want = _naive([(i, k) for i, k in LEFT], [(i, k) for i, k in RIGHT])
    assert got == want
    # sanity on the adversarial rows: transpositions excluded, empties in
    assert (1, 13, 2) not in got and (3, 15, 2) not in got
    assert (5, 17, 0) in got and (4, 17, 1) in got


def test_max_dist_guard(spark):
    df = spark.createDataFrame([(1, "a")], "id long, key string")
    with pytest.raises(ValueError, match="max_dist"):
        edit_distance_join(df, df, "key", "key", "id", "id", max_dist=2)
