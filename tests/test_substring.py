"""Property tests for exact substring-level dedup (operators/substring.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tp_integ_data_pipeline_spark.operators.substring import (
    duplicated_spans,
    position_grams,
    strip_spans,
    winnow_grams,
)


def _doc(prefix: str, n: int) -> str:
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_duplicated_spans_finds_planted_run(spark):
    """A 12-token run planted in two otherwise-unique documents must
    come back as exactly one maximal span per doc, at the right
    offsets; the unique filler must contribute no spans."""
    shared = " ".join(f"dup{i}" for i in range(12))
    docs = spark.createDataFrame(
        [
            # doc 1: 10 unique tokens, then the shared run, then 5 more
            (1, _doc("a", 10) + " " + shared + " " + _doc("z", 5)),
            # doc 2: shared run at position 0, then unique tail
            (2, shared + " " + _doc("b", 20)),
            # doc 3: fully unique
            (3, _doc("c", 40)),
        ],
        ["doc_id", "text"],
    )
    spans = {
        r.id: (r.span_start, r.span_end, r.span_len)
        for r in duplicated_spans(docs, k=8).collect()
    }
    assert spans == {1: (10, 22, 12), 2: (0, 12, 12)}


def test_duplicated_spans_merges_overlaps_and_counts_self_repeats(spark):
    """Self-repetition within ONE document is duplication too, and
    overlapping duplicated windows merge into one maximal span."""
    rep = " ".join(f"r{i}" for i in range(10))
    docs = spark.createDataFrame(
        [(1, rep + " " + _doc("mid", 3) + " " + rep)], ["doc_id", "text"]
    )
    # both copies of the 10-token run duplicate each other (k=10 →
    # exactly one gram per copy, count 2)
    spans = sorted(
        (r.span_start, r.span_end)
        for r in duplicated_spans(docs, k=10).collect()
    )
    assert spans == [(0, 10), (13, 23)]


def test_strip_spans_rebuilds_survivors_in_order(spark):
    shared = " ".join(f"dup{i}" for i in range(12))
    d1_head, d1_tail = _doc("a", 10), _doc("z", 5)
    docs = spark.createDataFrame(
        [
            (1, d1_head + " " + shared + " " + d1_tail),
            (2, shared + " " + _doc("b", 20)),
            (3, _doc("c", 40)),
        ],
        ["doc_id", "text"],
    )
    spans = duplicated_spans(docs, k=8)
    got = {r.id: r for r in strip_spans(docs, spans).collect()}
    assert got[1].text == d1_head + " " + d1_tail
    assert got[1].n_removed_tokens == 12
    assert got[2].text == _doc("b", 20)
    assert got[2].n_removed_tokens == 12
    assert got[3].text == _doc("c", 40)  # untouched doc survives verbatim
    assert got[3].n_removed_tokens == 0


def test_winnow_keeps_fingerprint_coverage(spark):
    """Winnowing guarantee: any duplicated run of ≥ k + w − 1 tokens
    still shares at least one SELECTED fingerprint, so winnowed
    duplicated_spans detects it — at ~1/w the index size."""
    k, w = 5, 4
    shared = " ".join(f"dup{i}" for i in range(k + w - 1 + 10))  # well past k+w-1
    docs = spark.createDataFrame(
        [
            (1, _doc("a", 25) + " " + shared),
            (2, shared + " " + _doc("b", 25)),
            (3, _doc("c", 60)),
        ],
        ["doc_id", "text"],
    )
    grams = position_grams(docs, "doc_id", "text", k)
    thinned = winnow_grams(grams, w)
    assert thinned.count() < grams.count()  # it actually thins
    flagged = {r.id for r in duplicated_spans(docs, k=k, winnow=w).collect()}
    assert flagged == {1, 2}  # both carriers detected, clean doc not


def _naive_spans(texts: dict[int, str], k: int) -> set[tuple[int, int, int]]:
    """Brute-force Python model of duplicated_spans: count every
    position k-gram corpus-wide, mark positions with count ≥ 2, merge
    positions p1 < p2 into one run iff p2 ≤ p1 + k."""
    from collections import Counter

    grams: dict[int, list[str]] = {}
    counts: Counter = Counter()
    for did, text in texts.items():
        toks = text.split(" ")
        gs = [" ".join(toks[i : i + k]) for i in range(max(0, len(toks) - k + 1))]
        grams[did] = gs
        counts.update(gs)
    spans = set()
    for did, gs in grams.items():
        marked = [i for i, g in enumerate(gs) if counts[g] >= 2]
        run_start = None
        prev = None
        for p in marked:
            if prev is not None and p - prev <= k:
                prev = p
                continue
            if run_start is not None:
                spans.add((did, run_start, prev + k))
            run_start = prev = p
        if run_start is not None:
            spans.add((did, run_start, prev + k))
    return spans


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        # tiny alphabet → k-grams collide across random docs, exercising
        # marks, merges and self-repeats without planted structure
        st.lists(st.sampled_from("abc"), min_size=0, max_size=30).map(" ".join),
        min_size=1,
        max_size=12,
    )
)
def test_duplicated_spans_matches_naive_model(spark, corpus):
    from pyspark.sql import functions as F  # noqa: F401

    texts = dict(enumerate(corpus))
    docs = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])
    got = {
        (r.id, r.span_start, r.span_end)
        for r in duplicated_spans(docs, k=3).collect()
    }
    assert got == _naive_spans(texts, k=3)


def test_duplicated_spans_short_docs_emit_nothing(spark):
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "")], ["doc_id", "text"]
    )
    # k=8 > every doc length → no grams at all → no spans, no errors
    assert duplicated_spans(docs, k=8).count() == 0
    stripped = {r.id: r for r in strip_spans(docs, duplicated_spans(docs, k=8)).collect()}
    assert stripped[1].text == "a b c" and stripped[1].n_removed_tokens == 0
