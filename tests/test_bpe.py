"""BPE train + apply (operators/bpe.py): Sennrich reference behavior
on a hand-computed corpus, greedy-overlap semantics, train/apply
consistency, monotonic compression, early stop."""

from __future__ import annotations

from tp_integ_data_pipeline_spark.operators.bpe import (
    _tokenize_word,
    apply_bpe,
    train_bpe,
)


def _docs(spark, texts):
    return spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def test_train_learns_expected_merges(spark):
    # 'ab' appears in every word; 'abc' in two of three occurrences
    docs = _docs(spark, ["abc abc abd", "abc abd ab"])
    merges = train_bpe(docs, n_merges=2)
    assert merges[0] == ("a", "b")
    assert merges[1] == ("ab", "c")


def test_apply_matches_hand_tokenization(spark):
    docs = _docs(spark, ["abc abc abd", "abc abd ab"])
    merges = train_bpe(docs, n_merges=2)
    got = {
        r["word"]: (list(r["tokens"]), r["wf"])
        for r in apply_bpe(docs, merges).collect()
    }
    assert got["abc"] == (["abc"], 3)
    assert got["abd"] == (["ab", "d"], 2)
    assert got["ab"] == (["ab"], 1)


def test_greedy_overlap_like_reference():
    # 'aaaa' with merge (a,a): greedy left-to-right -> [aa, aa];
    # 'aaa' -> [aa, a]
    assert _tokenize_word("aaaa", [("a", "a")]) == ["aa", "aa"]
    assert _tokenize_word("aaa", [("a", "a")]) == ["aa", "a"]
    # second-order merge consumes first-order output
    assert _tokenize_word("aaaa", [("a", "a"), ("aa", "aa")]) == ["aaaa"]


def test_compression_monotonic_and_early_stop(spark):
    docs = _docs(spark, ["the cat sat on the mat", "the cat ate the rat"])
    prev = None
    for k in (0, 2, 4, 8):
        merges = train_bpe(docs, n_merges=k)
        total = sum(
            r["wf"] * r["n_tokens"] for r in apply_bpe(docs, merges).collect()
        )
        if prev is not None:
            assert total <= prev
        prev = total
    # min_count stop: a unique-word corpus has no pair with count >= 2
    assert train_bpe(_docs(spark, ["xyz"]), n_merges=5, min_count=2) == []


def test_spark_merge_pass_equals_python(spark):
    """The JVM aggregate() greedy pass used in training must tokenize
    exactly like the Python fold used in application."""
    docs = _docs(spark, ["aaab aab baaa aa b"])
    merges = train_bpe(docs, n_merges=3)
    applied = {r["word"]: list(r["tokens"]) for r in apply_bpe(docs, merges).collect()}
    for w, toks in applied.items():
        assert toks == _tokenize_word(w, merges), (w, toks)


def test_oracle_merge_replace_respects_symbol_boundaries():
    """The q153 DuckDB oracle applies each merge as a padded
    DOUBLED-separator replace (plans/selection_queries._bpe_oracle).
    That expression must equal the real greedy pass on symbol lists
    where a bare ``replace(s, a||SEP||b, ...)`` would go wrong:
    merge pair matching across a symbol boundary ([th, e] + (h, e) —
    the round-6 ADVICE finding), consecutive matches ([a,b,a,b] +
    (a,b) must yield [ab, ab] — where SINGLE padding would drop the
    second match), and greedy overlap ([a,a,a] -> [aa, a])."""
    import duckdb

    sep = chr(31)

    def greedy_pass(syms, a, b):
        out, pend = [], None
        for s in syms:
            if pend is None:
                pend = s
            elif pend == a and s == b:
                out.append(a + b)
                pend = None
            else:
                out.append(pend)
                pend = s
        if pend is not None:
            out.append(pend)
        return out

    def duck_pass(syms, a, b):
        (res,) = duckdb.execute(
            """
            SELECT array_to_string(list_filter(string_split(
                replace(? || replace(?, ?, ? || ?) || ?,
                        ? || ? || ? || ? || ? || ?,
                        ? || ? || ? || ?),
                ?), x -> length(x) > 0), ?) AS s
            """,
            [sep, sep.join(syms), sep, sep, sep, sep,
             sep, a, sep, sep, b, sep,
             sep, a, b, sep,
             sep, sep],
        ).fetchone()
        return [t for t in res.split(sep) if t]

    cases = [
        (["th", "e"], ("h", "e")),      # boundary: must NOT merge
        (["a", "bc"], ("a", "b")),      # right-prefix: must NOT merge
        (["ab", "c"], ("b", "c")),      # left-suffix: must NOT merge
        (["a", "b", "a", "b"], ("a", "b")),  # consecutive matches
        (["a", "a", "a"], ("a", "a")),       # greedy overlap
        (["a", "a", "a", "a"], ("a", "a")),
        (["x", "a", "b", "y", "a", "b"], ("a", "b")),
        (["ab", "ab", "ab"], ("ab", "ab")),  # multi-char greedy
    ]
    for syms, (a, b) in cases:
        assert duck_pass(syms, a, b) == greedy_pass(syms, a, b), (syms, a, b)
