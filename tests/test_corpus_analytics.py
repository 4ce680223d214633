"""Corpus analytics: dense ids, vocab growth, PMI bigrams, length trim
— edge cases the sf oracles can't reach (single-token docs, tiny
groups, empty input)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tp_integ_data_pipeline_spark.plans.corpus_analytics import (
    q128_dense_ids,
    q130_bigram_pmi,
)


def _write_docs(spark, tmp_path, rows):
    d = str(tmp_path / "documents.parquet")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int"
    ).write.parquet(d)
    return str(tmp_path)


def test_bigram_single_token_and_empty_docs(spark, tmp_path):
    rows = [
        (0, "x", "en", "s", 1),  # single token: contributes no bigram
        (1, "", "en", "s", 0),  # split('') -> [''], still no bigram
    ] + [(i, "a b", "en", "s", 3) for i in range(2, 9)]  # 7 × ("a","b")
    sf = _write_docs(spark, tmp_path, rows)
    out = q130_bigram_pmi(spark, sf).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["w1"], r["w2"], r["c_xy"]) == ("a", "b", 7)
    # 18 unigrams total: 'x' ×1, '' ×1, 'a' ×7, 'b' ×7... plus? 1+1+14=16
    n_uni = 16.0
    n_bi = 7.0
    want = math.log((7 / n_bi) / ((7 / n_uni) * (7 / n_uni)))
    assert abs(r["pmi"] - round(want, 6)) < 1e-9


def test_dense_ids_contiguous_and_stable_across_partitioning(spark, tmp_path):
    rows = [(i * 10, "t", "en", "s", 1) for i in range(37)]  # sparse, non-contiguous keys
    sf = _write_docs(spark, tmp_path, rows)
    out = q128_dense_ids(spark, sf).toPandas()
    assert list(out["row_id"]) == list(range(37))
    assert list(out["doc_id"]) == [i * 10 for i in range(37)]
