"""Text-analysis and multimodal plumbing tests (X4/X5)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from tp_integ_data_pipeline_spark.operators.multimodal import (
    attach_payload,
    decode_batch,
    decode_stub,
    frame_sample,
    payload_meta,
)
from tp_integ_data_pipeline_spark.operators.text import (
    char_ngrams,
    fingerprint,
    lang_id,
    lang_profiles,
    quality_score,
    token_count,
)


def test_token_and_quality(spark):
    df = spark.createDataFrame([(1, "the quick brown fox the end")], ["id", "text"])
    row = df.select(
        token_count().alias("n"), quality_score().alias("q")
    ).first()
    assert row.n == 6
    # 0.4*min(1, 6/100) + 0.3*(5/6 distinct) + 0.3*(1 - 2/6 stopwords)
    expected = 0.4 * 0.06 + 0.3 * (5 / 6) + 0.3 * (1 - 2 / 6)
    assert abs(row.q - expected) < 1e-12


def test_char_ngrams_and_fingerprint(spark):
    df = spark.createDataFrame([(1, "abcdefgh"), (2, "abc")], ["id", "text"])
    rows = {r.id: r for r in df.select("id", char_ngrams("text", 8).alias("g"),
                                       fingerprint("text", 8).alias("fp")).collect()}
    assert rows[1].g == ["abcdefgh"]
    assert rows[1].fp == hashlib.md5(b"abcdefgh").hexdigest()
    assert rows[2].g == [] and rows[2].fp is None


def test_lang_id_deterministic_and_total(spark, sf_dir):
    from tp_integ_data_pipeline_spark.sources.fixtures import load_table

    docs = load_table(spark, sf_dir, "documents")
    prof = lang_profiles(docs)
    pred = lang_id(docs, prof)
    assert pred.count() == docs.count()
    assert pred.filter(F.col("predicted_lang").isNull()).count() == 0
    # deterministic across runs
    a = sorted(map(tuple, pred.collect()))
    b = sorted(map(tuple, lang_id(docs, lang_profiles(docs)).collect()))
    assert a == b


def test_multimodal_payload_decode_framesample(spark):
    df = spark.createDataFrame([(1, "x" * 2500), (2, "hi")], ["doc_id", "text"])
    p = attach_payload(df)
    meta = {r.doc_id: r for r in payload_meta(p).collect()}
    assert meta[1].n_bytes == 2500
    assert meta[2].digest == hashlib.md5(b"hi").hexdigest()

    decoded = {r.doc_id: r for r in decode_batch(p).collect()}
    assert (decoded[1].width, decoded[1].height, decoded[1].n_frames) == decode_stub(b"x" * 2500)
    assert decoded[2].digest == hashlib.md5(b"hi").hexdigest()

    frames = {r.doc_id: r for r in frame_sample(p, chunk=1024).collect()}
    assert frames[1].n_frames == 3  # 2500 bytes → 3 chunks
    assert len(frames[1].frames[0]) == 1024 and len(frames[1].frames[2]) == 2500 - 2048
    assert frames[2].n_frames == 1
