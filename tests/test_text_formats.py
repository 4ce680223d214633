"""JSONL round-trip and CSV quarantine (sources/text_formats)."""

from __future__ import annotations

from pyspark.sql import types as T

from tp_integ_data_pipeline_spark.sources.fixtures import load_table
from tp_integ_data_pipeline_spark.sources.text_formats import (
    read_csv_quarantine,
    read_jsonl,
    write_jsonl,
)

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def test_jsonl_roundtrip_bit_exact(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "corpus_jsonl")
    write_jsonl(docs, out, max_records_per_file=200)
    back = read_jsonl(spark, out, DOC_SCHEMA)
    assert back.schema == DOC_SCHEMA
    assert back.count() == docs.count()
    # exact content equality both directions
    assert docs.exceptAll(back).count() == 0
    assert back.exceptAll(docs).count() == 0


def test_csv_quarantine_separates_malformed(spark, tmp_path):
    p = tmp_path / "feed.csv"
    p.write_text(
        "id,name,score\n"
        "1,alice,3.5\n"
        "2,bob,not_a_number\n"   # type mismatch -> quarantine
        "3,carol,7.25\n"
    )
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("score", T.DoubleType()),
        ]
    )
    good, quarantine = read_csv_quarantine(spark, str(p), schema)
    assert {r["id"] for r in good.collect()} == {1, 3}
    bad = [r["raw_line"] for r in quarantine.collect()]
    assert len(bad) == 1 and "not_a_number" in bad[0]


def test_jsonl_roundtrip_escapes_and_unicode(spark, tmp_path):
    # newline, quote, backslash, tab, non-ASCII — the characters JSONL
    # must escape to stay one-record-per-line
    rows = [
        (1, 'line one\nline two', "en", "s", 17),
        (2, 'quote " and \\ backslash', "en", "s", 23),
        (3, "tab\there + café 中文 \U0001f600", "xx", "s", 15),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = str(tmp_path / "esc_jsonl")
    write_jsonl(docs, out, compression="none")
    back = read_jsonl(spark, out, DOC_SCHEMA)
    assert back.count() == 3
    assert docs.exceptAll(back).count() == 0 and back.exceptAll(docs).count() == 0
    # one JSON object per line even with embedded newlines in values
    import glob
    lines = []
    for f in glob.glob(out + "/part-*.json"):
        lines += [l for l in open(f, encoding="utf-8").read().splitlines() if l.strip()]
    assert len(lines) == 3


def test_orc_roundtrip(spark, sf_dir, tmp_path):
    # ORC is the other columnar interchange format Spark ships natively;
    # verify the corpus round-trips bit-exactly through it.
    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "corpus_orc")
    docs.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    assert back.schema == docs.schema
    assert docs.exceptAll(back).count() == 0 and back.exceptAll(docs).count() == 0
