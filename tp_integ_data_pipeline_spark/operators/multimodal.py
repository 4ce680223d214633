"""Multimodal column plumbing (north-star X5).

Images / audio / video are opaque `binary` payload columns with typed
metadata. The Spark-side plumbing (schema, partitioning, Arrow batch
shape through mapInPandas) is real and tested; the actual media
decoding is STUBBED — the image/audio libraries are not in this
container — behind `decode_stub`, a clearly-marked deterministic fake
keyed on payload bytes. Swapping the stub body for PIL/libav calls is
the only change needed for real decode.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id long, n_bytes long, width int, height int, n_frames int, digest string"
)


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize an opaque binary payload column (here: utf-8 bytes
    of the text; in production: image/audio bytes from the source)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "utf-8"))


def payload_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Typed metadata extraction on the binary column — expression
    level, no decode: byte length + content digest."""
    return df.withColumn("n_bytes", F.octet_length(F.col(payload_col)).cast("long")).withColumn(
        "digest", F.md5(F.col(payload_col))
    )


def decode_stub(payload: bytes) -> tuple[int, int, int]:
    """STUB — deterministic fake decode. Real implementation would be
    `PIL.Image.open(io.BytesIO(payload))` / libav frame iteration; the
    libs are absent in this container, so we derive fake (width,
    height, n_frames) from the byte length. NotImplementedError is NOT
    raised so the Arrow plumbing stays exercisable end-to-end."""
    n = len(payload)
    return (n % 640 + 1, (n * 7) % 480 + 1, n // 1000 + 1)


def decode_batch(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Arrow-batched decode over mapInPandas — the real 100 TB shape:
    each executor pulls column batches, decodes rows vectorized-ish,
    emits a typed frame. Partitioning/ordering of the input is
    preserved; batch size governed by
    spark.sql.execution.arrow.maxRecordsPerBatch."""
    import hashlib

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            meta = [decode_stub(bytes(p)) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": payloads.map(len).astype("int64"),
                    "width": [m[0] for m in meta],
                    "height": [m[1] for m in meta],
                    "n_frames": [m[2] for m in meta],
                    "digest": [hashlib.md5(bytes(p)).hexdigest() for p in payloads],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(decode, schema=DECODED_SCHEMA)


def frame_sample(df: DataFrame, payload_col: str = "payload", chunk: int = 1024) -> DataFrame:
    """Treat the payload as a frame container and sample fixed-size
    chunks ("frames") — expression-level chunking, demonstrating
    array-of-binary column handling."""
    frames = F.expr(
        f"transform(sequence(0, int((octet_length({payload_col}) - 1) / {chunk})), "
        f"i -> substring({payload_col}, i * {chunk} + 1, {chunk}))"
    )
    return df.withColumn("frames", frames).withColumn("n_frames", F.size("frames"))
