"""Data-layout operators: Z-order clustering for multi-column skipping.

At 100 TB the scan cost of a selective query is set by how many files
(and row groups) the reader can SKIP via parquet min/max statistics.
Hive partitioning handles one coarse column; Z-ordering handles the
"filter by user_id AND time range" shape: interleaving the bits of
several columns' quantized values produces a 1-D sort key whose ranges
are simultaneously tight in every input dimension, so repartitionByRange
+ sortWithinPartitions on it yields files with narrow min/max envelopes
on ALL the z-columns at once (the same idea as Delta/Iceberg OPTIMIZE
ZORDER BY, re-expressed with plain DataFrame ops).

Everything is expression-level: per-column min/max travel as a 1-row
broadcast aggregate (no driver action), quantization + bit interleave
are codegen'd integer math, and the range repartition is the one
shuffle a layout rewrite inherently needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_BITS = 16  # per-column resolution; 2 cols × 16 bits = 32-bit z-value


def _quantize(col: Column, cmin: Column, cmax: Column, bits: int) -> Column:
    """Map a numeric column into [0, 2^bits) via min/max normalization
    (degenerate min==max collapses to 0)."""
    span = (cmax.cast("double") - cmin.cast("double"))
    frac = F.when(span > 0, (col.cast("double") - cmin.cast("double")) / span).otherwise(
        F.lit(0.0)
    )
    q = F.floor(frac * F.lit((1 << bits) - 1)).cast("long")
    return F.greatest(F.lit(0), F.least(F.lit((1 << bits) - 1), q))


def zorder_value(quantized: list[Column], bits: int = Z_BITS) -> Column:
    """Bit-interleave already-quantized [0, 2^bits) columns into one
    z-value: output bit (i·n_cols + j) = bit i of column j."""
    n = len(quantized)
    terms = []
    for i in range(bits):
        for j, q in enumerate(quantized):
            src_bit = q.bitwiseAND(F.lit(1 << i))
            shift = i * n + j - i  # position (i*n + j) minus source position i
            terms.append(
                F.shiftleft(src_bit, shift) if shift >= 0 else F.shiftright(src_bit, -shift)
            )
    z = terms[0]
    for t in terms[1:]:
        z = z.bitwiseOR(t)
    return z


def zorder_dataframe(
    df: DataFrame, cols: list[str], n_files: int, bits: int = Z_BITS
) -> DataFrame:
    """Return `df` re-clustered so a .write produces `n_files` files
    whose min/max envelopes are tight in EVERY column of `cols`.

    Column min/max ride along as a 1-row broadcast aggregate computed
    in the same job — no eager driver action, so the operator composes
    lazily like any other plan node.
    """
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"__min_{c}"), F.max(c).alias(f"__max_{c}")]
    bounds = df.agg(*aggs)
    quantized = [
        _quantize(
            F.col(c), F.col(f"__min_{c}"), F.col(f"__max_{c}"), bits
        )
        for c in cols
    ]
    with_z = (
        df.crossJoin(F.broadcast(bounds))
        .withColumn("__z", zorder_value(quantized, bits))
        .drop(*[f"__min_{c}" for c in cols], *[f"__max_{c}" for c in cols])
    )
    return with_z.repartitionByRange(n_files, "__z").sortWithinPartitions("__z").drop("__z")
