"""Data-layout operators: Z-order (Morton) clustering for multi-column
file skipping, and co-located bucketed tables for exchange-free joins.

Both attack the same 100 TB cost — I/O and shuffle volume — from the
STORAGE side, which is where a lakehouse wins or loses:

- Z-order: a box predicate on (x, y) after a 1-D sort on either column
  prunes on that column only; sorting by the interleaved-bit Morton
  value makes files cover LOCAL RECTANGLES of the (x, y) space, so
  parquet min/max stats skip most files for 2-D box queries (Delta
  OPTIMIZE ZORDER's mechanism). The curve value is a pure bit-
  interleave expression — JVM-side, oracle-reproducible arithmetic.
- Bucketed tables: two tables bucketed (and sorted) by the join key
  with the same bucket count join WITHOUT any Exchange — the shuffle
  happened once at write time and is amortized over every subsequent
  join (the classic warehouse fact-fact pattern).

No reference-repo counterpart — SURVEY.md §2.10 extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

Z_BITS = 16  # per-column resolution for zorder_dataframe's quantized path


def _quantize(col: Column, cmin: Column, cmax: Column, bits: int) -> Column:
    """Map a numeric column into [0, 2^bits) via min/max normalization
    (degenerate min==max collapses to 0)."""
    span = cmax.cast("double") - cmin.cast("double")
    frac = F.when(span > 0, (col.cast("double") - cmin.cast("double")) / span).otherwise(
        F.lit(0.0)
    )
    q = F.floor(frac * F.lit((1 << bits) - 1)).cast("long")
    return F.greatest(F.lit(0), F.least(F.lit((1 << bits) - 1), q))


def zorder_interleave(quantized: list[Column], bits: int = Z_BITS) -> Column:
    """Bit-interleave already-quantized [0, 2^bits) columns into one
    z-value: output bit (i·n_cols + j) = bit i of column j. N-column
    general form; the 2-column SQL-reproducible variant is
    ``zorder_value`` below.

    Requires ``len(quantized) * bits <= 63``: bit 63 is the sign bit
    of a LongType, so letting the interleave reach it would make the
    top rows sort FIRST under repartitionByRange, and shifts >= 64
    wrap silently (round-6 ADVICE finding). ``zorder_dataframe``
    clamps ``bits`` before calling; direct callers get a hard error."""
    n = len(quantized)
    if n * bits > 63:
        raise ValueError(
            f"zorder_interleave: {n} cols x {bits} bits = {n * bits} "
            "interleaved bits; must be <= 63 to stay in a signed long "
            "(clamp bits, e.g. bits = 63 // n_cols)"
        )
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
    """Return ``df`` re-clustered so a .write produces ``n_files`` files
    whose min/max envelopes are tight in EVERY column of ``cols``.

    Column min/max ride along as a 1-row broadcast aggregate computed
    in the same job — no eager driver action, so the operator composes
    lazily like any other plan node. Used by DataLake.compact(zorder_cols=...).
    """
    # stay inside the 63 value bits of a signed long: 4 cols at the
    # default 16 bits would place a bit at position 63 (sign) and 5+
    # cols would wrap shifts past 64 (round-6 ADVICE finding)
    bits = min(bits, 63 // max(1, len(cols)))
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"__min_{c}"), F.max(c).alias(f"__max_{c}")]
    bounds = df.agg(*aggs)
    quantized = [
        _quantize(F.col(c), F.col(f"__min_{c}"), F.col(f"__max_{c}"), bits) for c in cols
    ]
    with_z = (
        df.crossJoin(F.broadcast(bounds))
        .withColumn("__z", zorder_interleave(quantized, bits))
        .drop(*[f"__min_{c}" for c in cols], *[f"__max_{c}" for c in cols])
    )
    return with_z.repartitionByRange(n_files, "__z").sortWithinPartitions("__z").drop("__z")


def zorder_value(x: Column, y: Column, bits: int = 10) -> Column:
    """Morton (Z-order) interleave of the low ``bits`` bits of two
    non-negative ints: x's bit i lands at position 2i, y's at 2i+1.
    Built as a fixed sum of shift/mask terms — whole-stage-codegen
    arithmetic, no UDF, and exactly reproducible in ANSI SQL."""
    z: Column = F.lit(0).cast("long")
    for i in range(bits):
        xbit = F.shiftright(x.cast("long"), i).bitwiseAND(F.lit(1))
        ybit = F.shiftright(y.cast("long"), i).bitwiseAND(F.lit(1))
        z = z + xbit * F.lit(1 << (2 * i)) + ybit * F.lit(1 << (2 * i + 1))
    return z


def zorder_value_sql(x: str, y: str, bits: int = 10) -> str:
    """The identical Morton interleave as an ANSI-SQL expression string
    (for oracles / engines without bit-shift builtins): each term is
    ((col // 2^i) % 2) * 2^(2i [+1])."""
    terms = []
    for i in range(bits):
        terms.append(f"(({x} // {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"(({y} // {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")"


def zorder_write(
    df: DataFrame,
    path: str,
    x: str,
    y: str,
    bits: int = 10,
    n_files: int = 16,
) -> None:
    """Cluster ``df`` on the (x, y) Morton curve and write ``n_files``
    parquet files, each covering a contiguous curve segment (≈ a local
    rectangle of the key space). Range-partition + in-partition sort on
    the curve value puts every file's (x, y) min/max stats in a tight
    box, so a reader's 2-D box predicate skips most files — verified by
    the pruning test (tests/test_round5_ops.py)."""
    with_z = df.withColumn("__z", zorder_value(F.col(x), F.col(y), bits))
    (
        with_z.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def write_bucketed(
    spark: SparkSession,
    df: DataFrame,
    table: str,
    path: str,
    keys: list[str],
    n_buckets: int = 8,
) -> None:
    """Persist ``df`` as an external BUCKETED table (hash-bucketed and
    sorted by ``keys`` into ``n_buckets`` per-bucket files at ``path``).
    The write pays one shuffle; every later equi-join between tables
    bucketed the same way runs with NO Exchange on either side — the
    join co-location is durable table metadata, not a per-query hint."""
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, *keys)
        .sortBy(*keys)
        .saveAsTable(table)
    )
