"""Embedding scalar quantization (int8-style codes) — the storage
layer for ANN at corpus scale. No reference-repo counterpart
(SURVEY.md §2.10 extension surface): at 100 TB a float32 embedding
column is usually the single largest table; per-dimension min-max
codes cut it 4x while keeping cosine top-k recall high, and they
compose with the IVF/SRP paths in operators/similarity.py (quantize
the residuals / the stored vectors, re-rank the short list exact).

Shape notes (100 TB):
- ``dim_stats`` is ONE explode -> d-row aggregate (map-side combined);
  d rows travel back as a broadcast equi-join on the dim key — never a
  1-row cross join, never a driver collect of data-sized state.
- Codes are computed row-locally in exploded space; re-assembly to a
  compact ``array<int>`` is one vec-keyed shuffle (array_sort over the
  (dim, code) structs — deterministic, no window).
- Every arithmetic step (floor((v-min)/range*levels + 0.5)) is chosen
  to be bit-reproducible across engines: float32 -> double is exact,
  min/max are exact, floor is exact — so the codes themselves (not
  just aggregate stats) can be hash-checked against a SQL oracle,
  unlike KMeans-backed product quantization.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dim_stats(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-dimension (dim, cmin, cmax) over the whole table — the
    quantizer's training step. One explode + one d-row aggregate."""
    return (
        df.select(F.posexplode(vec_col).alias("dim", "v"))
        .select("dim", F.col("v").cast("double").alias("v"))
        .groupBy("dim")
        .agg(F.min("v").alias("cmin"), F.max("v").alias("cmax"))
    )


def _code_expr(v: Column, cmin: Column, cmax: Column, levels: int) -> Column:
    """Nearest-level min-max code CLAMPED to [0, levels]; engine-
    portable: floor(x + 0.5) (not round()) so Spark and any ANSI
    engine agree bit-for-bit on the same IEEE doubles. The clamp
    matters on the frozen-stats apply path, where an increment value
    outside the trained [cmin, cmax] must saturate (int8 contract)
    rather than emit an out-of-range code; self-trained codes are in
    range by construction, so the clamp is a no-op there. Degenerate
    dims (cmax == cmin) code to 0."""
    rng = cmax - cmin
    scaled = (v - cmin) / rng * F.lit(float(levels))
    clamped = F.least(
        F.lit(levels), F.greatest(F.lit(0), F.floor(scaled + F.lit(0.5)).cast("int"))
    )
    return F.when(rng == 0.0, F.lit(0)).otherwise(clamped).alias("code")


def quantize_codes(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    levels: int = 255,
    stats: DataFrame | None = None,
) -> DataFrame:
    """Exploded quantization: (id, dim, v, code, recon, abs_err) rows.

    ``stats`` (a ``dim_stats`` result) may be passed in so a caller can
    freeze the quantizer on one corpus snapshot and apply it to later
    increments — the train/apply split every production quantizer
    needs. Joined on the dim key as a broadcast hash join (d rows).
    """
    x = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(vec_col).alias("dim", "vf"),
    ).select("id", "dim", F.col("vf").cast("double").alias("v"))
    if stats is None:
        # self-trained path: stats AND codes both consume the exploded
        # relation — lazily checkpoint it so the base table is scanned
        # once, not once per branch (the q103-probe lesson)
        x = x.localCheckpoint(eager=False)
        st = x.groupBy("dim").agg(F.min("v").alias("cmin"), F.max("v").alias("cmax"))
        j = x.join(F.broadcast(st), "dim")
    else:
        # frozen-stats apply: a LEFT join so a dimension absent from the
        # trained stats (e.g. an increment with wider vectors than the
        # training corpus) fails LOUDLY instead of being silently
        # dropped by an inner join. assert_true lives in the join's
        # filter condition, so Catalyst cannot prune it away.
        j = x.join(F.broadcast(stats), "dim", "left").where(
            F.assert_true(
                F.col("cmin").isNotNull() & F.col("cmax").isNotNull(),
                F.concat(
                    F.lit("quantize_codes: dim absent from frozen stats: "),
                    F.col("dim").cast("string"),
                ),
            ).isNull()
        )
    code = _code_expr(F.col("v"), F.col("cmin"), F.col("cmax"), levels)
    recon = F.col("cmin") + F.col("code") * (F.col("cmax") - F.col("cmin")) / F.lit(
        float(levels)
    )
    return (
        j.withColumn("code", code)
        .withColumn("recon", recon)
        .withColumn("abs_err", F.abs(F.col("v") - F.col("recon")))
    )


def codes_to_array(exploded: DataFrame) -> DataFrame:
    """Re-pack exploded codes to (id, codes array<int>) — the compact
    storage form. One id-keyed shuffle; order restored row-locally by
    array_sort over (dim, code) structs, no window."""
    return (
        exploded.groupBy("id")
        .agg(F.collect_list(F.struct("dim", "code")).alias("dc"))
        .select(
            "id",
            F.transform(F.array_sort("dc"), lambda s: s["code"]).alias("codes"),
        )
    )


def reconstruction_report(exploded: DataFrame, levels: int = 255) -> DataFrame:
    """Per-dimension quantization audit: bounds, code spread, error
    stats. ``max_abs_err <= (cmax-cmin)/levels/2`` by construction —
    asserted in tests; the report is what a pipeline would alert on."""
    return exploded.groupBy("dim").agg(
        F.round(F.min("cmin"), 6).alias("cmin"),
        F.round(F.max("cmax"), 6).alias("cmax"),
        F.countDistinct("code").alias("n_codes"),
        F.round(F.avg("abs_err"), 6).alias("avg_abs_err"),
        F.round(F.max("abs_err"), 6).alias("max_abs_err"),
    )
