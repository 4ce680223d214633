"""Inline pipeline observability: audit metrics collected DURING the
action, not by a second scan.

A 100 TB write cannot afford the usual "write, then re-read to count
rows / nulls / ranges" audit pass — that doubles the I/O bill. Spark's
``Observation`` API attaches aggregate expressions to a plan node and
harvests them from the SAME job that materializes the data (metrics
ride the task results; zero extra scan, zero extra shuffle). This
module wraps it into the two shapes a pipeline needs:

* ``with_audit(df, metrics)`` — attach named audit aggregates, get the
  (df, observation) pair back; run any ONE action, then
  ``observation.get`` holds the metric dict.
* ``audited_write(df, path, metrics)`` — the common case: parquet
  write + metrics from that single job.

No reference-repo counterpart (the reference re-queries the DB to
check loads); SURVEY.md §2.10 extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation


def with_audit(
    df: DataFrame, metrics: dict[str, Column]
) -> tuple[DataFrame, Observation]:
    """Attach named aggregate expressions to the frame. The returned
    DataFrame MUST be consumed by exactly one action before reading
    ``observation.get`` (Spark fills an Observation once)."""
    if not metrics:
        raise ValueError("with_audit: metrics must be non-empty")
    obs = Observation("audit")
    named = [col.alias(name) for name, col in metrics.items()]
    return df.observe(obs, *named), obs


def audited_write(
    df: DataFrame, path: str, metrics: dict[str, Column], mode: str = "overwrite"
) -> dict:
    """Write parquet and return the audit metrics computed by the SAME
    job — one scan, one write, metrics for free."""
    observed, obs = with_audit(df, metrics)
    observed.write.mode(mode).parquet(path)
    return dict(obs.get)
