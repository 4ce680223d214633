"""Data-quality audit battery: the assertion layer a production
pipeline runs on every load (null rates, key uniqueness, referential
integrity, value ranges, freshness) — one long-format report a
scheduler can alert on.

Scale shape: all single-table checks for one table fuse into ONE
aggregate pass (conditional counts inside one ``agg``, unpivoted
row-locally with ``stack``), so k checks cost one scan, not k. The
referential check is the only join — an anti-join on the foreign key.
No reference-repo counterpart (the reference trusts its API payloads);
SURVEY.md §2.10 extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

REPORT_SCHEMA = ["check", "violations"]


def audit_checks(df: DataFrame, checks: dict[str, Column]) -> DataFrame:
    """(check, violations) rows from named violation predicates — each
    ``Column`` is a boolean that is true WHEN THE ROW VIOLATES the
    check. One scan: every predicate becomes a conditional count in a
    single aggregate, then one row-local stack() unpivot."""
    aggs = [
        F.count(F.when(pred, F.lit(1))).alias(f"__c{i}")
        for i, (_name, pred) in enumerate(checks.items())
    ]
    one = df.agg(*aggs)
    names = list(checks)
    stack = ", ".join(f"'{n}', __c{i}" for i, n in enumerate(names))
    return one.select(
        F.expr(f"stack({len(names)}, {stack}) as (check, violations)")
    )


def audit_uniqueness(df: DataFrame, keys: list[str], name: str) -> DataFrame:
    """(check, violations) with violations = number of rows beyond the
    first per key (0 = keys unique). Keyed aggregate, then the summary
    folds to one row — never a distinct-vs-count race on two scans."""
    per = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
    return per.agg(
        F.lit(name).alias("check"),
        # coalesce: SUM over zero groups (empty input) is NULL, but the
        # contract is violations=0 so downstream `violations > 0` alert
        # rules stay sound (round-5 advice)
        F.coalesce(F.sum(F.col("n") - F.lit(1)), F.lit(0)).cast("long").alias("violations"),
    )


def audit_reference(
    child: DataFrame, parent: DataFrame, fk: list[str], pk: list[str], name: str
) -> DataFrame:
    """(check, violations) with violations = child rows whose foreign
    key has no parent (orphans). One anti-join on the key — the
    minimum any referential check costs."""
    renamed = parent.select(*[F.col(p).alias(f) for p, f in zip(pk, fk)]).distinct()
    orphans = child.join(renamed, fk, "left_anti")
    return orphans.agg(
        F.lit(name).alias("check"), F.count(F.lit(1)).alias("violations")
    )


def audit_schema(df: DataFrame, expected: dict[str, str]) -> DataFrame:
    """Schema-contract check: compare ``df``'s schema against
    ``expected`` (column -> Spark simpleString type). Returns one row
    per discrepancy — (column, status in {missing, unexpected,
    type_mismatch}, expected_type, actual_type) — empty when the
    contract holds. Pure metadata (no scan, no job): the gate a feed
    runs BEFORE the data-level audits above, so a producer's silent
    schema change fails the contract instead of corrupting downstream
    casts."""
    actual = {f.name: f.dataType.simpleString() for f in df.schema}
    rows = []
    for col, etype in expected.items():
        if col not in actual:
            rows.append((col, "missing", etype, None))
        elif actual[col] != etype:
            rows.append((col, "type_mismatch", etype, actual[col]))
    for col, atype in actual.items():
        if col not in expected:
            rows.append((col, "unexpected", None, atype))
    return df.sparkSession.createDataFrame(
        rows, "column string, status string, expected_type string, actual_type string"
    )
