"""Privacy / governance operators: deterministic pseudonymization
with referential integrity.

The GDPR-pipeline verb the reference's warehouse loads would need
before sharing data: replace direct identifiers with salted-hash
pseudonyms such that (a) the mapping is irreversible without the
salt, (b) the SAME id maps to the SAME pseudonym in every table it
appears in (joins and aggregations still work downstream), and
(c) re-running with a rotated salt unlinks all prior pseudonyms.

Expression-level (sha2 over salt||value — JVM, codegen'd, no UDF, no
lookup table to secure or shuffle); the salt is a pipeline secret
passed by the caller, never derived from data. For k-anonymity-style
generalization see the masking in plans/curation.py (q98 redaction);
this module handles the identifier column itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pseudonymize(
    df: DataFrame,
    cols: dict[str, str] | list[str],
    salt: str,
    length: int | None = 16,
) -> DataFrame:
    """Replace each identifier column with
    ``sha256(salt || ':' || role || ':' || value)`` (hex, optionally
    truncated to ``length`` chars — 16 hex chars = 64 bits, collision
    odds ~n²/2⁶⁵).

    ``cols`` maps column name -> ROLE (a list means role == name).
    The role — not the column name — is hashed into the message, so
    the same entity keyed as ``user_id`` in one table and
    ``c_custkey`` in another maps to the SAME pseudonym (referential
    integrity), while equal values in unrelated roles (a user id vs a
    part number) land in distinct pseudonym spaces. Nulls stay null.
    """
    roles = {c: c for c in cols} if not isinstance(cols, dict) else cols
    out = df
    for c, role in roles.items():
        h = F.sha2(
            F.concat_ws(":", F.lit(salt), F.lit(role), F.col(c).cast("string")), 256
        )
        if length is not None:
            h = F.substring(h, 1, length)
        out = out.withColumn(c, F.when(F.col(c).isNotNull(), h))
    return out


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    k: int = 5,
) -> DataFrame:
    """Per-equivalence-class k-anonymity / l-diversity audit — the
    release-gate check run before sharing a quasi-identifiable table
    (Sweeney 2002; Machanavajjhala et al. 2007).

    Rows sharing the same ``quasi_cols`` tuple form an equivalence
    class; a class smaller than ``k`` re-identifies its members, and a
    class whose ``sensitive_col`` takes few distinct values leaks the
    attribute even when k holds. Returns one row per class:
    (quasi..., class_size, l_diversity, at_risk).

    Shape at 100 TB: ONE keyed aggregate over the quasi columns
    (count + count distinct, map-side combinable) — the class relation
    is |quasi-value-combinations|-sized, output-bounded, never a
    self-join. NULL quasi values form their own class (standard
    treatment: null tuples are mutually indistinguishable).
    """
    return (
        df.groupBy(*quasi_cols)
        .agg(
            F.count(F.lit(1)).alias("class_size"),
            F.countDistinct(F.col(sensitive_col)).alias("l_diversity"),
        )
        .withColumn("at_risk", F.col("class_size") < F.lit(k))
    )
