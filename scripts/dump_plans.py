"""Dump POST-EXECUTION formatted physical plans for named queries.

Usage:
    python scripts/dump_plans.py <suffix> <outdir> <query> [query ...]

Each query is materialized through the noop sink first so the dump
carries the AQE FINAL plan (AQEShuffleRead coalescing, runtime join
flips) — the evidence the optimization rounds' plan claims are checked
against. SF dir from $SPARK_GRAFT_SF_DIR (default sf0.1).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.audit_plans import formatted_plan  # noqa: E402
from tp_integ_data_pipeline_spark import plans  # noqa: E402
from tp_integ_data_pipeline_spark.session import get_session  # noqa: E402


def main() -> None:
    suffix, outdir, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)
    spark = get_session("plandump")
    for n in names:
        df = plans.QUERIES[n](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        with open(os.path.join(outdir, f"{n}_{suffix}.txt"), "w") as fh:
            fh.write(formatted_plan(df))
        print("dumped", n)


if __name__ == "__main__":
    main()
