"""Interleaved same-session A/B of one registered query under
alternative per-query conf overrides (the r15/r16 protocol: same
session, variants interleaved, min over reps, session caches cleared
before every timed run so shared prework is charged consistently).

Usage:
    python scripts/ab_query.py <query> '<json list of conf dicts>' [reps]

Example:
    python scripts/ab_query.py q165_count_min_sketch \
      '[{}, {"spark.tp_integ.spreadCorpusScan": "true"}]' 3
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tp_integ_data_pipeline_spark import plans  # noqa: E402
from tp_integ_data_pipeline_spark.plans import registry, session_cache  # noqa: E402
from tp_integ_data_pipeline_spark.session import get_session  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    variants = json.loads(sys.argv[2])
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("ab")
    # warmup: JVM/codegen/parquet footers (same as bench.py)
    plans.QUERIES["q01_pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    best = [None] * len(variants)
    for rep in range(reps):
        for i, confs in enumerate(variants):
            registry.QUERY_CONFS[name] = confs
            session_cache._CACHES.clear()
            gc.collect()
            t0 = time.time()
            plans.QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            el = time.time() - t0
            if best[i] is None or el < best[i]:
                best[i] = el
            print(f"rep{rep} variant{i} {el:.3f}s  {confs}", flush=True)
    print("---")
    for i, confs in enumerate(variants):
        print(f"variant{i} min={best[i]:.3f}s  {confs}")


if __name__ == "__main__":
    main()
