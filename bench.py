"""Round benchmark: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print
ONE JSON line: {"metric", "value", "unit", "queries", "sf"}.

Each query is fully materialized through the noop sink (no driver
collect — the 100 TB rule). A small untimed warmup absorbs JVM/codegen
startup so round-over-round numbers compare real plan cost.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tp_integ_data_pipeline_spark import plans
from tp_integ_data_pipeline_spark.session import get_session

HEADLINE = [
    "q00_flagship",
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_region_revenue",
    "q06_forecast_revenue",
    "q10_window_topk",
    "q11_window_running_sum",
    "q20_tumbling_window",
    "q30_transform_chain",
    "q41_ngram_jaccard_topk",
    "q42_minhash_lsh_pairs",
    "q44_embedding_near_dup",
    "q50_knn_bruteforce",
    "q55_text_stats",
    "q56_lang_id_confusion",
    "q57_fingerprint",
    "q60_stream_tumbling_window",
    "q66_decode_stub",
    "q70_scd1_merge",
]


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    spark = get_session("bench")

    # Warmup (untimed): JVM + codegen + parquet footer caches.
    materialize(plans.QUERIES["q01_pricing_summary"](spark, sf_dir))

    # Two passes, keep the min per query: single-JVM local mode has
    # noisy GC/contention tails; min-of-2 reports plan cost, not noise.
    timings: dict[str, float] = {}
    for _pass in range(2):
        for name in HEADLINE:
            t0 = time.time()
            materialize(plans.QUERIES[name](spark, sf_dir))
            elapsed = round(time.time() - t0, 3)
            if name not in timings or elapsed < timings[name]:
                timings[name] = elapsed

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
