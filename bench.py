"""Benchmark harness — BASELINE.md's 10-query headline set on sf0.1.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Methodology mirrors BASELINE.md: per query 1 warm-up run, then median of 3
timed runs, result fully collected to the driver. Session startup and view
registration excluded from timings (as in BASELINE.md).

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default all).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scopus_spark import registry  # noqa: E402
from scopus_spark.catalog import register_views  # noqa: E402
from scopus_spark.session import get_spark  # noqa: E402

# BASELINE.md metric name -> SURVEY §2 registry key
HEADLINE: dict[str, str] = {
    "q1_pricing_summary": "d2",
    "q3_shipping_priority": "q3",
    "q5_local_supplier": "c8",
    "q6_forecast_revenue": "d1",
    "topk_per_group_window": "e1",
    "sessionize_events": "i1",
    "json_extract_events": "h9",
    "vector_topk_bruteforce": "j3",
    "dedup_documents": "j1",
    "grouping_sets_rollup": "d9",
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    spark = get_spark(app_name="scopus_spark_bench")
    register_views(spark, sf_dir)  # excluded from timings, as in BASELINE.md

    queries = registry.all_queries()
    timings: dict[str, float] = {}
    for name, key in HEADLINE.items():
        fn = queries.get(key)
        if fn is None:
            continue
        fn(spark, sf_dir).collect()  # warm-up
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(runs), 4)

    print(
        json.dumps(
            {
                "metric": "headline_total_median",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
