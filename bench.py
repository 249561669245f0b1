"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], print ONE
JSON line with total + per-query wall seconds.

Each query executes end-to-end into the no-op sink (full plan runs,
nothing is collected to the driver, no sink I/O distorts timing).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from coronavirus_dashboard_pipeline_etl_spark.plans.gate_queries import QUERIES
from coronavirus_dashboard_pipeline_etl_spark.session import get_spark

# headline set: the flagship agg, the star joins, the full window-family
# panel pipeline, melt at volume, dedup + ANN — the operators whose cost
# dominates a 100 TB run.
HEADLINE = [
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_region_volume",
    "q6_forecast_revenue",
    "p7_melt_lineitem",
    "a234_change_direction_pct",
    "a1v_rolling_qty_by_part",
    "j2_rolling_rate_per100k",
    "a5_cumulative_sum",
    "a12_rank_latest",
    "d3_minhash_signatures",
    "d3b_lsh_pairs",
    "s1_ann_cosine_topk",
    "t2_quality_stats",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM/readers once so per-query numbers measure the plan,
    # not first-touch class loading.
    QUERIES["q1_pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
