"""Cold-adjacency probe for sub-second bench gates (round-12 verdict
item 3 — the pipe11 root-cause methodology, generalised): measure a
gate's first execution DIRECTLY AFTER the bench protocol's System.gc +
neutral-absorber cycle vs its steady repeat, so BASELINE.md can pin an
expected first-execution range the way pipe11's is pinned.

Usage: python tools/probe_cold.py [sf_dir] gate [gate ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from coronavirus_dashboard_pipeline_etl_spark.plans.gate_queries import (  # noqa: E402
    QUERIES,
)
from coronavirus_dashboard_pipeline_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args.pop(0) if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    names = args or ["pipe13_corpus_monitor", "j11c_asof_nearest"]
    spark = get_spark(app_name="probe_cold")
    spark.sparkContext.setLogLevel("ERROR")

    def noop(name: str) -> None:
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()

    def absorber() -> None:
        spark.range(0, 50_000_000, 1, 32).selectExpr(
            "sum(id * 3 + 1) AS s"
        ).write.format("noop").mode("overwrite").save()

    noop("q1_pricing_summary")  # the bench's JVM warm-up
    for name in names:
        import gc

        # steady pair first (codegen cached, heap committed)
        spark.catalog.clearCache()
        noop(name)
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        noop(name)
        steady = time.perf_counter() - t0
        # the bench protocol's GC cycle, then first execution
        gc.collect()
        spark._jvm.System.gc()
        absorber()
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        noop(name)
        post_gc = time.perf_counter() - t0
        print(
            f"{name:28s} steady={steady:6.2f}s post-gc-first={post_gc:6.2f}s "
            f"ratio={post_gc / max(steady, 1e-9):.1f}x"
        )
    spark.stop()


if __name__ == "__main__":
    main()
