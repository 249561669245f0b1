"""Time a subset of gate queries with the bench protocol (fresh session,
clearCache before each, noop sink, first execution) — for targeted
before/after comparison while optimizing, without paying a full bench.

Usage: python tools/time_queries.py [sf_dir] <gate> [gate ...] [--reps N]

Prints one JSON line {gate: [sec, ...]} (reps per gate, first-execution
plan each time — clearCache between reps so CacheManager reuse cannot
subsidise later reps).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from coronavirus_dashboard_pipeline_etl_spark.plans.gate_queries import QUERIES
from coronavirus_dashboard_pipeline_etl_spark.session import get_spark


def main() -> None:
    args = [a for a in sys.argv[1:]]
    reps = 1
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i : i + 2]
    if args and os.path.isdir(args[0]):
        sf_dir, gates = args[0], args[1:]
    else:
        sf_dir, gates = "/root/testdata/sf0.1", args
    spark = get_spark(app_name="time-queries")
    spark.sparkContext.setLogLevel("ERROR")
    # warm the JVM + parquet reader once with NEUTRAL jobs that are
    # never timed gates (r14 advice: warming with q1 gave q1 itself a
    # second-execution advantage when it was among the timed gates)
    spark.range(0, 50_000_000, 1, 32).selectExpr("sum(id * 3 + 1) s").write.format(
        "noop"
    ).mode("overwrite").save()
    from coronavirus_dashboard_pipeline_etl_spark.sources import load_table

    load_table(spark, sf_dir, "region").write.format("noop").mode(
        "overwrite"
    ).save()
    out: dict[str, list] = {}
    for name in gates:
        out[name] = []
        for _ in range(reps):
            try:
                spark.catalog.clearCache()
            except Exception:  # noqa: BLE001
                pass
            spark.sparkContext.setJobDescription(f"time_queries: {name}")
            t0 = time.perf_counter()
            try:
                QUERIES[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                out[name].append(round(time.perf_counter() - t0, 3))
            except Exception as e:  # noqa: BLE001
                out[name].append(f"ERR {type(e).__name__}: {e}"[:200])
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
