"""One-off probe for the pipe11_ann_index bench variance (VERDICT r9,
"What's wrong" item 1): r8 bench raw ~2.7 s vs r9 driver bench ~7.7 s on
unchanged code, steady-state 1.9-2.2 s.

Hypotheses measured here, all under the bench timing protocol
(clearCache before every timed run, noop sink):
  A. first-execution vs steady in one session (codegen + Python-worker
     spin-up for the mapInPandas kernel);
  B. GC phase: timed run immediately after System.gc + the neutral
     absorber (the bench does this for queries at gc_counter % 8 == 1)
     vs without;
  C. cold session (separate process would be needed; approximated by
     running pipe11 FIRST after the q1 warm-up, i.e. with no prior
     pandas-UDF query having warmed the Python worker pool).

Usage: python tools/probe_pipe11.py [sf_dir] [--first-only]
Prints one JSON line with every measurement.
"""
from __future__ import annotations

import gc
import json
import sys
import time

sys.path.insert(0, ".")

from coronavirus_dashboard_pipeline_etl_spark.session import get_spark  # noqa: E402
from coronavirus_dashboard_pipeline_etl_spark.plans.gate_queries import (  # noqa: E402
    QUERIES,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    first_only = "--first-only" in sys.argv
    spark = get_spark(master="local[32]", shuffle_partitions=32)

    def run(name: str) -> float:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return round(time.perf_counter() - t0, 3)

    def full_gc_and_absorb() -> None:
        gc.collect()
        spark._jvm.System.gc()
        spark.range(0, 50_000_000, 1, 32).selectExpr(
            "sum(id * 3 + 1) AS s"
        ).write.format("noop").mode("overwrite").save()

    out: dict = {"sf_dir": sf_dir}
    # bench-identical warm-up (q1 is JVM/reader warm-up, no pandas UDF)
    run("q1_pricing_summary")

    if first_only:
        # C: pipe11 as the FIRST pandas-UDF query of the session
        out["pipe11_first_no_python_warm"] = run("pipe11_ann_index")
        out["pipe11_second"] = run("pipe11_ann_index")
        print(json.dumps(out))
        spark.stop()
        return

    # warm the Python worker pool the way the real bench does: s1 and
    # d3 run long before pipe11 in HEADLINE order
    out["s1_warm"] = run("s1_ann_cosine_topk")
    out["pipe11_first_python_warm"] = run("pipe11_ann_index")  # A
    out["pipe11_steady"] = [run("pipe11_ann_index") for _ in range(3)]
    full_gc_and_absorb()  # B: bench GC-phase replica
    out["pipe11_after_gc_absorb"] = run("pipe11_ann_index")
    full_gc_and_absorb()
    out["pipe11_after_gc_absorb_2"] = run("pipe11_ann_index")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
