"""Steady-state timing sweep over the full gate registry: run every
queries() entry twice at the given sf (default sf0.1) and record the
SECOND run's wall time — plan-compile/codegen noise excluded — so
regressions in the heavy tail are visible per round.

Usage: python tools/timing_sweep.py [sf_dir] [out_json]

Writes one JSON object {gate: seconds | "ERR <type>"} plus a host
calibration probe, and prints the slowest 15. Compare across rounds
only after dividing by the calibration (hosts vary 1.2-3x per round).

Between gates the sweep drops every reference to the previous plans and
forces a GC on both sides of py4j, and every SESSION_GATES gates it
restarts the SparkSession outright (untimed): hundreds of executions in
one session otherwise pin localCheckpoint blocks, broadcasts, and
shuffle files faster than the lazy cleaner releases them — measured at
sf1 as pipe7 taking 204s mid-sweep vs 40s in a fresh session (and an
8 GiB-heap sweep dying of driver OOM outright); GC alone still left the
late heavy gates ~2x their fresh-session cost.
"""

from __future__ import annotations

import gc
import json
import sys
import time

sys.path.insert(0, ".")

from coronavirus_dashboard_pipeline_etl_spark.plans.gate_queries import QUERIES
from coronavirus_dashboard_pipeline_etl_spark.session import get_spark


def calibrate() -> float:
    """Single-threaded host-speed probe (same as bench.py's)."""
    import numpy as np

    rng = np.random.default_rng(42)
    a = rng.standard_normal(1 << 24)
    t0 = time.perf_counter()
    for _ in range(10):
        a = a * 1.000001 + 0.5
    return round(time.perf_counter() - t0, 3)


import os

# gates between session restarts; 0 = NEVER restart (the single-session
# endurance mode — r7's rolling checkpoint release is supposed to make
# restarts unnecessary, and SPARK_GRAFT_SESSION_GATES=0 proves it)
SESSION_GATES = int(os.environ.get("SPARK_GRAFT_SESSION_GATES", "30"))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "TIMING_SWEEP.json"
    spark = get_spark(master="local[32]", shuffle_partitions=32)
    out: dict[str, object] = {}
    for idx, (name, fn) in enumerate(QUERIES.items()):
        if SESSION_GATES and idx and idx % SESSION_GATES == 0:
            spark.stop()
            spark = get_spark(master="local[32]", shuffle_partitions=32)
        try:
            fn(spark, sf_dir).count()  # warm: plan compile + codegen
            # drop the warm run's persisted relations: the CacheManager
            # matches plans structurally, so the timed run would ride
            # the warm run's persist (measured: d12 9.5 s cache-warm vs
            # ~40 s honest at sf1). Steady state = warm codegen, COLD
            # data — any persist a gate legitimately builds is rebuilt
            # inside the timed window, like a fresh production run.
            spark.catalog.clearCache()
            t0 = time.time()
            fn(spark, sf_dir).count()
            out[name] = round(time.time() - t0, 2)
        except Exception as e:  # noqa: BLE001 — record, keep sweeping
            out[name] = f"ERR {type(e).__name__}"
        # release the finished gate's plans, cached relations,
        # checkpoint blocks, and broadcasts before the next one is timed
        try:
            spark.catalog.clearCache()
        except Exception:  # noqa: BLE001
            pass
        gc.collect()
        try:
            spark._jvm.System.gc()
        except Exception:  # noqa: BLE001
            pass
    with open(out_path, "w") as f:
        json.dump(
            {
                "sf_dir": sf_dir,
                "calibration_numpy_sec": calibrate(),
                "session_gates": SESSION_GATES,  # 0 = one session, no restarts
                "steady_s": out,
            },
            f,
            indent=1,
        )
    ranked = sorted(
        ((v, k) for k, v in out.items() if isinstance(v, float)),
        reverse=True,
    )
    for v, k in ranked[:15]:
        print(f"{v:7.2f}  {k}")
    errs = {k: v for k, v in out.items() if isinstance(v, str)}
    if errs:
        print("errors:", errs)
    print(f"total steady {sum(v for v, _ in ranked):.1f}s; wrote {out_path}")
    spark.stop()


if __name__ == "__main__":
    main()
