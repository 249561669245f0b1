"""Dump `.explain("formatted")` for named gates to plans/<tag>/<gate>_<suffix>.txt.

Usage: python tools/capture_plans.py <tag> <suffix> [sf_dir] <gate> [gate ...]

e.g. python tools/capture_plans.py r14 before /root/testdata/sf0.01 st6_stream_neardup_probe

Plan shape is scale-independent (PLAN_AUDIT protocol), so plans are
captured at a small sf by default to keep the eager store-building
composed gates cheap. Composed gates that eagerly checkpoint return a
truncated top plan; their per-stage plans are captured by
tools/plan_audit.py's stage hook — this tool records the final frame's
plan, which is what `.explain` shows a user.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from coronavirus_dashboard_pipeline_etl_spark.plans.gate_queries import QUERIES
from coronavirus_dashboard_pipeline_etl_spark.session import get_spark


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    rest = sys.argv[3:]
    if rest and os.path.isdir(rest[0]):
        sf_dir, gates = rest[0], rest[1:]
    else:
        sf_dir, gates = "/root/testdata/sf0.01", rest
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name=f"capture-plans-{tag}")
    spark.sparkContext.setLogLevel("ERROR")
    for name in gates:
        spark.sparkContext.setJobDescription(f"capture_plans: {name}")
        try:
            spark.catalog.clearCache()
        except Exception:  # noqa: BLE001
            pass
        try:
            df = QUERIES[name](spark, sf_dir)
            text = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            text = f"ERROR building/explaining {name}: {type(e).__name__}: {e}\n"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} — explain('formatted') at {sf_dir} ({suffix})\n\n")
            f.write(text if text.endswith("\n") else text + "\n")
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
