"""Scaling-exponent probe for the dedup heavy tail (round-14 verdict
item 6): run the N heaviest gates at two scale factors (default sf1 and
sf3 — the 10x and 30x replicas of the driver's sf0.1 data,
tools/gen_scale.py) and pin each gate's wall-time ratio against its
CANDIDATE-VOLUME ratio (max SQL-node output rows — for the
candidate-bound dedup gates that node is the pair/candidate join).

A gate whose time ratio tracks its candidate ratio is volume-bound (the
design scales: more executors absorb it); a time ratio far above the
candidate ratio would flag a super-linear term the sf0.1->sf1 sweeps
could not see.

Each (sf, gate) pair runs in its OWN PYTHON PROCESS (warm run pays
plan/codegen + store seeding, the SECOND run is recorded — the
timing_sweep steady-state protocol): py4j keeps ONE JVM per Python
process across SparkSession restarts, and the heavy checkpoint-pinning
gates (st6/pipe22) leave enough non-evictable residue in that shared
JVM that a later gate starves of execution memory even in a "fresh"
session (measured: pipe7 OOM'd at sf1 mid-probe while passing
identically in an isolated process — the same failure class
timing_sweep's SESSION_GATES restart mitigates, which a process
boundary eliminates outright).

Usage: python tools/scale_probe.py [out_json] [gate ...]
       python tools/scale_probe.py --one <sf_dir> <gate>   # internal
Writes SCALE_SF3.json + SCALE_SF3.md at the repo root by default.
"""

from __future__ import annotations

import gc
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: the five heaviest gates of the r13 bench/steady sweeps (VERDICT.md
#: plan-audit section), i.e. the dedup heavy tail whose 100x claim this
#: probe is for.
DEFAULT_GATES = [
    "st6_stream_neardup_probe",
    "pipe22_crawl_day",
    "pipe7_neardup_dedup",
    "pipe14_quality_dedup",
    "d12_containment_pairs",
]

SF_DIRS = {"sf1": "testdata_sf1", "sf3": "testdata_sf3"}


def run_one(sf_dir: str, name: str) -> None:
    """Child-process entry: one gate, one sf, fresh JVM. Prints a
    single JSON line (the parent parses the LAST stdout line, so Spark
    progress noise above it is harmless)."""
    from coronavirus_dashboard_pipeline_etl_spark.plans.gate_queries import (
        QUERIES,
    )
    from coronavirus_dashboard_pipeline_etl_spark.session import get_spark
    from tools.runtime_audit import measure

    spark = get_spark(app_name=f"scale_probe_{name}")
    spark.sparkContext.setLogLevel("ERROR")
    fn = QUERIES[name]
    # warm run: plan/codegen + gate store seeding
    measure(spark, fn, sf_dir)
    gc.collect()
    t0 = time.perf_counter()
    m = measure(spark, fn, sf_dir)
    m["sec"] = round(time.perf_counter() - t0, 2)
    spark.stop()
    print(json.dumps(m), flush=True)


def run_sf(label: str, sf_dir: str, gates: list[str]) -> dict[str, dict]:
    out: dict[str, dict] = {}
    for name in gates:
        # 24g heap for every child uniformly (both sfs — ratios stay
        # comparable): pipe7's sf1 working set (checkpoint-pinned pair
        # blocks + 32 concurrent hash builds) is BORDERLINE at the 8g
        # default and OOMs flakily; sizing the executor heap to the
        # working set is exactly what a real cluster does, and the
        # probe measures scaling, not minimum-memory fit.
        env = {**os.environ, "SPARK_GRAFT_DRIVER_MEM": "24g"}
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", sf_dir, name],
            capture_output=True,
            text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            env=env,
        )
        if proc.returncode == 0 and proc.stdout.strip():
            out[name] = json.loads(proc.stdout.strip().splitlines()[-1])
        else:
            tail = (proc.stderr or proc.stdout or "").strip().splitlines()
            out[name] = {"error": " / ".join(tail[-3:]) if tail else "no output"}
        print(label, name, out[name].get("sec", out[name]), flush=True)
    return out


def main() -> None:
    if len(sys.argv) >= 2 and sys.argv[1] == "--one":
        run_one(sys.argv[2], sys.argv[3])
        return
    out_json = sys.argv[1] if len(sys.argv) > 1 else "SCALE_SF3.json"
    gates = sys.argv[2:] or DEFAULT_GATES
    results = {
        label: run_sf(label, d, gates) for label, d in SF_DIRS.items()
    }
    doc = {"gates": gates, "sf_dirs": SF_DIRS, "results": results}
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, out_json), "w") as fh:
        json.dump(doc, fh, indent=1)

    lines = [
        "# SCALE_SF3 — dedup heavy tail, sf1 vs sf3 (3x corpus)",
        "",
        "Steady-state (second run in-session) wall time and candidate",
        "volume (max SQL-node output rows) per gate; `time ratio` vs",
        "`candidate ratio` is the scaling-exponent check: volume-bound",
        "gates track their candidates, a super-linear term would push",
        "time far above. Generated by `tools/scale_probe.py` on the",
        "`tools/gen_scale.py` replicas (within-replica dup structure",
        "mirrors the base corpus; replicas never collide, so candidate",
        "mass scales ~linearly like a real corpus).",
        "",
        "| gate | sf1 s | sf3 s | time ratio | sf1 cand. | sf3 cand. |"
        " cand. ratio | shuffle MiB sf1->sf3 |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for name in gates:
        a, b = results["sf1"].get(name, {}), results["sf3"].get(name, {})
        if "error" in a or "error" in b:
            lines.append(
                f"| {name} | ERR | ERR | — | — | — | — | "
                f"{a.get('error', '')}{b.get('error', '')} |"
            )
            continue
        tr = b["sec"] / max(a["sec"], 1e-9)
        cr = b["scan_rows"] / max(a["scan_rows"], 1)
        lines.append(
            f"| {name} | {a['sec']:.1f} | {b['sec']:.1f} | {tr:.2f}x |"
            f" {a['scan_rows']:,} | {b['scan_rows']:,} | {cr:.2f}x |"
            f" {a['shuffle_bytes']/2**20:.0f} -> "
            f"{b['shuffle_bytes']/2**20:.0f} |"
        )
    with open(os.path.join(root, "SCALE_SF3.md"), "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print("wrote SCALE_SF3.json / SCALE_SF3.md")


if __name__ == "__main__":
    main()
