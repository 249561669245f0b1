"""The round-1 postmortem, as a regression net: the external gate
driver calls ``queries()[name](spark, sf_dir)`` with its OWN plain
SparkSession — no repo confs. Round 1 lost 24/50 correctness rows
because reading TIMESTAMP(NANOS) parquet depended on a conf only
``session.get_spark`` set.

A plain session cannot be built inside the pytest JVM (getOrCreate
returns the fixture session), so this drives ``tools/run_gate.py`` —
which deliberately constructs a bare session — in a subprocess, over
one query per input table family (events nanos-timestamps, documents,
embeddings).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="driver testdata absent")
def test_plain_session_runs_every_table_family():
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "run_gate.py"),
            SF_DIR,
            "p8_pivot_events",      # events: TIMESTAMP(NANOS) column
            "t1_token_stats",       # documents
            "s2_ann_ivf_topk",      # embeddings (float arrays)
            "q1_pricing_summary",   # lineitem (nanos shipdate)
        ],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert "4 passed, 0 failed" in proc.stdout, proc.stdout[-2000:]
