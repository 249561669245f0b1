"""MSOA suppression-path tests (F6 fixture shape): counts straddling the
3/2 thresholds, an area whose series ends early (zero-padding), weekly
grid anchored at release - 5 days."""

import json

import pandas as pd
import pytest
from pyspark.sql import functions as F

from coronavirus_dashboard_pipeline_etl_spark.plans.msoa_pipeline import run_msoa


@pytest.fixture(scope="module")
def result(spark):
    days = [f"2021-03-{d:02d}" for d in range(1, 27)]
    rows = []
    # E02000001: healthy counts -> visible stats
    for d in days:
        rows.append(("E02000001", d, 5.0))
    # E02000002: tiny counts (rolling sums <= 2) -> fully suppressed
    for i, d in enumerate(days):
        rows.append(("E02000002", d, 1.0 if i % 7 == 0 else 0.0))
    # E02000003: series ends early -> zero-padded tail
    for d in days[:12]:
        rows.append(("E02000003", d, 4.0))
    cases = spark.createDataFrame(
        rows, "areaCode string, date string, newCasesBySpecimenDate double"
    )
    pop = spark.createDataFrame(
        [("E02000001", 8000.0), ("E02000002", 9000.0), ("E02000003", 7000.0)],
        "areaCode string, population double",
    )
    out = run_msoa(cases, pop, release_timestamp="2021-03-31", hash_key=b"k")
    return {(r["area_code"], r["date"]): r.asDict() for r in out.collect()}


def test_weekly_grid_anchor(result):
    # anchor = 2021-03-26; grid = 26, 19, 12, 05
    dates = {d for (_, d) in result}
    assert dates == {"2021-03-26", "2021-03-19", "2021-03-12", "2021-03-05"}


def test_healthy_area_visible(result):
    r = result[("E02000001", "2021-03-26")]
    assert r["newCasesBySpecimenDateRollingSum"] == 35.0
    assert r["newCasesBySpecimenDateRollingRate"] == round(35 / 8000 * 1e5, 1)
    payload = json.loads(r["payload"])
    assert payload["rollingSum"] == 35.0
    assert payload["direction"] == "SAME"


def test_small_counts_suppressed(result):
    # rolling sums of 0/1 are < 3 -> substituted to 2 -> everything nulled
    r = result[("E02000002", "2021-03-26")]
    assert r["newCasesBySpecimenDateRollingSum"] is None
    assert r["newCasesBySpecimenDateRollingRate"] is None
    payload = json.loads(r["payload"])
    assert payload.get("rollingSum") is None
    assert payload.get("newCasesBySpecimenDate") is None


def test_zero_padded_tail(result):
    # E02000003 has no data after 03-12; padded zeros make the tail
    # rolling sums drop to 0 -> suppressed (<=2)
    r = result[("E02000003", "2021-03-26")]
    assert r["newCasesBySpecimenDateRollingSum"] is None
    # at 03-12 the series is alive: sum of 7x4 = 28
    r2 = result[("E02000003", "2021-03-12")]
    assert r2["newCasesBySpecimenDateRollingSum"] == 28.0


def test_hashes_unique_and_keyed(result):
    hashes = {r["hash"] for r in result.values()}
    assert len(hashes) == len(result)
    assert all(len(h) == 24 for h in hashes)
