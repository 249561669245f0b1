"""Nested-pathway tests (F4/F5 fixture shapes): age-demographics daily
nesting with per-age rates, and the weekly variants scaffold."""

import pytest
from pyspark.sql import functions as F

from coronavirus_dashboard_pipeline_etl_spark.plans.demographics_pipeline import (
    run_demographics,
)


def test_age_demographics_nesting(spark):
    days = [f"2021-02-{d:02d}" for d in range(1, 21)]
    rows = []
    for d in days:
        for age in ("00_04", "05_09"):
            rows.append(("nation", "E92000001", "England", d, age, 10.0))
    # a hole: one (date, age) cell missing -> densified + zero-filled
    rows = [r for r in rows if not (r[3] == "2021-02-03" and r[4] == "00_04")]
    data = spark.createDataFrame(
        rows,
        "areaType string, areaCode string, areaName string, date string, "
        "age string, newCasesBySpecimenDate double",
    )
    pop = spark.createDataFrame(
        [("E92000001", "00_04", 3_000_000.0), ("E92000001", "05_09", 3_500_000.0)],
        "areaCode string, age string, population double",
    )
    out = run_demographics(
        data,
        nesting_param="age",
        value_metrics=["newCasesBySpecimenDate"],
        out_col="casesAgeDemographics",
        population=pop,
        rolling_rate=["newCasesBySpecimenDate"],
        zero_filled=["newCasesBySpecimenDate"],
    )
    got = {r["date"]: r.asDict() for r in out.collect()}
    assert len(got) == 20  # one row per date
    rec = got["2021-02-15"]["casesAgeDemographics"]
    assert [x["age"] for x in rec] == ["00_04", "05_09"]  # sorted nesting
    # age 05_09: full 7-day window of 10s -> rsum 70, rate = 70/3.5e6*1e5 = 2.0
    r59 = rec[1]
    assert r59["newCasesBySpecimenDateRollingSum"] == 70.0
    assert r59["newCasesBySpecimenDateRollingRate"] == 2.0
    # the AGE rate path carries NO freshness mask (calculate_age_rates'
    # date > frame-max guard is inert and it has no last-valid rule —
    # established by the composed reference-exec parity test, round 10;
    # the 5-day freshness handling in the reference demographics path
    # is the later wall-clock payload-format row drop, out of engine
    # scope): trailing dates keep their live rolling values
    tail = got["2021-02-18"]["casesAgeDemographics"][1]
    assert tail["newCasesBySpecimenDateRollingSum"] == 70.0
    assert tail["newCasesBySpecimenDateRollingRate"] == 2.0
    # the zero-filled hole keeps 00_04's rolling sum at 60 on day 9
    r04_d9 = got["2021-02-09"]["casesAgeDemographics"][0]
    assert r04_d9["newCasesBySpecimenDateRollingSum"] == 60.0
    assert got["2021-02-03"]["casesAgeDemographics"][0]["newCasesBySpecimenDate"] == 0.0


def test_weekly_variant_scaffold(spark):
    # Sundays: 2021-02-07, 14, 21, 28
    rows = [
        ("nation", "E92000001", "England", d, v, 50.0)
        for d in ("2021-02-07", "2021-02-21", "2021-02-28")
        for v in ("Alpha", "Other")
    ]
    data = spark.createDataFrame(
        rows,
        "areaType string, areaCode string, areaName string, date string, "
        "variant string, newWeeklyPercentage double",
    )
    out = run_demographics(
        data,
        nesting_param="variant",
        value_metrics=["newWeeklyPercentage"],
        out_col="variants",
        frequency="W",
        zero_filled=["newWeeklyPercentage"],
    )
    got = {r["date"]: r for r in out.collect()}
    # the missing Sunday 2021-02-14 is scaffolded in
    assert set(got) == {"2021-02-07", "2021-02-14", "2021-02-21", "2021-02-28"}
    recs = got["2021-02-14"]["variants"]
    assert [x["variant"] for x in recs] == ["Alpha", "Other"]
    assert recs[0]["newWeeklyPercentage"] == 0.0  # blanket zero-fill (nested path)


def test_flatten_nested_metrics_suffix_and_skip(spark):
    from coronavirus_dashboard_pipeline_etl_spark.operators import (
        flatten_nested_metrics,
    )

    df = spark.createDataFrame(
        [
            (
                "E1",
                "2023-10-01",
                [
                    {"age": "65+", "newVax": 10.0, "cumVax": 100.0},
                    {"age": "75+", "newVax": 5.0, "cumVax": 50.0},
                    {"age": "unknown", "newVax": 1.0, "cumVax": 2.0},
                    {"age": None, "newVax": 3.0, "cumVax": 4.0},
                ],
            )
        ],
        "areaCode string, date string, payload array<struct<age:string,newVax:double,cumVax:double>>",
    )
    out = flatten_nested_metrics(
        df, {"65+": ["newVax", "cumVax"], "75+": ["newVax"]}
    )
    rows = {(r.metric, r.value) for r in out.collect()}
    # '+' spelt out in the metric name (converter.py:70-74); unknown and
    # null ages skipped entirely (converter.py:240-246)
    assert rows == {
        ("newVax65plus", 10.0),
        ("cumVax65plus", 100.0),
        ("newVax75plus", 5.0),
    }
    assert set(out.columns) == {"areaCode", "date", "metric", "value"}
