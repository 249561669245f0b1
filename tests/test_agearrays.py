"""Nested age-array row math (db_etl/etl.py:678-799 semantics)."""

import pytest
from pyspark.sql import Row, functions as F

from coronavirus_dashboard_pipeline_etl_spark.operators import (
    calculate_pair_tested,
    calculate_sex_people_tested,
    enrich_nested_rates,
)


def _entry(age, value):
    return Row(age=age, value=value)


@pytest.fixture()
def pair_frame(spark):
    return spark.createDataFrame(
        [
            # sideB deliberately out of age order — op must align by age
            Row(
                areaCode="E1",
                sideA=[_entry("00-29", 10.0), _entry("30-59", 20.0)],
                sideB=[_entry("30-59", 5.0), _entry("00-29", 1.0)],
            ),
            Row(areaCode="E2", sideA=[_entry("00-29", 7.0)], sideB=None),
        ]
    )


@pytest.fixture()
def population(spark):
    return spark.createDataFrame(
        [
            Row(areaCode="E1", age="00-29", population=100),
            Row(areaCode="E1", age="30-59", population=50),
            Row(areaCode="E2", age="00-29", population=10),
        ]
    )


def test_pair_sum_aligns_by_age_and_rates(spark, pair_frame, population):
    out = calculate_pair_tested(
        pair_frame, ("sideA", "sideB"), "pairTested", population=population
    )
    rows = {r["areaCode"]: r["pairTested"] for r in out.collect()}
    e1 = sorted(rows["E1"], key=lambda e: e["age"])
    assert [e["value"] for e in e1] == [11.0, 25.0]
    # rate = value / pop * 100k rounded to 1dp
    assert [e["rate"] for e in e1] == [11000.0, 50000.0]


def test_pair_sum_null_when_either_side_missing(spark, pair_frame, population):
    out = calculate_pair_tested(
        pair_frame, ("sideA", "sideB"), "pairTested", population=population
    )
    rows = {r["areaCode"]: r["pairTested"] for r in out.collect()}
    assert rows["E2"] is None  # reference dropna guard -> whole cell null


def test_pair_sum_without_population_has_no_rate_field(spark, pair_frame):
    out = calculate_pair_tested(pair_frame, ("sideA", "sideB"), "pairTested")
    fields = [
        f.name
        for f in out.schema["pairTested"].dataType.elementType.fields
    ]
    assert "rate" not in fields
    rows = {r["areaCode"]: r["pairTested"] for r in out.collect()}
    assert [e["value"] for e in sorted(rows["E1"], key=lambda e: e["age"])] == [
        11.0,
        25.0,
    ]


def test_named_pairs_wrapper(spark, pair_frame, population):
    out = calculate_sex_people_tested(
        pair_frame,
        population=population,
        pairs={"peopleTested": ("sideA", "sideB")},
    )
    assert "peopleTested" in out.columns


def test_enrich_nested_rates_and_missing_population(spark, population):
    df = spark.createDataFrame(
        [
            Row(areaCode="E1", cell=[_entry("00-29", 50.0)]),
            Row(areaCode="E9", cell=[_entry("00-29", 3.0)]),  # no pop rows
        ]
    )
    out = enrich_nested_rates(df, "cell", population)
    rows = {r["areaCode"]: r["cell"] for r in out.collect()}
    assert rows["E1"][0]["rate"] == 50000.0
    assert rows["E9"][0]["rate"] is None
    assert rows["E9"][0]["value"] == 3.0


def test_pair_plan_is_broadcast_no_extra_shuffle(spark, pair_frame, population):
    out = calculate_pair_tested(
        pair_frame, ("sideA", "sideB"), "pairTested", population=population
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
