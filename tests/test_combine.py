"""J11 multi-frame combine (operators/combine.py) — left semantics,
missing-supplement passthrough, disjoint-column guard, one shuffle.

Reference semantics: db_etl/db_uploader/chunk_ops/combine.py:116-153
(iterated pandas left joins on (areaType, areaCode, date))."""

import pytest

from coronavirus_dashboard_pipeline_etl_spark.operators.combine import (
    combine_supplements,
)


def _frames(spark):
    main = spark.createDataFrame(
        [("ltla", "E1", "2024-01-01", 10), ("ltla", "E1", "2024-01-02", 20)],
        "areaType string, areaCode string, date string, cases int",
    )
    by_age = spark.createDataFrame(
        [("ltla", "E1", "2024-01-01", 7), ("ltla", "E9", "2024-01-01", 3)],
        "areaType string, areaCode string, date string, cases_0_59 int",
    )
    deaths = spark.createDataFrame(
        [("ltla", "E1", "2024-01-02", 1)],
        "areaType string, areaCode string, date string, deaths int",
    )
    return main, by_age, deaths


def test_left_join_semantics_and_missing_supplement(spark):
    main, by_age, deaths = _frames(spark)
    out = combine_supplements(main, [by_age, None, deaths])
    assert out.columns == [
        "areaType", "areaCode", "date", "cases", "cases_0_59", "deaths",
    ]
    rows = {r["date"]: r for r in out.collect()}
    # supplement-only key (E9) dropped; nulls where a family has no row
    assert set(rows) == {"2024-01-01", "2024-01-02"}
    assert rows["2024-01-01"]["cases_0_59"] == 7
    assert rows["2024-01-01"]["deaths"] is None
    assert rows["2024-01-02"]["deaths"] == 1
    assert rows["2024-01-02"]["cases_0_59"] is None


def test_overlapping_value_columns_raise(spark):
    main, by_age, _ = _frames(spark)
    dup = by_age.withColumnRenamed("cases_0_59", "cases")
    with pytest.raises(ValueError, match="disjoint"):
        combine_supplements(main, [dup])


def test_missing_key_column_raises(spark):
    main, by_age, _ = _frames(spark)
    with pytest.raises(ValueError, match="key columns"):
        combine_supplements(main, [by_age.drop("date")])


def test_single_shuffle_regardless_of_supplement_count(spark):
    main, by_age, deaths = _frames(spark)
    out = combine_supplements(main, [by_age, deaths, by_age.withColumnRenamed(
        "cases_0_59", "cases_60_plus"
    )])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_validate_rejects_duplicate_keys(spark):
    import pytest
    from pyspark.sql import functions as F

    main = spark.createDataFrame(
        [("ltla", "A1", "2024-01-01", 1.0), ("ltla", "A1", "2024-01-01", 2.0)],
        "areaType string, areaCode string, date string, m1 double",
    )
    with pytest.raises(ValueError, match="duplicate key row"):
        combine_supplements(main, [], validate=True)


def test_validate_passes_unique_keys(spark):
    main = spark.createDataFrame(
        [("ltla", "A1", "2024-01-01", 1.0), ("ltla", "A2", "2024-01-01", 2.0)],
        "areaType string, areaCode string, date string, m1 double",
    )
    supp = spark.createDataFrame(
        [("ltla", "A1", "2024-01-01", 9.0)],
        "areaType string, areaCode string, date string, m2 double",
    )
    out = combine_supplements(main, [supp], validate=True)
    assert out.count() == 2
