"""F7 — population broadcast dimensions.

The reference fetches ``population.json``
(``population/population.py:28-56``) shaped
``{"general": {areaCode: n}, "ageSexBroadBreakdown": {...},
"ageSex5YearBreakdown": {male/female: {areaCode: {band: n}}}}``
plus per-age CSVs (``db_etl/etl.py:1146-1151``) and the MSOA population
CSV (``msoa_etl_orchestrator/orchestrator.py:183-190``).

All of these are kilobyte-scale dimensions: parse once, return small
DataFrames the rate operators broadcast-join (J2). The nested JSON is
parsed with variant explode — same machinery as the release source.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F


def load_population_json(spark: SparkSession, path: str) -> dict[str, DataFrame]:
    """Returns {'general': (areaCode, population),
    'age_sex_5yr': (sex, areaCode, age, population)}.

    The LATERAL variant_explode SQL needs a named relation; the view name
    is per-call unique and dropped before returning (spark.sql resolves
    the view into the plan at analysis time, so the returned lazy frames
    survive the drop) — a fixed name would clobber/race across
    concurrent loads in one session."""
    view = f"__population_json_{uuid.uuid4().hex}"
    spark.read.text(path, wholetext=True).createOrReplaceTempView(view)
    try:
        general = spark.sql(
            f"""
            SELECT l1.key AS areaCode, CAST(l1.value AS DOUBLE) AS population
            FROM {view},
            LATERAL variant_explode(variant_get(parse_json(value), '$.general')) AS l1
            """
        )
        age_sex = spark.sql(
            f"""
            SELECT sexes.key AS sex, areas.key AS areaCode, bands.key AS age,
                   CAST(bands.value AS DOUBLE) AS population
            FROM {view},
            LATERAL variant_explode(variant_get(parse_json(value), '$.ageSex5YearBreakdown')) AS sexes,
            LATERAL variant_explode(sexes.value) AS areas,
            LATERAL variant_explode(areas.value) AS bands
            """
        )
    finally:
        spark.catalog.dropTempView(view)
    return {"general": general, "age_sex_5yr": age_sex}


def load_age_population_csv(spark: SparkSession, path: str) -> DataFrame:
    """``prepped_demographics_population.csv``: (areaCode, age, population)."""
    return (
        spark.read.option("header", True).csv(path)
        .select(
            "areaCode",
            "age",
            F.col("population").cast("double").alias("population"),
        )
    )


def load_msoa_population_csv(spark: SparkSession, path: str) -> DataFrame:
    """``msoa_pop2020.csv``: (areaCode, population)."""
    return (
        spark.read.option("header", True).csv(path)
        .select(
            "areaCode", F.col("population").cast("double").alias("population")
        )
    )
