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

from pyspark.sql import DataFrame, SparkSession, functions as F


def load_population_json(spark: SparkSession, path: str) -> dict[str, DataFrame]:
    """Returns {'general': (areaCode, population),
    'age_sex_5yr': (sex, areaCode, age, population)}."""
    raw = spark.read.text(path, wholetext=True)
    raw.createOrReplaceTempView("__population_json")
    general = spark.sql(
        """
        SELECT l1.key AS areaCode, CAST(l1.value AS DOUBLE) AS population
        FROM __population_json,
        LATERAL variant_explode(variant_get(parse_json(value), '$.general')) AS l1
        """
    )
    age_sex = spark.sql(
        """
        SELECT sexes.key AS sex, areas.key AS areaCode, bands.key AS age,
               CAST(bands.value AS DOUBLE) AS population
        FROM __population_json,
        LATERAL variant_explode(variant_get(parse_json(value), '$.ageSex5YearBreakdown')) AS sexes,
        LATERAL variant_explode(sexes.value) AS areas,
        LATERAL variant_explode(areas.value) AS bands
        """
    )
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
