"""Parquet table loaders for the driver's synthetic star schema
(TESTDATA.md) — the engine's S3 parquet source (SURVEY.md §2.1,
``chunk_etl_retriever/retriever.py:99``) applied to the bench tables.

The driver's parquet stores timestamps as TIMESTAMP(NANOS); with
``spark.sql.legacy.parquet.nanosAsLong`` they surface as LongType
nanoseconds. ``load_table`` converts the known timestamp columns to
proper TimestampType (microsecond truncation — all queries operate at
date granularity, so this is lossless for our purposes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# columns that are TIMESTAMP(NANOS) in the driver parquet
_NANO_TS_COLS: dict[str, list[str]] = {
    "orders": ["o_orderdate"],
    "lineitem": ["l_shipdate"],
    "events": ["ts"],
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # The caller's session may not have been built by our get_spark();
    # the conf is runtime-settable, so set it here so reading TIMESTAMP(NANOS)
    # parquet never depends on who constructed the session.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in _NANO_TS_COLS.get(name, []):
        if col in df.columns and dict(df.dtypes)[col] == "bigint":
            # integer `div`, not `/`: double division rounds the 60-bit
            # nanosecond epoch (53-bit mantissa) and can land 1µs off the
            # exact truncation other engines compute
            df = df.withColumn(
                col, F.timestamp_micros(F.expr(f"`{col}` div 1000"))
            )
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every bench table as a temp view for spark.sql queries."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
