"""Parquet table loaders for the driver's synthetic star schema
(TESTDATA.md) — the engine's S3 parquet source (SURVEY.md §2.1,
``chunk_etl_retriever/retriever.py:99``) applied to the bench tables.

The driver's parquet has stored timestamps two different ways across
testdata vintages: TIMESTAMP(NANOS) (surfacing as LongType nanoseconds
under ``spark.sql.legacy.parquet.nanosAsLong``) and timestamp[us] with
``isAdjustedToUTC=false`` (surfacing as TIMESTAMP_NTZ). ``load_table``
normalises the known timestamp columns of either vintage to proper
TimestampType with identical epoch micros (the session timezone is
pinned to UTC, so the NTZ reinterpretation is exact).
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

# timestamp columns in the driver parquet (encoding varies by vintage)
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
    # Pin UTC (runtime-settable) so the TIMESTAMP_NTZ -> TIMESTAMP
    # reinterpretation below and all downstream date arithmetic match
    # the DuckDB oracle regardless of who constructed the session.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    dtypes = dict(df.dtypes)
    for col in _NANO_TS_COLS.get(name, []):
        if col not in dtypes:
            continue
        if dtypes[col] == "bigint":
            # integer `div`, not `/`: double division rounds the 60-bit
            # nanosecond epoch (53-bit mantissa) and can land 1µs off the
            # exact truncation other engines compute
            df = df.withColumn(
                col, F.timestamp_micros(F.expr(f"`{col}` div 1000"))
            )
        elif dtypes[col] == "timestamp_ntz":
            # parquet timestamp[us] with isAdjustedToUTC=false reads as
            # TIMESTAMP_NTZ; reinterpret under the UTC session timezone
            # so downstream unix_micros sees the same integer DuckDB's
            # epoch_us computes
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every bench table as a temp view for spark.sql queries."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
