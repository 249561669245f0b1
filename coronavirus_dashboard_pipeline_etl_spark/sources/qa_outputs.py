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

import re
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def int_coerced(col: Column) -> Column:
    """JSON-facing value rendered as a raw number string: whole floats as
    integers, else the double (the reference's nullable-Int64 dance,
    db_etl/etl.py:1183-1185). NaN/±Inf become null (pandas-JSON
    behaviour); ``try_cast`` because a plain long cast THROWS under
    Spark 4 ANSI mode on NaN/overflow and would abort the whole write."""
    as_long = col.try_cast("long")
    finite = (
        col.isNotNull()
        & ~F.isnan(col)
        & (col != F.lit(float("inf")))
        & (col != F.lit(float("-inf")))
    )
    return F.when(
        finite & (as_long.cast("double") == col), as_long.cast("string")
    ).when(finite, col.cast("string"))


_NUM_RE = r'"(-?\d+(\.\d+)?(E-?\d+)?)"'


def write_records_json(
    df: DataFrame, path: str, numeric_cols: Sequence[str] = ()
) -> None:
    """Newline-delimited records JSON with integer coercion.

    Coerced values must land as JSON *numbers* ({"v": 5}, {"v": 5.5}),
    not strings — a typed Spark column can't mix long and double, so the
    record line is rendered via to_json and the strictly-numeric quoted
    values are unquoted per configured column."""
    out = df
    for c in numeric_cols:
        out = out.withColumn(c, int_coerced(F.col(c)))
    # ignoreNullFields=false: nulls must render as {"v": null}, not vanish
    # (pandas records-JSON keeps the key; consumers key on field presence)
    line = F.to_json(
        F.struct(*[F.col(c) for c in df.columns]),
        {"ignoreNullFields": "false"},
    )
    for c in numeric_cols:
        line = F.regexp_replace(line, f'"{re.escape(c)}":{_NUM_RE}', f'"{c}":$1')
    out.select(line.alias("value")).write.mode("overwrite").text(path)


def write_archive_csv(df: DataFrame, path: str) -> None:
    """Full-frame archive CSV (header, nulls empty like pandas)."""
    df.write.mode("overwrite").option("header", True).option(
        "emptyValue", ""
    ).csv(path)
