"""Nested-cell construction and payload wrapping.

* ``nest_records`` — the reference's
  ``groupby(keys).apply(lambda x: x[cols].to_dict("records"))``
  (``db_etl/etl.py:1315-1320``) building list-of-dict cells (age
  demographics / variants). Spark-native:
  ``groupBy(keys).agg(sort_array(collect_list(struct(...))))`` — typed
  ``ArrayType(StructType)`` end-to-end with deterministic ordering for
  golden comparison.
* ``wrap_payload`` — scalar -> ``{"value": x}`` JSON payload cells
  (``db_etl_upload/uploader.py:501-508``); arrays pass through as JSON
  arrays. The serving store's JSONB ``payload`` column equivalent.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def nest_records(
    df: DataFrame,
    group_keys: Sequence[str],
    record_cols: Sequence[str],
    out: str,
    sort_key: str | None = None,
) -> DataFrame:
    """One row per group with an array<struct> column of the records.

    ``sort_key`` must be a member of ``record_cols``; placing it first in
    the struct makes ``sort_array`` order by it (struct comparison is
    field-order lexicographic).
    """
    cols = list(record_cols)
    if sort_key:
        cols = [sort_key] + [c for c in cols if c != sort_key]
    rec = F.struct(*[F.col(c) for c in cols])
    return df.groupBy(*group_keys).agg(F.sort_array(F.collect_list(rec)).alias(out))


def wrap_payload(value: Column) -> Column:
    """Scalar value -> JSON object string ``{"value": <x>}``."""
    return F.to_json(F.struct(value.alias("value")))


def wrap_payload_column(
    df: DataFrame, value_col: str = "payload", out: str | None = None
) -> DataFrame:
    return df.withColumn(out or value_col, wrap_payload(F.col(value_col)))
