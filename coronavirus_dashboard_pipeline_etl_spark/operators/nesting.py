"""Nested-cell construction and payload wrapping.

* ``nest_records`` — the reference's
  ``groupby(keys).apply(lambda x: x[cols].to_dict("records"))``
  (``db_etl/etl.py:1315-1320``) building list-of-dict cells (age
  demographics / variants). Spark-native:
  ``groupBy(keys).agg(sort_array(collect_list(struct(...))))`` — typed
  ``ArrayType(StructType)`` end-to-end with deterministic ordering for
  golden comparison.
* ``flatten_nested_metrics`` — the inverse: nested age arrays ->
  flat suffixed metrics (``main_etl_nested_metrics_converter``).
* ``wrap_payload`` — scalar -> ``{"value": x}`` JSON payload cells
  (``db_etl_upload/uploader.py:501-508``); arrays pass through as JSON
  arrays. The serving store's JSONB ``payload`` column equivalent.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

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


def flatten_nested_metrics(
    df: DataFrame,
    age_metric_mapping: Mapping[str, Sequence[str]],
    nested_col: str = "payload",
    age_field: str = "age",
    metric_out: str = "metric",
    value_out: str = "value",
    suffix_mapping: Mapping[str, str] | None = None,
) -> DataFrame:
    """Nested age-array payload -> flat per-band metric rows.

    The inverse of ``nest_records``, mirroring the reference's
    nested-metrics converter
    (``main_etl_nested_metrics_converter/converter.py:226-283``): each
    array entry whose ``age`` is configured emits one row per configured
    metric, named ``metric + suffix`` where the suffix is the age band
    with ``+`` spelt out (``suffix_mapping`` at ``converter.py:70-74``,
    e.g. ``65+`` -> ``65plus``); entries with unknown/null ages are
    skipped (``converter.py:240-246``).

    Physically: a generated candidate array per row + one explode — a
    narrow map-side transform, no shuffle, no Python.
    """
    if suffix_mapping is None:
        suffix_mapping = {
            age: age.replace("+", "plus") for age in age_metric_mapping
        }
    entry = F.col("__entry")
    candidates = []
    for age, metric_names in age_metric_mapping.items():
        for m in metric_names:
            candidates.append(
                F.when(
                    entry[age_field] == age,
                    F.struct(
                        F.lit(m + suffix_mapping[age]).alias(metric_out),
                        entry[m].alias(value_out),
                    ),
                )
            )
    keep = [c for c in df.columns if c != nested_col]
    return (
        df.select(*keep, F.explode(nested_col).alias("__entry"))
        .select(
            *keep,
            F.explode(
                F.filter(F.array(*candidates), lambda x: x.isNotNull())
            ).alias("__flat"),
        )
        .select(*keep, f"__flat.{metric_out}", f"__flat.{value_out}")
    )


def wrap_payload(value: Column) -> Column:
    """Scalar value -> JSON object string ``{"value": <x>}``.

    A NULL value wraps as ``{"value":null}`` — the reference's
    ``convert_values`` (uploader.py:501-507) turns None into
    ``{"value": None}``, so the stored JSONB carries an explicit null
    member; ``to_json``'s default of OMITTING null fields would ship
    ``{}`` instead (found by the composed deploy-chain reference-exec
    test, round 10)."""
    return F.to_json(
        F.struct(value.alias("value")), {"ignoreNullFields": "false"}
    )


def wrap_payload_column(
    df: DataFrame, value_col: str = "payload", out: str | None = None
) -> DataFrame:
    return df.withColumn(out or value_col, wrap_payload(F.col(value_col)))
