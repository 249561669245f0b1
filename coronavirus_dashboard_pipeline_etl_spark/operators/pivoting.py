"""Wide<->long reshaping: melt (P7) and pivot (P8).

* melt — ``db_etl_upload/uploader.py:613-618``: wide metric columns ->
  ``(id_vars..., metric, payload)`` long rows. Spark's native
  ``DataFrame.melt`` (Spark 3.4+) compiles to a single generator
  (Expand) — no shuffle at all.
* pivot — ``db_etl/etl.py:897-902``: ``pivot_table(values, index=keys,
  columns=category, aggfunc=max)``. ``groupBy(keys).pivot(category)
  .agg(max)`` with an explicit values list so Spark skips the extra
  distinct-values job (two jobs -> one at scale).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def melt(
    df: DataFrame,
    id_vars: Sequence[str],
    value_vars: Sequence[str] | None = None,
    var_name: str = "metric",
    value_name: str = "payload",
) -> DataFrame:
    value_vars = list(
        value_vars
        if value_vars is not None
        else [c for c in df.columns if c not in id_vars]
    )
    return df.melt(
        ids=list(id_vars),
        values=value_vars,
        variableColumnName=var_name,
        valueColumnName=value_name,
    )


def pivot_max(
    df: DataFrame,
    index: Sequence[str],
    column: str,
    value: str,
    values: Sequence[str] | None = None,
) -> DataFrame:
    """pivot_table(..., aggfunc=max) parity (dedups duplicate cells)."""
    grouped = df.groupBy(*index)
    pivoted = grouped.pivot(column, list(values)) if values else grouped.pivot(column)
    return pivoted.agg(F.max(F.col(value)))
