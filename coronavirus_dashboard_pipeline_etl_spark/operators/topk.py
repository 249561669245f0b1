"""Rank-latest / top-k-per-group helpers — the serving layer's
``RANK() OVER (... ORDER BY date DESC) = 1`` idiom (SURVEY.md §2.5 W7,
§2.4 A12: ``main_etl_nested_metrics_converter/queries.py:22-56``,
``rate_scales_worker/queries.py:23-30``, cache/percentile/report queries).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def latest_per_group(
    df: DataFrame,
    group_keys: Sequence[str],
    order_col: str = "date",
    k: int = 1,
    rank_col: str | None = None,
) -> DataFrame:
    """Keep the k most recent rows per group (row_number semantics).

    Scale note: this is the classic top-k-per-group; Spark plans it as one
    exchange + in-partition sort with a rank filter pushed into the sort
    (TakeOrderedAndProject when k is small and grouping is absent).
    """
    w = Window.partitionBy(*group_keys).orderBy(F.col(order_col).desc())
    out = df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= k)
    if rank_col:
        return out.withColumnRenamed("__rn", rank_col)
    return out.drop("__rn")


def latest_date_only(
    df: DataFrame, scope_keys: Sequence[str] = (), date_col: str = "date"
) -> DataFrame:
    """Restrict to rows at the max date (the SQL
    ``date IN (SELECT MAX(date) ...)`` membership idiom, J10)."""
    if not scope_keys:
        mx = df.agg(F.max(date_col).alias("__mx"))
        return (
            df.join(F.broadcast(mx), on=df[date_col] == mx["__mx"], how="inner")
            .drop("__mx")
        )
    w = Window.partitionBy(*scope_keys)
    return (
        df.withColumn("__mx", F.max(date_col).over(w))
        .filter(F.col(date_col) == F.col("__mx"))
        .drop("__mx")
    )
