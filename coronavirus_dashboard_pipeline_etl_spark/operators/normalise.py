"""Record normalisation: bounded zero-fill, bounded forward-fill, and
areaName propagation.

Re-expresses ``db_etl/processors/normalisation.py:26-147`` — which loops
per areaCode in Python — as three window expressions over a single
``partitionBy(areaCode [, nesting]) orderBy(date)`` exchange. The
reference's per-area Python loop is O(areas × rows); this is one pass.

pandas-parity notes:

* Fill bounds are *strict* on the upper end: rows are filled only where
  ``min_valid_date <= date < max_valid_date`` (``normalisation.py:58-66``).
  The row at ``max_valid_date`` is non-null by construction so the strict
  bound is observable only for rows *after* the last valid date — they
  stay null.
* ``areaName`` is propagated from the first non-null name per areaCode in
  date order (``normalisation.py:70-73``).
* Groups are keyed by ``areaCode`` alone (not areaType) — matching
  ``d.areaCode == areaCode`` exactly.
* ``areaNameLower`` is appended when areaName exists
  (``normalisation.py:88-89``).
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

from pyspark.sql import DataFrame, Window, functions as F

from .util import with_scalar


def _valid_bounds(col: str, w_group):
    """min/max date over the rows where `col` is non-null, per group."""
    valid_date = F.when(F.col(col).isNotNull(), F.col("date"))
    return F.min(valid_date).over(w_group), F.max(valid_date).over(w_group)


def normalise_records(
    df: DataFrame,
    zero_filled: Iterable[str] = (),
    cumulative: Iterable[str] = (),
    group_keys: Sequence[str] = ("areaCode",),
    date_col: str = "date",
) -> DataFrame:
    """Bounded zero-fill + bounded ffill + areaName propagation.

    Mirrors ``normalise_records`` (normalisation.py:26-89).
    """
    zero_filled = sorted(set(zero_filled) & set(df.columns))
    cumulative = sorted(set(cumulative) & set(df.columns))

    keys = list(group_keys)
    w_group = Window.partitionBy(*keys)
    w_ffill = (
        Window.partitionBy(*keys)
        .orderBy(date_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_first = (
        Window.partitionBy(*keys)
        .orderBy(date_col)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )

    for col in zero_filled:
        lo, hi = _valid_bounds(col, w_group)
        # typed zero: lit(0.0) would coerce DECIMAL metric columns to
        # double and silently lose exact arithmetic downstream
        zero = F.lit(0).cast(df.schema[col].dataType)
        df = df.withColumn(
            col,
            F.when(
                F.col(col).isNull()
                & (F.col(date_col) >= lo)
                & (F.col(date_col) < hi),
                zero,
            ).otherwise(F.col(col)),
        )

    if "areaName" in df.columns:
        df = df.withColumn(
            "areaName", F.first("areaName", ignorenulls=True).over(w_first)
        )

    for col in cumulative:
        lo, hi = _valid_bounds(col, w_group)
        df = df.withColumn(
            col,
            F.when(
                F.col(col).isNull()
                & (F.col(date_col) >= lo)
                & (F.col(date_col) < hi),
                F.last(F.col(col), ignorenulls=True).over(w_ffill),
            ).otherwise(F.col(col)),
        )

    if "areaName" in df.columns:
        df = df.withColumn("areaNameLower", F.lower(F.col("areaName")))

    return df


def normalise_demographics_records(
    df: DataFrame,
    nesting_param: str,
    zero_filled: Iterable[str] = (),
    cumulative: Iterable[str] = (),
    date_col: str = "date",
) -> DataFrame:
    """Nested-path normalisation (``normalisation.py:97-147``).

    Differences from the flat path, per the reference:
    * zero-filled metrics are blanket zero-filled (no bounds);
    * cumulative metrics are zero-seeded at the global min date so all
      bands share a starting point, then ffilled within the valid range
      per (areaCode, nesting value).
    """
    zero_filled = sorted(set(zero_filled) & set(df.columns))
    cumulative = sorted(set(cumulative) & set(df.columns))

    for col in zero_filled:
        zero = F.lit(0).cast(df.schema[col].dataType)
        df = df.withColumn(col, F.coalesce(F.col(col), zero))

    if "areaName" in df.columns:
        w_area = (
            Window.partitionBy("areaCode")
            .orderBy(date_col)
            .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        )
        df = df.withColumn(
            "areaName", F.first("areaName", ignorenulls=True).over(w_area)
        )

    if cumulative:
        # zero-seed the first date across all bands (normalisation.py:128-133)
        df = with_scalar(df, "__global_min_date", F.min(date_col))
        for col in cumulative:
            zero = F.lit(0).cast(df.schema[col].dataType)
            df = df.withColumn(
                col,
                F.when(
                    (F.col(date_col) == F.col("__global_min_date"))
                    & F.col(col).isNull(),
                    zero,
                ).otherwise(F.col(col)),
            )
        df = df.drop("__global_min_date")

        keys = ["areaCode", nesting_param]
        w_group = Window.partitionBy(*keys)
        w_ffill = (
            Window.partitionBy(*keys)
            .orderBy(date_col)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        for col in cumulative:
            lo, hi = _valid_bounds(col, w_group)
            df = df.withColumn(
                col,
                F.when(
                    F.col(col).isNull()
                    & (F.col(date_col) >= lo)
                    & (F.col(date_col) < hi),
                    F.last(F.col(col), ignorenulls=True).over(w_ffill),
                ).otherwise(F.col(col)),
            )

    if "areaName" in df.columns:
        df = df.withColumn("areaNameLower", F.lower(F.col("areaName")))

    return df
