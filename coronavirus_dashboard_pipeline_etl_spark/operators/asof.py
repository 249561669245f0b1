"""Release-over-release (as-of) delta — the serving layer's
today-vs-previous-release self-join (SURVEY.md §2.3 J9:
``chunk_etl_postprocessing/vaccinations/queries.py:22-91``,
``testing/queries.py:3-105``).

The reference runs: today's snapshot LEFT JOIN yesterday's snapshot on
(area, metric), emitting ``CASE WHEN today - yesterday < 0 THEN 0 ELSE
today - yesterday END`` (publish-date "new" metrics derived from
cumulative ones).

Spark-first shape: one window over the release dimension (lag) — no
self-join, no second scan of the fact table.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def release_delta(
    df: DataFrame,
    group_keys: Sequence[str],
    release_col: str,
    value_col: str,
    out: str = "delta",
    clamp_negative: bool = True,
) -> DataFrame:
    """value - lag(value) per group ordered by release, clamped at 0."""
    w = Window.partitionBy(*group_keys).orderBy(release_col)
    delta = F.col(value_col) - F.lag(value_col).over(w)
    if clamp_negative:
        delta = F.greatest(delta, F.lit(0))
    return df.withColumn(out, delta)


def latest_two_releases_delta(
    df: DataFrame,
    group_keys: Sequence[str],
    release_col: str,
    value_col: str,
    out: str = "delta",
    clamp_negative: bool = True,
) -> DataFrame:
    """The exact reference query shape: per group, compare the newest
    release's value against the previous one; emit one row per group at
    the newest release. NULL previous -> today's value (LEFT JOIN
    semantics with COALESCE(yesterday, 0) in the reference)."""
    w = Window.partitionBy(*group_keys).orderBy(F.col(release_col).desc())
    ranked = df.withColumn("__rn", F.row_number().over(w))
    today = ranked.filter(F.col("__rn") == 1).drop("__rn")
    prev = (
        ranked.filter(F.col("__rn") == 2)
        .select(*group_keys, F.col(value_col).alias("__prev"))
    )
    joined = today.join(prev, on=list(group_keys), how="left")
    delta = F.col(value_col) - F.coalesce(F.col("__prev"), F.lit(0))
    if clamp_negative:
        delta = F.greatest(delta, F.lit(0))
    return joined.withColumn(out, delta).drop("__prev")
