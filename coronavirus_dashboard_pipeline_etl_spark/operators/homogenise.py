"""Date homogenisation — densify the (areaType, areaCode, date) panel so
every area carries every date in the observed global range.

Re-expresses ``db_etl/processors/homogenisation.py:29-130``: the reference
builds a cartesian scaffold DataFrame in driver memory (itertools.product
per areaType) and outer-merges. Here the scaffold is
``sequence(min_date, max_date, interval 1 day)`` exploded against the
distinct area keys — generated distributed, joined with the scaffold as
the left (preserved) side. Since the scaffold spans the global date range
and contains every area key present in the data, scaffold-LEFT-JOIN-data
is exactly the reference's outer merge.

Scale note: distinct-areas is a tiny frame (≤ ~7k keys for MSOA); the
scaffold (areas × dates) is at most a few million rows, built with one
shuffle for distinct(); the join against the fact table shuffles on the
same keys every downstream window uses, so AQE reuses the exchange.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import broadcast

from .util import with_scalar


def _date_scaffold(df: DataFrame, date_col: str, frequency: str) -> DataFrame:
    """1-column frame of all dates in [global min, global max].

    ``frequency`` 'D' = daily; 'W' = pandas ``date_range(freq="W")``
    parity: weekly anchored on Sundays, first Sunday >= min date
    (homogenise_demographics_dates, homogenisation.py:88-96).
    """
    bounds = df.agg(
        F.min(F.to_date(date_col)).alias("lo"), F.max(F.to_date(date_col)).alias("hi")
    )
    if frequency == "D":
        seq = F.sequence(F.col("lo"), F.col("hi"), F.expr("interval 1 day"))
    elif frequency == "W":
        first_sunday = F.when(
            F.dayofweek("lo") == 1, F.col("lo")
        ).otherwise(F.next_day("lo", "Sun"))
        seq = F.when(
            first_sunday <= F.col("hi"),
            F.sequence(first_sunday, F.col("hi"), F.expr("interval 7 days")),
        ).otherwise(F.array())
    else:  # pragma: no cover - config error
        raise ValueError(f"unsupported frequency {frequency!r}")
    return bounds.select(F.explode(seq).alias("__scaffold_date"))


def homogenise_dates(
    df: DataFrame,
    group_keys: Sequence[str] = ("areaType", "areaCode"),
    date_col: str = "date",
    frequency: str = "D",
    extra_keys: Sequence[str] = (),
) -> DataFrame:
    """Densify to one row per (group keys [, extra nesting keys], date).

    ``extra_keys`` reproduces ``homogenise_demographics_dates``: the
    scaffold is additionally crossed with the distinct values of the
    nesting parameter (age band / variant), homogenisation.py:97-113.
    Dates are kept as ISO strings at the edges (the reference's wire
    format).
    """
    keys = list(group_keys)
    areas = df.select(*keys).distinct()
    dates = _date_scaffold(df, date_col, frequency)
    scaffold = areas.crossJoin(broadcast(dates))
    for k in extra_keys:
        scaffold = scaffold.crossJoin(broadcast(df.select(k).distinct()))
    scaffold = scaffold.withColumn(
        date_col, F.date_format("__scaffold_date", "yyyy-MM-dd")
    ).drop("__scaffold_date")

    # full outer = the reference's outer merge: for frequency='D' the
    # scaffold is a superset of the data keys so this degenerates to a left
    # join; for 'W' it also preserves any non-Sunday-aligned input rows.
    join_keys = [*keys, *extra_keys, date_col]
    out = scaffold.join(df, on=join_keys, how="full_outer")
    return out.select(*join_keys, *[c for c in df.columns if c not in join_keys])
