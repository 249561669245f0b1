"""EP2 nested pathway — age-demographics / variants pipeline.

Reference ``run_demographics`` (``db_etl/etl.py:1190-1344``): a long-by-
nesting-value frame (age band or variant) is densified per (area, date,
nesting value), normalised, rate-enriched against the per-(areaCode, age)
population dimension, tail-masked, then collapsed to one row per
(area, date) with a list-of-dict cell (``db_etl/etl.py:1315-1320``).

Spark shape: the nested cell is a typed ``array<struct>`` built with
``sort_array(collect_list(struct(...)))`` — deterministic ordering, no
Python. Weekly variants use the Sunday-anchored scaffold
(``homogenise_demographics_dates`` frequency="W").
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

from collections.abc import Mapping

from ..config import RATE_PRECISION, TAIL_TRIM_DAYS
from ..operators import (
    calculate_sex_people_tested,
    enrich_nested_rates,
    homogenise_dates,
    nest_records,
    normalise_demographics_records,
)
from ..operators.rates import calculate_rates
from ..operators.trim import trim_end


def run_demographics(
    data: DataFrame,
    nesting_param: str,
    value_metrics: Sequence[str],
    out_col: str,
    population: DataFrame | None = None,
    rolling_rate: Sequence[str] = (),
    zero_filled: Sequence[str] = (),
    cumulative: Sequence[str] = (),
    frequency: str = "D",
    tail_mask: Sequence[str] = (),
    rate_precision: int | None = RATE_PRECISION,
) -> DataFrame:
    """data: (areaType, areaCode, areaName, date, <nesting_param>,
    metrics...); population (optional): (areaCode, <nesting_param>,
    population) for age rates.

    Returns one row per (areaType, areaCode, areaName, date) with
    ``out_col`` = sorted array<struct<{nesting_param}, metrics...>>.
    """
    # span="group": the reference runs ONE chunk per area
    # (etl.py:1285-1322), so each area's scaffold covers its OWN
    # [first, last] observed dates and its OWN nesting values — a
    # global scaffold would invent leading/trailing rows and bands the
    # reference never produces (found by the composed reference-exec
    # parity test, round 10)
    df = homogenise_dates(
        data,
        group_keys=("areaType", "areaCode"),
        frequency=frequency,
        extra_keys=(nesting_param,),
        span="group",
    )
    df = normalise_demographics_records(
        df,
        nesting_param=nesting_param,
        zero_filled=zero_filled,
        cumulative=cumulative,
    )
    if population is not None and rolling_rate:
        df = calculate_rates(
            df,
            population,
            rolling_rate=rolling_rate,
            group_keys=("areaType", "areaCode", nesting_param),
            join_keys=("areaCode", nesting_param),
            precision=rate_precision,
            # the AGE rate path has no live freshness mask
            # (calculate_age_rates: date > frame-max is inert, no
            # last-valid rule) — masking belongs to the flat path
            tail_rules=False,
        )
    if tail_mask:
        df = trim_end(df, tail_mask, TAIL_TRIM_DAYS)

    record_cols = [nesting_param, *value_metrics]
    if population is not None and rolling_rate:
        record_cols += [f"{m}RollingSum" for m in rolling_rate] + [
            f"{m}RollingRate" for m in rolling_rate
        ]
    record_cols = [c for c in record_cols if c in df.columns]

    # areaName rides along via first() — it is constant per area after
    # normalisation
    nested = nest_records(
        df,
        group_keys=["areaType", "areaCode", "date"],
        record_cols=record_cols,
        out=out_col,
        sort_key=nesting_param,
    )
    names = df.groupBy("areaType", "areaCode").agg(
        F.first("areaName", ignorenulls=True).alias("areaName")
    )
    return nested.join(F.broadcast(names), ["areaType", "areaCode"], "left").select(
        "areaType", "areaCode", "areaName", "date", out_col
    )


def run_pair_metrics(
    wide: DataFrame,
    population: DataFrame | None,
    pairs: Mapping[str, Sequence[str]],
    rate_enrich: Sequence[str] = (),
    **kwargs,
) -> DataFrame:
    """Post-nesting stage of the demographics pathway: once several
    ``run_demographics`` outputs are joined into one wide frame of
    nested cells, derive the paired metrics (reference
    ``calculate_sex_people_tested``, ``db_etl/etl.py:784-799`` — e.g.
    maleTested + femaleTested -> peopleTested with per-age rates) and
    rate-enrich any additional nested cells (``process_outlier``,
    ``db_etl/etl.py:678-711``).

    All map-side: broadcast population map + JVM HOFs, no shuffle on the
    wide frame.
    """
    wide = calculate_sex_people_tested(wide, population, pairs, **kwargs)
    if population is not None:
        for col in rate_enrich:
            wide = enrich_nested_rates(wide, col, population, **kwargs)
    return wide
