"""Per-100k rate calculation against broadcast population dimensions.

Re-expresses ``db_etl/processors/generic_rate.py:30-135``
(``calculate_rates``) and ``:138-228`` (``calculate_age_rates``):

* RollingSum = pandas rolling(7).sum() parity (see operators.rolling),
* RollingRate = round(RollingSum / population * 100_000, 1),
* tail rule: metrics named *SpecimenDate*/*DeathDate* are masked where
  date > global_max_date - 5d; all others where date > their own last
  valid raw date,
* incidence rate = round(value / population * 100_000, 1) — no window.

The population frame is a few-thousand-row dimension: always broadcast
(J2 in SURVEY.md §2.3). At 100 TB of panel rows this join never shuffles
the fact side.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.functions import broadcast

from ..config import (
    RATE_PER,
    RATE_PRECISION,
    ROLLING_WINDOW,
    SUFFIX_ROLLING_RATE,
    SUFFIX_ROLLING_SUM,
    TAIL_TRIM_DAYS,
)
from .util import with_scalar


def calculate_rates(
    df: DataFrame,
    population: DataFrame,
    rolling_rate: Iterable[str] = (),
    incidence_rate: Iterable[str] = (),
    group_keys: Sequence[str] = ("areaType", "areaCode"),
    join_keys: Sequence[str] = ("areaCode",),
    date_col: str = "date",
    rate_per_n: int = RATE_PER,
    precision: int | None = RATE_PRECISION,
) -> DataFrame:
    """Add {m}RollingSum/{m}RollingRate and {m}Rate columns.

    ``population`` must carry ``join_keys`` + a ``population`` column.
    For the age-demographics variant pass group_keys=("areaType",
    "areaCode","age"), join_keys=("areaCode","age")
    (generic_rate.py:180-199).

    ``precision=None`` skips the reference's round-to-1dp — used by the
    cross-engine gate (decimal-rounding of doubles differs per engine)
    and callers that round at the edge. Decimal-typed metrics keep exact
    decimal rolling sums (associative => partition-order independent);
    rates always compute in IEEE double with a fixed (sum / pop) * per_n
    operation order.
    """
    rolling_rate = sorted(set(rolling_rate) & set(df.columns))
    incidence_rate = sorted(set(incidence_rate) & set(df.columns))
    if not rolling_rate and not incidence_rate:
        return df

    df = df.join(
        broadcast(population.select(*join_keys, "population")),
        on=list(join_keys),
        how="left",
    )

    keys = list(group_keys)
    w_roll = (
        Window.partitionBy(*keys)
        .orderBy(date_col)
        .rowsBetween(-(ROLLING_WINDOW - 1), 0)
    )
    w_all = Window.partitionBy(*keys)
    dtypes = dict(df.dtypes)

    # The global-max-date cutoff is only consulted for event-dated metrics;
    # computing it costs a second pass over the upstream subtree (the
    # scalar branch re-executes the fact scan), so skip it entirely when no
    # configured metric is event-dated.
    needs_cutoff = any("SpecimenDate" in m or "DeathDate" in m for m in rolling_rate)
    if needs_cutoff:
        df = with_scalar(df, "__max_date", F.max(date_col))
        event_cutoff = F.date_format(
            F.date_sub(F.to_date("__max_date"), TAIL_TRIM_DAYS), "yyyy-MM-dd"
        )

    for m in rolling_rate:
        rsum = f"{m}{SUFFIX_ROLLING_SUM}"
        rrate = f"{m}{SUFFIX_ROLLING_RATE}"
        keep_exact = dtypes.get(m, "").startswith("decimal")
        raw = F.col(m) if keep_exact else F.col(m).cast("double")
        rate = F.col(rsum).cast("double") / F.col("population") * rate_per_n
        df = df.withColumn(
            rsum,
            F.when(
                F.count(raw).over(w_roll) == ROLLING_WINDOW, F.sum(raw).over(w_roll)
            ),
        ).withColumn(
            rrate, rate if precision is None else F.round(rate, precision)
        )

        # tail freshness rule (generic_rate.py:107-117)
        if "SpecimenDate" in m or "DeathDate" in m:
            stale = F.col(date_col) > event_cutoff
        else:
            last_raw = F.max(F.when(raw.isNotNull(), F.col(date_col))).over(w_all)
            stale = F.col(date_col) > last_raw
        for c in (rsum, rrate):
            df = df.withColumn(c, F.when(stale, F.lit(None)).otherwise(F.col(c)))

    for m in incidence_rate:
        inc = F.col(m).cast("double") / F.col("population") * rate_per_n
        df = df.withColumn(
            f"{m}Rate", inc if precision is None else F.round(inc, precision)
        )

    drop = ["population"] + (["__max_date"] if needs_cutoff else [])
    return df.drop(*drop)
