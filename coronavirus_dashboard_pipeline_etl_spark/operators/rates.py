"""Per-100k rate calculation against broadcast population dimensions.

Re-expresses ``db_etl/processors/generic_rate.py:30-135``
(``calculate_rates``) and ``:138-228`` (``calculate_age_rates``):

* RollingSum = pandas rolling(7).sum() parity (see operators.rolling),
* RollingRate = round(RollingSum / population * 100_000, 1),
* tail rule: metrics named *SpecimenDate*/*DeathDate* are masked where
  date > global_max_date - 5d; all others where date > the metric's
  global last valid raw date,
* incidence rate = round(value / population * 100_000, 1) — no window.

The population frame is a few-thousand-row dimension: always broadcast
(J2 in SURVEY.md §2.3). At 100 TB of panel rows this join never shuffles
the fact side.
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping, Sequence

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
from .rolling import rolling_sum_col


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
    last_valid: Mapping[str, str] | None = None,
    tail_rules: bool = True,
    frame_keys: Sequence[str] | None = None,
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

    Leading-edge parity: the reference re-aggregates the rolling sum
    through a one-row-per-key ``groupby().sum()`` whose default
    ``min_count=0`` coerces every NaN rolling sum to 0.0
    (generic_rate.py:88-96) — so it PUBLISHES 0 for each area's first 6
    days (and any sub-7-observation window). We coalesce the guarded
    sum to a typed zero to match. Tail parity: non-event metrics are
    masked after the metric's GLOBAL last valid date — one scalar over
    the whole frame (generic_rate.py:113-117), not a per-area max — so
    areas that stop reporting early keep their trailing rolling values
    exactly like the reference.

    ``frame_keys`` scopes the tail-rule scalars (event cutoff and
    per-metric last-valid dates) PER GROUP instead of over the whole
    frame: the reference's main chain runs on one (areaType, areaCode)
    chunk per call (retrieve.py:147-163), so its ``d.date.max()`` /
    ``dropna().date.max()`` are that AREA's own dates. The default
    (None, whole-frame scalars) is the FUNCTION's verbatim behavior on
    a multi-area frame — composition layers that reproduce the
    per-chunk fan-out pass the chunk keys (found by the per-area
    composed reference-exec parity test, round 10).

    ``tail_rules=False`` reproduces the AGE path (calculate_age_rates,
    generic_rate.py:139-214), which has NO live freshness mask: its
    ``date > max_date`` guard is inert (callers pass the frame max) and
    it has no last-valid rule — both masks above belong to the FLAT
    path only (established by the composed demographics reference-exec
    parity test, round 10).

    The whole-frame scalars (event cutoff, per-metric last valid dates)
    are an aggregate branch over the upstream subtree — a second pass.
    At scale, pass ``last_valid`` (metric -> ISO date, and the key
    ``"__max_date"`` for the event cutoff when event-dated metrics are
    configured) to skip that pass entirely — the same explicit-cutoff
    fast path ``trim_end`` has.
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
    dtypes = dict(df.dtypes)

    def raw(m: str) -> F.Column:
        keep_exact = dtypes.get(m, "").startswith("decimal")
        return F.col(m) if keep_exact else F.col(m).cast("double")

    def is_event(m: str) -> bool:
        return "SpecimenDate" in m or "DeathDate" in m

    # All whole-frame scalars in ONE aggregate + ONE broadcast cross join
    # (a per-metric with_scalar would cross-join once per metric): the
    # event-dated cutoff, plus each non-event metric's global last valid
    # raw date (generic_rate.py:113-117 — dropna().date.max() over the
    # whole frame, NOT per area).
    known = last_valid or {}
    if frame_keys is not None and tail_rules:
        # per-chunk scalars as window maxes — no aggregate branch, no
        # cross join; the window rides the existing key partitioning
        w_frame = Window.partitionBy(*frame_keys)
        scalar_cols: list = []
        max_date = (
            F.lit(known["__max_date"])
            if "__max_date" in known
            else F.max(date_col).over(w_frame)
        )
        event_cutoff = F.date_format(
            F.date_sub(F.to_date(max_date), TAIL_TRIM_DAYS), "yyyy-MM-dd"
        )

        def last_valid_col(m: str) -> F.Column:
            if m in known:
                return F.lit(known[m])
            return F.max(
                F.when(raw(m).isNotNull(), F.col(date_col))
            ).over(w_frame)

        return _rates_stages(
            df, rolling_rate, incidence_rate, dtypes, raw, is_event,
            w_roll, rate_per_n, precision, tail_rules, event_cutoff,
            last_valid_col, date_col, scalar_cols,
        )
    scalar_aggs = []
    # ``tail_rules=False`` reproduces the AGE path (calculate_age_rates,
    # generic_rate.py:139-214): its only mask is ``date > max_date``
    # with max_date = the frame max — inert — and it has no last-valid
    # rule either; both freshness masks belong to the FLAT path only
    # (found by the composed demographics reference-exec test, round 10)
    if tail_rules and any(is_event(m) for m in rolling_rate) and "__max_date" not in known:
        scalar_aggs.append(F.max(date_col).alias("__max_date"))
    for m in rolling_rate:
        if tail_rules and not is_event(m) and m not in known:
            scalar_aggs.append(
                F.max(F.when(raw(m).isNotNull(), F.col(date_col))).alias(
                    f"__last_{m}"
                )
            )
    scalar_cols = []
    if scalar_aggs:
        scalars = df.agg(*scalar_aggs)
        scalar_cols = scalars.columns
        df = df.crossJoin(broadcast(scalars))
    if tail_rules:
        max_date = (
            F.lit(known["__max_date"])
            if "__max_date" in known
            else F.col("__max_date")
        )
        event_cutoff = F.date_format(
            F.date_sub(F.to_date(max_date), TAIL_TRIM_DAYS), "yyyy-MM-dd"
        )

    def last_valid_col(m: str) -> F.Column:
        return F.lit(known[m]) if m in known else F.col(f"__last_{m}")

    return _rates_stages(
        df, rolling_rate, incidence_rate, dtypes, raw, is_event,
        w_roll, rate_per_n, precision, tail_rules,
        event_cutoff if tail_rules else None,
        last_valid_col, date_col, scalar_cols,
    )


def _rates_stages(
    df, rolling_rate, incidence_rate, dtypes, raw, is_event, w_roll,
    rate_per_n, precision, tail_rules, event_cutoff, last_valid_col,
    date_col, scalar_cols,
):
    """Shared tail of ``calculate_rates``: one projection for all
    sums+rates, one for all tail masks (the mask must observe the
    computed columns). The caller decides HOW the tail-rule scalars are
    derived (whole-frame aggregate + cross join, per-chunk window
    maxes, or caller-supplied literals) — the stage arithmetic is
    identical for every scoping."""
    stage1: dict[str, F.Column] = {}
    for m in rolling_rate:
        rsum = f"{m}{SUFFIX_ROLLING_SUM}"
        guarded = rolling_sum_col(raw(m), w_roll)
        # min_count=0 coercion: NaN windows publish as typed zero
        keep_exact = dtypes.get(m, "").startswith("decimal")
        zero = F.lit(0).cast(dtypes[m]) if keep_exact else F.lit(0.0)
        stage1[rsum] = F.coalesce(guarded, zero)
    for m in incidence_rate:
        inc = F.col(m).cast("double") / F.col("population") * rate_per_n
        stage1[f"{m}Rate"] = inc if precision is None else F.round(inc, precision)
    df = df.withColumns(stage1)

    stage2: dict[str, F.Column] = {}
    for m in rolling_rate:
        rsum = f"{m}{SUFFIX_ROLLING_SUM}"
        rrate = f"{m}{SUFFIX_ROLLING_RATE}"
        rate = F.col(rsum).cast("double") / F.col("population") * rate_per_n
        rate = rate if precision is None else F.round(rate, precision)
        if not tail_rules:
            stage2[rrate] = rate
            continue
        # tail freshness rule (generic_rate.py:107-117)
        if is_event(m):
            stale = F.col(date_col) > event_cutoff
        else:
            stale = F.col(date_col) > last_valid_col(m)
        stage2[rsum] = F.when(stale, F.lit(None)).otherwise(F.col(rsum))
        stage2[rrate] = F.when(stale, F.lit(None)).otherwise(rate)
    df = df.withColumns(stage2)

    return df.drop("population", *scalar_cols)


def age_standardised_rate(
    df: DataFrame,
    rate_col: str,
    std_weights: dict[str, float],
    group_keys: Sequence[str] = ("areaType", "areaCode", "date"),
    age_col: str = "age",
    out: str = "asr",
) -> DataFrame:
    """Direct age standardisation: the weighted mean of per-band rates
    under a STANDARD population's weights — the comparable-across-areas
    rate every public-health dashboard quotes next to the crude rate
    (the natural extension of the per-band rate path,
    ``db_etl/etl.py:678-711`` / calculate_age_rates).

    ``std_weights`` maps age band -> standard-population weight (e.g.
    the European Standard Population shares). Bands missing a rate
    contribute nothing (their weight is excluded from the denominator
    — the partial-coverage convention), so ASR is NULL only when no
    band reported.

    Exactness: weights enter as DECIMAL(18,6) literals and rates cast
    to DECIMAL(18,6); both sums are decimal (associative, any
    partition order), with ONE double division at the end. One groupBy
    shuffle on ``group_keys``.
    """
    wexpr = None
    for band, wgt in sorted(std_weights.items()):
        c = F.when(F.col(age_col) == band, F.lit(wgt).cast("decimal(18,6)"))
        wexpr = c if wexpr is None else wexpr.when(
            F.col(age_col) == band, F.lit(wgt).cast("decimal(18,6)")
        )
    w = wexpr  # NULL for unknown bands -> excluded from both sums
    r = F.col(rate_col).cast("decimal(18,6)")
    valid = w.isNotNull() & r.isNotNull()
    num = F.sum(F.when(valid, w * r)).cast("double")
    den = F.sum(F.when(valid, w)).cast("double")
    return df.groupBy(*group_keys).agg(
        (num / den).alias(out),
        F.count(F.when(valid, 1)).cast("long").alias("n_bands"),
    )
