"""Rolling-window metric family: RollingSum / Change / Direction /
ChangePercentage (+ small-count pre-suppression).

Re-expresses the reference's pandas pipeline
(``db_etl/processors/rolling.py:65-231`` — ``change_by_sum``,
``calculate_percentage_change``, ``replace_all_zero``, ``get_directions``)
as pure Spark window expressions. No UDFs: every edge case is a ``when``
chain, so the whole family stays inside WholeStageCodegen and shuffles
exactly once per group-key set (all windows share one
``partitionBy(areaType, areaCode) orderBy(date)`` exchange).

pandas-parity notes (the hard part, SURVEY.md §7):

* ``rolling(7).sum()`` defaults to ``min_periods=7`` *counting non-null
  observations*: the result is null unless all 7 rows exist AND are
  non-null.  → ``count(col) over (rows 6 preceding) == 7`` guard.
* ``rolling(8).apply(pct_change)`` likewise needs 8 non-null rows.
* ``replace_all_zero``: if a group's rolling-sum column sums to 0, the
  whole group becomes null (``rolling.py:58-62``).
* ``calculate_percentage_change`` (``rolling.py:65-77``):
  cur = window[7], prev = window[0];
  ``cur == 0 and prev > 0``            -> -100
  ``fraction = cur / (prev or 1) - 1`` (prev==0 -> divide by 1)
  ``fraction == -1``                   -> 0
  else ``fraction * 100`` rounded to 1 dp.
* masking order (``rolling.py:100-231``): min-sum substitution happens
  *before* the zero-group/diff/pct steps; rows where the raw metric is
  null get all four derived columns nulled; rows where the (substituted)
  rolling sum equals ``min_sum_sub`` get the derived columns *and the raw
  metric* nulled (MSOA small-count suppression,
  ``msoa_etl_db/processor.py:279-281``).
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

from ..config import (
    CHANGE_PERIOD,
    GROUP_KEYS,
    ROLLING_WINDOW,
    SUFFIX_CHANGE,
    SUFFIX_CHANGE_PERCENTAGE,
    SUFFIX_DIRECTION,
    SUFFIX_ROLLING_SUM,
)


def rolling_sum_col(col, w_rows) -> Column:
    """pandas ``rolling(n).sum()`` with default min_periods=n — the
    count-guarded windowed sum. THE single definition of the guard:
    ``change_by_sum`` and ``rates.calculate_rates`` both build on it,
    so a future change to the min_periods semantics lands everywhere
    at once instead of drifting across inline copies."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(
        F.count(c).over(w_rows) == ROLLING_WINDOW,
        F.sum(c).over(w_rows),
    )


def direction_col(change: Column) -> Column:
    """Sign of the 7-day change -> UP/DOWN/SAME (rolling.py:51-55)."""
    return (
        F.when(change < 0, F.lit("DOWN"))
        .when(change > 0, F.lit("UP"))
        .when(change == 0, F.lit("SAME"))
    )


def percentage_change_col(cur: Column, prev: Column, precision: int | None = 1) -> Column:
    """``calculate_percentage_change`` (rolling.py:65-77) as one expression.

    The division runs in IEEE double (cast from whatever exact type the
    rolling sum carries) — deterministic across engines. ``precision``
    mirrors the reference's ``.round(1)``; pass None to skip rounding
    (the gate queries do, for bit-exact oracle comparison).
    """
    cur_d, prev_d = cur.cast("double"), prev.cast("double")
    denom = F.when(prev_d != 0, prev_d).otherwise(F.lit(1.0))
    fraction = cur_d / denom - F.lit(1.0)
    pct = fraction * 100
    if precision is not None:
        pct = F.round(pct, precision)
    return (
        F.when((cur_d == 0) & (prev_d > 0), F.lit(-100.0))
        .when(fraction == -1, F.lit(0.0))
        .otherwise(pct)
    )


def change_by_sum(
    df: DataFrame,
    metrics: Iterable[str],
    group_keys: Sequence[str] = tuple(GROUP_KEYS),
    date_col: str = "date",
    min_sum_allowed: float | None = None,
    min_sum_sub: float | None = None,
    pct_precision: int | None = 1,
) -> DataFrame:
    """Add ``{m}RollingSum/Change/Direction/ChangePercentage`` per metric.

    One shuffle total: all four derived columns per metric ride the same
    window exchange, and all metrics share it too (same partition keys),
    so Catalyst plans a single sort + exchange regardless of how many
    metrics are configured — at 100 TB this is the difference between 1
    and ~120 shuffles.

    Plan-size note: the whole family is built in FOUR projections total
    (one ``withColumns`` per dependency stage — the stages exist only
    because window functions cannot nest), not ~10 chained
    ``withColumn`` per metric: at the reference's real ~120-metric width
    a chained build produces a 1000+-node plan whose analysis time
    dominates small batches.

    Numeric note: the reference does ``astype(float)`` first; we keep
    DECIMAL inputs as decimals instead so the rolling/cumulative sums are
    exact (associativity makes the result independent of partition
    evaluation order — required for the duckdb gate, and simply better
    arithmetic). Double inputs behave exactly like the reference.
    """
    metrics = sorted(set(metrics) & set(df.columns))
    if not metrics:
        return df
    dtypes = dict(df.dtypes)

    keys = list(group_keys)
    w = Window.partitionBy(*keys).orderBy(date_col)
    w_roll = w.rowsBetween(-(ROLLING_WINDOW - 1), 0)
    w_all = Window.partitionBy(*keys)

    def names(m: str) -> tuple[str, str, str, str]:
        return (
            f"{m}{SUFFIX_ROLLING_SUM}",
            f"{m}{SUFFIX_CHANGE}",
            f"{m}{SUFFIX_DIRECTION}",
            f"{m}{SUFFIX_CHANGE_PERCENTAGE}",
        )

    def raw(m: str) -> Column:
        keep_exact = dtypes.get(m, "").startswith("decimal")
        return F.col(m) if keep_exact else F.col(m).cast("double")

    # stage 1 — guarded rolling sum (+ min-sum substitution BEFORE the
    # zero-group/diff/pct steps, rolling.py:126-128). A metric whose
    # RollingSum column ALREADY exists (calculate_rates ran first) keeps
    # it untouched — the reference's `if rolling_sum not in data.columns`
    # guard (rolling.py:131-163): the pre-existing sum carries the rate
    # path's 0-coerced leading windows, and the substitution only applies
    # on the fresh-computation path.
    stage1: dict[str, Column] = {}
    for m in metrics:
        if names(m)[0] in df.columns:
            continue
        rsum_expr = rolling_sum_col(raw(m), w_roll)
        if min_sum_allowed is not None:
            rsum_expr = F.when(
                rsum_expr < F.lit(min_sum_allowed), F.lit(float(min_sum_sub))
            ).otherwise(rsum_expr)
        stage1[names(m)[0]] = rsum_expr
    if stage1:
        df = df.withColumns(stage1)

    # stage 2 — replace_all_zero: group whose rolling sums total 0 -> null
    df = df.withColumns(
        {
            names(m)[0]: F.when(
                F.sum(F.col(names(m)[0])).over(w_all) == 0, F.lit(None)
            ).otherwise(F.col(names(m)[0]))
            for m in metrics
        }
    )

    # stage 3 — change / direction / pct over the gated rolling sum
    stage3: dict[str, Column] = {}
    for m in metrics:
        rsum, chg, dirn, pct = names(m)
        change = F.col(rsum) - F.lag(rsum, CHANGE_PERIOD).over(w)
        prev = F.lag(rsum, ROLLING_WINDOW).over(w)
        pct_guard = F.count(F.col(rsum)).over(w.rowsBetween(-ROLLING_WINDOW, 0))
        stage3[chg] = change
        stage3[dirn] = direction_col(change)
        stage3[pct] = F.when(
            pct_guard == ROLLING_WINDOW + 1,
            percentage_change_col(F.col(rsum), prev, pct_precision),
        )
    df = df.withColumns(stage3)

    # stage 4 — row-level gates: raw-null rows carry no derived stats
    # (rolling.py:216-219); substituted rows null everything incl. the
    # raw metric (MSOA suppression, rolling.py:222-231)
    stage4: dict[str, Column] = {}
    for m in metrics:
        rsum, chg, dirn, pct = names(m)
        raw_null = raw(m).isNull()

        def gate(c: Column) -> Column:
            return F.when(raw_null, F.lit(None)).otherwise(c)

        rsum_f = gate(F.col(rsum))
        chg_f, dirn_f, pct_f = gate(F.col(chg)), gate(F.col(dirn)), gate(F.col(pct))
        if min_sum_allowed is not None:
            suppressed = rsum_f == F.lit(float(min_sum_sub))

            def sup(c: Column) -> Column:
                return F.when(suppressed, F.lit(None)).otherwise(c)

            stage4[m] = sup(F.col(m))
            rsum_f, chg_f = sup(rsum_f), sup(chg_f)
            dirn_f, pct_f = sup(dirn_f), sup(pct_f)
        stage4[rsum], stage4[chg] = rsum_f, chg_f
        stage4[dirn], stage4[pct] = dirn_f, pct_f
    return df.withColumns(stage4)


def rolling_mean_centered(
    df: DataFrame,
    col: str,
    out: str,
    group_keys: Sequence[str] = tuple(GROUP_KEYS),
    date_col: str = "date",
    window: int = 7,
) -> DataFrame:
    """Centered rolling mean for viz smoothing
    (``db_etl_homepage_graphs/utils.py:105`` — ``rolling(7, center=True).mean()``).

    pandas centering for window=7 is rows [-3, +3]; min_periods defaults
    to the window, so require 7 non-null observations.
    """
    half = window // 2
    w = (
        Window.partitionBy(*group_keys)
        .orderBy(date_col)
        .rowsBetween(-half, window - half - 1)
    )
    return df.withColumn(
        out,
        F.when(F.count(F.col(col)).over(w) == window, F.avg(F.col(col)).over(w)),
    )


def cumulative_sum(
    df: DataFrame,
    metrics: Iterable[str],
    group_keys: Sequence[str] = tuple(GROUP_KEYS),
    date_col: str = "date",
    prefix: str = "cum",
) -> DataFrame:
    """Per-group cumulative sum (db_etl/etl.py:938-958, ``groupby.cumsum``).

    pandas cumsum skips nulls (null in -> null out, running total keeps
    going), which is exactly ``sum over unboundedPreceding`` + null gate.

    Output naming follows the reference's
    ``metric.replace("new", "cum")`` (etl.py:944): ``newCases`` becomes
    ``cumCases``, not ``cumNewCases``. Metrics without a ``new``
    substring take the prefix-and-capitalise fallback (the reference
    never feeds those; the fallback keeps the operator total).
    """
    metrics = sorted(set(metrics) & set(df.columns))
    w = (
        Window.partitionBy(*group_keys)
        .orderBy(date_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for m in metrics:
        if m.startswith(prefix):
            out = m
        elif prefix == "cum" and "new" in m:
            out = m.replace("new", "cum")
        else:
            out = f"{prefix}{m[0].upper()}{m[1:]}"
        df = df.withColumn(
            out,
            F.when(F.col(m).isNotNull(), F.sum(F.col(m)).over(w)),
        )
    return df


def rolling_percentile(
    df: DataFrame,
    col: str,
    out: str,
    q: float = 0.5,
    group_keys: Sequence[str] = tuple(GROUP_KEYS),
    date_col: str = "date",
    window: int = 7,
    min_periods: int | None = None,
) -> DataFrame:
    """Rolling percentile (median by default) — the outlier-robust
    smoother pandas offers as ``rolling(7).median()`` and Spark has no
    named function for. Spark's ``percentile`` is an ordinary aggregate,
    so it runs over a window frame directly: same exchange as every
    other rolling op in this module (one shuffle on the group keys,
    shared with co-planned windows), with the pandas ``min_periods``
    row-count guard.

    Exact percentile buffers the frame's values per row — fine at any
    corpus width since the frame is ``window`` rows (a constant), unlike
    a whole-group percentile.
    """
    if not 0.0 <= q <= 1.0:
        raise ValueError(f"q must be in [0, 1], got {q}")
    need = window if min_periods is None else min_periods
    w = (
        Window.partitionBy(*group_keys)
        .orderBy(date_col)
        .rowsBetween(-(window - 1), 0)
    )
    val = F.expr(f"percentile({col}, {q!r})").over(w)
    return df.withColumn(
        out, F.when(F.count(F.col(col)).over(w) >= need, val)
    )


def ewma_halving(
    df: DataFrame,
    group_keys: Sequence[str],
    date_col: str,
    value_col: str,
    lags: int = 10,
    scale: int = 1_000_000,
    out: str = "ewma",
) -> DataFrame:
    """Exponentially weighted moving average with decay 1/2, truncated
    to the last ``lags`` rows — the smoothing companion to
    ``rolling_mean_centered`` (the reference smooths with centered
    means, ``db_etl/processors/rolling.py``; EWMA weights recency,
    the standard live-dashboard variant).

    ewma_t = sum_{k<n} x_{t-k} * 2^-(k) / sum_{k<n} 2^-(k), n = rows
    available (head-truncated like pandas ``ewm(...).mean()`` with
    adjust=True, but hard-truncated at ``lags`` so the state is a
    constant-size frame).

    NULL values are SKIPPED (``collect_list`` drops them) but the frame
    is still ``rowsBetween(-(lags-1), 0)`` over ALL rows: a NULL row
    occupies a frame slot, so the window holds the NON-NULL values
    among the last ``lags`` rows — the array shrinks rather than
    reaching further back for older non-null values, and the remaining
    values take the most-recent weights. Pre-filter NULL rows before
    calling if last-``lags``-non-null semantics are wanted, or
    zero-fill if the series has holes and calendar-faithful weights
    matter.

    Cross-engine determinism: values are scaled to integers (``scale``
    must cover the input's decimal places), weights are integer powers
    of two (2^(lags-1-k)), numerator and denominator are exact BIGINT
    sums, and the single final division is double/double. int64->double
    conversion is hardware round-nearest everywhere — unlike
    wide-DECIMAL->double casts, which differ in the last ulp between
    engines. Requires |value| * scale * 2^lags * lags < 2^63; with the
    defaults that bounds |value| < ~9e5, asserted per row (NULL result
    would silently corrupt an average — raise instead via ANSI
    overflow on the shifted product).

    One shuffle on the group keys, shared with any co-planned window.
    """
    if not 1 <= lags <= 40:
        raise ValueError(f"lags must be in [1, 40], got {lags}")
    w = (
        Window.partitionBy(*group_keys)
        .orderBy(date_col)
        .rowsBetween(-(lags - 1), 0)
    )
    x_scaled = (
        (F.col(value_col).cast("decimal(18,6)") * F.lit(scale))
        .cast("decimal(24,0)")
        .cast("long")
    )
    arr = F.collect_list(x_scaled).over(w)  # oldest .. newest, <= lags
    n = F.size(arr)
    # literal weight vector, newest first: [2^(lags-1), ..., 2^0];
    # zip against the reversed frame (slice keeps lengths equal —
    # zip_with would null-pad a longer side)
    weights = F.array(
        *[F.lit(1 << (lags - 1 - k)).cast("long") for k in range(lags)]
    )
    rev = F.reverse(arr)
    num = F.aggregate(
        F.zip_with(rev, F.slice(weights, 1, n), lambda x, wt: x * wt),
        F.lit(0).cast("long"),
        lambda acc, z: acc + z,
    )
    den = F.aggregate(
        F.slice(weights, 1, n),
        F.lit(0).cast("long"),
        lambda acc, z: acc + z,
    )
    ewma = num.cast("double") / (den * F.lit(scale)).cast("double")
    return df.withColumn(out, F.when(n > 0, ewma))
