"""EP3 — MSOA cases pipeline (the reference's highest-fan-out path).

Reference: ``msoa_etl_db/processor.py:267-298`` runs ~6 800 Azure
Functions, one per MSOA area code. Here the whole path is one plan over
the (areaCode, date, newCasesBySpecimenDate) table — per-area work is
ordinary partition parallelism on areaCode.

Chain (processor.py order):
  zero-pad trailing dates to the release max (get_dataset:146-171 —
  homogenise supplies the rows, zero-fill the values)
  -> change_by_sum(min_sum_allowed=3, min_sum_sub=2)   small-count
     pre-suppression (processor.py:279-281)
  -> calculate_rolling_rate on the SUBSTITUTED rolling sum
     (processor.py:82-87 — rate = round(rsum / population * 1e5, 1))
  -> suppress_by_rolling_sum: stats nulled where NOT rsum > 2
     (processor.py:211-226; the raw metric was already nulled by the
     min-sum path)
  -> weekly thinning on the -7D grid anchored at release_timestamp - 5d,
     bounded below by the series min (get_date_periods:67-79)
  -> nested payload cell (convert_types:96-110) + keyed row hash
     (generate_row_hash:113-142)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import broadcast

from ..config import (
    MSOA_MIN_SUM_ALLOWED,
    MSOA_MIN_SUM_SUB,
    RATE_PER,
    RATE_PRECISION,
)
from ..operators import (
    change_by_sum,
    homogenise_dates,
    row_hash_blake2,
    suppress_by_rolling_sum,
)

METRIC = "newCasesBySpecimenDate"
STAT_SUFFIXES = ["RollingSum", "Change", "Direction", "ChangePercentage", "RollingRate"]


def weekly_periods_filter(
    df: DataFrame, anchor_date_col: F.Column, date_col: str = "date"
) -> DataFrame:
    """Keep rows on the descending weekly grid from the anchor
    (processor.py:67-93: ``date_range(end=min, start=anchor, freq=-7D)``)."""
    on_grid = (
        F.datediff(anchor_date_col, F.to_date(date_col)) % 7 == 0
    ) & (F.to_date(date_col) <= anchor_date_col)
    return df.filter(on_grid)


def run_msoa(
    cases: DataFrame,
    population: DataFrame,
    release_timestamp: str,
    hash_key: bytes | None = None,
    release_id: int = 1,
    suppress: bool = True,
    pct_precision: int | None = 1,
    rate_precision: int | None = RATE_PRECISION,
) -> DataFrame:
    """cases: (areaCode, date, newCasesBySpecimenDate);
    population: (areaCode, population); release_timestamp: ISO date(/time)
    of the release driving the weekly grid anchor.

    ``suppress=False`` reproduces the reference's dry-run operator
    (processor.py:238-264, unsuppressed output). The precision knobs
    default to the reference's rounding; the oracle gates pass None
    (engines round doubles differently at the last ulp).
    """
    df = cases.withColumn("areaType", F.lit("msoa"))

    # densify to the global max date; missing/padded observations are 0
    # (the reference appends literal zero rows). span="group_min": the
    # reference's per-area frame begins at that area's OWN first
    # observed date but get_dataset:146-171 zero-pads TRAILING dates to
    # the release (global) max — a fully-global scaffold would give a
    # late-starting area leading zero rows the reference never produces
    # (found by the composed reference-exec parity test, round 10).
    df = homogenise_dates(df, span="group_min")
    df = df.withColumn(METRIC, F.coalesce(F.col(METRIC), F.lit(0.0)))

    if suppress:
        df = change_by_sum(
            df,
            [METRIC],
            min_sum_allowed=MSOA_MIN_SUM_ALLOWED,
            min_sum_sub=MSOA_MIN_SUM_SUB,
            pct_precision=pct_precision,
        )
    else:
        df = change_by_sum(df, [METRIC], pct_precision=pct_precision)

    # rate from the existing (possibly substituted) rolling sum — the
    # reference's guard `if rolling_sum not in data.columns` means the
    # rate always sees change_by_sum's output, never a fresh sum.
    df = df.join(broadcast(population.select("areaCode", "population")), "areaCode", "left")
    rate = (
        F.col(f"{METRIC}RollingSum").cast("double")
        / F.col("population")
        * RATE_PER
    )
    if rate_precision is not None:
        rate = F.round(rate, rate_precision)
    df = df.withColumn(f"{METRIC}RollingRate", rate).drop("population")

    if suppress:
        df = suppress_by_rolling_sum(
            df,
            f"{METRIC}RollingSum",
            [f"{METRIC}{s}" for s in STAT_SUFFIXES],
            threshold=MSOA_MIN_SUM_SUB,
        )

    anchor = F.date_sub(F.to_date(F.lit(release_timestamp[:10])), 5)
    df = weekly_periods_filter(df, anchor)

    nested = F.to_json(
        F.struct(
            F.col(METRIC).alias(METRIC),
            F.col(f"{METRIC}RollingSum").alias("rollingSum"),
            F.col(f"{METRIC}Change").alias("change"),
            F.col(f"{METRIC}Direction").alias("direction"),
            F.col(f"{METRIC}ChangePercentage").alias("changePercentage"),
            F.col(f"{METRIC}RollingRate").alias("rollingRate"),
        )
    )
    out = (
        df.withColumn("payload", nested)
        .withColumn("release_id", F.lit(release_id))
        .withColumn("metric", F.lit(METRIC))
        .withColumnRenamed("areaType", "area_type")
        .withColumnRenamed("areaCode", "area_code")
    )
    return row_hash_blake2(
        out,
        ["date", "area_type", "area_code", "metric", "release_id"],
        out="hash",
        key=hash_key,
    ).select(
        "area_type",
        "area_code",
        "date",
        "metric",
        "payload",
        "release_id",
        "hash",
        *[f"{METRIC}{s}" for s in STAT_SUFFIXES],
    )
