"""Plan-size behaviour at the reference's real metric width.

The reference's DEFAULT_METRICS panel is ~120 metrics wide
(db_etl/etl.py:83-240). A per-metric withColumn chain builds a
1000+-projection plan whose Catalyst analysis dominates small batches;
the staged withColumns build must keep analysis time bounded.
"""

import time

from pyspark.sql import Row, functions as F

from coronavirus_dashboard_pipeline_etl_spark.operators import (
    change_by_sum,
    normalise_records,
)

N_METRICS = 120


def _wide_panel(spark):
    metrics = [f"metric{i:03d}" for i in range(N_METRICS)]
    rows = [
        Row(
            areaType="nation",
            areaCode=f"E{a}",
            date=f"2024-01-{d:02d}",
            **{m: float(d + i) for i, m in enumerate(metrics)},
        )
        for a in range(2)
        for d in range(1, 15)
    ]
    return spark.createDataFrame(rows), metrics


def test_change_by_sum_wide_panel_analyses_in_bounded_time(spark):
    df, metrics = _wide_panel(spark)
    t0 = time.monotonic()
    out = change_by_sum(df, metrics)
    _ = out.schema  # forces analysis
    elapsed = time.monotonic() - t0
    assert elapsed < 60, f"analysis took {elapsed:.1f}s for {N_METRICS} metrics"
    assert f"metric000RollingSum" in out.columns
    assert len(out.columns) == len(df.columns) + 4 * N_METRICS


def test_change_by_sum_wide_panel_single_exchange(spark):
    df, metrics = _wide_panel(spark)
    out = change_by_sum(df, metrics)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_normalise_wide_panel_one_projection(spark):
    df, metrics = _wide_panel(spark)
    # null a few cells so fills actually engage
    df = df.withColumn(
        "metric000",
        F.when(F.col("date") == "2024-01-05", None).otherwise(F.col("metric000")),
    )
    t0 = time.monotonic()
    out = normalise_records(
        df, zero_filled=metrics[:60], cumulative=metrics[60:]
    )
    _ = out.schema
    elapsed = time.monotonic() - t0
    assert elapsed < 60, f"analysis took {elapsed:.1f}s"
    row = out.filter(
        (F.col("areaCode") == "E0") & (F.col("date") == "2024-01-05")
    ).collect()[0]
    assert row["metric000"] == 0.0  # zero-filled inside valid bounds
