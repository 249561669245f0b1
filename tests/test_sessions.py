"""Sessionization semantics: gap boundaries, ties, single-shuffle plan."""

import re
from datetime import datetime

from pyspark.sql import functions as F

from coronavirus_dashboard_pipeline_etl_spark.operators.sessions import (
    session_stats,
    sessionize,
)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )


def test_gap_opens_new_session(spark):
    t = lambda m, s=0: datetime(2024, 1, 1, 0, m, s)
    df = _events(
        spark,
        [
            (1, 7, t(0), 1.0),
            (2, 7, t(29), 1.0),   # 29 min gap -> same session
            (3, 7, t(59), 1.0),   # exactly 30 min -> same (gap must EXCEED)
            (4, 7, t(59, 1), 1.0),
            # 30 min + 1 s after event 4 -> new session
            (5, 7, datetime(2024, 1, 1, 1, 29, 2), 1.0),
            (6, 9, t(0), 1.0),    # other user independent
        ],
    )
    out = {
        r.event_id: r.session_index
        for r in sessionize(df).select("event_id", "session_index").collect()
    }
    assert out == {1: 0, 2: 0, 3: 0, 4: 0, 5: 1, 6: 0}


def test_equal_timestamps_never_split(spark):
    t0 = datetime(2024, 1, 1)
    df = _events(spark, [(i, 1, t0, 1.0) for i in range(5)])
    idx = {r.session_index for r in sessionize(df).collect()}
    assert idx == {0}


def test_session_stats_values(spark):
    t = lambda m: datetime(2024, 1, 1, 0, m)
    df = _events(
        spark,
        [(1, 1, t(0), 1.5), (2, 1, t(10), 2.5), (3, 1, t(50), 4.0)],
    )
    rows = session_stats(df).orderBy("session_index").collect()
    assert [r.n_events for r in rows] == [2, 1]
    assert rows[0].value_sum == 4.0
    assert rows[0].duration_s == 600.0
    assert rows[1].duration_s == 0.0


def test_single_shuffle_plan(spark):
    t0 = datetime(2024, 1, 1)
    df = _events(spark, [(1, 1, t0, 1.0)])
    plan = session_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
