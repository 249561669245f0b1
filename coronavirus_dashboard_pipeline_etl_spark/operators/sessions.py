"""Gap-based sessionization over event logs.

The reference pipeline has no event-stream analytics (SURVEY.md §2.9 —
everything is snapshot batch), but a telemetry / training-data pipeline
over raw event logs needs the classic sessionize operator: group each
user's events into sessions separated by an inactivity gap, then reduce
each session to its stats. This is the batch twin of
``streaming/windows.py``'s session windows — same semantics, expressed
as plain windows so it runs on any DataFrame and gets an exact SQL
oracle.

Scale design (100 TB of events):

* one shuffle total — the ``partitionBy(user)`` window exchange. The
  follow-up ``groupBy(user, session_index)`` needs only
  ``ClusteredDistribution(user, session)``, which the window's
  ``HashPartitioning(user)`` already satisfies (a subset of the grouping
  keys), so Catalyst plans NO second exchange;
* gap arithmetic on ``unix_micros`` — pure integer comparisons, no
  double rounding, cross-engine exact;
* per-user data volumes are naturally bounded (a user's events fit a
  partition); a pathological hot user is an input-data problem the
  AQE skew handling absorbs, not a plan flaw.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .util import ts_micros

__all__ = ["sessionize", "session_stats"]


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    tiebreak_cols: tuple[str, ...] = ("event_id",),
) -> DataFrame:
    """Assign a per-user ``session_index`` (0-based) that increments
    whenever the gap to the previous event exceeds ``gap_seconds``.

    ``tiebreak_cols`` makes the event order total when timestamps
    collide, so the lag is deterministic. Equal timestamps can never
    open a session (gap 0), so ties only affect which row is "previous",
    never the session boundaries themselves.
    """
    if gap_seconds <= 0:
        raise ValueError(f"gap_seconds must be > 0, got {gap_seconds}")
    w = Window.partitionBy(user_col).orderBy(ts_col, *tiebreak_cols)
    us = ts_micros(ts_col)
    prev_us = F.lag(us).over(w)
    is_new = F.when(
        prev_us.isNull() | (us - prev_us > gap_seconds * 1_000_000), 1
    ).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn(
        "session_index", (F.sum(is_new).over(run) - 1).cast("long")
    )


def session_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str | None = "value",
    gap_seconds: int = 1800,
    tiebreak_cols: tuple[str, ...] = ("event_id",),
) -> DataFrame:
    """Sessionize then reduce: one row per (user, session) with start /
    end (exact epoch micros), event count, duration, and an exact-decimal
    value sum surfaced as double.

    Single-shuffle plan — see module docstring: the aggregation reuses
    the sessionize window's hash partitioning on ``user_col``.
    """
    s = sessionize(df, user_col, ts_col, gap_seconds, tiebreak_cols)
    us = ts_micros(ts_col)
    aggs = [
        F.min(us).alias("session_start_us"),
        F.max(us).alias("session_end_us"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    if value_col is not None:
        aggs.append(
            F.sum(F.col(value_col).cast("decimal(18,6)"))
            .cast("double")
            .alias("value_sum")
        )
    out = s.groupBy(user_col, "session_index").agg(*aggs)
    return out.withColumn(
        "duration_s",
        ((F.col("session_end_us") - F.col("session_start_us")) / F.lit(1_000_000.0)),
    )
