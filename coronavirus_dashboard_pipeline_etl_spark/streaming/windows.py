"""Watermarked windowed aggregation (SURVEY.md §2.9).

The reference handles late data by full-snapshot reprocessing; a
continuous deployment of this engine instead aggregates event streams
with event-time windows + a watermark bounding both state size and
lateness: input older than ``watermark`` behind the max observed event
time is dropped instead of reopening finalized windows, so state is
O(groups x windows-in-watermark-horizon) no matter how long the stream
runs — the property that matters at 100 TB/day ingest.

Plain DataFrame -> DataFrame function: works identically on a batch
frame (window() is an ordinary grouping expression there), so the same
code path is testable in batch and deployable on a stream.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

from ..operators.util import as_ltz


def windowed_event_counts(
    df: DataFrame,
    ts_col: str = "ts",
    group_cols: Sequence[str] = ("event_type",),
    window_duration: str = "1 hour",
    slide: str | None = None,
    watermark: str | None = "1 hour",
    value_col: str | None = "value",
) -> DataFrame:
    """Per (group, event-time window) counts (+ value sum when
    ``value_col`` is present).

    On a streaming frame the watermark is mandatory for append-mode
    sinks and bounds late data; on a batch frame ``watermark=None``
    (or any value — batch ignores it) gives the identical result,
    which is what the oracle gate verifies.
    """
    # Normalise NTZ input IN PLACE before the watermark: the window
    # struct inherits the input's timestamp flavour, and the watermark
    # must attach to the very column the window groups on.
    df = df.withColumn(ts_col, as_ltz(ts_col))
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    w = (
        F.window(F.col(ts_col), window_duration, slide)
        if slide
        else F.window(F.col(ts_col), window_duration)
    )
    aggs = [F.count("*").alias("n_events")]
    has_value = value_col is not None and value_col in df.columns
    if has_value:
        aggs.append(F.sum(F.col(value_col).cast("double")).alias("value_sum"))
    out_cols = ["n_events"] + (["value_sum"] if has_value else [])
    return (
        df.groupBy(*group_cols, w.alias("__w"))
        .agg(*aggs)
        .select(
            *group_cols,
            F.date_format("__w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            F.date_format("__w.end", "yyyy-MM-dd HH:mm:ss").alias("window_end"),
            *out_cols,
        )
    )


def dedup_stream(
    df: DataFrame,
    keys: Sequence[str] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """At-most-once-per-key event dedup (the streaming face of the
    engine's exact-dedup family).

    Streaming frame: ``dropDuplicatesWithinWatermark`` — duplicate
    arrivals within ``watermark`` of the first occurrence are dropped
    and per-key state is EVICTED once the watermark passes it, so state
    is O(keys-in-horizon), not O(all keys ever seen) — the property
    that keeps an always-on ingest alive at 100 TB/day. (Plain
    streaming ``dropDuplicates`` would grow state forever.)

    Batch frame: plain ``dropDuplicates`` over the same keys — identical
    output whenever duplicates sit inside the horizon, which is what the
    oracle gate verifies.
    """
    if df.isStreaming:
        return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            list(keys)
        )
    return df.dropDuplicates(list(keys))


def session_window_stats(
    df: DataFrame,
    ts_col: str = "ts",
    group_cols: Sequence[str] = ("user_id",),
    gap: str = "30 minutes",
    watermark: str | None = "1 hour",
    value_col: str | None = "value",
) -> DataFrame:
    """Event-time SESSION windows (dynamic gap-merged windows) — the
    Structured Streaming twin of ``operators.sessions.sessionize``:
    ``F.session_window`` merges events within ``gap`` of each other into
    one window per group, exactly the inactivity-gap semantics, but
    expressed so the state store handles it incrementally on a stream
    (watermark evicts closed sessions -> bounded state).

    On a batch frame the same expression computes the same sessions in
    one pass; the oracle gate proves batch session_window == the
    classic lag/cumsum SQL sessionization row-for-row, which is what
    licenses swapping one for the other between backfill and live
    serving.

    Session bounds surface as exact epoch micros. ``session_end_us`` is
    the END of the merged window = last event + gap (Spark's session
    semantics; verified: events exactly ``gap`` apart still merge — a
    split needs the gap EXCEEDED, matching ``sessionize``); the batch
    operator reports the last EVENT — subtract the gap for event-bounds
    parity.
    """
    # normalise in place BEFORE the watermark — see windowed_event_counts
    df = df.withColumn(ts_col, as_ltz(ts_col))
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    aggs = [F.count("*").alias("n_events")]
    has_value = value_col is not None and value_col in df.columns
    if has_value:
        aggs.append(
            F.sum(F.col(value_col).cast("decimal(18,6)"))
            .cast("double")
            .alias("value_sum")
        )
    out_cols = ["n_events"] + (["value_sum"] if has_value else [])
    return (
        df.groupBy(*group_cols, F.session_window(F.col(ts_col), gap).alias("__w"))
        .agg(*aggs)
        .select(
            *group_cols,
            F.unix_micros("__w.start").alias("session_start_us"),
            F.unix_micros("__w.end").alias("session_end_us"),
            *out_cols,
        )
    )


def enrich_with_dims(
    stream: DataFrame,
    dims: DataFrame,
    keys: Sequence[str],
    how: str = "left",
) -> DataFrame:
    """Stream-static dimension enrichment: join a (possibly streaming)
    event frame to a static dimension table. Spark re-reads the static
    side per micro-batch (picking up dimension updates between batches)
    and plans a broadcast when the dim is small — the streaming twin of
    the batch star join (`plans/serving._joined`).

    Works identically on a batch frame, so the same enrichment step is
    oracle-checkable in batch and deployable on the stream. Only
    stream-STATIC joins are supported here (inner/left_outer per Spark's
    matrix for the streaming side); stream-stream joins need watermarks
    on both sides and belong to a separate operator.
    """
    from pyspark.sql.functions import broadcast

    if how not in ("inner", "left"):
        raise ValueError(
            f"enrich_with_dims supports inner/left, got {how!r}"
        )
    return stream.join(broadcast(dims), on=list(keys), how=how)


def join_streams_within(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    before: str = "10 minutes",
    after: str = "10 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermarked STREAM-STREAM inner join — the §2.9 capability
    ``enrich_with_dims`` (stream-static) does not cover: correlate two
    event streams on keys within an event-time window
    (``r.ts ∈ [l.ts - before, l.ts + after]``).

    On streams, BOTH sides carry the watermark and the time-range
    condition bounds the join state: each side keeps only rows inside
    the watermark horizon, so state is O(rate x horizon), never
    O(stream length) — the property that keeps a correlation job alive
    indefinitely. On batch frames the identical expression is a plain
    range-condition join, which is what the oracle gate verifies.

    The right side's timestamp surfaces as ``right_ts_out`` (streams
    often share the column name 'ts'); all other column names must be
    disjoint across the two sides apart from ``keys``.
    """
    dup = (set(left.columns) & set(right.columns)) - set(keys) - {right_ts}
    if dup:
        raise ValueError(
            f"join_streams_within: column collision outside keys: {sorted(dup)}"
        )
    # 'right_ts_out' is reserved for the renamed right timestamp; a
    # column with that literal name on either side would slip past the
    # intersection check above and yield a duplicate output column.
    if "right_ts_out" in left.columns or (
        "right_ts_out" in right.columns and right_ts != "right_ts_out"
    ):
        raise ValueError(
            "join_streams_within: 'right_ts_out' is a reserved output "
            "column name; rename it on the input side"
        )
    l = left.withColumn(left_ts, as_ltz(left_ts))
    r = right.withColumn(right_ts, as_ltz(right_ts))
    if l.isStreaming:
        l = l.withWatermark(left_ts, watermark)
    if r.isStreaming:
        r = r.withWatermark(right_ts, watermark)
    r = r.withColumnRenamed(right_ts, "right_ts_out")
    la, ra = l.alias("l"), r.alias("r")
    cond = [F.col(f"l.{k}") == F.col(f"r.{k}") for k in keys]
    cond.append(
        F.col("r.right_ts_out")
        >= F.col(f"l.{left_ts}") - F.expr(f"INTERVAL {before}")
    )
    cond.append(
        F.col("r.right_ts_out")
        <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {after}")
    )
    out_cols = (
        [F.col(f"l.{c}") for c in l.columns]
        + [F.col(f"r.{c}") for c in r.columns if c not in keys]
    )
    return la.join(ra, cond, "inner").select(*out_cols)
