"""Custom stateful streaming operator: incremental per-area running
totals via ``applyInPandasWithState``.

The reference recomputes cumulative metrics from the full snapshot every
release (SURVEY.md §2.9 — batch-only, no incremental state). This
operator is the streaming-native alternative the engine offers on top:
each micro-batch carries only the day's increments, and per-group state
(the running total) persists in the state store across batches, so
cumulative series cost O(increment) per release instead of O(history).

State layout is one double per group — at ~7k areas × ~150 metrics the
state store holds ~1M scalars, trivially checkpointable; the operator
scales with group cardinality, never with history length.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_totals_stream(
    stream: DataFrame,
    group_col: str = "areaCode",
    date_col: str = "date",
    value_col: str = "value",
) -> DataFrame:
    """(group, date, value) increments -> (group, date, value, cumulative).

    Within a batch rows are ordered by ``date_col``; nulls count as zero
    increments (matching the reference's cumsum over zero-filled panels,
    ``db_etl/etl.py:938-958``). Emits every input row with its running
    total; state carries the post-batch total per group.
    """

    out_schema = (
        f"{group_col} string, {date_col} string, "
        f"{value_col} double, cumulative double"
    )
    state_schema = "total double"

    def update(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        (total,) = state.get if state.exists else (0.0,)
        batch = pd.concat(list(pdfs), ignore_index=True)
        if len(batch):
            batch = batch.sort_values(date_col, kind="mergesort")
            batch["cumulative"] = batch[value_col].fillna(0.0).cumsum() + total
            total = float(batch["cumulative"].iloc[-1])
            state.update((total,))
            yield batch[[group_col, date_col, value_col, "cumulative"]]

    return (
        stream.groupBy(group_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def release_delta_stream(
    stream: DataFrame,
    group_col: str = "areaCode",
    release_col: str = "release_date",
    value_col: str = "value",
    clamp_negative: bool = True,
) -> DataFrame:
    """Streaming twin of ``operators.asof.release_delta`` — the
    reference's publish-date "new" metric derived from a cumulative one
    (``chunk_etl_postprocessing/vaccinations/queries.py:22-91``): per
    group, each release's value minus the previous release's, clamped
    at zero.

    Batch mode recomputes the lag over all releases every run; here the
    state store carries ONE scalar per group (the previous release's
    value), so a daily release costs O(groups) regardless of history
    length — same state-size argument as ``running_totals_stream``.
    Releases must arrive in order per group (true of a release feed;
    within a batch rows are sorted by ``release_col``).

    Null semantics MIRROR the batch operator exactly (parity-tested):
    the previous value is the strict previous ROW's value — a NULL
    release does not get skipped over — and with ``clamp_negative`` a
    null-involved delta coerces to 0 (Spark's ``greatest(NULL, 0)``);
    without it, nulls propagate.
    """
    out_schema = (
        f"{group_col} string, {release_col} string, "
        f"{value_col} double, delta double"
    )
    # previous row's value may itself be NULL — track presence separately
    state_schema = "last double, seen boolean"

    def update(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        if state.exists:
            last, seen = state.get
        else:
            last, seen = None, False
        batch = pd.concat(list(pdfs), ignore_index=True)
        if len(batch):
            batch = batch.sort_values(release_col, kind="mergesort")
            deltas = []
            for v in batch[value_col]:
                v_ok = not pd.isna(v)
                prev_ok = seen and last is not None and not pd.isna(last)
                if v_ok and prev_ok:
                    d = float(v) - float(last)
                    if clamp_negative and d < 0:
                        d = 0.0
                else:
                    # value - lag is NULL; greatest(NULL, 0) = 0 under clamp
                    d = 0.0 if clamp_negative else None
                deltas.append(d)
                last, seen = (float(v) if v_ok else None), True
            batch["delta"] = pd.array(deltas, dtype="float64")
            state.update((last, seen))
            yield batch[[group_col, release_col, value_col, "delta"]]

    return stream.groupBy(group_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_totals_tws(
    stream: DataFrame,
    group_col: str = "areaCode",
    date_col: str = "date",
    value_col: str = "value",
) -> DataFrame:
    """``running_totals_stream`` on the Spark-4-native
    ``transformWithStateInPandas`` API (StatefulProcessor + ValueState)
    — identical semantics, parity-tested against the
    ``applyInPandasWithState`` form.

    Why both exist: transformWithState is where streaming state is
    headed (multiple typed state variables, TTL, timers, RocksDB-backed
    by requirement) and new deployments should prefer it; the
    applyInPandasWithState twin stays for Spark 3.x-compatible callers.
    Requires the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass``) AND the
    ``protobuf`` Python package (the transformWithState state-server
    protocol is protobuf-based; this container ships without it, so the
    parity test skips there — the applyInPandasWithState twin is the
    covered path, exactly like the redis/PIL import-gated sinks).
    """
    import pandas as pd  # noqa: F811 (batch fn runs on executors)
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = (
        f"{group_col} string, {date_col} string, "
        f"{value_col} double, cumulative double"
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._total = handle.getValueState("total", "total double")

        def handleInputRows(self, key, rows, timerValues):
            total = (
                self._total.get()[0] if self._total.exists() else 0.0
            )
            batch = pd.concat(list(rows), ignore_index=True)
            if len(batch):
                batch = batch.sort_values(date_col, kind="mergesort")
                batch["cumulative"] = (
                    batch[value_col].fillna(0.0).cumsum() + total
                )
                self._total.update((float(batch["cumulative"].iloc[-1]),))
                yield batch[[group_col, date_col, value_col, "cumulative"]]

        def close(self) -> None:
            pass

    return stream.groupBy(group_col).transformWithStateInPandas(
        RunningTotals(),
        outputStructType=out_schema,
        outputMode="append",
        timeMode="none",
    )
