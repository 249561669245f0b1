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
