"""Small shared helpers for the operator library."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.functions import broadcast


def ts_micros(col: Column | str) -> Column:
    """Exact epoch microseconds from a timestamp column of EITHER
    flavour — TIMESTAMP (LTZ) or TIMESTAMP_NTZ.

    ``F.unix_micros`` rejects TIMESTAMP_NTZ with DATATYPE_MISMATCH, and
    parquet in the wild stores both encodings (``isAdjustedToUTC``
    true/false on the same logical µs integer). The ``cast("timestamp")``
    is a no-op on LTZ input and reinterprets NTZ wall-clock under the
    session timezone — the engine pins ``spark.sql.session.timeZone=UTC``
    (session.py), so both paths yield the identical integer DuckDB's
    ``epoch_us`` computes. Every temporal operator goes through this
    helper instead of calling ``unix_micros`` directly.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def as_ltz(col: Column | str) -> Column:
    """Normalise a timestamp column to TIMESTAMP (LTZ). No-op on LTZ;
    reinterprets NTZ wall-clock under the (UTC) session timezone. Use
    BEFORE time-window operators (``F.session_window``, ``F.window``)
    whose output struct inherits the input flavour."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("timestamp")


def with_scalar(df: DataFrame, name: str, agg: Column) -> DataFrame:
    """Attach a whole-frame aggregate as a column WITHOUT a single-partition
    window.

    ``F.max(x).over(Window.partitionBy())`` funnels the entire dataset
    through one partition — fatal at 100 TB. Instead we compute the
    aggregate as a 1-row DataFrame (a normal distributed partial+final agg)
    and broadcast-cross-join it back, which Catalyst plans as
    BroadcastNestedLoopJoin over a 1-row build side: zero extra shuffles
    of the fact table and stays lazy.
    """
    scalar = df.agg(agg.alias(name))
    return df.crossJoin(broadcast(scalar))


def drop_helper(df: DataFrame, *cols: str) -> DataFrame:
    return df.drop(*[c for c in cols if c in df.columns])
