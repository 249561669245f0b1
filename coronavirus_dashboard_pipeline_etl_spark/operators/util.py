"""Small shared helpers for the operator library."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.functions import broadcast


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
