"""Skew mitigation for hot join keys.

AQE's skew-join splitting (on in session.py) handles most skew at
runtime by splitting oversized sort-merge partitions. Salting is the
explicit fallback for the cases AQE can't fix: a single key so hot that
even a split partition's build side won't fit, or aggregation-free
shuffles where one reducer drowns. The pattern: spread the big side's
hot keys over N sub-keys, replicate the small side N times, join on
(key, salt).

Reference relevance: the panel's group keys are areaCode (~7k values,
near-uniform) — salting is unnecessary there; this exists for the
TB-scale fact⋈fact joins the LLM-pipeline operators introduce (e.g.
candidate-pair joins where one document bucket is pathologically hot).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

SALT_COL = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side's rows spread across ``salt_buckets``
    sub-keys and the small side replicated once per bucket.

    Deterministic: the salt is a hash of the big side's whole row (task
    retries re-derive the same salt). The small side grows by the bucket
    factor — keep it the genuinely-small side.

    Only join types where every output row is anchored to a big-side row
    are valid: right/full joins would emit each unmatched small-side row
    once per salt replica (and null-extend matched keys for the replicas
    a big row didn't land on), silently corrupting results.
    """
    valid = {"inner", "left", "leftouter", "left_outer", "left_semi",
             "leftsemi", "left_anti", "leftanti"}
    if how.lower().replace("_", "") not in {v.replace("_", "") for v in valid}:
        raise ValueError(
            f"salted_join supports big-side-anchored joins only, not {how!r}"
        )
    on = list(on)
    big_salted = big.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*big.columns), F.lit(salt_buckets))
    )
    small_rep = small.withColumn(
        SALT_COL,
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)).cast("array<long>")),
    )
    return big_salted.join(small_rep, on=on + [SALT_COL], how=how).drop(SALT_COL)
