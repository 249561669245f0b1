"""Multi-frame metric-family combination (SURVEY.md §2 J11).

Re-expresses the reference's dormant legacy combiner
(``db_etl/db_uploader/chunk_ops/combine.py:116-153``): a main chunk
frame iteratively LEFT-joined with N supplement metric-family frames on
``(areaType, areaCode, date)``, each supplement contributing its own
disjoint set of metric columns, with missing supplement files replaced
by an empty keyed frame (``combine.py:62-66``).

Spark-first design: N sequential shuffle joins on the same key would
cost N hash exchanges (or N broadcasts of frames that are NOT small at
100 TB — every supplement is corpus-sized).  Because every frame shares
the key and contributes *disjoint* value columns, the whole combination
collapses into ONE union + ONE groupBy: null-pad each frame to the
common schema with ``unionByName(allowMissingColumns=True)`` (a no-op
narrow transformation), then take ``first(col, ignorenulls=True)`` per
key — a single hash exchange regardless of supplement count, with
map-side partial aggregation shrinking the shuffle to at most one row
per (frame, key).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MARK = "__is_main__"


def combine_supplements(
    main: DataFrame,
    supplements: Sequence[Optional[DataFrame]],
    keys: Sequence[str] = ("areaType", "areaCode", "date"),
    validate: bool = False,
) -> DataFrame:
    """LEFT-join ``supplements`` onto ``main`` on ``keys`` in one shuffle.

    Contract (mirrors the reference's chunk files): ``keys`` are unique
    per frame, and non-key columns are disjoint across frames — each
    metric family owns its columns.  Overlapping value columns raise
    loudly (pandas ``.join`` would likewise fail without suffixes);
    silent coalescing would be order-nondeterministic after a shuffle.

    KEY UNIQUENESS IS THE CALLER'S CONTRACT: a frame with duplicate
    keys makes ``first(ignorenulls=True)`` pick a shuffle-order-
    dependent copy SILENTLY (the reference's iterated ``.join`` would
    instead multiply rows). ``validate=True`` turns the contract into a
    loud check — one count-vs-countDistinct aggregate per frame before
    the combine (an extra pass over each input; off by default because
    the production chunk files are unique-keyed by construction).

    Supplement entries may be ``None`` (a missing blob in the
    reference): they contribute nothing, matching the reference's empty
    keyed frame substitute.  Keys present only in a supplement are
    dropped (left-join semantics) via a main-row marker.

    Output column order is ``keys``, then main's value columns, then
    each supplement's in argument order — the order the reference's
    iterated ``data.join(...)`` loop produces.
    """
    keys = list(keys)
    frames = [main] + [s for s in supplements if s is not None]

    seen: dict[str, int] = {}
    value_cols: list[str] = []
    for i, frame in enumerate(frames):
        missing = [k for k in keys if k not in frame.columns]
        if missing:
            raise ValueError(f"frame {i} is missing key columns {missing}")
        for c in frame.columns:
            if c in keys:
                continue
            if c in seen:
                raise ValueError(
                    f"value column {c!r} appears in frames {seen[c]} and {i}; "
                    "metric families must contribute disjoint columns"
                )
            seen[c] = i
            value_cols.append(c)

    if validate:
        for i, frame in enumerate(frames):
            # groupBy (not count_distinct) so null keys compare the way
            # the combine's own groupBy will treat them; collect bounded
            dup = (
                frame.groupBy(*keys)
                .count()
                .filter(F.col("count") > 1)
                .limit(3)
                .collect()
            )
            if dup:
                raise ValueError(
                    f"frame {i} has duplicate key row(s) on {keys}, "
                    f"e.g. {[tuple(r)[:-1] for r in dup]}; "
                    "first(ignorenulls=True) over duplicates is "
                    "shuffle-order-dependent — dedup the frame or "
                    "aggregate it before combining"
                )

    tagged = [
        f.withColumn(_MARK, F.lit(1 if i == 0 else 0)) for i, f in enumerate(frames)
    ]
    unioned = tagged[0]
    for t in tagged[1:]:
        unioned = unioned.unionByName(t, allowMissingColumns=True)

    combined = unioned.groupBy(*keys).agg(
        F.max(_MARK).alias(_MARK),
        *[F.first(c, ignorenulls=True).alias(c) for c in value_cols],
    )
    return combined.filter(F.col(_MARK) == 1).select(*keys, *value_cols)
