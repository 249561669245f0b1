"""Release-over-release (as-of) delta — the serving layer's
today-vs-previous-release self-join (SURVEY.md §2.3 J9:
``chunk_etl_postprocessing/vaccinations/queries.py:22-91``,
``testing/queries.py:3-105``).

The reference runs: today's snapshot LEFT JOIN yesterday's snapshot on
(area, metric), emitting ``CASE WHEN today - yesterday < 0 THEN 0 ELSE
today - yesterday END`` (publish-date "new" metrics derived from
cumulative ones).

Spark-first shape: one window over the release dimension (lag) — no
self-join, no second scan of the fact table.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

from .util import ts_micros


def release_delta(
    df: DataFrame,
    group_keys: Sequence[str],
    release_col: str,
    value_col: str,
    out: str = "delta",
    clamp_negative: bool = True,
    zero_baseline: bool = False,
) -> DataFrame:
    """value - lag(value) per group ordered by release, clamped at 0.

    A group's FIRST release has no lag: the default (strict lag)
    yields NULL → clamped to 0, the contract the streaming twin
    ``release_delta_stream`` mirrors row-for-row. The reference's
    publish-delta query instead baselines against COALESCE(prev, 0) —
    a brand-new metric publishes its whole first value as the delta —
    which is what ``latest_two_releases_delta`` (the J9 surface)
    implements; pass ``zero_baseline=True`` to get that semantics from
    the generic lag form too. Don't use the default for publish
    deltas: it silently zeroes every new series' first count.
    """
    w = Window.partitionBy(*group_keys).orderBy(release_col)
    prev = F.lag(value_col).over(w)
    if zero_baseline:
        prev = F.coalesce(prev, F.lit(0))
    delta = F.col(value_col) - prev
    if clamp_negative:
        delta = F.greatest(delta, F.lit(0))
    return df.withColumn(out, delta)


def latest_two_releases_delta(
    df: DataFrame,
    group_keys: Sequence[str],
    release_col: str,
    value_col: str,
    out: str = "delta",
    clamp_negative: bool = True,
) -> DataFrame:
    """The exact reference query shape: per group, compare the newest
    release's value against the previous one; emit one row per group at
    the newest release. NULL previous -> today's value (LEFT JOIN
    semantics with COALESCE(yesterday, 0) in the reference)."""
    w = Window.partitionBy(*group_keys).orderBy(F.col(release_col).desc())
    ranked = df.withColumn("__rn", F.row_number().over(w))
    today = ranked.filter(F.col("__rn") == 1).drop("__rn")
    prev = (
        ranked.filter(F.col("__rn") == 2)
        .select(*group_keys, F.col(value_col).alias("__prev"))
    )
    joined = today.join(prev, on=list(group_keys), how="left")
    delta = F.col(value_col) - F.coalesce(F.col("__prev"), F.lit(0))
    if clamp_negative:
        delta = F.greatest(delta, F.lit(0))
    return joined.withColumn(out, delta).drop("__prev")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str] = (),
    tolerance_seconds: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Generic as-of LEFT join: each left row picks, within its key
    group, the right row with the greatest ``right_ts <= left_ts``
    (``direction="backward"``, the pandas/kdb default — ties at the
    exact same timestamp match), the least ``right_ts >= left_ts``
    (``"forward"``), or whichever of the two is closer in time
    (``"nearest"``, ties broken toward backward as pandas does). The
    operator Spark lacks natively, built Spark-first:

    UNION the two sides tagged (right rows sort BEFORE left rows at
    equal timestamps), then one ``last(value, ignorenulls=True)`` window
    per key carries the latest right payload forward onto every left
    row. ONE shuffle on the join keys — never a range-join explosion or
    a per-key sort-merge of left x right; at 100 TB both sides stream
    through the same hash exchange and the window is a linear scan.
    ``forward`` mirrors the frame (``first`` over the following rows,
    left rows sorting before equal-timestamp right rows so ``>=`` ties
    match); ``nearest`` evaluates both windows inside the SAME
    partition-level sort pipeline — still one shuffle, two in-partition
    sort orders — and keeps the closer match.

    ``right_cols`` are carried onto matches (they must not collide with
    left column names); unmatched left rows keep them NULL plus a NULL
    ``asof_ts_us``. ``tolerance_seconds`` voids matches further than the
    bound in the match's direction (pandas ``merge_asof`` tolerance;
    for ``nearest`` it bounds the absolute distance). Right rows should
    be unique per (keys, right_ts) — among exact duplicates the carried
    row is frame-order-dependent; pre-aggregate to make it total.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"asof_join: direction must be backward/forward/nearest,"
            f" got {direction!r}"
        )
    overlap = set(right_cols) & set(left.columns)
    if overlap:
        raise ValueError(
            f"asof_join: right_cols collide with left columns: {sorted(overlap)}"
        )
    key_list = list(keys)
    lus = ts_micros(left_ts)
    rus = ts_micros(right_ts)
    r_tagged = right.select(
        *key_list,
        rus.alias("__us"),
        F.lit(0).alias("__is_left"),
        F.struct(
            rus.alias("asof_ts_us"), *[F.col(c) for c in right_cols]
        ).alias("__rv"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}")
          for c in left.columns],
    )
    l_tagged = left.select(
        *key_list,
        lus.alias("__us"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(r_tagged.schema["__rv"].dataType).alias("__rv"),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )
    tagged = r_tagged.unionByName(l_tagged)
    tol_us = (
        None if tolerance_seconds is None else tolerance_seconds * 1_000_000
    )

    def _bounded(m: Column, back: bool) -> Column:
        if tol_us is None:
            return m
        if back:
            ok = m["asof_ts_us"] >= F.col("__us") - F.lit(tol_us)
        else:
            ok = m["asof_ts_us"] <= F.col("__us") + F.lit(tol_us)
        return F.when(ok, m)

    # backward frame: right rows (tag 0) sort before equal-ts left rows,
    # so <= ties land inside the preceding frame
    w_back = (
        Window.partitionBy(*key_list)
        .orderBy("__us", "__is_left")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # forward frame: left rows sort before equal-ts right rows, so >=
    # ties land inside the following frame
    w_fwd = (
        Window.partitionBy(*key_list)
        .orderBy("__us", F.col("__is_left").desc())
        .rowsBetween(0, Window.unboundedFollowing)
    )
    if direction == "backward":
        carried = tagged.withColumn(
            "__match", F.last("__rv", ignorenulls=True).over(w_back)
        )
        match = _bounded(F.col("__match"), back=True)
    elif direction == "forward":
        carried = tagged.withColumn(
            "__match", F.first("__rv", ignorenulls=True).over(w_fwd)
        )
        match = _bounded(F.col("__match"), back=False)
    else:  # nearest
        carried = tagged.withColumn(
            "__mb", F.last("__rv", ignorenulls=True).over(w_back)
        ).withColumn("__mf", F.first("__rv", ignorenulls=True).over(w_fwd))
        mb = _bounded(F.col("__mb"), back=True)
        mf = _bounded(F.col("__mf"), back=False)
        d_back = F.col("__us") - mb["asof_ts_us"]
        d_fwd = mf["asof_ts_us"] - F.col("__us")
        match = (
            F.when(mb.isNull(), mf)
            .when(mf.isNull(), mb)
            .when(d_fwd < d_back, mf)  # tie -> backward (pandas)
            .otherwise(mb)
        )
    out = carried.filter(F.col("__is_left") == 1)
    return out.select(
        *[F.col(f"__l_{c}").alias(c) for c in left.columns],
        match["asof_ts_us"].alias("asof_ts_us"),
        *[match[c].alias(c) for c in right_cols],
    )


def range_join(
    left: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    interval_id_col: str = "interval_id",
    start_us_col: str = "start_us",
    end_us_col: str = "end_us",
    bucket_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval join (event -> containing window, half-open
    ``[start, end)``), the second temporal join Spark lacks.

    Scale path: a time GRID turns the inequality join into an equi-join
    — each interval explodes onto the ``bucket_seconds`` cells it
    covers, each event hashes to exactly one cell, the join key is the
    cell id, and the containment predicate filters the handful of
    co-bucketed candidates. Shuffles both sides ONCE on well-spread
    grid cells; no BroadcastNestedLoopJoin, no cross product. Intervals
    spanning many cells fan out proportionally (pick ``bucket_seconds``
    near the typical interval length).

    Overlapping intervals produce one output row per containing
    interval. ``how="left"`` keeps events contained in no interval with
    a NULL ``interval_id`` — free here (unlike ``interval_overlap_join``)
    because the point side never fans out: each event owns exactly ONE
    grid cell, so moving the containment predicate into the join's ON
    clause preserves misses without needing a row identity, at the same
    single-shuffle cost as the inner form (pandas ``merge_asof``-style
    enrichment default, cf. the reference's despatch enrichment joins).
    """
    if bucket_seconds <= 0:
        raise ValueError(f"bucket_seconds must be > 0, got {bucket_seconds}")
    if how not in ("inner", "left"):
        raise ValueError(f"range_join supports inner/left, got {how!r}")
    bus = bucket_seconds * 1_000_000
    ev = left.withColumn("__us", ts_micros(ts_col))
    ev = ev.withColumn("__cell", F.expr(f"__us div {bus}"))
    iv = intervals.select(
        F.col(interval_id_col),
        F.col(start_us_col).alias("__s"),
        F.col(end_us_col).alias("__e"),
    )
    # half-open interval: the last covered cell is the one holding e-1
    cells = iv.select(
        interval_id_col,
        "__s",
        "__e",
        F.explode(
            F.sequence(
                F.expr(f"__s div {bus}"), F.expr(f"(__e - 1) div {bus}")
            )
        ).alias("__cell"),
    )
    contained = (F.col("__us") >= F.col("__s")) & (F.col("__us") < F.col("__e"))
    if how == "inner":
        joined = ev.join(cells, "__cell").filter(contained)
    else:
        # containment INSIDE the ON clause: an event whose co-bucketed
        # candidates all fail (or whose cell holds no interval) emits
        # exactly one NULL-extended row — still a cell-keyed equi-join
        cond = (ev["__cell"] == cells["__cell"]) & contained
        joined = ev.join(cells, cond, "left")
    return joined.select(*left.columns, interval_id_col)


def scd2_intervals(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    attr_cols: Sequence[str] = (),
    tiebreak_cols: Sequence[str] = (),
    compact: bool = True,
) -> DataFrame:
    """Build SCD-type-2 validity intervals from an attribute-change
    event stream: one row per (key, version) with ``valid_from_us`` /
    ``valid_to_us`` (exclusive; NULL = current) and ``is_current`` — the
    dimension-table counterpart of ``asof_join`` (join facts to it with
    ``range_join`` on the validity interval, or ``asof_join`` on
    ``valid_from_us``).

    ``compact=True`` first drops rows whose every attribute is
    null-safe-equal to the key's previous row (change-detection
    compaction, lag over the same window — no extra shuffle), THEN
    chains ``valid_to = lead(valid_from)`` over the surviving versions.
    One hash exchange on ``keys`` total; both windows and the filter
    share it.

    ``tiebreak_cols`` totalise the order under timestamp collisions —
    required for a deterministic version chain when two updates share a
    timestamp.
    """
    key_list = list(keys)
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in tiebreak_cols]
    w = Window.partitionBy(*key_list).orderBy(*order)
    out = df
    if compact and attr_cols:
        changed = F.lit(False)
        for c in attr_cols:
            changed = changed | ~F.col(c).eqNullSafe(F.lag(c).over(w))
        first = F.lag(ts_col).over(w).isNull()
        out = out.withColumn("__keep", first | changed).filter("__keep").drop(
            "__keep"
        )
    vf = ts_micros(ts_col)
    out = out.select(
        *key_list,
        *attr_cols,
        vf.alias("valid_from_us"),
        F.lead(vf).over(w).alias("valid_to_us"),
    )
    return out.withColumn("is_current", F.col("valid_to_us").isNull())


def snapshot_diff(
    today: DataFrame,
    previous: DataFrame,
    keys: Sequence[str],
    value_cols: Sequence[str],
) -> DataFrame:
    """Release-QA diff of two snapshots on the same key space: one row
    per key present in either side, with ``status`` in
    {added, removed, changed, same} (null-safe value comparison) plus
    both value sets (``<col>`` today, ``<col>_prev`` previous).

    The reference's release QA eyeballs row counts per release
    (``db_etl_update_db/update.py:24-38``); this is the per-row upgrade
    a real release gate needs. One full-outer sort-merge join on the
    keys — the canonical shape; both sides shuffle once.
    """
    t = today.select(
        *keys, *[F.col(c) for c in value_cols], F.lit(1).alias("__t")
    )
    p = previous.select(
        *keys,
        *[F.col(c).alias(f"{c}_prev") for c in value_cols],
        F.lit(1).alias("__p"),
    )
    joined = t.join(p, on=list(keys), how="full_outer")
    same = F.lit(True)
    for c in value_cols:
        same = same & F.col(c).eqNullSafe(F.col(f"{c}_prev"))
    status = (
        F.when(F.col("__p").isNull(), F.lit("added"))
        .when(F.col("__t").isNull(), F.lit("removed"))
        .when(same, F.lit("same"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(
        *keys,
        *value_cols,
        *[f"{c}_prev" for c in value_cols],
        status.alias("status"),
    )


def apply_changes(
    snapshot: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    seq_col: str = "seq",
    op_col: str = "op",
    delete_op: str = "D",
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Apply a CDC change stream to a snapshot — the lakehouse
    APPLY CHANGES / Debezium-compaction semantic (public: Delta Lake
    docs, Kleppmann DDIA ch.11): per key, only the change with the
    HIGHEST ``(seq, *tiebreaks)`` wins; a winning ``op == delete_op``
    tombstone removes the key (a tombstone for an absent key is a
    no-op); any other winning op upserts the change's row wholesale;
    keys untouched by the stream pass through. Returns the new
    snapshot with exactly the snapshot's columns.

    ``changes`` must carry every snapshot column plus ``seq_col`` and
    ``op_col``; ``tiebreak_cols`` totalise the order under sequence
    collisions (same contract as ``scd2_intervals``) — REQUIRED for a
    deterministic result when one key can hold two changes at one
    sequence number. Malformed change rows raise loudly: a NULL ``op``
    (would silently tombstone) and a NULL value in any key column
    (could never match the anti-join, so an upsert would append a
    duplicate row on EVERY application) both fail with ``assert_true``.

    Plan shape: one window exchange on ``keys`` reduces the stream to
    its per-key winner (the stream is delta-sized, not table-sized);
    the snapshot then LEFT ANTI joins the winners' key set (touched
    rows drop) and the non-tombstone winners union in. At scale the
    winner set is broadcast-sized whenever the delta is — both joins
    collapse to broadcast hash joins and the full table never
    shuffles; with a table-sized backlog the anti join degrades
    gracefully to sort-merge on the same key exchange the window
    already produced.
    """
    key_list = list(keys)
    missing = [
        c
        for c in snapshot.columns + [seq_col, op_col, *tiebreak_cols]
        if c not in changes.columns
    ]
    if missing:
        raise ValueError(
            f"apply_changes: changes is missing columns {missing}"
        )
    order = [F.col(seq_col).desc()] + [
        F.col(c).desc() for c in tiebreak_cols
    ]
    # a NULL key value can never match the left-anti join below, so a
    # NULL-key upsert would APPEND a fresh row on every application
    # (duplicates accumulating across micro-batches) instead of
    # upserting — raise loudly, same convention as the NULL-op guard.
    # The guard is woven into the key columns themselves (an added-
    # then-dropped assert column would be pruned unevaluated).
    def _guarded_key(c: str):
        dt = changes.schema[c].dataType
        return (
            F.when(F.col(c).isNotNull(), F.col(c))
            .otherwise(
                F.assert_true(
                    F.lit(False),
                    F.lit(
                        f"apply_changes: NULL value in key column {c!r} "
                        "in change stream"
                    ),
                ).cast(dt)
            )
            .alias(c)
        )

    guarded = changes.select(
        *[
            _guarded_key(c) if c in key_list else F.col(c)
            for c in changes.columns
        ]
    )
    w = Window.partitionBy(*key_list).orderBy(*order)
    winners = (
        guarded.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    kept = snapshot.join(
        winners.select(*key_list), on=key_list, how="left_anti"
    )
    # a NULL op would fail the != below and silently tombstone the key
    # (the anti-join already dropped it) — malformed input raises loudly
    # instead, matching the engine's degenerate-input convention
    op = F.when(
        F.col(op_col).isNotNull(), F.col(op_col)
    ).otherwise(
        F.assert_true(
            F.lit(False), F.lit("apply_changes: NULL op in change stream")
        ).cast("string")
    )
    upserts = winners.filter(op != delete_op).select(*snapshot.columns)
    return kept.unionByName(upserts)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_id_col: str = "interval_id",
    right_id_col: str = "interval_id",
    start_us_col: str = "start_us",
    end_us_col: str = "end_us",
    bucket_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Interval x interval OVERLAP join (both sides are ranges,
    half-open ``[start, end)``) — the third temporal join Spark lacks,
    completing the family (``asof_join`` point->latest, ``range_join``
    point->containing-interval).

    Same grid trick as ``range_join``: both sides explode onto the
    ``bucket_seconds`` cells they cover and the join is a pure equi-join
    on the cell id. A pair overlapping across many shared cells would
    surface once per cell, so the join keeps only the FIRST shared cell
    — ``cell == greatest(start_cell_l, start_cell_r)`` — which
    deduplicates by construction, with NO distinct shuffle afterwards.
    Overlap test ``l.s < r.e AND r.s < l.e`` runs on the co-bucketed
    candidates only.

    ``how="left"`` keeps left intervals overlapping nothing, with NULL
    ``r_id``/``r_s``/``r_e``. Unlike ``range_join`` the left side DOES
    fan out onto its covered cells, so misses cannot be restored in the
    ON clause (a NULL-extended row would surface once per uncovered
    cell); instead the miss set is recovered by a LEFT ANTI join of the
    left side against the matched ``l_id`` set — ``left_id_col`` must
    therefore be unique per left row. Costs one extra exchange of the
    (narrow, 3-column) left side keyed on the id.

    Shuffles each side once on well-spread grid cells; fan-out per
    interval is its covered-cell count (pick ``bucket_seconds`` near
    the typical interval length, exactly as in ``range_join``).
    """
    if bucket_seconds <= 0:
        raise ValueError(f"bucket_seconds must be > 0, got {bucket_seconds}")
    if how not in ("inner", "left"):
        raise ValueError(
            f"interval_overlap_join supports inner/left, got {how!r}"
        )
    bus = bucket_seconds * 1_000_000

    def cells(df: DataFrame, id_col: str, tag: str) -> DataFrame:
        # EMPTY half-open intervals ([s, s), or malformed e < s) cover
        # no cells and overlap nothing — without this filter the bare
        # predicate l_s < r_e AND r_s < l_e matches a degenerate point
        # lying inside the other interval, and sequence(s div bus,
        # (s-1) div bus) even explodes DESCENDING cells the interval
        # does not cover. Under how="left", filtered-out empty left
        # intervals still surface via the anti-join miss set (with
        # NULL right side), which is the correct "overlaps nothing".
        return (
            df.select(
                F.col(id_col).alias(f"{tag}_id"),
                F.col(start_us_col).alias(f"{tag}_s"),
                F.col(end_us_col).alias(f"{tag}_e"),
            )
            .filter(F.col(f"{tag}_s") < F.col(f"{tag}_e"))
            .select(
                "*",
                F.explode(
                    F.sequence(
                        F.expr(f"{tag}_s div {bus}"),
                        F.expr(f"({tag}_e - 1) div {bus}"),
                    )
                ).alias("__cell"),
            )
        )

    l = cells(left, left_id_col, "l")
    r = cells(right, right_id_col, "r")
    first_shared = F.greatest(
        F.expr(f"l_s div {bus}"), F.expr(f"r_s div {bus}")
    )
    matched = (
        l.join(r, "__cell")
        .filter(
            (F.col("l_s") < F.col("r_e"))
            & (F.col("r_s") < F.col("l_e"))
            & (F.col("__cell") == first_shared)
        )
        .select("l_id", "r_id", "l_s", "l_e", "r_s", "r_e")
    )
    if how == "inner":
        return matched
    misses = (
        left.select(
            F.col(left_id_col).alias("l_id"),
            F.col(start_us_col).alias("l_s"),
            F.col(end_us_col).alias("l_e"),
        )
        .join(matched.select("l_id"), "l_id", "left_anti")
        .select(
            "l_id",
            F.lit(None).cast(matched.schema["r_id"].dataType).alias("r_id"),
            "l_s",
            "l_e",
            F.lit(None).cast(matched.schema["r_s"].dataType).alias("r_s"),
            F.lit(None).cast(matched.schema["r_e"].dataType).alias("r_e"),
        )
    )
    return matched.unionByName(misses)
