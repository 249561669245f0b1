"""Generic as-of join and grid-bucketed range join semantics."""

import re
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from coronavirus_dashboard_pipeline_etl_spark.operators.asof import (
    asof_join,
    range_join,
)


def t(h, m=0, s=0):
    return datetime(2024, 1, 1, h, m, s)


def test_asof_join_backward_semantics(spark):
    left = spark.createDataFrame(
        [(1, 100, t(10)), (1, 101, t(12)), (2, 200, t(9))],
        "user_id long, event_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, t(10), 7), (1, t(11), 8), (2, t(9, 30), 9)],
        "user_id long, ts timestamp, ref long",
    )
    out = {
        r.event_id: (r.ref, r.asof_ts_us)
        for r in asof_join(
            left, right, keys=["user_id"], right_cols=["ref"]
        ).collect()
    }
    # equal timestamp matches (<=); later left rows pick the newest right
    assert out[100][0] == 7
    assert out[101][0] == 8
    # user 2: right row is AFTER the left event -> no match, NULLs
    assert out[200] == (None, None)


def test_asof_join_tolerance_voids_stale_matches(spark):
    left = spark.createDataFrame(
        [(1, 100, t(12))], "user_id long, event_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, t(8), 7)], "user_id long, ts timestamp, ref long"
    )
    ok = asof_join(left, right, ["user_id"], right_cols=["ref"]).collect()[0]
    assert ok.ref == 7
    bounded = asof_join(
        left, right, ["user_id"], right_cols=["ref"], tolerance_seconds=3600
    ).collect()[0]
    assert bounded.ref is None and bounded.asof_ts_us is None


def test_asof_join_one_shuffle_and_collision_guard(spark):
    left = spark.createDataFrame(
        [(1, 100, t(10))], "user_id long, event_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, t(9), 7)], "user_id long, ts timestamp, ref long"
    )
    out = asof_join(left, right, ["user_id"], right_cols=["ref"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1

    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, ["user_id"], right_cols=["event_id"])


def test_range_join_containment_and_overlap(spark):
    ev = spark.createDataFrame(
        [(1, t(0, 30)), (2, t(1)), (3, t(5)), (4, t(2))],
        "event_id long, ts timestamp",
    )
    us = lambda h: 1_704_067_200_000_000 + h * 3_600_000_000
    iv = spark.createDataFrame(
        [(0, us(0), us(2)), (1, us(1), us(3))],  # overlapping
        "interval_id long, start_us long, end_us long",
    )
    got = sorted(
        (r.event_id, r.interval_id)
        for r in range_join(ev, iv, bucket_seconds=1800).collect()
    )
    # ev1 in iv0 only; ev2 in both (boundary: start inclusive);
    # ev3 in none (inner -> drops); ev4 in iv1 only (end exclusive for iv0)
    assert got == [(1, 0), (2, 0), (2, 1), (4, 1)]


def test_range_join_no_nested_loop(spark):
    ev = spark.createDataFrame([(1, t(0, 30))], "event_id long, ts timestamp")
    iv = spark.createDataFrame(
        [(0, 1_704_067_200_000_000, 1_704_070_800_000_000)],
        "interval_id long, start_us long, end_us long",
    )
    plan = (
        range_join(ev, iv)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_scd2_intervals_compaction_and_chain(spark):
    from coronavirus_dashboard_pipeline_etl_spark.operators.asof import (
        scd2_intervals,
    )

    rows = [
        (1, 1, t(9), "free"),
        (2, 1, t(10), "free"),   # no change -> compacted away
        (3, 1, t(11), "pro"),
        (4, 2, t(9), "free"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, plan string"
    )
    out = scd2_intervals(
        df, keys=["user_id"], attr_cols=["plan"], tiebreak_cols=["event_id"]
    ).collect()
    u1 = sorted(
        [(r.plan, r.valid_to_us is None) for r in out if r.user_id == 1]
    )
    assert u1 == [("free", False), ("pro", True)]
    free = next(r for r in out if r.user_id == 1 and r.plan == "free")
    pro = next(r for r in out if r.user_id == 1 and r.plan == "pro")
    # the compacted duplicate must NOT break the chain: free's validity
    # ends exactly where pro begins
    assert free.valid_to_us == pro.valid_from_us
    assert next(r for r in out if r.user_id == 2).is_current


def test_scd2_single_exchange(spark):
    from coronavirus_dashboard_pipeline_etl_spark.operators.asof import (
        scd2_intervals,
    )

    df = spark.createDataFrame(
        [(1, 1, t(9), "a")], "event_id long, user_id long, ts timestamp, v string"
    )
    plan = (
        scd2_intervals(df, ["user_id"], attr_cols=["v"], tiebreak_cols=["event_id"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1


def test_ntile_summary_equal_mass(spark):
    from coronavirus_dashboard_pipeline_etl_spark.functions.curation import (
        ntile_summary,
    )

    df = spark.createDataFrame(
        [(i, float(i % 7)) for i in range(20)], "doc_id long, v double"
    )
    out = {r.tile: r for r in ntile_summary(df, "v", n_tiles=4).collect()}
    assert [out[i].n for i in (1, 2, 3, 4)] == [5, 5, 5, 5]
    assert out[1].tile_min == 0.0 and out[4].tile_max == 6.0
    # tiles are ordered by value: every tile's max <= next tile's min
    for i in (1, 2, 3):
        assert out[i].tile_max <= out[i + 1].tile_min


def test_snapshot_diff_statuses(spark):
    from coronavirus_dashboard_pipeline_etl_spark.operators.asof import (
        snapshot_diff,
    )

    today = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0), ("c", None)],
        "k string, v double",
    )
    prev = spark.createDataFrame(
        [("a", 1.0), ("b", 9.0), ("d", 4.0), ("e", None)],
        "k string, v double",
    )
    got = {
        r.k: r.status
        for r in snapshot_diff(today, prev, keys=["k"], value_cols=["v"]).collect()
    }
    # null-safe compare: c (null today, absent prev) is added; e removed
    assert got == {
        "a": "same", "b": "changed", "c": "added", "d": "removed", "e": "removed",
    }


def test_profile_table_counts(spark):
    import pytest as _pytest

    from coronavirus_dashboard_pipeline_etl_spark.functions.curation import (
        profile_table,
    )

    df = spark.createDataFrame(
        [(1, "x"), (2, None), (3, "x"), (4, "y")],
        "id long, s string",
    )
    out = {r.column_name: r for r in profile_table(df, ("id", "s")).collect()}
    assert out["id"].n_rows == 4 and out["id"].n_nulls == 0
    assert out["id"].n_distinct == 4
    assert out["s"].n_nulls == 1 and out["s"].n_distinct == 2

    with _pytest.raises(ValueError, match="empty column list"):
        profile_table(df, ())


def test_asof_directions_match_pandas_merge_asof(spark):
    """Cross-validate all three directions (and tolerance) against
    pandas.merge_asof on pseudo-random data. Distances are made
    tie-free (left ts odd, right ts even microsecond parity) so the
    nearest tie-break convention difference cannot trigger."""
    import random

    import pandas as pd

    rng = random.Random(42)
    left_rows = [
        (u, i, 2 * rng.randrange(0, 500_000) + 1)  # odd micros
        for i, u in enumerate(rng.choices(range(8), k=300))
    ]
    right_rows = [
        (u, 1000 + i, 2 * rng.randrange(0, 500_000))  # even micros
        for i, u in enumerate(rng.choices(range(8), k=200))
    ]
    # make right unique per (user, ts)
    seen = set()
    right_rows = [
        r for r in right_rows
        if (r[0], r[2]) not in seen and not seen.add((r[0], r[2]))
    ]

    left = spark.createDataFrame(
        [(u, i, ts) for u, i, ts in left_rows],
        "user_id long, event_id long, us long",
    ).select(
        "user_id", "event_id",
        F.timestamp_micros(F.col("us")).alias("ts"),
    )
    right = spark.createDataFrame(
        [(u, r, ts) for u, r, ts in right_rows],
        "user_id long, ref long, us long",
    ).select(
        "user_id", "ref", F.timestamp_micros(F.col("us")).alias("ts")
    )

    lpd = pd.DataFrame(
        left_rows, columns=["user_id", "event_id", "us"]
    ).sort_values("us").reset_index(drop=True)
    rpd = pd.DataFrame(
        right_rows, columns=["user_id", "ref", "us"]
    ).sort_values("us").reset_index(drop=True)

    for direction in ("backward", "forward", "nearest"):
        for tol_s in (None, 1):  # tolerance in whole seconds
            got = {
                r.event_id: (r.ref, r.asof_ts_us)
                for r in asof_join(
                    left, right, ["user_id"], right_cols=["ref"],
                    direction=direction, tolerance_seconds=tol_s,
                ).collect()
            }
            kw = {}
            if tol_s is not None:
                kw["tolerance"] = tol_s * 1_000_000  # integer micros
            exp_df = pd.merge_asof(
                lpd, rpd, on="us", by="user_id",
                direction=direction, suffixes=("", "_r"), **kw,
            )
            # pandas keeps the matched right 'us' only via the ref row;
            # recover matched ts by joining ref -> us
            ref_ts = dict(zip(rpd["ref"], rpd["us"]))
            for _, row in exp_df.iterrows():
                ref = None if pd.isna(row["ref"]) else int(row["ref"])
                exp_ts = ref_ts.get(ref) if ref is not None else None
                assert got[int(row["event_id"])] == (ref, exp_ts), (
                    direction, tol_s, row["event_id"],
                    got[int(row["event_id"])], (ref, exp_ts),
                )


def test_apply_changes_rules(spark):
    """CDC apply: latest-wins per (seq, tiebreak), tombstone deletes,
    tombstone for an absent key is a no-op, insert creates, untouched
    keys pass through, and the result carries exactly the snapshot's
    columns."""
    import pytest
    from pyspark.sql import functions as F

    from coronavirus_dashboard_pipeline_etl_spark.operators.asof import apply_changes

    snap = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)],
        "id long, name string, val double",
    )
    changes = spark.createDataFrame(
        [
            # id 1: update then delete (delete wins at seq 2)
            (1, "a", 11.0, 1, "U", "s1"),
            (1, "a", 11.0, 2, "D", "s1"),
            # id 2: two seq-2 updates -> tiebreak 's2' > 's1'
            (2, "b", 21.0, 2, "U", "s1"),
            (2, "b2", 22.0, 2, "U", "s2"),
            # id 3: delete then reinstate at higher seq
            (3, "c", 30.0, 1, "D", "s1"),
            (3, "c2", 33.0, 2, "U", "s1"),
            # id 5: fresh insert; id 9: tombstone for absent key
            (5, "e", 50.0, 1, "I", "s1"),
            (9, "x", 0.0, 1, "D", "s1"),
        ],
        "id long, name string, val double, seq long, op string, src string",
    )
    out = apply_changes(
        snap, changes, keys=["id"], tiebreak_cols=["src"]
    )
    assert out.columns == snap.columns
    got = {r.id: (r.name, r.val) for r in out.collect()}
    assert got == {
        2: ("b2", 22.0),
        3: ("c2", 33.0),
        4: ("d", 40.0),
        5: ("e", 50.0),
    }

    with pytest.raises(ValueError, match="missing columns"):
        apply_changes(snap, changes.drop("op"), keys=["id"])


def test_apply_changes_sequential_equals_union(spark):
    """Composability: applying change waves one at a time (in seq
    order) equals applying the union in one shot — the property that
    lets a CDC consumer batch arbitrarily. Holds because per-key
    latest-wins is associative when wave boundaries respect seq
    order."""
    import random

    from coronavirus_dashboard_pipeline_etl_spark.operators.asof import (
        apply_changes,
    )

    rng = random.Random(11)
    snap_rows = [(i, float(i * 10)) for i in range(40)]
    snap = spark.createDataFrame(snap_rows, "id long, val double")
    waves = []
    for seq in (1, 2, 3):
        rows = []
        for i in range(60):  # ids 0..59: some absent from snapshot
            r = rng.random()
            if r < 0.4:
                continue
            op = "D" if r < 0.6 else "U"
            rows.append((i, float(seq * 1000 + i), seq, op, f"s{seq}"))
        waves.append(
            spark.createDataFrame(
                rows, "id long, val double, seq long, op string, src string"
            )
        )

    seq_applied = snap
    for w in waves:
        seq_applied = apply_changes(
            seq_applied, w, keys=["id"], tiebreak_cols=["src"]
        )
    union = waves[0]
    for w in waves[1:]:
        union = union.unionByName(w)
    one_shot = apply_changes(
        snap, union, keys=["id"], tiebreak_cols=["src"]
    )
    a = {(r.id, r.val) for r in seq_applied.collect()}
    b = {(r.id, r.val) for r in one_shot.collect()}
    assert a == b and a  # non-vacuous


def test_apply_changes_null_op_raises(spark):
    """A winning change with a NULL op must raise loudly — without the
    guard the anti-join has already dropped the key, so a malformed
    extract would silently tombstone rows."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from coronavirus_dashboard_pipeline_etl_spark.operators.asof import (
        apply_changes,
    )

    snap = spark.createDataFrame([(1, 10.0)], "id long, val double")
    changes = spark.createDataFrame(
        [(1, 11.0, 1, None)], "id long, val double, seq long, op string"
    )
    with pytest.raises(
        (SparkRuntimeException, Py4JJavaError), match="NULL op"
    ):
        apply_changes(snap, changes, keys=["id"]).collect()

    import pytest as _pt
    with _pt.raises(ValueError, match="missing columns.*src"):
        apply_changes(
            snap,
            changes,
            keys=["id"],
            tiebreak_cols=["src"],
        )


def test_apply_changes_null_key_raises(spark):
    """A change with a NULL key value must raise loudly: NULL never
    matches the left-anti join, so a NULL-key upsert would APPEND a
    fresh row on every application — duplicates accumulating across
    micro-batches — instead of upserting (round-11 advice)."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from coronavirus_dashboard_pipeline_etl_spark.operators.asof import (
        apply_changes,
    )

    snap = spark.createDataFrame([(1, 10.0)], "id long, val double")
    changes = spark.createDataFrame(
        [(None, 11.0, 1, "U")], "id long, val double, seq long, op string"
    )
    with pytest.raises(
        (SparkRuntimeException, Py4JJavaError), match="NULL value in key"
    ):
        apply_changes(snap, changes, keys=["id"]).collect()

    # a NULL-key tombstone is equally malformed — and equally caught
    # (the winner's key is evaluated by the anti-join side too)
    tomb = spark.createDataFrame(
        [(None, 0.0, 1, "D")], "id long, val double, seq long, op string"
    )
    with pytest.raises(
        (SparkRuntimeException, Py4JJavaError), match="NULL value in key"
    ):
        apply_changes(snap, tomb, keys=["id"]).collect()

    # NULL keys already IN the snapshot are untouched-rows territory:
    # they pass through (no change targets them — guard is on the
    # change stream only)
    snap_null = spark.createDataFrame(
        [(1, 10.0), (None, 99.0)], "id long, val double"
    )
    ok = spark.createDataFrame(
        [(1, 11.0, 1, "U")], "id long, val double, seq long, op string"
    )
    got = {
        (r.id, r.val)
        for r in apply_changes(snap_null, ok, keys=["id"]).collect()
    }
    assert got == {(1, 11.0), (None, 99.0)}
