"""Deterministic HLL / count-min sketch semantics, merge laws, and the
nearest/forward as-of directions plus duplicated-span detection added in
round 5."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from coronavirus_dashboard_pipeline_etl_spark.functions.sketches import (
    countmin_lookup,
    countmin_sketch,
    hll_merge,
    hll_registers,
    hll_summary,
)
from coronavirus_dashboard_pipeline_etl_spark.functions.dedup import (
    duplicated_spans,
)
from coronavirus_dashboard_pipeline_etl_spark.operators.asof import asof_join


def _items(spark, n, tag=""):
    return spark.range(n).select(
        F.concat(F.lit(tag), F.col("id").cast("string")).alias("it")
    )


def test_hll_registers_bounded_and_deterministic(spark):
    df = _items(spark, 5000)
    r1 = hll_registers(df, F.col("it"), p=8)
    rows = r1.collect()
    assert len(rows) <= 256
    assert all(0 <= r.bucket < 256 for r in rows)
    assert all(1 <= r.max_rank <= 53 for r in rows)
    # rerun identical (pure function of md5)
    r2 = sorted((r.bucket, r.max_rank) for r in hll_registers(df, F.col("it"), p=8).collect())
    assert r2 == sorted((r.bucket, r.max_rank) for r in rows)


def test_hll_merge_equals_whole(spark):
    a = _items(spark, 3000)
    b = spark.range(2000, 6000).select(F.col("id").cast("string").alias("it"))
    whole = a.unionByName(b)
    merged = hll_merge(
        hll_registers(a, F.col("it"), p=7), hll_registers(b, F.col("it"), p=7)
    )
    expect = sorted(
        (r.bucket, r.max_rank)
        for r in hll_registers(whole, F.col("it"), p=7).collect()
    )
    assert sorted((r.bucket, r.max_rank) for r in merged.collect()) == expect


def test_hll_estimate_accuracy(spark):
    # p=10 -> typical rel error ~ 1.04/sqrt(1024) ~ 3.3%; assert a loose 15%
    df = _items(spark, 20000)
    regs = hll_registers(df, F.col("it"), p=10)
    est = hll_summary(regs, p=10).collect()[0]
    assert est.m == 1024
    assert abs(est.raw_estimate - 20000) / 20000 < 0.15


def test_hll_duplicates_do_not_move_estimate(spark):
    base = _items(spark, 1000)
    dup = base.unionByName(base).unionByName(base)
    r_base = sorted(
        (r.bucket, r.max_rank)
        for r in hll_registers(base, F.col("it"), p=8).collect()
    )
    r_dup = sorted(
        (r.bucket, r.max_rank)
        for r in hll_registers(dup, F.col("it"), p=8).collect()
    )
    assert r_base == r_dup


def test_hll_p_validation(spark):
    df = _items(spark, 10)
    with pytest.raises(ValueError):
        hll_registers(df, F.col("it"), p=3)
    with pytest.raises(ValueError):
        hll_registers(df, F.col("it"), p=17)


def test_countmin_never_undercounts(spark):
    # skewed stream: item k appears k times, k in 1..60
    df = spark.range(60).select(
        (F.col("id") + 1).alias("k")
    ).select(F.explode(F.sequence(F.lit(1), F.col("k"))).alias("_"), "k")
    sk = countmin_sketch(df, F.col("k").cast("string"), depth=3, width=64)
    true = df.groupBy("k").count().withColumnRenamed("count", "true_n")
    est = countmin_lookup(
        sk, true, F.col("k").cast("string"), depth=3, width=64
    ).collect()
    assert all(r.cm_estimate >= r.true_n for r in est)
    # sketch is bounded regardless of cardinality
    assert sk.count() <= 3 * 64


def test_countmin_merge_by_union_sum(spark):
    a = _items(spark, 500)
    b = _items(spark, 500)  # identical items -> counts double
    sa = countmin_sketch(a, F.col("it"), depth=2, width=32)
    sb = countmin_sketch(b, F.col("it"), depth=2, width=32)
    merged = (
        sa.unionByName(sb).groupBy("row", "col").agg(F.sum("cnt").alias("cnt"))
    )
    whole = countmin_sketch(
        a.unionByName(b), F.col("it"), depth=2, width=32
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_countmin_validation(spark):
    df = _items(spark, 5)
    with pytest.raises(ValueError):
        countmin_sketch(df, F.col("it"), depth=0)
    with pytest.raises(ValueError):
        countmin_sketch(df, F.col("it"), width=1)


# --------------------------------------------------------------------------
# as-of directions
# --------------------------------------------------------------------------

def _t(h, m=0):
    return datetime(2024, 1, 1, h, m)


@pytest.fixture()
def asof_frames(spark):
    left = spark.createDataFrame(
        [(1, 100, _t(10)), (1, 101, _t(12)), (1, 102, _t(14))],
        "user_id long, event_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, _t(9), 7), (1, _t(11, 30), 8), (1, _t(13), 9)],
        "user_id long, ts timestamp, ref long",
    )
    return left, right


def test_asof_forward(spark, asof_frames):
    left, right = asof_frames
    out = {
        r.event_id: r.ref
        for r in asof_join(
            left, right, ["user_id"], right_cols=["ref"], direction="forward"
        ).collect()
    }
    # 10:00 -> next right at 11:30; 12:00 -> 13:00; 14:00 -> none
    assert out == {100: 8, 101: 9, 102: None}


def test_asof_forward_equal_ts_matches(spark):
    left = spark.createDataFrame(
        [(1, 100, _t(11))], "user_id long, event_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, _t(11), 5)], "user_id long, ts timestamp, ref long"
    )
    row = asof_join(
        left, right, ["user_id"], right_cols=["ref"], direction="forward"
    ).collect()[0]
    assert row.ref == 5


def test_asof_nearest_picks_closer_and_ties_backward(spark):
    left = spark.createDataFrame(
        # 11:00 is 60m from 10:00 and 30m from 11:30 -> forward wins;
        # 12:00 is exactly 30m from both 11:30 and 12:30 -> backward wins
        [(1, 100, _t(11)), (1, 101, _t(12))],
        "user_id long, event_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, _t(10), 1), (1, _t(11, 30), 2), (1, _t(12, 30), 3)],
        "user_id long, ts timestamp, ref long",
    )
    out = {
        r.event_id: r.ref
        for r in asof_join(
            left, right, ["user_id"], right_cols=["ref"], direction="nearest"
        ).collect()
    }
    assert out == {100: 2, 101: 2}


def test_asof_nearest_tolerance_bounds_both_sides(spark):
    left = spark.createDataFrame(
        [(1, 100, _t(12))], "user_id long, event_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, _t(8), 1), (1, _t(15), 2)], "user_id long, ts timestamp, ref long"
    )
    # within 4h: backward (8:00) exactly at bound matches; forward 15:00 (3h) nearer
    near = asof_join(
        left, right, ["user_id"], right_cols=["ref"],
        direction="nearest", tolerance_seconds=4 * 3600,
    ).collect()[0]
    assert near.ref == 2
    # 1h tolerance: both out of range -> NULL
    none = asof_join(
        left, right, ["user_id"], right_cols=["ref"],
        direction="nearest", tolerance_seconds=3600,
    ).collect()[0]
    assert none.ref is None and none.asof_ts_us is None


def test_asof_direction_validation(spark, asof_frames):
    left, right = asof_frames
    with pytest.raises(ValueError):
        asof_join(left, right, ["user_id"], direction="sideways")


# --------------------------------------------------------------------------
# duplicated spans
# --------------------------------------------------------------------------

def test_duplicated_spans_finds_shared_passage(spark):
    shared = "the quick brown fox jumps over the lazy dog"  # 9 tokens
    docs = spark.createDataFrame(
        [
            (1, "intro words " + shared + " tail one"),
            (2, "other prefix here " + shared),
            (3, "completely different text with no repeats at all ok"),
        ],
        "doc_id long, text string",
    )
    out = duplicated_spans(docs, span_tokens=8, min_docs=2).collect()
    # 9-token shared passage -> two overlapping 8-token spans, both in docs 1+2
    assert len(out) == 2
    assert all(r.n_docs == 2 and r.first_doc == 1 for r in out)


def test_duplicated_spans_short_docs_and_repeats(spark):
    docs = spark.createDataFrame(
        [(1, "too short"), (2, "a b c a b c a b c a b c")],
        "doc_id long, text string",
    )
    # within-doc repetition alone never reaches min_docs=2
    assert duplicated_spans(docs, span_tokens=4, min_docs=2).count() == 0
    one = duplicated_spans(docs, span_tokens=4, min_docs=1)
    rows = one.collect()
    assert all(r.n_docs == 1 for r in rows)
    # doc 2 has repeated 4-grams: some fp must have n_occurrences > 1
    assert any(r.n_occurrences > 1 for r in rows)
    with pytest.raises(ValueError):
        duplicated_spans(docs, span_tokens=0)


# --------------------------------------------------------------------------
# sketches as LIVE streaming aggregates (registers/counters are classic
# monotone/commutative state, so the same DataFrame code runs unchanged
# on a readStream frame)
# --------------------------------------------------------------------------

def test_hll_registers_stream_matches_batch(spark, tmp_path):
    import json as _json

    in_dir, ckpt = tmp_path / "in", tmp_path / "ckpt"
    in_dir.mkdir()
    (in_dir / "b1.json").write_text(
        "\n".join(_json.dumps({"it": f"x{i}"}) for i in range(400))
    )
    (in_dir / "b2.json").write_text(
        "\n".join(_json.dumps({"it": f"x{i}"}) for i in range(200, 700))
    )
    stream = (
        spark.readStream.format("json")
        .schema("it string")
        .option("maxFilesPerTrigger", 1)
        .load(str(in_dir))
    )
    q = (
        hll_registers(stream, F.col("it"), p=7)
        .writeStream.format("memory")
        .queryName("hll_stream_test")
        .outputMode("complete")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r.bucket, r.max_rank)
        for r in spark.sql("SELECT * FROM hll_stream_test").collect()
    )
    batch = spark.createDataFrame(
        [(f"x{i}",) for i in range(700)], "it string"
    )
    expect = sorted(
        (r.bucket, r.max_rank)
        for r in hll_registers(batch, F.col("it"), p=7).collect()
    )
    assert got == expect


def test_countmin_stream_matches_batch(spark, tmp_path):
    import json as _json

    in_dir, ckpt = tmp_path / "in", tmp_path / "ckpt"
    in_dir.mkdir()
    rows = [f"k{i % 30}" for i in range(500)]
    (in_dir / "b1.json").write_text(
        "\n".join(_json.dumps({"it": r}) for r in rows[:250])
    )
    (in_dir / "b2.json").write_text(
        "\n".join(_json.dumps({"it": r}) for r in rows[250:])
    )
    stream = (
        spark.readStream.format("json")
        .schema("it string")
        .option("maxFilesPerTrigger", 1)
        .load(str(in_dir))
    )
    q = (
        countmin_sketch(stream, F.col("it"), depth=3, width=64)
        .writeStream.format("memory")
        .queryName("cm_stream_test")
        .outputMode("complete")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        map(tuple, spark.sql("SELECT * FROM cm_stream_test").collect())
    )
    batch = spark.createDataFrame([(r,) for r in rows], "it string")
    expect = sorted(
        map(tuple, countmin_sketch(batch, F.col("it"), depth=3, width=64).collect())
    )
    assert got == expect


def test_hll_grouped_matches_per_group_filter(spark):
    df = spark.range(3000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        F.col("id").cast("string").alias("it"),
    )
    grouped = hll_registers(df, F.col("it"), p=7, group_cols=("g",))
    for g in ("0", "1", "2"):
        solo = sorted(
            (r.bucket, r.max_rank)
            for r in hll_registers(
                df.filter(F.col("g") == g), F.col("it"), p=7
            ).collect()
        )
        sub = sorted(
            (r.bucket, r.max_rank)
            for r in grouped.filter(F.col("g") == g).collect()
        )
        assert sub == solo
    summ = hll_summary(grouped, p=7, group_cols=("g",))
    rows = {r.g: r for r in summ.collect()}
    assert len(rows) == 3
    for g, r in rows.items():
        assert abs(r.raw_estimate - 1000) / 1000 < 0.3


def test_sketches_ignore_null_items(spark):
    with_nulls = spark.createDataFrame(
        [("a",), ("b",), (None,), (None,)], "it string"
    )
    clean = spark.createDataFrame([("a",), ("b",)], "it string")
    r_n = sorted(map(tuple, hll_registers(with_nulls, F.col("it"), p=4).collect()))
    r_c = sorted(map(tuple, hll_registers(clean, F.col("it"), p=4).collect()))
    assert r_n == r_c and all(b is not None for b, _ in r_n)
    s_n = sorted(map(tuple, countmin_sketch(with_nulls, F.col("it"), 2, 8).collect()))
    s_c = sorted(map(tuple, countmin_sketch(clean, F.col("it"), 2, 8).collect()))
    assert s_n == s_c
    # NULL candidate estimates NULL (never a fake exact 0)
    est = countmin_lookup(
        countmin_sketch(with_nulls, F.col("it"), 2, 8),
        with_nulls.distinct(), F.col("it"), 2, 8,
    ).collect()
    by_item = {r.it: r.cm_estimate for r in est}
    assert by_item[None] is None
    assert by_item["a"] >= 1 and by_item["b"] >= 1


def test_countmin_lookup_candidate_name_collisions(spark):
    import pytest as _pytest

    df = spark.createDataFrame([("a",), ("a",), ("b",)], "it string")
    sk = countmin_sketch(df, F.col("it"), depth=2, width=8)
    # candidates carrying row/col/cnt columns must survive the probe
    cands = spark.createDataFrame(
        [("a", 1, 2, 3), ("b", 4, 5, 6)], "it string, row int, col int, cnt int"
    )
    out = {r.it: r.cm_estimate
           for r in countmin_lookup(sk, cands, F.col("it"), 2, 8).collect()}
    assert out == {"a": 2, "b": 1}
    with _pytest.raises(ValueError):
        countmin_lookup(
            sk, cands.withColumnRenamed("row", "__row"), F.col("it"), 2, 8
        )


def test_bloom_no_false_negatives_and_merge(spark):
    from coronavirus_dashboard_pipeline_etl_spark.functions.sketches import (
        bloom_bits,
        bloom_probe,
    )

    a = _items(spark, 300)
    b = spark.range(300, 600).select(F.col("id").cast("string").alias("it"))
    bits_a = bloom_bits(a, F.col("it"), m_bits=4096, k_hashes=3)
    bits_b = bloom_bits(b, F.col("it"), m_bits=4096, k_hashes=3)
    merged = bits_a.unionByName(bits_b).distinct()
    whole = bloom_bits(a.unionByName(b), F.col("it"), m_bits=4096, k_hashes=3)
    assert sorted(r.bit for r in merged.collect()) == sorted(
        r.bit for r in whole.collect()
    )
    # every inserted item probes true; bit table bounded
    probe = bloom_probe(whole, a.unionByName(b), F.col("it"), 4096, 3)
    assert probe.filter(~F.col("maybe_present")).count() == 0
    assert whole.count() <= 4096
    # items far outside the set mostly probe false (fp rate sane)
    absent = spark.range(100000, 101000).select(
        F.col("id").cast("string").alias("it")
    )
    fp = bloom_probe(whole, absent, F.col("it"), 4096, 3)
    assert fp.filter(F.col("maybe_present")).count() < 200
    # NULL candidate -> NULL verdict
    null_probe = bloom_probe(
        whole,
        spark.createDataFrame([(None,)], "it string"),
        F.col("it"), 4096, 3,
    ).collect()[0]
    assert null_probe.maybe_present is None


def test_hll_grouped_by_event_time_window_streams(spark, tmp_path):
    """Grouped HLL keyed by an event-time window runs as a live
    streaming aggregation (complete mode) and matches batch — the
    distinct-per-hour monitoring shape."""
    import json as _json

    in_dir, ckpt = tmp_path / "in", tmp_path / "ckpt"
    in_dir.mkdir()
    rows = [
        {"it": f"u{i % 37}", "ts": f"2024-01-01T{10 + (i % 2):02d}:0{i % 6}:00"}
        for i in range(200)
    ]
    (in_dir / "b1.json").write_text(
        "\n".join(_json.dumps(r) for r in rows[:100])
    )
    (in_dir / "b2.json").write_text(
        "\n".join(_json.dumps(r) for r in rows[100:])
    )
    schema = "it string, ts timestamp"

    def sketch(df):
        win = df.withColumn(
            "hour", F.date_format(F.window("ts", "1 hour").start, "HH")
        )
        return hll_registers(win, F.col("it"), p=6, group_cols=("hour",))

    stream = (
        spark.readStream.format("json").schema(schema)
        .option("maxFilesPerTrigger", 1).load(str(in_dir))
    )
    q = (
        sketch(stream)
        .writeStream.format("memory").queryName("hll_win_test")
        .outputMode("complete")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = sorted(
        map(tuple, spark.sql("SELECT * FROM hll_win_test").collect())
    )
    batch = spark.createDataFrame(
        [(r["it"], r["ts"].replace("T", " ")) for r in rows],
        "it string, ts string",
    ).selectExpr("it", "CAST(ts AS TIMESTAMP) ts")
    expect = sorted(map(tuple, sketch(batch).collect()))
    assert got == expect


def test_histogram_quantiles_bounded_error_and_merge_equivalence(spark):
    from coronavirus_dashboard_pipeline_etl_spark.functions.sketches import (
        histogram_quantiles,
    )

    df = spark.range(10000).select((F.col("id") % 1000).cast("double").alias("v"))
    qs = (0.1, 0.5, 0.9)
    out = {r.q: r.est for r in
           histogram_quantiles(df, "v", 0.0, 1000.0, 100, qs).collect()}
    # uniform 0..999: true quantile ~ q*1000; bucket width 10 bounds error
    for q in qs:
        assert abs(out[q] - q * 1000) <= 10 + 1e-9, (q, out[q])
    with pytest.raises(ValueError):
        histogram_quantiles(df, "v", 0.0, 1000.0, 100, ())
    with pytest.raises(ValueError):
        histogram_quantiles(df, "v", 0.0, 1000.0, 100, (0.0,))


def test_hll_summary_empty_input_is_empty_sketch(spark):
    # SUM over zero rows is NULL; the ungrouped one-row summary must
    # still carry the empty-sketch values: v_empty = m and
    # s_scaled = m * 2^(61-p) (every bucket contributes 2^(61-p)),
    # raw_estimate ~ alpha_m * m — not NULLs (ADVICE r5)
    p = 7
    m = 1 << p
    empty = _items(spark, 5).filter(F.lit(False))
    regs = hll_registers(empty, F.col("it"), p=p)
    row = hll_summary(regs, p=p).collect()[0]
    assert row.m == m and row.v_empty == m
    assert row.s_scaled == m * (1 << (61 - p))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    assert abs(row.raw_estimate - alpha * m) < 1e-9


def test_kmv_sketch_exact_and_estimate(spark):
    """KMV: unsaturated sketches are the exact distinct set (estimate
    == exact count); saturated sketches keep exactly k ascending
    values and the estimator lands within the published error bound
    (~1/sqrt(k)) on a known cardinality."""
    from pyspark.sql import functions as F

    from coronavirus_dashboard_pipeline_etl_spark.functions.sketches import (
        kmv_estimate,
        kmv_sketch,
    )

    # 2000 distinct values, each duplicated 3x, one group
    rows = [(i % 2000,) for i in range(6000)]
    df = spark.createDataFrame(rows, "v long")
    sk = kmv_sketch(df, F.col("v").cast("string"), k=64).select(
        "sketch",
        "n_kept",
        kmv_estimate(F.col("sketch"), F.col("n_kept"), 64).alias("est"),
    )
    r = sk.first()
    assert r["n_kept"] == 64
    assert list(r["sketch"]) == sorted(r["sketch"])
    assert abs(r["est"] - 2000) / 2000 < 3 / (64 ** 0.5)  # 3 sigma

    small = spark.createDataFrame([(i,) for i in range(10)], "v long")
    r2 = (
        kmv_sketch(small, F.col("v").cast("string"), k=64)
        .select(
            "n_kept",
            kmv_estimate(F.col("sketch"), F.col("n_kept"), 64).alias("est"),
        )
        .first()
    )
    assert r2["n_kept"] == 10 and r2["est"] == 10.0


def test_kmv_pairwise_matches_exact_on_unsaturated(spark):
    """When both sketches are unsaturated the pairwise estimates are
    EXACT: jaccard/union/intersection equal the true set values."""
    from pyspark.sql import functions as F

    from coronavirus_dashboard_pipeline_etl_spark.functions.sketches import (
        kmv_pairwise,
        kmv_sketch,
    )

    rows = [("a", v) for v in range(0, 30)] + [
        ("b", v) for v in range(20, 50)
    ]
    df = spark.createDataFrame(rows, "g string, v long")
    sk = kmv_sketch(
        df, F.col("v").cast("string"), k=128, group_cols=("g",)
    )
    r = kmv_pairwise(sk, "g", k=128).first()
    assert (r["g_a"], r["g_b"]) == ("a", "b")
    assert r["overlap_k"] == 10  # |{20..29}|
    assert r["union_est"] == 50.0
    assert abs(r["jaccard_est"] - 10 / 50) < 1e-12
    assert abs(r["intersect_est"] - 10.0) < 1e-9


def test_kmv_sketch_merge_equals_direct(spark):
    """KMV merge contract (kmv_merge): pooling per-shard sketches'
    already-hashed values and keeping the k smallest distinct equals
    sketching the full corpus directly — schema and values — the
    property that makes it a mergeable distributed aggregate."""
    from pyspark.sql import functions as F

    from coronavirus_dashboard_pipeline_etl_spark.functions.sketches import (
        kmv_merge,
        kmv_sketch,
    )

    rows = [(("s1" if v % 2 == 0 else "s2"), v % 700) for v in range(4000)]
    df = spark.createDataFrame(rows, "shard string, v long")
    k = 32
    direct = kmv_sketch(df, F.col("v").cast("string"), k=k).first()

    shard_sketches = kmv_sketch(
        df, F.col("v").cast("string"), k=k, group_cols=("shard",)
    )
    merged = kmv_merge(shard_sketches.drop("shard"), k=k).first()
    assert list(merged["sketch"]) == list(direct["sketch"])
    assert merged["n_kept"] == direct["n_kept"] == k
