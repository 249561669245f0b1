"""Fixed-point PageRank + hashed linear classifier unit coverage.

The gate (pr1/t8, tools/run_gate.py) pins cross-engine exactness; these
tests pin the ALGORITHM against hand-computed / pure-Python references
on graphs small enough to reason about.
"""

import pyspark.sql.functions as F

from coronavirus_dashboard_pipeline_etl_spark.functions.graph import (
    UNIT,
    bipartite_edges,
    pagerank_fixed_point,
)
from coronavirus_dashboard_pipeline_etl_spark.functions.text import (
    hashed_classifier_score,
)


def _ranks(df):
    return {r["node"]: r["rank_int"] for r in df.collect()}


def test_two_node_cycle_is_stationary(spark):
    # a <-> b: contributions are the full rank each way; the uniform
    # distribution is stationary, so every iteration returns UNIT
    # (up to the documented integer-division epsilon: none here).
    edges = spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long")
    got = _ranks(pagerank_fixed_point(edges, n_iter=4))
    base = 15 * UNIT // 100
    expect = UNIT
    for _ in range(4):
        expect = base + 85 * expect // 100
    assert got == {0: expect, 1: expect}


def test_one_iteration_matches_hand_computation(spark):
    # star: 0->1, 0->2, 1->0, 2->0 (symmetrised star). outdeg(0)=2.
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 0), (2, 0)], "src long, dst long"
    )
    got = _ranks(pagerank_fixed_point(edges, n_iter=1))
    base = 15 * UNIT // 100
    # node 0 receives UNIT from 1 and UNIT from 2; nodes 1,2 each
    # receive UNIT div 2 from 0.
    assert got[0] == base + 85 * (2 * UNIT) // 100
    assert got[1] == got[2] == base + 85 * (UNIT // 2) // 100


def test_python_reference_simulation(spark):
    # arbitrary digraph, every node has an out-edge; compare 3 rounds
    # against a literal pure-Python simulation of the fixed-point rule.
    raw = [(0, 1), (1, 2), (2, 0), (2, 1), (3, 0), (0, 3), (1, 3)]
    edges = spark.createDataFrame(raw, "src long, dst long")
    nodes = sorted({s for s, _ in raw})
    outdeg = {n: sum(1 for s, _ in raw if s == n) for n in nodes}
    rank = {n: UNIT for n in nodes}
    base = 15 * UNIT // 100
    for _ in range(3):
        inc = {n: 0 for n in nodes}
        for s, d in raw:
            inc[d] += rank[s] // outdeg[s]
        rank = {n: base + 85 * inc[n] // 100 for n in nodes}
    got = _ranks(pagerank_fixed_point(edges, n_iter=3))
    assert got == rank


def test_mass_decay_is_bounded(spark):
    # integer truncation only ever DROPS sub-unit remainders: total
    # mass stays within n_edges + n_nodes units of the damped total.
    raw = [(i, (i * 7 + 1) % 23) for i in range(23)] + [
        ((i * 7 + 1) % 23, i) for i in range(23)
    ]
    edges = spark.createDataFrame(raw, "src long, dst long")
    out = pagerank_fixed_point(edges, n_iter=3)
    total = out.agg(F.sum("rank_int")).collect()[0][0]
    n_nodes = out.count()
    assert total <= n_nodes * UNIT
    assert total >= n_nodes * UNIT - 3 * (len(raw) + n_nodes) * 100


def test_bipartite_edges_no_dangling(spark):
    pairs = spark.createDataFrame(
        [(1, 10), (2, 10), (2, 20)], "c long, s long"
    )
    e = bipartite_edges(pairs, "c", "s", right_offset=1000)
    rows = {(r["src"], r["dst"]) for r in e.collect()}
    assert rows == {
        (1, 1010), (2, 1010), (2, 1020),
        (1010, 1), (1010, 2), (1020, 2),
    }
    srcs = {s for s, _ in rows}
    dsts = {d for _, d in rows}
    assert dsts <= srcs  # every destination can forward its mass


def test_classifier_matches_python_reference(spark):
    import hashlib

    weights = [((b * 31) % 201) - 100 for b in range(64)]

    def bucket(tok: str) -> int:
        return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % 64

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma", "en"), (2, "", "en"), (3, "alpha", "en")],
        "doc_id long, text string, lang string",
    )
    out = {
        r["doc_id"]: r
        for r in hashed_classifier_score(
            docs, weights=weights, threshold=0.0
        ).collect()
    }
    for doc_id, text in [(1, "alpha beta gamma"), (3, "alpha")]:
        toks = [t for t in text.split(" ") if t]
        raw = sum(weights[bucket(t)] for t in toks)
        assert out[doc_id]["score_raw"] == raw
        assert out[doc_id]["score"] == raw / (len(toks) * 1000)
        assert out[doc_id]["label"] == (out[doc_id]["score"] >= 0.0)
    # empty doc: NULL score, label false, raw == bias == 0
    assert out[2]["score_raw"] == 0
    assert out[2]["score"] is None
    assert out[2]["label"] is False


def test_classifier_bias_and_threshold(spark):
    docs = spark.createDataFrame(
        [(1, "x x x x", "en")], "doc_id long, text string, lang string"
    )
    weights = [0] * 8
    out = hashed_classifier_score(
        docs, weights=weights, bias=4000, threshold=0.5
    ).collect()[0]
    assert out["score_raw"] == 4000
    assert out["score"] == 4000 / (4 * 1000)
    assert out["label"] is True


def test_moment_stats_matches_statistics_module(spark):
    import statistics

    from coronavirus_dashboard_pipeline_etl_spark.functions.curation import (
        moment_stats,
    )

    rows = [("a", 1.5, 10.0), ("a", 2.5, 20.0), ("a", 4.0, 15.0),
            ("b", 7.0, 1.0), ("b", 7.0, 2.0), ("c", 3.0, 9.0)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = {r["g"]: r for r in moment_stats(df, ("g",), "x", "y").collect()}
    for g in ("a", "b"):
        xs = [x for gg, x, _ in rows if gg == g]
        ys = [y for gg, _, y in rows if gg == g]
        assert got[g]["n"] == len(xs)
        assert abs(got[g]["mean_x"] - statistics.fmean(xs)) < 1e-12
        assert abs(got[g]["stddev_x"] - statistics.stdev(xs)) < 1e-12
        assert abs(got[g]["covar_xy"] - statistics.covariance(xs, ys)) < 1e-12
        if g == "a":
            assert abs(
                got[g]["corr_xy"] - statistics.correlation(xs, ys)
            ) < 1e-12
        else:  # constant x: correlation undefined -> NULL
            assert got[g]["corr_xy"] is None
    # single-row group: stddev/covar/corr all NULL
    assert got["c"]["stddev_x"] is None
    assert got["c"]["covar_xy"] is None
    assert got["c"]["corr_xy"] is None


def test_zorder_key_bit_interleave(spark):
    from coronavirus_dashboard_pipeline_etl_spark.functions.curation import (
        zorder_key,
    )

    df = spark.createDataFrame(
        [(0b1010, 0b0110), (0, 0), (255, 1)], "a long, b long"
    )
    out = [r["z"] for r in df.select(zorder_key(["a", "b"], bits=8).alias("z")).collect()]

    def interleave(a, b, bits=8):
        z = 0
        for i in range(bits):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    assert out == [interleave(0b1010, 0b0110), 0, interleave(255, 1)]


def test_zorder_key_locality(spark):
    # the point of z-order: sorting by z keeps BOTH dimensions' ranges
    # narrow within each contiguous chunk, unlike a single-column sort
    from coronavirus_dashboard_pipeline_etl_spark.functions.curation import (
        zorder_key,
    )

    rows = [(a, b) for a in range(32) for b in range(32)]
    df = spark.createDataFrame(rows, "a long, b long")
    ordered = (
        df.select("a", "b", zorder_key(["a", "b"], bits=5).alias("z"))
        .orderBy("z")
        .collect()
    )
    chunk = ordered[: len(ordered) // 4]  # first quarter of the layout
    spread_a = max(r["a"] for r in chunk) - min(r["a"] for r in chunk)
    spread_b = max(r["b"] for r in chunk) - min(r["b"] for r in chunk)
    # a lexicographic (a, b) sort would give spread_b = 31 in ANY
    # quarter; z-order bounds both spreads to the quadrant size
    assert spread_a <= 16 and spread_b <= 16


def test_fastss_finds_every_edit_kind(spark):
    from coronavirus_dashboard_pipeline_etl_spark.functions.dedup import (
        editdist_pairs_fastss,
    )

    rows = [
        (1, "kitten"),
        (2, "mitten"),    # substitution of 1
        (3, "kiten"),     # deletion from 1
        (4, "kittens"),   # insertion on 1
        (5, "kitten"),    # equal to 1 (distance 0)
        (6, "sitting"),   # distance 3 from 1 — must NOT pair
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in editdist_pairs_fastss(df).collect()
    }
    assert got[(1, 2)] == 1 and got[(1, 3)] == 1 and got[(1, 4)] == 1
    assert got[(1, 5)] == 0
    assert not any(6 in pair for pair in got)
    # the whole neighborhood of "kitten" variants pairs up too
    assert got[(2, 5)] == 1 and got[(3, 5)] == 1 and got[(4, 5)] == 1


def test_fastss_respects_blocks_and_guard(spark):
    import pytest

    from coronavirus_dashboard_pipeline_etl_spark.functions.dedup import (
        editdist_pairs_fastss,
    )

    df = spark.createDataFrame(
        [(1, "abc", "en"), (2, "abd", "fr")], "doc_id long, text string, lang string"
    )
    assert (
        editdist_pairs_fastss(df, block_cols=("lang",)).count() == 0
    )  # cross-language pair suppressed by blocking
    dup = spark.createDataFrame(
        [(i, "same") for i in range(10)], "doc_id long, text string"
    )
    with pytest.raises(RuntimeError, match="max_block"):
        editdist_pairs_fastss(dup, max_block=5)


def test_table_checksum_detects_any_row_change(spark):
    from coronavirus_dashboard_pipeline_etl_spark.functions.curation import (
        table_checksum,
    )

    a = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, None)], "k long, v string"
    )
    # same content, different row order and partitioning -> same digest
    b = spark.createDataFrame(
        [(3, None), (1, "x"), (2, "y")], "k long, v string"
    ).repartition(7)
    ca = table_checksum(a).collect()[0]
    cb = table_checksum(b).collect()[0]
    assert ca["n_rows"] == 3 and (ca["n_rows"], ca["checksum"]) == (
        cb["n_rows"],
        cb["checksum"],
    )
    # one changed cell -> different digest
    c = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "z")], "k long, v string"
    )
    assert table_checksum(c).collect()[0]["checksum"] != ca["checksum"]
    # NULL and the string "\x00" marker must NOT collide with each other
    # in different columns thanks to the fixed separator positions
    d = spark.createDataFrame([(None, "x")], "k long, v string")
    e = spark.createDataFrame([(1, None)], "k long, v string")
    assert (
        table_checksum(d).collect()[0]["checksum"]
        != table_checksum(e).collect()[0]["checksum"]
    )


def test_personalized_pagerank_teleports_to_seeds(spark):
    # cycle 0->1->2->3->0: uniform PR is symmetric; personalizing on
    # node 0 must (a) preserve total restart mass, (b) rank 0 highest
    # and decay with distance from the seed along the cycle.
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0)], "src long, dst long"
    )
    got = _ranks(pagerank_fixed_point(edges, n_iter=6, teleport=[0]))
    base = 15 * UNIT // 100
    # python reference: same fixed-point rule, restart 4*base on node 0
    rank = {n: UNIT for n in range(4)}
    for _ in range(6):
        inc = {n: 0 for n in range(4)}
        for s, d in [(0, 1), (1, 2), (2, 3), (3, 0)]:
            inc[d] += rank[s]  # outdeg 1
        rank = {
            n: (4 * base if n == 0 else 0) + 85 * inc[n] // 100
            for n in range(4)
        }
    assert got == rank
    assert got[0] > got[1] > got[2] > got[3]


def test_personalized_pagerank_rejects_empty_seeds(spark):
    import pytest

    edges = spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long")
    with pytest.raises(ValueError, match="non-empty"):
        pagerank_fixed_point(edges, teleport=[])


def test_dangling_raises_by_default(spark):
    # 0->1, 1 has no out-edge: pre-r7 this silently dropped node 1 and
    # its mass; now it's a loud error naming the count
    edges = spark.createDataFrame([(0, 1)], "src long, dst long")
    import pytest

    with pytest.raises(ValueError, match="1 node\\(s\\) have no out-edge"):
        pagerank_fixed_point(edges, n_iter=1)


def test_dangling_redistribute_python_reference(spark):
    # digraph with two dangling sinks (3, 4); compare 3 rounds against
    # a literal pure-Python simulation of the redistribute rule:
    #   rank'(v) = base + 85*(incoming(v) + dm div n) div 100
    raw = [(0, 1), (0, 3), (1, 2), (1, 4), (2, 0)]
    edges = spark.createDataFrame(raw, "src long, dst long")
    nodes = sorted({s for s, _ in raw} | {d for _, d in raw})
    outdeg = {n: sum(1 for s, _ in raw if s == n) for n in nodes}
    rank = {n: UNIT for n in nodes}
    base = 15 * UNIT // 100
    n = len(nodes)
    for _ in range(3):
        dm = sum(rank[v] for v in nodes if outdeg[v] == 0)
        inc = {v: 0 for v in nodes}
        for s, d in raw:
            inc[d] += rank[s] // outdeg[s]
        rank = {
            v: base + 85 * (inc[v] + dm // n) // 100 for v in nodes
        }
    got = _ranks(
        pagerank_fixed_point(edges, n_iter=3, dangling="redistribute")
    )
    assert got == rank


def test_dangling_redistribute_includes_sink_only_nodes(spark):
    # node 1 appears only as dst: it must be IN the result (pre-r7 the
    # node set was outdeg keys, so sinks vanished from the output)
    edges = spark.createDataFrame([(0, 1)], "src long, dst long")
    got = _ranks(
        pagerank_fixed_point(edges, n_iter=2, dangling="redistribute")
    )
    assert set(got) == {0, 1}


def test_dangling_redistribute_teleport_returns_mass_to_seeds(spark):
    # 0->1 (1 dangling), teleport to {0}: dangling mass returns to the
    # seed only. Hand-unroll one round: dm = UNIT (node 1's start),
    # seed share = dm div 1; node 0 gets seed_base + 85*(0 + dm)//100,
    # node 1 gets 0 + 85*(contrib(0->1) + 0)//100.
    edges = spark.createDataFrame([(0, 1)], "src long, dst long")
    got = _ranks(
        pagerank_fixed_point(
            edges, n_iter=1, teleport=[0], dangling="redistribute"
        )
    )
    base = 15 * UNIT // 100
    seed_base = 2 * base // 1
    assert got[0] == seed_base + 85 * (0 + UNIT // 1) // 100
    assert got[1] == 0 + 85 * (UNIT // 1 + 0) // 100


def test_invalid_dangling_mode_rejected(spark):
    edges = spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long")
    import pytest

    with pytest.raises(ValueError, match="dangling must be"):
        pagerank_fixed_point(edges, dangling="ignore")
