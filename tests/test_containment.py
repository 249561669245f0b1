"""shingle_containment_pairs — asymmetric semantics, prefix-filter
exactness vs a brute-force reference, and the loud max_block guard."""

import itertools

import pytest

from coronavirus_dashboard_pipeline_etl_spark.functions.dedup import (
    shingle_containment_pairs,
)

QUOTE = "alpha beta gamma delta epsilon"
LONG = "intro words here " + QUOTE + " and a very long tail of other words"
DOCS = [
    (0, QUOTE, "en"),
    (1, LONG, "en"),
    (2, "unrelated text with completely different content entirely", "en"),
    (3, QUOTE, "fr"),  # other block: must not pair with 0/1
    (4, "alpha beta", "en"),  # < 3 tokens -> 0 shingles, dropped
]


def _shingles(text, k=3):
    w = [t for t in text.split(" ") if t]
    return set(" ".join(w[i : i + k]) for i in range(len(w) - k + 1))


def _brute(threshold=0.8):
    by_id = {i: (_shingles(t), lang) for i, t, lang in DOCS}
    out = {}
    for a, b in itertools.permutations(by_id, 2):
        sa, la = by_id[a]
        sb, lb = by_id[b]
        if not sa or not sb or la != lb:
            continue
        c = len(sa & sb) / len(sa)
        if c >= threshold:
            out[(a, b)] = c
    return out

def test_asymmetric_superset_detection(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string, lang string")
    got = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in shingle_containment_pairs(df, threshold=0.8).collect()
    }
    want = _brute()
    assert got == pytest.approx(want)
    # the quote is contained in the long doc, not vice versa
    assert (0, 1) in got and got[(0, 1)] == 1.0
    assert (1, 0) not in got


def test_blocking_respected(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string, lang string")
    got = shingle_containment_pairs(df, threshold=0.8).collect()
    ids = {(r["id_a"], r["id_b"]) for r in got}
    assert not any(3 in pair for pair in ids)


def test_max_block_guard_raises(spark):
    # every doc shares the same rare shingle -> one posting list of 30
    df = spark.createDataFrame(
        [(i, f"x{i} shared rare shingle y{i}", "en") for i in range(30)],
        "doc_id long, text string, lang string",
    )
    with pytest.raises(RuntimeError, match="max_block"):
        shingle_containment_pairs(df, threshold=0.3, max_block=5).collect()
