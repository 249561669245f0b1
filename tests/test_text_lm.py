"""bigram_lm_score log mode vs a pure-Python add-k bigram LM.

The rational mode is oracle-gated (lm1_bigram_novelty); the log mode
uses libm ln, so it is pinned here against an independent reference
instead of a cross-engine hash (tfidf determinism contract)."""

import math
from collections import Counter

import pytest

from coronavirus_dashboard_pipeline_etl_spark.functions.text import bigram_lm_score

CORPUS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat on the log"),
    (2, "a cat and a dog"),
    (3, "singleton"),
    (4, ""),
    (5, "the the the"),
]
K = 0.5


def _reference():
    toks = {i: [t for t in s.split(" ") if t] for i, s in CORPUS}
    bigrams = {i: list(zip(ts, ts[1:])) for i, ts in toks.items()}
    model = Counter(b for bs in bigrams.values() for b in bs)
    uni = Counter(t for ts in toks.values() for t in ts)
    vocab = len(uni)
    out = {}
    for i, bs in bigrams.items():
        if not bs:
            out[i] = (0, None, None)
            continue
        s = sum(math.log((model[b] + K) / (uni[b[0]] + K * vocab)) for b in bs)
        avg = s / len(bs)
        out[i] = (len(bs), avg, math.exp(-avg))
    return out


def test_log_mode_matches_python_reference(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logprob"], r["perplexity"])
        for r in bigram_lm_score(df, k=K, mode="log").collect()
    }
    want = _reference()
    assert set(got) == set(want)
    for i in want:
        assert got[i][0] == want[i][0], i
        if want[i][1] is None:
            assert got[i][1] is None and got[i][2] is None
        else:
            assert got[i][1] == pytest.approx(want[i][1], rel=1e-12)
            assert got[i][2] == pytest.approx(want[i][2], rel=1e-12)


def test_rational_mode_novelty_counts(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    rows = {r["doc_id"]: r for r in bigram_lm_score(df, mode="rational").collect()}
    # "the the"->"the the" appears only in doc 5 (twice): corpus==own count
    assert rows[5]["n_bigrams"] == 2
    assert rows[5]["novel_bigrams"] == 2
    assert rows[5]["novelty"] == 1.0
    # "sat on" occurs in docs 0 and 1 -> not novel for either
    assert rows[0]["novel_bigrams"] < rows[0]["n_bigrams"]
    # empty/one-token docs survive with zero counts and null ratios
    assert rows[3]["n_bigrams"] == 0 and rows[4]["n_bigrams"] == 0
    assert rows[4]["novelty"] is None


def test_bad_mode_raises(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    with pytest.raises(ValueError, match="mode"):
        bigram_lm_score(df, mode="ppl")
