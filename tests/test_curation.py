"""Corpus-curation operators (functions/curation.py)."""

from pyspark.sql import Row, functions as F

from coronavirus_dashboard_pipeline_etl_spark.functions import (
    contamination_check,
    normalize_embeddings,
    quantize_embeddings,
    repetition_stats,
    stratified_sample,
    vocab_topk,
    word_shingles,
)


def test_word_shingles_and_short_docs(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="a b c d"), Row(doc_id=2, text="a b")]
    )
    out = df.select("doc_id", word_shingles("text", 3).alias("sh"))
    rows = {r["doc_id"]: r["sh"] for r in out.collect()}
    assert rows[1] == ["a b c", "b c d"]
    assert rows[2] == []  # shorter than n -> empty, not null


def test_contamination_flags_overlap_only(spark):
    corpus = spark.createDataFrame(
        [
            Row(doc_id=1, text="the quick brown fox jumps over the lazy dog"),
            Row(doc_id=2, text="completely different words here entirely now"),
        ]
    )
    bench = spark.createDataFrame(
        [Row(doc_id=99, text="quick brown fox jumps over the lazy dog today")]
    )
    out = contamination_check(corpus, bench, n=8)
    rows = {r["doc_id"]: r["contaminated"] for r in out.collect()}
    assert rows == {1: True, 2: False}


def test_stratified_sample_deterministic_and_salted(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i, lang="en" if i % 2 else "de") for i in range(200)]
    )
    a = stratified_sample(docs, {"en": 0.5, "de": 0.1})
    b = stratified_sample(docs, {"en": 0.5, "de": 0.1})
    assert sorted(r["doc_id"] for r in a.collect()) == sorted(
        r["doc_id"] for r in b.collect()
    )
    salted = stratified_sample(docs, {"en": 0.5, "de": 0.1}, salt="v2")
    assert sorted(r["doc_id"] for r in salted.collect()) != sorted(
        r["doc_id"] for r in a.collect()
    )
    # rough rate sanity: en near 50%, de near 10%
    n_en = a.filter(F.col("lang") == "en").count()
    assert 30 <= n_en <= 70


def test_vocab_topk_rank_and_ties(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="apple banana apple"),
            Row(doc_id=2, text="banana cherry"),
        ]
    )
    out = vocab_topk(docs, k=2).collect()
    assert out[0]["token"] == "banana" and out[0]["doc_freq"] == 2
    # apple and cherry tie on doc_freq=1 -> token asc
    assert out[1]["token"] == "apple" and out[1]["total_freq"] == 2


def test_repetition_stats(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="spam spam spam spam"),
            Row(doc_id=2, text="all tokens unique here"),
        ]
    )
    rows = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert rows[1]["dup_token_ratio"] == 0.75
    assert rows[2]["dup_token_ratio"] == 0.0
    assert rows[1]["dup_3gram_ratio"] == 0.5  # 2 shingles, 1 distinct


def test_normalize_and_quantize_embeddings(spark):
    df = spark.createDataFrame(
        [
            Row(vec_id=1, embedding=[3.0, 4.0]),
            Row(vec_id=2, embedding=[0.0, 0.0]),  # zero vector edge
        ]
    )
    out = quantize_embeddings(normalize_embeddings(df), "embedding")
    rows = {r["vec_id"]: r for r in out.collect()}
    assert rows[1]["embedding"] == [0.6, 0.8]
    assert rows[1]["embedding_q"] == [95, 127]  # floor(0.6/0.8*127+.5)
    assert rows[2]["embedding"] == [0.0, 0.0]
    assert rows[2]["embedding_q"] == [0, 0]
    assert rows[2]["embedding_q_scale"] == 0.0


def test_scrub_pii_redacts_and_counts(spark):
    import pytest

    from coronavirus_dashboard_pipeline_etl_spark.functions import (
        pii_counts,
        scrub_pii,
    )

    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="mail a.b+c@x.co.uk ip 192.168.0.1 tel +447009001234"),
            Row(doc_id=2, text="clean text with version 1.2 and year 2024"),
        ]
    )
    out = df.select(
        "doc_id", scrub_pii("text").alias("s"), *pii_counts("text").values()
    ).collect()
    r1 = next(r for r in out if r.doc_id == 1)
    assert r1.s == "mail <EMAIL> ip <IP> tel <PHONE>"
    assert (r1.n_email, r1.n_ipv4, r1.n_phone) == (1, 1, 1)
    r2 = next(r for r in out if r.doc_id == 2)
    # short dotted version numbers must NOT be flagged as IPs: clean
    # text passes through byte-identical
    assert r2.s == "clean text with version 1.2 and year 2024"
    assert (r2.n_email, r2.n_ipv4, r2.n_phone) == (0, 0, 0)

    with pytest.raises(ValueError, match="unknown PII kind"):
        df.select(scrub_pii("text", kinds=("ssn",)))


def test_remove_boilerplate_lines(spark):
    from coronavirus_dashboard_pipeline_etl_spark.functions import (
        remove_boilerplate_lines,
    )

    banner = "subscribe now"
    rows = [
        Row(doc_id=i, text=f"unique {i} first\n{banner}\nunique {i} second")
        for i in range(1, 11)
    ]
    rows.append(Row(doc_id=99, text=banner))  # all-boilerplate doc
    out = {
        r.doc_id: r
        for r in remove_boilerplate_lines(
            spark.createDataFrame(rows), min_docs=10
        ).collect()
    }
    assert 99 not in out  # nothing left -> doc disappears
    assert out[3].text == "unique 3 first\nunique 3 second"  # order kept
    assert out[3].n_lines == 2
    # a line must appear in min_docs DISTINCT docs to be boilerplate:
    # doc 1's unique lines survive even though every doc has 3 lines
    assert all(banner not in r.text for r in out.values())


def test_bpe_ish_tokens_runs(spark):
    from coronavirus_dashboard_pipeline_etl_spark.functions import (
        bpe_token_stats,
    )

    df = spark.createDataFrame(
        [Row(doc_id=1, text="don't tokenize v1.2-beta (2024) naively")]
    )
    r = bpe_token_stats(df).collect()[0]
    # don ' t | tokenize | v 1 . 2 - beta | ( 2024 ) | naively = 14 runs
    assert r.n_bpe_tokens == 14
    assert r.n_ws_tokens == 5
    assert r.fragmentation == 14 / 5


def test_assign_packs_layout_and_guard(spark):
    import pytest

    from coronavirus_dashboard_pipeline_etl_spark.functions import assign_packs

    rows = [
        Row(doc_id=1, chunk_index=0, chunk_tokens=100),
        Row(doc_id=1, chunk_index=1, chunk_tokens=100),
        Row(doc_id=2, chunk_index=0, chunk_tokens=100),  # crosses the cut
        Row(doc_id=3, chunk_index=0, chunk_tokens=50),
    ]
    out = {
        (r.doc_id, r.chunk_index): (r.pack_id, r.pack_offset)
        for r in assign_packs(
            spark.createDataFrame(rows), context_len=256
        ).collect()
    }
    assert out[(1, 0)] == (0, 0)
    assert out[(1, 1)] == (0, 100)
    # chunk 3 starts at 200, crosses 256: concat-and-split keeps it in
    # the pack its START falls in (the cut slices the token stream, not
    # chunk boundaries)
    assert out[(2, 0)] == (0, 200)
    assert out[(3, 0)] == (1, 300 % 256)

    big = spark.createDataFrame([Row(doc_id=1, chunk_index=0, chunk_tokens=999)])
    with pytest.raises(Exception, match="exceeds context_len"):
        assign_packs(big, context_len=256).collect()

    # per-shard packing: prefix sums restart per partition key
    sharded = assign_packs(
        spark.createDataFrame(rows).withColumn(
            "src", F.col("doc_id") % 2
        ),
        context_len=256,
        partition_cols=("src",),
    )
    got = {
        (r.doc_id, r.chunk_index): (r.pack_id, r.pack_offset)
        for r in sharded.collect()
    }
    assert got[(2, 0)] == (0, 0)  # doc 2 is alone in shard 0


def test_weighted_sample_temperature_reshaping(spark):
    import pytest

    from coronavirus_dashboard_pipeline_etl_spark.functions import (
        weighted_sample,
    )

    df = spark.createDataFrame(
        [Row(doc_id=i, w=0.25) for i in range(4000)]
    )
    kept_t1 = weighted_sample(df, "w", temperature=1.0).count()
    kept_hot = weighted_sample(df, "w", temperature=2.0).count()   # 0.25^0.5 = 0.5
    kept_cold = weighted_sample(df, "w", temperature=0.5).count()  # 0.25^2 = 0.0625
    assert abs(kept_t1 / 4000 - 0.25) < 0.05
    assert abs(kept_hot / 4000 - 0.5) < 0.05
    assert abs(kept_cold / 4000 - 0.0625) < 0.03
    # determinism: same salt -> identical sample
    a = {r.doc_id for r in weighted_sample(df, "w").collect()}
    b = {r.doc_id for r in weighted_sample(df, "w").collect()}
    assert a == b

    bad = spark.createDataFrame([Row(doc_id=1, w=1.5)])
    with pytest.raises(Exception, match="outside"):
        weighted_sample(bad, "w").collect()
    with pytest.raises(ValueError, match="temperature"):
        weighted_sample(df, "w", temperature=0.0)


def test_cardinality_stats_hll_tracks_exact(spark):
    from coronavirus_dashboard_pipeline_etl_spark.functions import (
        cardinality_stats,
        fingerprint,
    )

    docs = spark.createDataFrame(
        [Row(doc_id=i, lang="en", text=f"doc {i % 700}") for i in range(2000)]
    ).withColumn("fp", fingerprint("text"))
    exact = cardinality_stats(docs, approx=False).collect()[0]
    approx = cardinality_stats(docs, approx=True).collect()[0]
    assert exact.n_distinct == 700
    assert abs(exact.dup_ratio - (1 - 700 / 2000)) < 1e-9
    # HLL++ at rsd=0.02: allow 3 sigma
    assert abs(approx.n_distinct - 700) <= 700 * 0.06


def test_weighted_sample_null_weight_fails_loudly(spark):
    import pytest

    from coronavirus_dashboard_pipeline_etl_spark.functions import (
        weighted_sample,
    )

    df = spark.createDataFrame(
        [Row(doc_id=1, w=0.5), Row(doc_id=2, w=None)],
        "doc_id long, w double",
    )
    with pytest.raises(Exception, match="outside"):
        weighted_sample(df, "w").collect()


def test_remove_boilerplate_regex_metachar_separator(spark):
    from coronavirus_dashboard_pipeline_etl_spark.functions import (
        remove_boilerplate_lines,
    )

    rows = [Row(doc_id=i, text=f"keep {i}|ad banner") for i in range(10)]
    out = remove_boilerplate_lines(
        spark.createDataFrame(rows), min_docs=5, line_sep="|"
    ).collect()
    assert {r.text for r in out} == {f"keep {i}" for i in range(10)}


def test_cardinality_dup_ratio_never_negative(spark):
    from pyspark.sql import functions as F

    from coronavirus_dashboard_pipeline_etl_spark.functions import (
        cardinality_stats,
    )

    # all-unique fingerprints: HLL may estimate above the row count;
    # the ratio must clamp at 0
    docs = spark.createDataFrame(
        [Row(lang="en", fp=f"fp{i}") for i in range(5000)]
    )
    r = cardinality_stats(docs, approx=True, rsd=0.05).collect()[0]
    assert r.dup_ratio >= 0.0


# ---------------------------------------------------------------------------
# quality percentile gates
# ---------------------------------------------------------------------------

def test_percentile_filter_ties_share_fate(spark):
    from coronavirus_dashboard_pipeline_etl_spark.functions.curation import (
        percentile_filter,
    )

    df = spark.createDataFrame(
        [(i, "en", s) for i, s in enumerate([0.1, 0.5, 0.5, 0.9, 1.0])],
        "doc_id long, lang string, score double",
    )
    out = {r.doc_id: r for r in percentile_filter(df, "score", 0.5).collect()}
    # cume_dist: 0.1 -> 0.2; the 0.5 tie -> 0.6 both; 0.9 -> 0.8; 1.0 -> 1
    assert out[1].score_cume_dist == out[2].score_cume_dist == 0.6
    # at-least semantics: the tie class straddling the cut is kept whole
    assert out[1].kept == out[2].kept == True  # noqa: E712
    assert out[3].kept and out[4].kept and not out[0].kept

    # degenerate all-tied group: everything kept (the percent_rank
    # formulation kept NOTHING here — property-test find)
    tied = spark.createDataFrame(
        [(i, "en", 1.0) for i in range(4)], "doc_id long, lang string, score double"
    )
    assert all(r.kept for r in percentile_filter(tied, "score", 0.5).collect())


def test_threshold_filter_matches_exact_away_from_boundary(spark):
    from coronavirus_dashboard_pipeline_etl_spark.functions.curation import (
        percentile_filter,
        threshold_filter,
    )

    rows = [(i, "en", float(i)) for i in range(100)] + [
        (100 + i, "fr", float(i % 10)) for i in range(50)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, score double")
    exact = {r.doc_id: r for r in percentile_filter(df, "score", 0.4).collect()}
    approx = {r.doc_id: r for r in threshold_filter(df, "score", 0.4).collect()}
    min_kept = {}
    for r in exact.values():
        if r.kept:
            min_kept[r.lang] = min(min_kept.get(r.lang, 1e18), r.score)
    # the two paths may only disagree at the cut itself: the boundary
    # score or its immediate predecessor (rank-interpolation + tie-class
    # handling), never in the interior
    for k, er in exact.items():
        if er.kept != approx[k].kept:
            assert er.score in (min_kept[er.lang] - 1, min_kept[er.lang]), (
                k, er.score, min_kept[er.lang],
            )
    interior = [
        k for k, er in exact.items()
        if er.score not in (min_kept[er.lang] - 1, min_kept[er.lang])
    ]
    assert all(exact[k].kept == approx[k].kept for k in interior)


def test_percentile_filter_rejects_bad_fraction(spark):
    import pytest as _pytest

    from coronavirus_dashboard_pipeline_etl_spark.functions.curation import (
        percentile_filter,
    )

    df = spark.createDataFrame([(1, "en", 0.5)], "doc_id long, lang string, score double")
    with _pytest.raises(ValueError):
        percentile_filter(df, "score", 0.0)


def test_tfidf_log_path_matches_math_log(spark):
    import math

    from coronavirus_dashboard_pipeline_etl_spark.functions.text import tfidf_topk

    docs = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "cherry cherry durian apple"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_topk(docs, k=10, log_idf=True).collect()
    n = 3
    for r in out:
        expect = r.tf * (math.log((n + 1) / (r.term_df + 1)) + 1.0)
        assert abs(r.score - expect) < 1e-12, (r.term, r.score, expect)
    # doc 1: 'apple' tf=2 df=2 -> 2*(ln(4/3)+1); 'banana' tf=1 df=2 ->
    # ln(4/3)+1: apple must outrank banana
    d1 = {r.term: r for r in out if r.doc_id == 1}
    assert d1["apple"].term_df == 2
    assert d1["apple"].term_rank < d1["banana"].term_rank


def test_tfidf_rational_and_log_rank_agree_at_tf1(spark):
    from coronavirus_dashboard_pipeline_etl_spark.functions.text import tfidf_topk

    docs = spark.createDataFrame(
        [(i, f"w{i} shared common{i % 2}") for i in range(6)],
        "doc_id long, text string",
    )
    ranks = lambda df: sorted(
        (r.doc_id, r.term_rank, r.term) for r in df.collect()
    )
    assert ranks(tfidf_topk(docs, k=3, log_idf=True)) == ranks(
        tfidf_topk(docs, k=3, log_idf=False)
    )


def test_extract_domain_strips_scheme_userinfo_port(spark):
    from coronavirus_dashboard_pipeline_etl_spark.functions.curation import (
        extract_domain,
    )

    df = spark.createDataFrame(
        [
            (1, "https://user:pw@WWW.Example.COM:8443/a/b?q=1#f"),
            (2, "http://plain.org/page"),
            (3, "ftp://host.net"),
            (4, "not a url"),
        ],
        "doc_id long, url string",
    )
    got = {r.doc_id: r.d for r in df.select("doc_id", extract_domain("url").alias("d")).collect()}
    assert got == {1: "www.example.com", 2: "plain.org", 3: "host.net", 4: ""}


def test_cap_per_group_keeps_first_n(spark):
    from coronavirus_dashboard_pipeline_etl_spark.functions.curation import (
        cap_per_group,
    )

    df = spark.createDataFrame(
        [(i, "a" if i < 7 else "b") for i in range(10)],
        "doc_id long, domain string",
    )
    out = cap_per_group(df, "domain", max_per_group=3)
    kept = sorted(r.doc_id for r in out.collect() if r.kept)
    assert kept == [0, 1, 2, 7, 8, 9]
    # all rows retained for audit
    assert out.count() == 10


def test_histogram_fixed_clamps_and_conserves_mass(spark):
    from coronavirus_dashboard_pipeline_etl_spark.functions.curation import (
        histogram_fixed,
    )

    df = spark.createDataFrame(
        [(float(v),) for v in [-5, 0, 9.99, 10, 55, 99, 100, 1000]],
        "x double",
    )
    out = {r.bucket: r for r in histogram_fixed(df, "x", 0.0, 100.0, 10).collect()}
    assert out[0].n == 3          # -5 clamps in, 0, 9.99
    assert out[1].n == 1          # 10 lands in bucket 1 (left-closed)
    assert out[5].n == 1
    assert out[9].n == 3          # 99, 100 and 1000 clamp into the top bucket
    assert sum(r.n for r in out.values()) == 8
    assert out[5].bucket_lo == 50.0


def test_bm25_ranks_relevance_and_log_path(spark):
    import math

    import pytest as _pytest

    from coronavirus_dashboard_pipeline_etl_spark.functions.text import bm25_topk

    docs = spark.createDataFrame(
        [
            (1, "spark spark spark engine"),
            (2, "spark engine"),
            (3, "totally unrelated words here"),
            (4, "engine only text block"),
        ],
        "doc_id long, text string",
    )
    out = bm25_topk(docs, ["spark"], k=4, log_idf=True).collect()
    ranked_ids = [r.doc_id for r in out]
    # docs with the term outrank docs without; higher tf wins (short dl)
    assert ranked_ids[0] == 1 and ranked_ids[1] == 2
    assert {ranked_ids[2], ranked_ids[3]} == {3, 4}
    assert out[2].score == 0.0 and out[3].score == 0.0

    # log-idf value check for doc 2: tf=1, dl=2, avgdl=(4+2+4+4)/4=3.5,
    # N=4, df=2
    idf = math.log(1.0 + (4 - 2 + 0.5) / (2 + 0.5))
    expect = idf * (1 * 2.2 / (1 + 1.2 * (0.25 + 0.75 * 2 / 3.5)))
    got = next(r.score for r in out if r.doc_id == 2)
    assert abs(got - expect) < 1e-12

    with _pytest.raises(ValueError, match="empty query"):
        bm25_topk(docs, [])


def test_bm25_zero_shuffle_corpus_side(spark):
    from coronavirus_dashboard_pipeline_etl_spark.functions.text import bm25_topk

    docs = spark.createDataFrame(
        [(i, "spark engine row") for i in range(10)],
        "doc_id long, text string",
    )
    plan = (
        bm25_topk(docs, ["spark"], k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # stats aggregate exchanges a 1-row side; the corpus path itself must
    # not hash-exchange (top-k is TakeOrdered, not a sort shuffle)
    assert "TakeOrderedAndProject" in plan


def test_key_skew_stats_orders_and_shares(spark):
    from coronavirus_dashboard_pipeline_etl_spark.functions.curation import (
        key_skew_stats,
    )

    df = spark.createDataFrame(
        [(i, "hot" if i < 80 else f"k{i}") for i in range(100)],
        "row_id long, k string",
    )
    out = key_skew_stats(df, ("k",), top_k=3).collect()
    assert out[0].k == "hot" and out[0].n_rows == 80 and out[0].share == 0.8
    # ties (all singleton keys) break lexicographically
    assert [r.k for r in out[1:]] == ["k80", "k81"]


def test_common_token_score_bounds(spark):
    from coronavirus_dashboard_pipeline_etl_spark.functions.curation import (
        common_token_score,
    )

    docs = spark.createDataFrame(
        [
            (1, "the the the"),       # universal token -> commonness 1
            (2, "the unique2 zzz2"),
            (3, "the unique3 zzz3"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.commonness for r in common_token_score(docs).collect()}
    assert got[1] == 1.0                      # every token in every doc
    # doc 2: df('the')=3, df(unique)=1, df(zzz)=1 -> 5 / (3*3)
    assert got[2] == 5 / 9 and got[3] == 5 / 9


def test_mixture_rebalance_hits_target_mixture(spark):
    import pytest as _pytest

    from coronavirus_dashboard_pipeline_etl_spark.functions.curation import (
        mixture_rebalance,
    )

    rows = (
        [(i, "en") for i in range(1000)]
        + [(2000 + i, "fr") for i in range(100)]
        + [(4000 + i, "de") for i in range(500)]
    )
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = mixture_rebalance(df, {"en": 0.4, "fr": 0.2, "de": 0.4})
    got = {r[0]: r[1] for r in out.groupBy("lang").count().collect()}
    # fr is the binding stratum (100 / 0.2 = 500 total): expect ~200 en,
    # all 100 fr... fr rate = min(1, 500*0.2/100) = 1.0
    assert got["fr"] == 100
    assert 170 <= got["en"] <= 230    # md5-coin noise around 200
    assert 170 <= got["de"] <= 230
    # untargeted strata drop; bad targets raise
    assert "zz" not in got
    with _pytest.raises(ValueError, match="sum to 1"):
        mixture_rebalance(df, {"en": 0.2})
    with _pytest.raises(ValueError, match="absent"):
        mixture_rebalance(df, {"en": 0.5, "xx": 0.5})


def test_dedup_incremental_drops_seen_and_intra_batch(spark):
    from coronavirus_dashboard_pipeline_etl_spark.functions.dedup import (
        dedup_incremental,
        fingerprint,
    )

    history = spark.createDataFrame(
        [(0, "old news")], "doc_id long, text string"
    ).select(fingerprint("text").alias("fp"))
    batch = spark.createDataFrame(
        [
            (10, "old news"),        # already in history -> dropped
            (11, "Fresh  Story"),    # kept (first of its fp)
            (12, "fresh story"),     # same normalised fp -> dropped
            (13, "another one"),
        ],
        "doc_id long, text string",
    )
    kept = sorted(r.doc_id for r in dedup_incremental(batch, history).collect())
    assert kept == [11, 13]


def test_split_corpus_stability(spark):
    """A doc's split never changes when the corpus grows — the property
    seeded randomSplit lacks — and fractions land near target."""
    from coronavirus_dashboard_pipeline_etl_spark.functions.curation import (
        split_corpus,
    )

    small = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    big = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    s_small = {r["doc_id"]: r["split"] for r in split_corpus(small).collect()}
    s_big = {r["doc_id"]: r["split"] for r in split_corpus(big).collect()}
    assert all(s_big[k] == v for k, v in s_small.items())
    frac_val = sum(1 for v in s_big.values() if v == "val") / len(s_big)
    assert 0.02 < frac_val < 0.09  # 5% target, md5-coin variance

    import pytest
    with pytest.raises(ValueError):
        split_corpus(small, val_fraction=0.6, test_fraction=0.5)


def test_assign_shards_deterministic(spark):
    """(shard_id, shard_pos) is a bijection onto dense per-shard ranks,
    identical across partitionings of the same input."""
    from coronavirus_dashboard_pipeline_etl_spark.functions.curation import (
        assign_shards,
    )

    df1 = spark.range(0, 300).withColumnRenamed("id", "doc_id")
    df2 = df1.repartition(7)
    a = {r["doc_id"]: (r["shard_id"], r["shard_pos"])
         for r in assign_shards(df1, n_shards=8).collect()}
    b = {r["doc_id"]: (r["shard_id"], r["shard_pos"])
         for r in assign_shards(df2, n_shards=8).collect()}
    assert a == b
    # positions dense 0..n-1 within each shard
    from collections import defaultdict
    by_shard = defaultdict(list)
    for sid, pos in a.values():
        by_shard[sid].append(pos)
    for sid, ps in by_shard.items():
        assert sorted(ps) == list(range(len(ps)))


def test_priority_sample_weighted_without_replacement(spark):
    """priority_sample: exact output size, heavier rows likelier, fully
    deterministic across re-runs, and the python replay agrees."""
    import hashlib

    from pyspark.sql import functions as F

    from coronavirus_dashboard_pipeline_etl_spark.functions.curation import (
        priority_sample,
    )

    rows = [(i, "g", (i % 7) + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, w long")
    kept = priority_sample(df, k=25, weight_col="w", group_cols=("lang",))
    got = sorted(r["doc_id"] for r in kept.collect())
    assert len(got) == 25
    # python replay of the identical priority rule
    def u(i):
        return max(int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16), 1)

    expect = sorted(
        sorted(rows, key=lambda r: (-(r[2] / u(r[0])), r[0]))[:25],
        key=lambda r: r[0],
    )
    assert got == [r[0] for r in expect]
    # deterministic across runs
    again = sorted(r["doc_id"] for r in priority_sample(
        df, k=25, weight_col="w", group_cols=("lang",)).collect())
    assert again == got
    # never more rows than exist
    small = priority_sample(df.limit(5), k=25, weight_col="w")
    assert small.count() == 5
    # heavier rows overrepresented: mean kept weight > corpus mean
    kept_w = [r["w"] for r in kept.collect()]
    all_w = [r[2] for r in rows]
    assert sum(kept_w) / len(kept_w) > sum(all_w) / len(all_w)


def test_mixture_rebalance_max_strata_guard(spark):
    import pytest as _pytest

    from coronavirus_dashboard_pipeline_etl_spark.functions.curation import (
        mixture_rebalance,
    )

    # stratum column with 50 distinct values against max_strata=10:
    # must fail LOUDLY before collecting the full count dict
    df = spark.createDataFrame(
        [(i, f"s{i % 50}") for i in range(200)], "doc_id long, lang string"
    )
    with _pytest.raises(ValueError, match="max_strata"):
        mixture_rebalance(df, {"s0": 0.5, "s1": 0.5}, max_strata=10)
    # too many TARGETS also refuses up front
    targets = {f"s{i}": 1 / 50 for i in range(50)}
    with _pytest.raises(ValueError, match="target strata exceeds"):
        mixture_rebalance(df, targets, max_strata=10)
    # at/below the bound, unchanged behavior
    out = mixture_rebalance(
        df, {"s0": 0.5, "s1": 0.5}, max_strata=50
    )
    assert out.count() > 0


def test_stratified_sample_map_literal_path_matches_when_chain(spark):
    """>256 strata switches to the map-literal threshold lookup; the
    kept set must be identical to the when-chain form (same md5 coin,
    same thresholds, same default)."""
    docs = spark.createDataFrame(
        [Row(doc_id=i, lang=f"l{i % 300}") for i in range(1200)]
    )
    big = {f"l{j}": (0.8 if j % 2 else 0.2) for j in range(300)}
    out_map = stratified_sample(docs, big, default_fraction=0.1)
    kept_map = sorted(r.doc_id for r in out_map.collect())
    # when-chain result reconstructed stratum-by-stratum (each call
    # stays under the 256 cutoff)
    kept_chain = []
    for j in range(300):
        sub = docs.filter(F.col("lang") == f"l{j}")
        kept_chain.extend(
            r.doc_id
            for r in stratified_sample(sub, {f"l{j}": big[f"l{j}"]}).collect()
        )
    assert kept_map == sorted(kept_chain)
    # default_fraction applies to unlisted strata in the map path too
    out_def = stratified_sample(
        docs, {f"l{j}": 1.0 for j in range(299)} | {"zz": 1.0}, default_fraction=0.0
    )
    assert out_def.filter(F.col("lang") == "l299").count() == 0


def test_dsir_importance_log_matches_pure_python_and_guards(spark):
    """DSIR: rational mode's exact integers drive selection; log mode
    reproduces the paper's importance weight against a pure-Python
    reference on the same hashed buckets; bucket guard is loud; the
    priority_sample composition returns exactly k rows biased toward
    high-mass docs."""
    import hashlib
    import math

    import pytest as _pytest

    from coronavirus_dashboard_pipeline_etl_spark.functions.curation import (
        dsir_importance,
        priority_sample,
    )

    rows = [
        (1, "the cat sat on the mat", "en"),
        (2, "the dog sat on the log", "en"),
        (3, "el gato se sento", "es"),
        (4, "der hund sitzt auf dem baum", "de"),
        (5, "the the the the the the", "en"),
        (6, "", "en"),
        (7, "cat", "es"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    target = df.filter("lang = 'en'")
    m = 64

    def md5int(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def grams(text: str) -> list[str]:
        tk = [t for t in text.split(" ") if t]
        return tk + [a + "\x01" + b for a, b in zip(tk, tk[1:])]

    # pure-Python model over the same buckets
    raw_cnt: dict[int, int] = {}
    tgt_cnt: dict[int, int] = {}
    for did, text, lang in rows:
        for g in grams(text):
            b = md5int(g) % m
            raw_cnt[b] = raw_cnt.get(b, 0) + 1
            if lang == "en":
                tgt_cnt[b] = tgt_cnt.get(b, 0) + 1
    big_r, big_t = sum(raw_cnt.values()), sum(tgt_cnt.values())

    # --- log mode vs reference ---
    got = {
        r.doc_id: r
        for r in dsir_importance(df, target, n_buckets=m, mode="log").collect()
    }
    for did, text, lang in rows:
        gs = grams(text)
        want = sum(
            math.log((tgt_cnt.get(md5int(g) % m, 0) + 1.0) / (big_t + m))
            - math.log((raw_cnt[md5int(g) % m] + 1.0) / (big_r + m))
            for g in gs
        )
        assert got[did].n_grams == len(gs)
        assert got[did].log_weight == _pytest.approx(want, abs=1e-9)
        if gs:
            assert got[did].avg_log_weight == _pytest.approx(
                want / len(gs), abs=1e-9
            )
        else:
            assert got[did].log_weight == 0.0 and got[did].avg_log_weight == 0.0

    # --- rational mode vs the same model in big-int arithmetic ---
    got_r = {
        r.doc_id: r
        for r in dsir_importance(df, target, n_buckets=m).collect()
    }
    for did, text, lang in rows:
        gs = grams(text)
        mass = sum(
            max(
                1,
                min(
                    10**12,
                    ((tgt_cnt.get(md5int(g) % m, 0) + 1) * (big_r + m) * 10**6)
                    // ((raw_cnt[md5int(g) % m] + 1) * (big_t + m)),
                ),
            )
            for g in gs
        )
        assert got_r[did].importance_mass == mass
        # English docs should out-weigh non-English ones per gram
        if gs:
            assert got_r[did].importance == mass / (len(gs) * 10**6)
    en_avg = sum(got_r[d].importance for d in (1, 2, 5)) / 3
    non_en_avg = sum(got_r[d].importance for d in (3, 4, 7)) / 3
    assert en_avg > non_en_avg

    # --- guards ---
    with _pytest.raises(ValueError, match="n_buckets"):
        dsir_importance(df, target, n_buckets=(1 << 20) + 1)
    with _pytest.raises(ValueError, match="mode"):
        dsir_importance(df, target, mode="geometric")

    # --- resample composition: exactly k survivors, weighted w/o repl ---
    scored = dsir_importance(df, target, n_buckets=m)
    kept = priority_sample(scored, k=3, weight_col="importance_mass")
    assert kept.count() == 3


def test_validate_constraints_all_rule_kinds(spark):
    """Every constraint kind reports the exact violation count and the
    deterministic min-id sample; clean rules report 0 with NULL sample;
    unknown kinds fail loudly."""
    import pytest as _pytest

    from coronavirus_dashboard_pipeline_etl_spark.functions.curation import (
        validate_constraints,
    )

    rows = [
        (1, "alpha", "en", 5),
        (2, None, "en", 50),        # null text
        (3, "alpha", "EN", -1),     # dup text, bad lang case, range low
        (4, "beta", "xx", 99999),   # lang not in dim, range high
        (5, "alpha", "de", 10),     # dup text
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, n long")
    dim = spark.createDataFrame([("en",), ("de",)], "lang string")

    out = {
        (r.rule, r.col_name): r
        for r in validate_constraints(
            df,
            [
                ("not_null", "text"),
                ("not_null", "doc_id"),
                ("range", "n", 0, 100),
                ("regex", "lang", "^[a-z]{2}$"),
                ("accepted", "lang", ("en", "de", "xx", "EN")),
                ("unique", "text"),
                ("referential", "lang", dim, "lang"),
            ],
        ).collect()
    }
    assert out[("not_null", "text")].violations == 1
    assert out[("not_null", "text")].sample_key == "2"
    assert out[("not_null", "doc_id")].violations == 0
    assert out[("not_null", "doc_id")].sample_key is None
    assert out[("range", "n")].violations == 2          # -1 and 99999
    assert out[("range", "n")].sample_key == "3"
    assert out[("regex", "lang")].violations == 1       # "EN"
    assert out[("accepted", "lang")].violations == 0    # EN accepted here
    assert out[("unique", "text")].violations == 2      # 3 alphas -> 2 extra
    assert out[("unique", "text")].sample_key == "1"
    assert out[("referential", "lang")].violations == 2  # EN, xx
    assert out[("referential", "lang")].sample_key == "3"

    with _pytest.raises(ValueError, match="unknown constraint"):
        validate_constraints(df, [("fancy", "text")]).collect()


def test_dsir_external_target_counts_full_target_total(spark):
    """DSIR with an EXTERNAL target domain (not a subset of raw — the
    paper's actual setting): target-only buckets must still enter the
    target total T, or every ratio's (T+m) normaliser undercounts.
    Regression for the left-join bug that silently dropped them."""
    import hashlib

    from coronavirus_dashboard_pipeline_etl_spark.functions.curation import (
        dsir_importance,
    )

    raw_rows = [(1, "alpha beta"), (2, "gamma delta")]
    # target shares one gram with raw ("alpha") and adds grams raw has
    # never seen — those occupy target-only buckets
    tgt_rows = [(10, "alpha zzzuniquegram qqqothergram wwwthirdgram")]
    raw = spark.createDataFrame(raw_rows, "doc_id long, text string")
    tgt = spark.createDataFrame(tgt_rows, "doc_id long, text string")
    m = 4096  # large enough that the unique grams don't collide

    def md5int(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def grams(text: str) -> list[str]:
        tk = [t for t in text.split(" ") if t]
        return tk + [a + "\x01" + b for a, b in zip(tk, tk[1:])]

    raw_cnt: dict[int, int] = {}
    tgt_cnt: dict[int, int] = {}
    for _, text in raw_rows:
        for g in grams(text):
            raw_cnt[md5int(g) % m] = raw_cnt.get(md5int(g) % m, 0) + 1
    for _, text in tgt_rows:
        for g in grams(text):
            tgt_cnt[md5int(g) % m] = tgt_cnt.get(md5int(g) % m, 0) + 1
    big_r = sum(raw_cnt.values())
    big_t = sum(tgt_cnt.values())  # ALL target grams, incl. target-only
    assert any(b not in raw_cnt for b in tgt_cnt)  # the setting matters

    got = {
        r.doc_id: r
        for r in dsir_importance(raw, tgt, n_buckets=m).collect()
    }
    for did, text in raw_rows:
        mass = sum(
            max(
                1,
                min(
                    10**12,
                    ((tgt_cnt.get(md5int(g) % m, 0) + 1) * (big_r + m) * 10**6)
                    // ((raw_cnt[md5int(g) % m] + 1) * (big_t + m)),
                ),
            )
            for g in grams(text)
        )
        assert got[did].importance_mass == mass, did


def test_third_review_guards_and_checksum_injectivity(spark):
    """Third review pass regressions: loud guards (LSH bands, zero-norm
    assignment, bad priority weights, missing teleport seeds), NULL-text
    totality in paragraph dedup, and checksum injectivity for the
    sentinel-collision cases the old encoding missed."""
    import pytest as _pytest
    from pyspark.sql import Row

    from coronavirus_dashboard_pipeline_etl_spark.functions.curation import (
        priority_sample,
        table_checksum,
    )
    from coronavirus_dashboard_pipeline_etl_spark.functions.dedup import (
        dedup_paragraphs,
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from coronavirus_dashboard_pipeline_etl_spark.functions.graph import (
        pagerank_fixed_point,
    )
    from coronavirus_dashboard_pipeline_etl_spark.functions.similarity import (
        assign_centroids,
    )

    docs = spark.createDataFrame(
        [Row(doc_id=1, text="a b c"), Row(doc_id=2, text="a b c")]
    )
    sigs = minhash_signatures(docs)
    with _pytest.raises(ValueError, match="positive multiple"):
        lsh_candidate_pairs(sigs, k=16, bands=32)

    # NULL text must come back (empty), not vanish
    docs2 = spark.createDataFrame(
        [Row(doc_id=1, text="p1\n\np2"), Row(doc_id=2, text=None)]
    )
    out = {r.doc_id: r for r in dedup_paragraphs(docs2).collect()}
    assert set(out) == {1, 2}
    assert out[2].text == ""

    # zero-norm vector fails loudly instead of NULLing centroid_id
    vecs = spark.createDataFrame(
        [Row(vec_id=1, embedding=[0.0, 0.0])]
    )
    cents = spark.createDataFrame(
        [Row(centroid_id=0, centroid=[1.0, 0.0])]
    )
    with _pytest.raises(Exception, match="zero-norm"):
        assign_centroids(vecs, cents).collect()

    # bad priority weights fail loudly: NULL and negative raise;
    # zero is legitimate (inclusion probability 0 — never selected)
    rows = spark.createDataFrame(
        [Row(doc_id=1, w=2.0), Row(doc_id=2, w=None)]
    )
    with _pytest.raises(Exception, match="must be >= 0"):
        priority_sample(rows, k=1, weight_col="w").collect()
    rows_neg = spark.createDataFrame(
        [Row(doc_id=1, w=2.0), Row(doc_id=2, w=-1.0)]
    )
    with _pytest.raises(Exception, match="must be >= 0"):
        priority_sample(rows_neg, k=1, weight_col="w").collect()
    # NaN would pass a < 0 check and then SORT FIRST (Spark ranks NaN
    # above every finite double) — it must raise, not win the sample
    rows_nan = spark.createDataFrame(
        [Row(doc_id=1, w=2.0), Row(doc_id=2, w=float("nan"))]
    )
    with _pytest.raises(Exception, match="must be >= 0"):
        priority_sample(rows_nan, k=1, weight_col="w").collect()
    rows_zero = spark.createDataFrame(
        [Row(doc_id=1, w=2.0), Row(doc_id=2, w=0.0)]
    )
    kept = priority_sample(rows_zero, k=2, weight_col="w").collect()
    assert [r.doc_id for r in kept] == [1]

    # missing teleport seed fails loudly
    edges = spark.createDataFrame([Row(src=1, dst=2), Row(src=2, dst=1)])
    with _pytest.raises(ValueError, match="teleport seed"):
        pagerank_fixed_point(edges, n_iter=1, teleport=[999])

    # checksum injectivity: NULL vs a literal old-sentinel string, and
    # separator-straddling values, must checksum DIFFERENTLY
    a = spark.createDataFrame([Row(x=None, y="b")], "x string, y string")
    b = spark.createDataFrame([Row(x="\x00", y="b")], "x string, y string")
    ca = table_checksum(a, cols=["x", "y"]).collect()[0].checksum
    cb = table_checksum(b, cols=["x", "y"]).collect()[0].checksum
    assert ca != cb
    c = spark.createDataFrame([Row(x="a\x01b", y="c")], "x string, y string")
    d = spark.createDataFrame([Row(x="a", y="b\x01c")], "x string, y string")
    cc = table_checksum(c, cols=["x", "y"]).collect()[0].checksum
    cd = table_checksum(d, cols=["x", "y"]).collect()[0].checksum
    assert cc != cd
    # and identical tables still agree
    assert (
        table_checksum(a, cols=["x", "y"]).collect()[0].checksum
        == table_checksum(a, cols=["x", "y"]).collect()[0].checksum
    )


def test_topgram_repetition_hand_values(spark):
    """Gopher char-fraction rules on hand-checkable docs: argmax count
    with lexicographic tie, exact char fractions, duplicated-5-gram
    coverage, and the short/empty degenerate cases."""
    from coronavirus_dashboard_pipeline_etl_spark.functions.curation import (
        topgram_repetition,
    )

    docs = spark.createDataFrame(
        [
            # "a b a b a" -> 2-grams: [a b, b a, a b, b a] — tie at 2,
            # lexicographic min "a b" wins; frac = 2*3/9
            (1, "a b a b a"),
            # all tokens distinct: every 2-gram occurs once -> top
            # count 1, lexicographically first gram "p q"
            (2, "p q r s"),
            # 5-gram duplication: "x y x y x y x y x y x y" has
            # 8 5-grams, each of the 2 distinct values 4x -> all dup;
            # chars=23, gram len 9 -> dup5 = 8*9/23
            (3, "x y x y x y x y x y x y"),
            (4, "one"),  # shorter than any n-gram
            (5, ""),  # empty
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in topgram_repetition(docs, top_ns=(2,), dup_n=5).collect()
    }
    assert out[1].top2_gram == "a b"
    assert abs(out[1].top2_char_frac - 2 * 3 / 9) < 1e-12
    assert out[2].top2_gram == "p q"
    assert abs(out[2].top2_char_frac - 1 * 3 / 7) < 1e-12
    assert abs(out[3].dup5_char_frac - 8 * 9 / 23) < 1e-12
    assert out[4].top2_gram is None
    assert out[4].top2_char_frac == 0.0
    assert out[5].dup5_char_frac == 0.0
