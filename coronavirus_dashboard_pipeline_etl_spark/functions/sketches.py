"""Mergeable streaming sketches: HyperLogLog distinct-count and
count-min frequency, built deterministic-by-construction.

Beyond-reference capability (the reference counts distincts exactly in
Postgres, e.g. ``db_etl/homepage_graphs/queries.py`` COUNT(DISTINCT)
patterns); at 100 TB an exact distinct is a full shuffle of every key,
while a sketch is a bounded-size, mergeable aggregate that map-side
combines — the standard engine answer (Spark's own
``approx_count_distinct`` is an HLL++).

Why hand-rolled rather than ``approx_count_distinct``: the built-in's
register layout is engine-internal (not cross-checkable, not portable),
and its estimate differs run-to-run across engines.  This one derives
every register from ``md5`` so the SAME sketch state is reproducible in
any engine (the DuckDB oracle rebuilds it bit-for-bit), and the
register table itself is the exported artifact — union two register
tables and take ``max`` per bucket to merge (classic HLL merge), which
also makes it a valid custom *streaming* aggregate.

Determinism contract (matches gate_queries.py):

* the 60-bit item hash is the first 15 hex chars of md5 — identical
  everywhere;
* register ranks are pure integer ops (bit-length via ``bin``/``%b``,
  never ``log2`` whose libm rounding may differ);
* the harmonic-mean denominator is an EXACT decimal sum of integer
  powers of two (scaled by 2^61 so empty buckets contribute 2^61);
  only the final alpha*m^2 correction touches doubles (mul/div only —
  IEEE-deterministic).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .dedup import md5_prefix_long as _h60  # shared 60-bit base hash

# bucket = low p bits of the 60-bit hash, rank from the rest.
_HASH_BITS = 60


def _salted_mod(salt: Column, item: Column, modulus: int) -> Column:
    """The ONE salted-hash construction every multi-hash sketch uses:
    ``md5(salt || '|' || item) % modulus``. Count-min rows and bloom
    positions must build and probe with the identical formula — keep a
    single definition so they cannot drift (the SQL oracles mirror it
    via gate_queries' shared builder)."""
    return _h60(
        F.concat(salt.cast("string"), F.lit("|"), item)
    ) % F.lit(modulus)


def hll_registers(
    df: DataFrame,
    item: Column,
    p: int = 9,
    group_cols: "tuple[str, ...]" = (),
) -> DataFrame:
    """HyperLogLog register table for the distinct count of ``item``,
    optionally one sketch per ``group_cols`` key (distinct-users-per-
    source/day style monitoring — ONE pass builds every group's sketch).

    Returns one row per OCCUPIED bucket: ``(*group_cols, bucket,
    max_rank)`` with ``bucket`` in [0, 2^p) and ``max_rank`` in
    [1, 60-p+1].  This is the sketch's full state: mergeable by
    ``union`` + ``max(max_rank) GROUP BY (*group_cols, bucket)``, and
    O(groups * 2^p) rows regardless of input size.

    Scale shape: one map-side-combinable groupBy on a (group, p-bit)
    key — the partial aggregate per task is bounded by groups * 2^p
    rows, so the shuffle is constant-size per group no matter how many
    input rows each task scans.
    """
    if not 4 <= p <= 16:
        raise ValueError(f"hll_registers: p must be in [4,16], got {p}")
    m = 1 << p
    # NULL items are not observations (matching COUNT(DISTINCT) and
    # Spark's approx_count_distinct); without this filter they would
    # produce a (NULL, NULL) register row that corrupts v_empty and
    # survives merges forever
    df = df.filter(item.isNotNull())
    h = _h60(item)
    bucket = (h % F.lit(m)).alias("bucket")
    # top 60-p bits; shiftright, never double division (h > 2^53 would
    # round through a double and corrupt the rank)
    w = F.shiftright(h, p)
    wbits = _HASH_BITS - p
    # rank = position of the leftmost 1-bit of w within (60-p) bits,
    # counted from 1; all-zero w -> wbits + 1 (standard HLL rho).
    rank = F.when(w == 0, F.lit(wbits + 1)).otherwise(
        F.lit(wbits) - F.length(F.bin(w)) + 1
    )
    keys = [F.col(c) for c in group_cols]
    return (
        df.select(*keys, bucket, rank.alias("rank"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rank").alias("max_rank"))
    )


def hll_merge(*register_tables: DataFrame) -> DataFrame:
    """Merge sketches built with the same ``p``: max rank per
    (group, bucket). The group columns are INFERRED from the schema
    (everything that isn't ``bucket``/``max_rank``) so merging grouped
    sketches can't silently collapse groups by forgetting a parameter.

    This is what makes the sketch a distributed/streaming aggregate:
    shard corpora, sketch each shard, merge the tiny register tables.
    """
    if not register_tables:
        raise ValueError("hll_merge: need at least one register table")
    cols = set(register_tables[0].columns)
    if not {"bucket", "max_rank"} <= cols:
        raise ValueError(
            "hll_merge: inputs must be hll_registers outputs "
            f"(bucket, max_rank[, group cols]); got {sorted(cols)}"
        )
    for t in register_tables[1:]:
        if set(t.columns) != cols:
            raise ValueError(
                "hll_merge: register tables disagree on columns: "
                f"{sorted(cols)} vs {sorted(t.columns)}"
            )
    group_cols = [c for c in register_tables[0].columns
                  if c not in ("bucket", "max_rank")]
    out = register_tables[0]
    for t in register_tables[1:]:
        out = out.unionByName(t)
    return out.groupBy(*group_cols, "bucket").agg(
        F.max("max_rank").alias("max_rank")
    )


def hll_summary(
    registers: DataFrame,
    p: int = 9,
    group_cols: "tuple[str, ...]" = (),
) -> DataFrame:
    """Estimate summary from a register table: one row per
    ``group_cols`` key (one row total when empty).

    Columns: ``m`` (buckets), ``v_empty`` (zero registers), ``s_scaled``
    (exact integer harmonic-mean denominator, scaled by 2^(61-p)),
    ``raw_estimate`` (alpha_m * m^2 / sum(2^-M_j), the uncorrected HLL
    estimator — deterministic: exact integers into one double div/mul).

    The 2^(61-p) scaling is chosen so the denominator is EXACT BIGINT
    arithmetic end-to-end: the largest register contribution is
    2^(60-p), the smallest 2^0, and the worst-case total m * 2^(61-p)
    = 2^61 < 2^63.  Staying in int64 (not DECIMAL) matters because the
    final int->double cast is IEEE round-nearest in every engine,
    whereas wide-decimal->double conversion rounds differently between
    engines (observed: Spark vs DuckDB differ in the last ulp on a
    70-bit unscaled value).

    The small-range linear-counting correction (m * ln(m / V)) is the
    right production refinement but ``ln`` is libm-dependent, so it is
    left to callers that don't need cross-engine bit-equality:
    ``corrected = m * math.log(m / v_empty)`` when ``raw <= 2.5 m`` and
    ``v_empty > 0``.
    """
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    scale_pow = 61 - p  # empty-bucket contribution: 2^scale_pow
    # integer shift, never pow(): the double round-trip is not reliably
    # exact (F.shiftleft only takes a literal shift; the SQL form takes
    # an expression)
    scaled = F.expr(
        f"shiftleft(CAST(1 AS BIGINT), {scale_pow} - max_rank)"
    )
    pre = registers.select(*group_cols, scaled.alias("__scaled"))
    # coalesce: SUM over zero rows is NULL; the ungrouped empty-input
    # row must still carry the empty-sketch values (present=0 so
    # s_scaled = m * 2^(61-p) and raw ~ alpha*m), not NULLs
    agg = pre.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("present"),
        F.coalesce(F.sum("__scaled"), F.lit(0).cast("long")).alias("s_occ"),
    )
    return agg.select(
        *group_cols,
        F.lit(m).cast("long").alias("m"),
        (F.lit(m) - F.col("present")).cast("long").alias("v_empty"),
        (
            F.col("s_occ")
            + (F.lit(m) - F.col("present")).cast("long")
            * F.lit(1 << scale_pow).cast("long")
        ).cast("long").alias("s_scaled"),
    ).select(
        *group_cols,
        "m",
        "v_empty",
        "s_scaled",
        # single precomputed double coefficient (alpha * m^2 * 2^(61-p))
        # so an oracle can embed the identical literal
        (
            F.lit(alpha * m * m * float(1 << scale_pow))
            / F.col("s_scaled").cast("double")
        ).alias("raw_estimate"),
    )


# --------------------------------------------------------------------------
# count-min
# --------------------------------------------------------------------------

def countmin_sketch(
    df: DataFrame, item: Column, depth: int = 4, width: int = 512
) -> DataFrame:
    """Count-min sketch of ``item`` frequencies: ``(row, col, cnt)``,
    at most depth*width rows.  Row i uses hash ``md5(i || '|' || item)``
    so the d hash functions are independent and reproducible anywhere.

    Mergeable by ``union`` + ``sum(cnt) GROUP BY row, col`` — a valid
    shard/stream aggregate.  Scale shape: the explode is x``depth`` on
    the map side, then one groupBy on a (depth*width)-ary key with
    map-side combine; shuffle size is bounded by the sketch, not the
    data.
    """
    if depth < 1 or width < 2:
        raise ValueError("countmin_sketch: need depth >= 1, width >= 2")
    rows = F.explode(
        F.array(*[F.lit(i) for i in range(depth)])
    ).alias("row")
    # NULL items are not observations (a NULL concat would null the
    # hash and pile every NULL into phantom (row, NULL) cells that
    # lookups then undercount)
    tagged = df.filter(item.isNotNull()).select(item.alias("__item"), rows)
    col = _salted_mod(F.col("row"), F.col("__item"), width)
    return (
        tagged.select("row", col.alias("col"))
        .groupBy("row", "col")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def countmin_lookup(
    sketch: DataFrame,
    candidates: DataFrame,
    item: Column,
    depth: int = 4,
    width: int = 512,
) -> DataFrame:
    """Point-estimate each candidate's frequency: min over the d rows.

    ``candidates`` is expected small (heavy-hitter shortlist); the join
    against the bounded sketch broadcasts.  Output keeps every candidate
    column and appends ``cm_estimate`` (upper-bound count: the count-min
    guarantee is estimate >= true, overcount bounded by e*N/width with
    probability 1 - e^-depth).  NULL-item candidates get NULL (they are
    never counted into the sketch, so 0 would masquerade as an exact
    answer).  Internal keys are ``__``-prefixed so candidate frames may
    themselves carry ``row``/``col``/``cnt`` columns.
    """
    from pyspark.sql.functions import broadcast

    if any(c.startswith("__") for c in candidates.columns):
        raise ValueError(
            "countmin_lookup: candidate columns must not start with '__'"
        )
    rows = F.explode(
        F.array(*[F.lit(i) for i in range(depth)])
    ).alias("__row")
    keyed = candidates.withColumn("__item", item).select("*", rows)
    col = _salted_mod(F.col("__row"), F.col("__item"), width)
    sk = broadcast(
        sketch.select(
            F.col("row").alias("__row"),
            F.col("col").alias("__col"),
            F.col("cnt").alias("__cnt"),
        )
    )
    probed = keyed.withColumn("__col", col).join(
        sk, on=["__row", "__col"], how="left"
    )
    out_cols = [c for c in candidates.columns]
    est = F.min(
        F.when(
            F.col("__item").isNotNull(),
            F.coalesce(F.col("__cnt"), F.lit(0)),
        )
    )
    return probed.groupBy(*out_cols).agg(est.alias("cm_estimate"))


# --------------------------------------------------------------------------
# bloom filter
# --------------------------------------------------------------------------

def bloom_bits(
    df: DataFrame, item: Column, m_bits: int = 8192, k_hashes: int = 4
) -> DataFrame:
    """Bloom-filter membership sketch as a SET-BIT table: one row per
    distinct set position, at most ``m_bits`` rows whatever the input.
    The portable form of the bloom Spark builds internally for runtime
    join-filter pushdown — here it is an explicit, engine-independent
    artifact (md5-derived positions) you can persist next to a corpus
    and probe from any engine.

    Mergeable by ``union`` + ``distinct`` (bit-OR).  Guarantee: a probe
    of any inserted item finds all its bits (NO false negatives);
    absent items collide with probability ~(1 - e^(-k n / m))^k.

    Scale shape: explode x``k_hashes`` then one map-side-combinable
    distinct on a bounded key — constant-size shuffle like the other
    sketches.  NULL items are not observations.
    """
    if m_bits < 2 or k_hashes < 1:
        raise ValueError("bloom_bits: need m_bits >= 2, k_hashes >= 1")
    hashes = F.explode(
        F.array(*[F.lit(i) for i in range(k_hashes)])
    ).alias("__k")
    tagged = df.filter(item.isNotNull()).select(item.alias("__item"), hashes)
    bit = _salted_mod(F.col("__k"), F.col("__item"), m_bits)
    return tagged.select(bit.alias("bit")).distinct()


def bloom_probe(
    bits: DataFrame,
    candidates: DataFrame,
    item: Column,
    m_bits: int = 8192,
    k_hashes: int = 4,
) -> DataFrame:
    """Probe the set-bit table: appends ``maybe_present`` per candidate
    (true iff ALL k positions are set; false is definitive absence).
    The bit table is bounded by ``m_bits`` rows, so it broadcasts — the
    probe never shuffles the candidate side, which is what makes this
    the semi-join pre-filter at scale (drop definitively-absent rows
    before the real join moves any data).  NULL-item candidates probe
    to NULL.
    """
    from pyspark.sql.functions import broadcast

    # same bounds as bloom_bits: probing with parameters different from
    # the build would silently produce false negatives, violating the
    # 'false is definitive absence' contract
    if m_bits < 2 or k_hashes < 1:
        raise ValueError("bloom_probe: need m_bits >= 2, k_hashes >= 1")
    if any(c.startswith("__") for c in candidates.columns):
        raise ValueError(
            "bloom_probe: candidate columns must not start with '__'"
        )
    hashes = F.explode(
        F.array(*[F.lit(i) for i in range(k_hashes)])
    ).alias("__k")
    keyed = candidates.withColumn("__item", item).select("*", hashes)
    bit = _salted_mod(F.col("__k"), F.col("__item"), m_bits)
    probed = keyed.withColumn("__bit", bit).join(
        broadcast(bits.select(F.col("bit").alias("__bit"), F.lit(1).alias("__hit"))),
        on="__bit",
        how="left",
    )
    out_cols = [c for c in candidates.columns]
    maybe = F.when(
        F.max(F.col("__item").isNull().cast("int")) == 1, F.lit(None)
    ).otherwise(F.min(F.coalesce(F.col("__hit"), F.lit(0))) == 1)
    return probed.groupBy(*out_cols).agg(maybe.alias("maybe_present"))


# --------------------------------------------------------------------------
# histogram quantiles
# --------------------------------------------------------------------------

def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    bins: int,
    qs: "tuple[float, ...]" = (0.25, 0.5, 0.75),
) -> DataFrame:
    """Approximate quantiles from a fixed-bound equi-width histogram —
    the deterministic, mergeable twin of ``approxQuantile``: the
    histogram is ONE map-side-combinable pass (``curation.
    histogram_fixed``), merges by adding counts, and the estimate is
    linear interpolation inside the covering bucket from EXACT integer
    counts, so two engines (or two shards merged) produce identical
    doubles.

    Returns ``(q, est)`` per requested quantile. Error is bounded by
    one bucket width; choose ``bins`` for the precision the monitor
    needs. The post-histogram work is a window over <= ``bins`` rows —
    bounded, never data-sized.
    """
    from .curation import histogram_fixed

    if not qs:
        raise ValueError("histogram_quantiles: need at least one q")
    if any(not 0.0 < q <= 1.0 for q in qs):
        raise ValueError(f"quantiles must be in (0, 1], got {qs}")
    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi}]")
    from pyspark.sql import Window

    width = (hi - lo) / bins
    # NULL values are not observations: histogram_fixed's edge clamp
    # (greatest skips NULLs in Spark) would otherwise silently pile
    # them into bucket 0 and skew every quantile
    df = df.filter(F.col(value_col).isNotNull())
    hist = histogram_fixed(df, value_col, lo, hi, bins)
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        "bucket",
        "n",
        F.sum("n").over(w).alias("cum"),
        F.sum("n").over(
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("total"),
    )
    qdf = hist.sparkSession.createDataFrame(
        [(float(q),) for q in qs], "q double"
    )
    # covering bucket: smallest bucket whose inclusive cumulative count
    # reaches q * total (exact-int cum vs double target — deterministic)
    cand = qdf.crossJoin(cum).filter(
        F.col("cum").cast("double") >= F.col("q") * F.col("total")
    )
    wq = Window.partitionBy("q").orderBy("bucket")
    first = cand.withColumn("__rn", F.row_number().over(wq)).filter(
        F.col("__rn") == 1
    )
    est = (
        F.lit(lo)
        + F.col("bucket").cast("double") * F.lit(width)
        + (
            F.col("q") * F.col("total")
            - (F.col("cum") - F.col("n")).cast("double")
        )
        / F.col("n").cast("double")
        * F.lit(width)
    )
    return first.select("q", est.alias("est"))


# --------------------------------------------------------------------------
# KMV (k-minimum-values / bottom-k) distinct sketch — supports set
# INTERSECTION estimates, which HLL cannot express
# --------------------------------------------------------------------------

def kmv_sketch(
    df: DataFrame,
    item: Column,
    k: int = 64,
    group_cols: "tuple[str, ...]" = (),
) -> DataFrame:
    """Bottom-k / KMV distinct sketch (Bar-Yossef et al. 2002; Beyer et
    al. SIGMOD 2007): per group, the ``k`` SMALLEST distinct 60-bit item
    hashes, ascending. One row per group: ``(*group_cols, sketch
    array<long>, n_kept int)``.

    Why alongside HLL: a KMV sketch is a uniform sample of the hash
    space, so two groups' sketches compose — Jaccard / intersection
    estimates fall out of ``kmv_pairwise`` — where HLL registers only
    union.  Merge per-shard sketches with ``kmv_merge`` (pool the
    already-hashed sketch VALUES and keep the k smallest distinct —
    never re-hash them through this function, which would land the
    merged sketch in a double-hashed space incompatible with
    directly-built sketches).

    Scale shape: a map-side-combinable distinct on ``(group, hash)``
    (the partial dedup halves the exchange under repetition-heavy
    corpora), then a PER-PARTITION bottom-k prefilter (keep the k
    smallest per shuffle partition — the union of per-partition
    bottom-ks always contains the global bottom-k, so the result is
    partitioning-independent) before the global ``row_number <= k``:
    the final group-keyed exchange carries at most k x partitions rows
    per group instead of every distinct hash — without the prefilter
    an UNGROUPED sketch would funnel the corpus's whole distinct-hash
    set through one task.

    Determinism: the hash is the shared md5 60-bit prefix
    (``dedup.md5_prefix_long``), the sketch is an exact set — the
    DuckDB oracle rebuilds it value-for-value.
    """
    from pyspark.sql import Window

    if k < 2:
        raise ValueError(f"kmv_sketch: k must be >= 2, got {k}")
    df = df.filter(item.isNotNull())
    h = _h60(item)
    keys = [F.col(c) for c in group_cols]
    distinct = df.select(*keys, h.alias("__h")).dropDuplicates(
        [*group_cols, "__h"]
    )
    pre = Window.partitionBy(
        *group_cols, F.spark_partition_id()
    ).orderBy("__h")
    distinct = (
        distinct.withColumn("__prn", F.row_number().over(pre))
        .filter(F.col("__prn") <= k)
        .drop("__prn")
    )
    w = Window.partitionBy(*group_cols).orderBy("__h")
    return (
        distinct.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .groupBy(*group_cols)
        .agg(
            F.array_sort(F.collect_list("__h")).alias("sketch"),
            F.count(F.lit(1)).cast("int").alias("n_kept"),
        )
    )


def kmv_merge(
    sketches: DataFrame,
    k: int,
    group_cols: "tuple[str, ...]" = (),
) -> DataFrame:
    """Merge per-shard KMV sketches built with the same ``k``: pool the
    sketch VALUES (already hashed — re-hashing via ``kmv_sketch`` would
    produce an incompatible double-hashed sketch) and keep the k
    smallest distinct per group. Output schema matches ``kmv_sketch``,
    so merged and directly-built sketches compose in ``kmv_pairwise``
    and estimate identically (pytest pins merged == direct).

    The exchange carries at most k values per input sketch row.
    """
    from pyspark.sql import Window

    if k < 2:
        raise ValueError(f"kmv_merge: k must be >= 2, got {k}")
    pooled = sketches.select(
        *[F.col(c) for c in group_cols], F.explode("sketch").alias("__h")
    ).dropDuplicates([*group_cols, "__h"])
    w = Window.partitionBy(*group_cols).orderBy("__h")
    return (
        pooled.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .groupBy(*group_cols)
        .agg(
            F.array_sort(F.collect_list("__h")).alias("sketch"),
            F.count(F.lit(1)).cast("int").alias("n_kept"),
        )
    )


def kmv_estimate(sketch: Column, n_kept: Column, k: int) -> Column:
    """Distinct-count estimate from a KMV sketch column: exact
    ``n_kept`` while the sketch is unsaturated (fewer than k distinct
    values seen — the sketch IS the value set), else the KMV estimator
    ``(k-1) / U_k`` with ``U_k`` the k-th smallest hash normalised to
    (0, 1].  Exactly two IEEE double ops (one divide each) in a fixed
    order — cross-engine reproducible."""
    u_k = F.element_at(sketch, k).cast("double") / F.lit(float(1 << 60))
    return F.when(
        n_kept < k, n_kept.cast("double")
    ).otherwise(F.lit(float(k - 1)) / u_k)


def kmv_pairwise(
    sketches: DataFrame,
    group_col: str,
    k: int,
) -> DataFrame:
    """Pairwise Jaccard / intersection / union estimates between every
    two groups' KMV sketches (Beyer et al. 2007 §4): for groups a < b,
    pool both sketches, keep the k' = min(k, |pool|) smallest distinct
    values L, count the members of L present in BOTH sketches, then

    * ``jaccard_est``  = overlap / k'
    * ``union_est``    = KMV estimate over L (exact |L| if unsaturated)
    * ``intersect_est`` = jaccard_est * union_est

    All work is higher-order functions over two k-sized arrays after a
    sketch x sketch self-join — the frame is groups², never data-sized
    (sketch the corpus first; this runs on the sketch table).
    """
    if k < 2:
        raise ValueError(f"kmv_pairwise: k must be >= 2, got {k}")
    a = sketches.select(
        F.col(group_col).alias("g_a"), F.col("sketch").alias("__sa")
    )
    b = sketches.select(
        F.col(group_col).alias("g_b"), F.col("sketch").alias("__sb")
    )
    pairs = a.join(b, F.col("g_a") < F.col("g_b"))
    pool = F.slice(
        F.array_sort(F.array_union("__sa", "__sb")), 1, k
    )
    kp = F.size(pool)  # k' = min(k, |distinct union of sketches|)
    overlap = F.size(
        F.filter(
            pool,
            lambda v: F.array_contains(F.col("__sa"), v)
            & F.array_contains(F.col("__sb"), v),
        )
    )
    jaccard = overlap.cast("double") / kp.cast("double")
    u_k = F.element_at(pool, kp).cast("double") / F.lit(float(1 << 60))
    union_est = F.when(
        kp < k, kp.cast("double")
    ).otherwise(F.lit(float(k - 1)) / u_k)
    return pairs.select(
        "g_a",
        "g_b",
        overlap.cast("long").alias("overlap_k"),
        jaccard.alias("jaccard_est"),
        union_est.alias("union_est"),
        (jaccard * union_est).alias("intersect_est"),
    )
