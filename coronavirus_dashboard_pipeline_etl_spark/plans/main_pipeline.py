"""EP1 — the main daily-release pipeline, end to end.

The reference's processor chain (``db_etl/etl.py:996-1022``, "These must
be done in a specific order") re-expressed as one composed Spark plan:

    nested JSON -> long -> pivot (wide panel)
    -> homogenise_dates          (J4 scaffold densify)
    -> normalise_records         (W1-W3 bounded fills)
    -> negative_to_zero          (P4)
    -> calculate_pair_summations (A8)
    -> calculate_by_adjacent_column (J3)
    -> calculate_rates           (J2 + A1 per-100k)
    -> change_by_sum             (A1-A4 rolling family)
    -> ratio_to_percentage
    -> trim_end                  (W5 freshness mask)
    -> releaseTimestamp + canonical sort

and the load side (``db_etl_upload/uploader.py:546-655``):

    melt (P7) -> trim_sides (W4) -> payload wrap (P10) -> keyed hash
    -> partition_id -> partitioned parquet write (S8/S10 as
    partitionBy + dynamic overwrite instead of Postgres DDL + upsert).

Where the reference runs one Azure Function per area and rides blob
storage between stages, this is a single lazy plan: area fan-out is
partition parallelism, the orchestrator barrier is a stage boundary.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..config import (
    DEFAULT_METRICS,
    RATE_PRECISION,
    MetricConfig,
    TAIL_TRIM_DAYS,
)
from ..operators import (
    calculate_by_adjacent_column,
    calculate_pair_summations,
    calculate_rates,
    change_by_sum,
    drop_weekly_metric_nulls,
    homogenise_dates,
    melt,
    negative_to_zero,
    normalise_records,
    ratio_to_percentage,
    row_hash_blake2,
    trim_end,
    trim_sides,
)
from ..operators.nesting import wrap_payload
from ..sources.nested_json import (
    area_names,
    explode_timeseries,
    pivot_panel,
    read_nested_release,
)

PANEL_META = ["areaType", "areaCode", "areaName", "date"]


def build_panel(spark: SparkSession, json_path: str) -> DataFrame:
    """Raw release JSON -> canonical wide panel."""
    long = read_nested_release(spark, json_path)
    obs = explode_timeseries(long)
    return pivot_panel(obs, names=area_names(long))


def process_panel(
    panel: DataFrame,
    population: DataFrame,
    config: MetricConfig = DEFAULT_METRICS,
    release_timestamp: str | None = None,
    pct_precision: int | None = 1,
    rate_precision: int | None = RATE_PRECISION,
) -> DataFrame:
    """The processor chain on an existing wide panel (reference order).

    The precision knobs default to the reference's rounding; the oracle
    gate passes None (engines round doubles differently at the last
    ulp).

    Frame scope: the reference fans the main chain out as ONE
    (areaType, areaCode) chunk per call (retrieve.py:147-163 writes one
    blob per area; run_direct processes it alone), so every
    frame-scoped scalar in the chain — the homogenise span, the rates
    event cutoff and last-valid dates, the trim_end cutoff — is that
    AREA's own, not the release's. The per-area composed reference-exec
    parity test (round 10) caught the global scoping this plan
    originally used."""
    chunk_keys = ("areaType", "areaCode")
    out = homogenise_dates(panel, span="group")
    out = normalise_records(
        out,
        zero_filled=config.fill_with_zeros,
        cumulative=config.start_with_zero,
    )
    out = negative_to_zero(out, config.negative_to_zero)
    out = calculate_pair_summations(out, config.pair_sums)
    out = calculate_by_adjacent_column(out, config.adjacent_fill)
    out = calculate_rates(
        out,
        population,
        rolling_rate=config.rolling_rate,
        incidence_rate=config.incidence_rate,
        precision=rate_precision,
        frame_keys=chunk_keys,
    )
    # change_by_sum reuses a RollingSum column calculate_rates already
    # made (reference rolling.py:131-163): the rate path's sums carry
    # 0-coerced leading windows, so recomputing them would NOT be
    # identical at the leading edge.
    out = change_by_sum(
        out, config.sum_change_direction, pct_precision=pct_precision
    )
    out = ratio_to_percentage(out, config.ratio_to_percentage)
    out = trim_end(out, config.trim_end, TAIL_TRIM_DAYS, group_keys=chunk_keys)
    if release_timestamp is not None:
        out = out.withColumn("releaseTimestamp", F.lit(release_timestamp))
    return out.orderBy(
        F.col("areaType"), F.col("areaCode"), F.col("date").desc()
    )


def to_long_store(
    panel: DataFrame,
    release_id: int,
    partition_group_expr: F.Column | None = None,
    hash_key: bytes | None = None,
    metric_registry_path: str | None = None,
) -> DataFrame:
    """Processed wide panel -> serving-store long rows.

    Mirrors deploy() (uploader.py:546-655): melt, trim unstable series
    edges, wrap payloads as JSON cells, stamp release/partition ids, key
    each row with the keyed digest the reference uses for upsert identity
    (uploader.py:171-179).

    With ``metric_registry_path``, unknown metric names are first
    upserted into the metric registry and every row gains the registry's
    numeric ``metric_id`` via broadcast join — the reference's
    ``validate_metrics`` dynamic-schema step (uploader.py:339-350).
    """
    id_vars = [c for c in PANEL_META if c in panel.columns] + (
        ["releaseTimestamp"] if "releaseTimestamp" in panel.columns else []
    )
    # the panel mixes numeric metrics and string metrics (Direction
    # columns); pandas melts them into one object column — Spark melts
    # each type family separately, trims + wraps, then unions the JSON
    # payload rows. areaNameLower is derived metadata, not a metric.
    dtypes = dict(panel.dtypes)
    skip = set(id_vars) | {"areaNameLower"}
    num_vars = [
        c
        for c, t in dtypes.items()
        if c not in skip
        and (t in ("double", "float", "bigint", "int") or t.startswith("decimal"))
    ]
    str_vars = [c for c in dtypes if c not in skip and c not in num_vars]

    def prep(value_vars):
        part = melt(panel, id_vars=id_vars, value_vars=value_vars)
        part = part.withColumnRenamed("areaType", "area_type").withColumnRenamed(
            "areaCode", "area_code"
        )
        part = trim_sides(part)
        # weekly-cadence metrics drop null payloads before wrapping
        # (deploy order: melt -> trim_sides -> format_weekly_metrics,
        # uploader.py:617-621)
        part = drop_weekly_metric_nulls(part)
        return part.withColumn("payload", wrap_payload(F.col("payload")))

    parts = [prep(v) for v in (num_vars, str_vars) if v]
    long = parts[0]
    for p in parts[1:]:
        long = long.unionByName(p)

    if partition_group_expr is None:
        partition_group_expr = F.when(
            F.col("area_type").isin("utla", "ltla", "nhsTrust", "msoa"),
            F.lower(F.col("area_type")),
        ).otherwise(F.lit("other"))
    long = long.withColumn("partition_id", partition_group_expr)
    long = long.withColumn("release_id", F.lit(release_id))
    if metric_registry_path is not None:
        from ..sources.registry import register_metrics, resolve_metric_ids

        registry = register_metrics(long, metric_registry_path)
        long = resolve_metric_ids(long, registry)
    # reference hash identity (uploader.py:156-178): date FIRST, then
    # area_type, area_code, metric_id, release_id. Exact parity with
    # reference-stored hashes therefore requires the registry path (the
    # numeric metric_id); without it the same recipe runs keyed on the
    # metric name instead.
    metric_key = "metric_id" if "metric_id" in long.columns else "metric"
    return row_hash_blake2(
        long,
        ["date", "area_type", "area_code", metric_key, "release_id"],
        out="hash",
        key=hash_key,
    )


def write_store(long: DataFrame, path: str) -> None:
    """S8/S10 — the serving store write.

    ``partitionBy(partition_id)`` + dynamic partition overwrite replaces
    the reference's per-release Postgres partition DDL
    (uploader.py:255-295) and hash-upsert: re-running a release replaces
    exactly its own partitions, so the write is idempotent like the
    reference's ON CONFLICT path.
    """
    (
        long.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("partition_id")
        .parquet(path)
    )


def write_store_bucketed(
    long: DataFrame, table_name: str, buckets: int = 64
) -> None:
    """Bucketed variant of the serving store for shuffle-free serving.

    The serving queries window/group by (area, metric) over the fact
    table (serving.py: latest_per_group, latest_n_dates, landing cache).
    Bucketing + in-bucket sorting by those keys means a reader's
    groupBy/window on (area_code, metric) needs NO exchange — at 100 TB
    the per-query shuffle of the whole fact table is the serving
    bottleneck, and this removes it. Writes through the catalog
    (``saveAsTable``) because bucket metadata lives in the metastore.

    Re-runs keep write_store's idempotence: once the table exists, the
    write goes through ``insertInto`` with dynamic partition overwrite,
    replacing ONLY the partitions present in ``long`` (a plain
    ``saveAsTable(overwrite)`` would drop every other release's
    partitions). Spark enforces the table's bucket spec on insertInto, so
    inserted partitions stay bucket-readable.
    """
    spark = long.sparkSession
    if spark.catalog.tableExists(table_name):
        # insertInto is positional: match the table's column order
        # (partition column last). The dynamic-overwrite writer OPTION is
        # ignored on the insertInto path — only the session conf governs
        # it — so set and restore it around the write.
        cols = spark.table(table_name).columns
        conf_key = "spark.sql.sources.partitionOverwriteMode"
        prev = spark.conf.get(conf_key, "static")
        spark.conf.set(conf_key, "dynamic")
        try:
            long.select(*cols).write.mode("overwrite").insertInto(table_name)
        finally:
            spark.conf.set(conf_key, prev)
    else:
        (
            long.write.mode("overwrite")
            .partitionBy("partition_id")
            .bucketBy(buckets, "area_code", "metric")
            .sortBy("area_code", "metric", "date")
            .format("parquet")
            .saveAsTable(table_name)
        )


def merge_upsert_store(
    incoming: DataFrame, path: str, max_affected_partitions: int = 10_000
) -> None:
    """MERGE twin of ``write_store`` — the reference's row-level upsert
    semantic (``db_etl_upload/uploader.py:300-325``: dedup the batch on
    the identity tuple, then INSERT .. ON CONFLICT (hash, partition_id)
    DO UPDATE SET payload) expressed over a parquet store at partition
    granularity. ``write_store``'s dynamic overwrite REPLACES a
    partition wholesale; this keeps existing rows whose hash the batch
    doesn't carry — the semantic a partial re-run or late-metric
    backfill needs.

    1. Batch dedup: the reference keeps the FIRST duplicate in frame
       order; a distributed frame has no frame order, so the twin keeps
       the MAX payload string per (hash, partition_id) — deterministic
       across engines and partitionings. Identity-tuple duplicates
       share their hash (the hash IS the keyed identity digest,
       uploader.py:156-178), so the dedup key is the same.
    2. Affected partitions: distinct partition_id in the batch
       (bounded, loud collect — a batch fanning into more than
       ``max_affected_partitions`` partitions is a malformed release).
    3. Conflict rule: existing rows in affected partitions survive iff
       their (hash, partition_id) is absent from the batch; batch rows
       always land. The reference updates ONLY payload on conflict,
       but a hash match implies every identity column matches, so
       batch-row-wins IS payload-update.
    4. The merged affected partitions are localCheckpoint-materialised
       (the plan reads the same files the dynamic overwrite is about
       to replace), then written with dynamic partition overwrite —
       untouched partitions' files are never rewritten. At real 100 TB
       scale the same logic rides a transactional table format's MERGE
       (Delta/Iceberg) instead of checkpoint+overwrite; the semantics
       here are the contract.
    """
    from pyspark.errors import AnalysisException
    from pyspark.sql import Window

    from ..functions.graph import _persistent_rdd_ids, _release_rdds

    spark = incoming.sparkSession
    w = Window.partitionBy("hash", "partition_id").orderBy(
        F.col("payload").desc()
    )
    inc = (
        incoming.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    # FS-agnostic existence probe: an os.path check only sees the local
    # filesystem — on HDFS/S3 an existing store would read as absent and
    # the first-write fallback's dynamic overwrite would wholesale-
    # replace the batch's partitions, losing every non-conflicting row.
    # Probe through Spark's reader instead (missing path OR an empty
    # schema-less directory both raise AnalysisException).
    try:
        existing_all = spark.read.parquet(path)
    except AnalysisException:
        write_store(inc, path)
        return
    parts = (
        inc.select("partition_id")
        .distinct()
        .limit(max_affected_partitions + 1)
        .collect()
    )
    if len(parts) > max_affected_partitions:
        raise ValueError(
            f"merge_upsert_store: batch touches more than "
            f"{max_affected_partitions} partitions; that is a malformed "
            "release (or raise max_affected_partitions explicitly)"
        )
    affected = [r["partition_id"] for r in parts]
    existing = existing_all.filter(F.col("partition_id").isin(affected))
    survivors = existing.join(
        inc.select("hash", "partition_id"),
        ["hash", "partition_id"],
        "left_anti",
    )
    # the checkpoint blocks are not cache-manager entries (unpersist is
    # a no-op for them); release by RDD id once the write has consumed
    # them, else every merge pins its partitions' rows for the session
    # — the accumulation class that OOM'd the r6 sweep driver
    sc = spark.sparkContext
    __b = _persistent_rdd_ids(sc)
    merged = inc.unionByName(survivors.select(*inc.columns)).localCheckpoint(
        eager=True
    )
    merged_ids = (
        ((_persistent_rdd_ids(sc) or set()) - __b) if __b is not None else set()
    )
    try:
        write_store(merged, path)
    finally:
        _release_rdds(sc, merged_ids)


def run_main(
    spark: SparkSession,
    json_path: str,
    population: DataFrame,
    store_path: str | None = None,
    release_id: int = 1,
    config: MetricConfig = DEFAULT_METRICS,
    release_timestamp: str | None = None,
) -> DataFrame:
    """Full EP1: returns the long store rows (and writes them if a store
    path is given)."""
    panel = build_panel(spark, json_path)
    processed = process_panel(panel, population, config, release_timestamp)
    long = to_long_store(processed, release_id=release_id)
    if store_path:
        write_store(long, store_path)
    return long


def compact_store(
    spark: SparkSession,
    path: str,
    partitions: Sequence[str] | None = None,
    target_rows_per_file: int = 2_000_000,
) -> dict[str, int]:
    """Small-file compaction for the partitioned serving store — the
    housekeeping a daily-release store needs at 100 TB: each release
    rewrite leaves one file set per partition per run, and serving scan
    cost degrades with file count, not bytes.

    Per selected ``partition_id`` (default: all), rewrites the
    partition's rows into ``ceil(rows / target_rows_per_file)`` files
    via the same dynamic-overwrite path as ``write_store`` — so a
    killed compaction run is re-runnable (idempotent per partition) and
    concurrent readers of OTHER partitions never see a partial state.
    Returns ``{partition_id: file_count_written}``.

    Scale shape: one count + one coalesced rewrite per partition, each
    bounded by that partition's size — never a full-store shuffle. The
    coalesce is a NARROW repartition (no exchange) since output files
    only need merging, not redistribution.

    Concurrency contract: plain-parquet dynamic overwrite offers NO
    snapshot isolation WITHIN a partition — an EXTERNAL reader or
    writer touching a partition while it is being compacted can observe
    a partial file set. Schedule compaction in the release window when
    the selected partitions are quiescent (the store's release
    scheduling already serialises writers per partition); for
    concurrent-safe compaction use a table format with commit protocols
    (Delta/Iceberg) instead. The compactor's OWN read-then-replace
    cycle is enforced safe below: each partition is materialised
    (localCheckpoint) before its files are overwritten, so a task retry
    mid-overwrite re-reads executor blocks, never half-replaced files.
    """
    from ..functions.graph import _persistent_rdd_ids, _release_rdds

    sc = spark.sparkContext
    store = spark.read.parquet(path)
    # ONE grouped count for every selected partition (not a count-scan
    # per partition); the rewrites that follow each scan only their own
    # partition's files via partition pruning
    counts_df = store.groupBy("partition_id").count()
    if partitions is not None:
        counts_df = counts_df.filter(F.col("partition_id").isin(list(partitions)))
    counts = {r["partition_id"]: r["count"] for r in counts_df.collect()}
    written: dict[str, int] = {}
    for pid, n in sorted(counts.items()):
        if n == 0:
            continue
        n_files = max(1, -(-n // target_rows_per_file))
        # materialise the partition BEFORE the overwrite: the writer
        # must never stream from the very files it is replacing (the
        # same-partition reader/writer hazard the contract above
        # documents — localCheckpoint severs the scan dependency, at a
        # cost bounded by one partition's rows, so a task retry
        # mid-overwrite re-reads executor blocks, not half-replaced
        # files)
        # rolling release by RDD id (graph._release_rdds): a plain
        # DataFrame.unpersist() is a NO-OP for localCheckpoint blocks
        # (they are not cache-manager entries), which would pin every
        # compacted partition's rows for the session — the same
        # accumulation class that OOM'd the r6 sweep driver
        __b = _persistent_rdd_ids(sc)
        part_df = (
            store.filter(F.col("partition_id") == pid)
            .coalesce(n_files)
            .localCheckpoint(eager=True)
        )
        part_ids = (
            ((_persistent_rdd_ids(sc) or set()) - __b)
            if __b is not None
            else set()
        )
        try:
            (
                part_df.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("partition_id")
                .parquet(path)
            )
        finally:
            _release_rdds(sc, part_ids)
        written[pid] = n_files
    return written


def read_store(
    spark: SparkSession,
    path: str,
    partitions: Sequence[str] | None = None,
    columns: Sequence[str] | None = None,
) -> DataFrame:
    """Serving-store reader that keeps the scan minimal by
    construction: the ``partitions`` filter is an equality/IN predicate
    on the partition column (so Spark prunes directories — a release's
    query never lists, let alone reads, other releases' files) and
    ``columns`` projects before anything else (so ReadSchema carries
    only what the caller asked for). Both properties are asserted by
    the plan regression tests; callers composing further filters on the
    result keep full pushdown since nothing here materialises.
    """
    df = spark.read.parquet(path)
    if partitions is not None:
        df = df.filter(F.col("partition_id").isin(list(partitions)))
    if columns is not None:
        df = df.select(*columns)
    return df
