"""Streaming ingest — the reference's trigger model on Spark rails.

The reference has NO stream processing (SURVEY.md §2.9): every pipeline
is an event-triggered batch (HTTP/Service-Bus/blob/timer), late data is
handled by full-snapshot reprocessing, and revisions overwrite payloads
for an existing (hash, partition_id) (``db_etl_upload/uploader.py:
320-325``). The faithful Spark translation is a file-source
``readStream`` + ``foreachBatch`` hash-upsert with
``Trigger.AvailableNow`` — each arriving release file becomes one
idempotent micro-batch, exactly the reference's "blob landed, run the
ETL" behaviour, with checkpointed exactly-once file tracking replacing
the Service-Bus dedup/retry machinery.

No watermarks or session windows are needed for parity; a deployment
that wants continuous ingest flips ``available_now=False`` and gets the
same plan running forever.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery


def upsert_batch(
    batch: DataFrame,
    store_path: str,
    key_cols: tuple[str, ...] = ("hash", "partition_id"),
    order_col: str = "release_id",
) -> None:
    """Idempotent hash-upsert into a partitioned parquet store.

    Parquet has no MERGE; the equivalent with identical semantics to the
    reference's ``ON CONFLICT (hash, partition_id) DO UPDATE``:
    read back only the partitions the batch touches, anti-join out rows
    the batch replaces, union, and dynamically overwrite just those
    partitions. On Delta/Iceberg this function becomes a single
    ``MERGE INTO`` — the call-site contract is unchanged.
    """
    spark = batch.sparkSession
    touched = [r["partition_id"] for r in batch.select("partition_id").distinct().collect()]
    try:
        existing = spark.read.parquet(store_path).filter(
            F.col("partition_id").isin(touched)
        )
        keep = existing.join(
            batch.select(*key_cols).distinct(), on=list(key_cols), how="left_anti"
        )
        merged = keep.unionByName(batch, allowMissingColumns=True)
    except AnalysisException as exc:
        # ONLY a genuinely absent store means "first write" — any other
        # read failure (transient FS error, corrupt footer, permission
        # blip) must propagate: falling through to merged = batch would
        # dynamically OVERWRITE the touched partitions with just the
        # batch's rows, silently deleting every pre-existing row there
        if "PATH_NOT_FOUND" not in str(exc) and "Path does not exist" not in str(exc):
            raise
        merged = batch
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("partition_id")
        .parquet(store_path)
    )


def stream_release_files(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    transform: Callable[[DataFrame], DataFrame],
    sink: Callable[[DataFrame, int], None],
    schema: str,
    fmt: str = "json",
    available_now: bool = True,
) -> StreamingQuery:
    """File-source stream -> transform -> foreachBatch sink.

    ``transform`` is any composition of the engine's operators (they are
    plain DataFrame -> DataFrame functions, so batch pipelines reuse
    unchanged); ``sink`` receives (batch_df, batch_id) — pass a closure
    over ``upsert_batch`` for the serving store.
    """
    stream = (
        spark.readStream.format(fmt)
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(input_dir)
    )
    out = transform(stream)
    writer = (
        out.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def cdc_apply_batch(
    batch: DataFrame,
    store_path: str,
    keys: tuple[str, ...],
    seq_col: str = "seq",
    op_col: str = "op",
    delete_op: str = "D",
    tiebreak_cols: tuple[str, ...] = (),
) -> None:
    """Apply one CDC micro-batch to a parquet snapshot store — the
    ``foreachBatch`` sink form of ``operators.asof.apply_changes``
    (pass a closure over this to ``stream_release_files`` for a live
    change-stream upsert).

    Correctness across batches rests on the operator's pinned
    composability property (sequential wave application == one-shot
    union apply, ``test_apply_changes_sequential_equals_union``): as
    long as the stream delivers batches in non-decreasing ``seq``
    order (file source, oldest-first — the default), the store after
    the last batch equals ``apply_changes`` over the full stream.
    Within a batch the usual (seq, tiebreaks) latest-wins rule
    resolves collisions; ``tiebreak_cols`` must totalise the order
    inside one batch exactly as in the batch operator.

    First batch bootstraps an empty snapshot with the batch's value
    columns. The merged frame is eagerly materialised BEFORE the
    overwrite — its plan reads the store path it is about to replace.
    On Delta/Iceberg this becomes MERGE INTO; the call-site contract
    is unchanged.
    """
    from ..operators.asof import apply_changes

    spark = batch.sparkSession
    try:
        snapshot = spark.read.parquet(store_path)
    except AnalysisException as exc:
        # same rule as upsert_batch: ONLY a genuinely absent store
        # means "first write" — any other read failure must propagate
        # (treating it as first-write would overwrite the whole store
        # with one batch's rows)
        if "PATH_NOT_FOUND" not in str(exc) and "Path does not exist" not in str(
            exc
        ):
            raise
        snapshot = batch.drop(seq_col, op_col, *tiebreak_cols).limit(0)
    merged = apply_changes(
        snapshot,
        batch,
        keys=list(keys),
        seq_col=seq_col,
        op_col=op_col,
        delete_op=delete_op,
        tiebreak_cols=list(tiebreak_cols),
    )
    merged = merged.localCheckpoint(eager=True)
    merged.write.mode("overwrite").parquet(store_path)
