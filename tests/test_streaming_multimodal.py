"""Streaming ingest (AvailableNow + hash-upsert) and multimodal plumbing."""

import json
import time

import pytest
from pyspark.sql import functions as F

from coronavirus_dashboard_pipeline_etl_spark.functions.multimodal import (
    attach_media_meta,
    decode_images,
    sample_frames,
)
from coronavirus_dashboard_pipeline_etl_spark.streaming.ingest import (
    stream_release_files,
    upsert_batch,
)

SCHEMA = "hash string, partition_id string, payload string, release_id long"


def test_streaming_upsert_roundtrip(spark, tmp_path):
    inp, chk, store = tmp_path / "in", tmp_path / "chk", tmp_path / "store"
    inp.mkdir()

    (inp / "r1.json").write_text(
        "\n".join(
            json.dumps(x)
            for x in [
                {"hash": "a", "partition_id": "other", "payload": '{"value":1}', "release_id": 1},
                {"hash": "b", "partition_id": "utla", "payload": '{"value":2}', "release_id": 1},
            ]
        )
    )

    def sink(batch, batch_id):
        upsert_batch(batch, str(store))

    q = stream_release_files(
        spark, str(inp), str(chk),
        transform=lambda df: df,
        sink=sink, schema=SCHEMA,
    )
    q.awaitTermination(60)
    first = {r["hash"]: r for r in spark.read.parquet(str(store)).collect()}
    assert set(first) == {"a", "b"}

    # second file REVISES hash 'a' (same (hash, partition)) and adds 'c'
    (inp / "r2.json").write_text(
        "\n".join(
            json.dumps(x)
            for x in [
                {"hash": "a", "partition_id": "other", "payload": '{"value":9}', "release_id": 2},
                {"hash": "c", "partition_id": "other", "payload": '{"value":3}', "release_id": 2},
            ]
        )
    )
    q2 = stream_release_files(
        spark, str(inp), str(chk),
        transform=lambda df: df,
        sink=sink, schema=SCHEMA,
    )
    q2.awaitTermination(60)
    rows = {r["hash"]: r for r in spark.read.parquet(str(store)).collect()}
    assert set(rows) == {"a", "b", "c"}
    assert rows["a"]["payload"] == '{"value":9}'       # revised in place
    assert rows["a"]["release_id"] == 2
    assert rows["b"]["payload"] == '{"value":2}'       # untouched partition survives


def test_multimodal_decode(spark):
    rows = [
        (1, "image", b"IMG:4x3:" + bytes([10, 20, 30])),
        (2, "image", b"IMG:2x2:" + bytes([100])),
    ]
    df = spark.createDataFrame(rows, "media_id long, kind string, content binary")
    df = attach_media_meta(df)
    metas = {r["media_id"]: r["meta"] for r in df.collect()}
    assert metas[1]["n_bytes"] == len(b"IMG:4x3:") + 3

    decoded = {r["media_id"]: r for r in decode_images(df).collect()}
    assert decoded[1]["width"] == 4 and decoded[1]["height"] == 3
    assert decoded[1]["n_pixels"] == 12
    assert decoded[1]["mean_luma"] == pytest.approx(20.0)
    assert decoded[2]["mean_luma"] == pytest.approx(100.0)


def test_multimodal_decode_unknown_format(spark):
    df = spark.createDataFrame(
        [(1, "image", b"JPEGnotreally")], "media_id long, kind string, content binary"
    )
    with pytest.raises(Exception, match="NotImplementedError|image library"):
        decode_images(df).collect()


def test_frame_sampling(spark):
    frames = spark.range(100).select(
        F.lit(1).alias("media_id"), F.col("id").alias("frame_index")
    )
    kept = sample_frames(frames, every_n=10).collect()
    assert [r["frame_index"] for r in kept] == [0, 10, 20, 30, 40, 50, 60, 70, 80, 90]


def test_stateful_running_totals_across_batches(spark, tmp_path):
    """applyInPandasWithState: per-group totals must carry across
    micro-batches through the state store (batch 2 continues batch 1's
    cumulative, not restart at zero)."""
    from coronavirus_dashboard_pipeline_etl_spark.streaming.stateful import (
        running_totals_stream,
    )

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")
    # two files -> two micro-batches (maxFilesPerTrigger=1)
    (in_dir / "b1.json").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"areaCode": "A", "date": "2021-01-01", "value": 1.0},
                {"areaCode": "A", "date": "2021-01-02", "value": 2.0},
                {"areaCode": "B", "date": "2021-01-01", "value": 10.0},
            ]
        )
    )
    (in_dir / "b2.json").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"areaCode": "A", "date": "2021-01-03", "value": 4.0},
                {"areaCode": "B", "date": "2021-01-02", "value": None},
            ]
        )
    )

    stream = (
        spark.readStream.format("json")
        .schema("areaCode string, date string, value double")
        .option("maxFilesPerTrigger", 1)
        .load(str(in_dir))
    )
    out = running_totals_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("running_totals")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {
        (r["areaCode"], r["date"]): r["cumulative"]
        for r in spark.table("running_totals").collect()
    }
    assert rows[("A", "2021-01-01")] == 1.0
    assert rows[("A", "2021-01-02")] == 3.0
    assert rows[("A", "2021-01-03")] == 7.0   # state carried across batches
    assert rows[("B", "2021-01-01")] == 10.0
    assert rows[("B", "2021-01-02")] == 10.0  # null increment = +0
