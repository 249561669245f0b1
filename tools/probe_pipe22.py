"""Stage-level timing probe for pipe22_crawl_day (guide §1: measure
first): replicates the gate body exactly, wrapping every EAGER boundary
(store seeds, pruned-read bucket collects, wave checkpoint, state
advance writes) in a timer so the ~20-30 s gate total decomposes into
attributable stages. Read-only diagnostic — not on the bench path.

Usage: python tools/probe_pipe22.py [sf_dir] [--reps N]
Prints one JSON line {stage: [sec, ...]}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from coronavirus_dashboard_pipeline_etl_spark.functions.curation import assign_packs
from coronavirus_dashboard_pipeline_etl_spark.functions.dedup import (
    band_index_pruned,
    band_index_write,
    dedup_incremental,
    fp_store_pruned,
    fp_store_write,
    minhash_band_index,
    minhash_probe_pairs,
)
from coronavirus_dashboard_pipeline_etl_spark.functions.text import quality_stats
from coronavirus_dashboard_pipeline_etl_spark.session import get_spark
from coronavirus_dashboard_pipeline_etl_spark.sources import load_table
from coronavirus_dashboard_pipeline_etl_spark.streaming.ingest import (
    index_upsert_batch,
)


def run_once(spark, sf_dir: str, out: dict) -> None:
    def t(stage: str, fn):
        spark.sparkContext.setJobDescription(f"pipe22 probe: {stage}")
        t0 = time.perf_counter()
        r = fn()
        out.setdefault(stage, []).append(round(time.perf_counter() - t0, 3))
        return r

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    corpus0 = docs.filter(F.col("doc_id") % 3 == 0)
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    fp_path = f"{warehouse}/probe_pipe22_fps"
    idx_path = f"{warehouse}/probe_pipe22_index"
    corpus_path = f"{warehouse}/probe_pipe22_corpus"
    for p in (fp_path, idx_path, corpus_path):
        shutil.rmtree(p, ignore_errors=True)

    t(
        "seed_fp_write",
        lambda: fp_store_write(
            corpus0.select(
                F.md5(
                    F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")
                ).alias("fp")
            ).distinct(),
            fp_path,
            mode="overwrite",
        ),
    )
    t(
        "seed_band_index_write",
        lambda: band_index_write(
            minhash_band_index(corpus0, k=16, bands=2), idx_path, k=16, bands=2
        ),
    )
    t(
        "seed_corpus_write",
        lambda: corpus0.select("doc_id", "text").write.parquet(corpus_path),
    )

    raw1 = docs.filter(F.col("doc_id") % 3 == 1)
    waves = {
        1: raw1.unionByName(
            corpus0.filter(F.col("doc_id") % 5 == 0).select(
                (F.col("doc_id") + 1_000_000).alias("doc_id"), "lang", "text"
            )
        ),
        2: docs.filter(F.col("doc_id") % 3 == 2).unionByName(
            raw1.filter(F.col("doc_id") % 5 == 1).select(
                (F.col("doc_id") + 2_000_000).alias("doc_id"), "lang", "text"
            )
        ),
    }
    for wave_no, batch in waves.items():
        w = f"w{wave_no}"
        seen = t(f"{w}_fp_pruned_read", lambda: fp_store_pruned(spark, fp_path, batch))
        kept_e = dedup_incremental(batch, seen)
        corpus_docs = spark.read.parquet(corpus_path)
        pruned = t(
            f"{w}_band_pruned_read",
            lambda: band_index_pruned(spark, idx_path, kept_e, k=16, bands=2),
        )
        near_ids = (
            minhash_probe_pairs(
                kept_e, corpus_docs, k=16, bands=2, threshold=0.9,
                corpus_bands=pruned,
            )
            .select(F.col("new_id").alias("doc_id"))
            .distinct()
        )
        survivors = kept_e.join(near_ids, "doc_id", "left_anti")
        q = quality_stats(survivors)
        kept = q.filter(
            F.col("len_ok")
            & (F.col("distinct_ratio") >= 0.5)
            & (F.col("n_tokens") <= 512)
        )
        packed_lazy = assign_packs(
            kept, tokens_col="n_tokens", context_len=512, order_cols=("doc_id",)
        )
        packed = t(
            f"{w}_wave_plan_checkpoint",
            lambda: packed_lazy.localCheckpoint(eager=True),
        )
        t(f"{w}_fp_append", lambda: fp_store_write(packed.select("fp"), fp_path))
        t(
            f"{w}_corpus_append",
            lambda: packed.select("doc_id", "text")
            .write.mode("append")
            .parquet(corpus_path),
        )
        t(
            f"{w}_index_upsert",
            lambda: index_upsert_batch(
                packed.select("doc_id", "text"), idx_path, k=16, bands=2
            ),
        )
    for p in (fp_path, idx_path, corpus_path):
        shutil.rmtree(p, ignore_errors=True)


def main() -> None:
    args = list(sys.argv[1:])
    reps = 1
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    spark = get_spark(app_name="probe-pipe22")
    spark.sparkContext.setLogLevel("ERROR")
    # warm (bench protocol)
    spark.range(0, 50_000_000, 1, 32).selectExpr("sum(id*3+1) s").write.format(
        "noop"
    ).mode("overwrite").save()
    out: dict[str, list] = {}
    for _ in range(reps):
        try:
            spark.catalog.clearCache()
        except Exception:  # noqa: BLE001
            pass
        run_once(spark, sf_dir, out)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
