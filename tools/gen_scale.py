"""Scale the driver's sf0.1 testdata by an integer factor (default 10x
-> "sf1") for scale-stress runs, preserving the data model:

* join keys offset per replica with strides >= the base key range, so
  customer/orders/lineitem/part/supplier referential integrity holds
  and every key stays unique (the join/agg cardinality profile of a
  genuinely bigger TPC-H sample);
* region/nation stay as-is (shared dims — they do not grow with sf);
* documents: every token gets a replica suffix (replica 0 unchanged),
  so WITHIN-replica near-dup structure mirrors the base corpus while
  replicas do NOT collide — dedup pair counts scale ~linearly like a
  real corpus, not quadratically like naive row copying;
* embeddings: replica i cyclically shifts vector components by i*7
  (norm- and distribution-preserving, decorrelates replicas) — same
  rationale;
* events: ids/users offset (more traffic, more users, same window).

Output is parquet per table under the target dir.  This SCALES the
driver's data rather than synthesizing new data, so value
distributions match the certified inputs.

Usage: python tools/gen_scale.py [factor] [src_dir] [out_dir]
       (defaults: 10 /root/testdata/sf0.1 testdata_sf1)
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pyspark.sql import DataFrame, functions as F

from coronavirus_dashboard_pipeline_etl_spark.session import get_spark

# strides: round numbers >= the base table's key range at sf0.1
STRIDE = {
    "custkey": 1_000_000,
    "suppkey": 1_000_000,
    "partkey": 1_000_000,
    "orderkey": 10_000_000,
    "event_id": 10_000_000,
    "user_id": 1_000_000,
    "doc_id": 1_000_000,
    "vec_id": 1_000_000,
}


def replicate(df: DataFrame, factor: int) -> DataFrame:
    """Cross with replica ids 0..factor-1 (posexplode of a literal —
    no shuffle; each task emits factor copies of its rows)."""
    return df.select(
        F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("__r"), "*"
    )


def off(col: str, stride_key: str):
    return (F.col(col) + F.col("__r") * STRIDE[stride_key]).alias(col)


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else "testdata_sf1"
    spark = get_spark(master="local[32]", shuffle_partitions=32)

    def rd(name: str) -> DataFrame:
        return spark.read.parquet(f"{src}/{name}.parquet")

    def wr(df: DataFrame, name: str, parts: int) -> None:
        # single-FILE parquet, exactly the driver's layout (each table
        # is one file, readable as '{dir}/{t}.parquet' from both Spark
        # and the DuckDB oracle); Spark still parallelises the read by
        # row-group/byte-range splits
        import glob
        import os
        import shutil

        tmp = f"{out}/__tmp_{name}"
        df.drop("__r").coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(f"{tmp}/part-*.parquet")[0]
        os.makedirs(out, exist_ok=True)
        dest = f"{out}/{name}.parquet"
        if os.path.exists(dest):
            (shutil.rmtree if os.path.isdir(dest) else os.remove)(dest)
        shutil.move(part, dest)
        shutil.rmtree(tmp)
        print(f"wrote {name}", flush=True)

    # shared dims: copy through
    for name in ("region", "nation"):
        wr(rd(name).withColumn("__r", F.lit(0)), name, 1)

    wr(
        replicate(rd("customer"), factor).select(
            off("c_custkey", "custkey"),
            *[c for c in rd("customer").columns if c != "c_custkey"],
        ),
        "customer", 4,
    )
    wr(
        replicate(rd("supplier"), factor).select(
            off("s_suppkey", "suppkey"),
            *[c for c in rd("supplier").columns if c != "s_suppkey"],
        ),
        "supplier", 1,
    )
    wr(
        replicate(rd("part"), factor).select(
            off("p_partkey", "partkey"),
            *[c for c in rd("part").columns if c != "p_partkey"],
        ),
        "part", 4,
    )
    wr(
        replicate(rd("orders"), factor).select(
            off("o_orderkey", "orderkey"),
            off("o_custkey", "custkey"),
            *[
                c
                for c in rd("orders").columns
                if c not in ("o_orderkey", "o_custkey")
            ],
        ),
        "orders", 8,
    )
    wr(
        replicate(rd("lineitem"), factor).select(
            off("l_orderkey", "orderkey"),
            off("l_partkey", "partkey"),
            off("l_suppkey", "suppkey"),
            *[
                c
                for c in rd("lineitem").columns
                if c not in ("l_orderkey", "l_partkey", "l_suppkey")
            ],
        ),
        "lineitem", 32,
    )
    wr(
        replicate(rd("events"), factor).select(
            off("event_id", "event_id"),
            off("user_id", "user_id"),
            *[
                c
                for c in rd("events").columns
                if c not in ("event_id", "user_id")
            ],
        ),
        "events", 8,
    )
    # documents: suffix every token for replicas > 0 (keeps the
    # within-replica duplicate/near-dup profile, decorrelates replicas)
    doc_cols = [
        c for c in rd("documents").columns if c not in ("doc_id", "text")
    ]
    wr(
        replicate(rd("documents"), factor).select(
            off("doc_id", "doc_id"),
            F.when(F.col("__r") == 0, F.col("text"))
            .otherwise(
                F.regexp_replace(
                    F.col("text"), r"(\S+)",
                    F.concat(F.lit("$1~"), F.col("__r").cast("string")),
                )
            )
            .alias("text"),
            *doc_cols,
        ),
        "documents", 8,
    )
    # embeddings: cyclic component shift by __r * 7 (mod dim)
    emb_cols = [
        c for c in rd("embeddings").columns if c not in ("vec_id", "embedding")
    ]
    dim = len(rd("embeddings").select("embedding").first()[0])
    shifted = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: F.element_at(
            "embedding",
            (F.pmod(j + F.col("__r") * 7, F.lit(dim)) + 1).cast("int"),
        ),
    )
    wr(
        replicate(rd("embeddings"), factor).select(
            off("vec_id", "vec_id"),
            shifted.cast(
                rd("embeddings").schema["embedding"].dataType.simpleString()
            ).alias("embedding"),
            *emb_cols,
        ),
        "embeddings", 8,
    )
    print("done", flush=True)


if __name__ == "__main__":
    main()
