"""SparkSession factory tuned for the engine.

Scale notes (the settings below are chosen for a large cluster, and are
merely harmless on local[32]):

* AQE on: runtime coalescing of the ~32..2000 shuffle partitions, skew-join
  splitting for hot areaCodes / hot join keys.
* ``spark.sql.shuffle.partitions`` is a default only — AQE re-plans it.
* Arrow enabled for the few pandas-UDF paths (keyed blake2s hashing,
  multimodal decode) so Python exchange is columnar, never per-row.
* Parquet pushdown/pruning are Spark defaults; we keep them explicit so a
  misconfigured cluster profile can't silently disable them.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "coronavirus-dashboard-pipeline-etl-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` when no cluster
    manager is configured; on a real cluster leave it unset and submit via
    spark-submit.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        # AQE-gated SMJ->SHJ rewrite (optimization guide §3.1): when every
        # post-shuffle build partition's map output is under this
        # threshold, the runtime replaces a sort-merge join with a
        # shuffled-hash join, skipping both sorts — safe by construction
        # (the rewrite only fires when the hash table provably fits;
        # Spark's default 0 disables it). 64m matches
        # advisoryPartitionSizeInBytes so coalesced partitions stay
        # eligible. At sf0.1/local[32] the bench joins shuffle KiB-MiB and
        # an interleaved A/B showed no measurable local delta (host noise
        # bounds |Δ| at a few %); the win is at corpus scale, where the
        # sort on each side of every verify/posting join is pure overhead
        # once partitions hash-fit. Parameterised (env) so a cluster
        # profile can retune or disable without code changes.
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            os.environ.get("SPARK_GRAFT_SHJ_THRESHOLD", str(64 * 1024 * 1024)),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        # The driver's synthetic parquet uses TIMESTAMP(NANOS) which Spark
        # rejects by default; read as long (ns since epoch) and convert in
        # sources.tables.load_table.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    if master is not None:
        builder = builder.master(master)
    elif "SPARK_MASTER" not in os.environ:
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
