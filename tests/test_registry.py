"""Metric auto-registration (uploader.py:339-350 validate_metrics)."""

from pyspark.sql import Row

from coronavirus_dashboard_pipeline_etl_spark.sources import (
    load_metric_registry,
    register_metrics,
    resolve_metric_ids,
)


def _batch(spark, *metrics):
    return spark.createDataFrame([Row(metric=m, payload="1") for m in metrics])


def test_fresh_registry_assigns_deterministic_ids(spark, tmp_path):
    path = str(tmp_path / "registry")
    reg = register_metrics(_batch(spark, "newCases", "newDeaths"), path)
    rows = {r["metric"]: r["metric_id"] for r in reg.collect()}
    assert rows == {"newCases": 1, "newDeaths": 2}


def test_novel_metric_mid_release_lands_in_registry_and_store(spark, tmp_path):
    path = str(tmp_path / "registry")
    register_metrics(_batch(spark, "newCases"), path)
    # next release introduces a metric the registry has never seen
    batch = _batch(spark, "newCases", "newVariantX")
    reg = register_metrics(batch, path)
    rows = {r["metric"]: r["metric_id"] for r in reg.collect()}
    assert rows["newCases"] == 1  # untouched
    assert rows["newVariantX"] == 2  # appended after current max
    resolved = resolve_metric_ids(batch, reg)
    got = {r["metric"]: r["metric_id"] for r in resolved.collect()}
    assert got == rows


def test_reregistration_is_idempotent(spark, tmp_path):
    path = str(tmp_path / "registry")
    register_metrics(_batch(spark, "a", "b"), path)
    before = sorted(map(tuple, load_metric_registry(spark, path).collect()))
    register_metrics(_batch(spark, "a", "b"), path)
    after = sorted(map(tuple, load_metric_registry(spark, path).collect()))
    assert before == after


def test_to_long_store_resolves_metric_ids(spark, tmp_path):
    from coronavirus_dashboard_pipeline_etl_spark.plans.main_pipeline import (
        to_long_store,
    )

    panel = spark.createDataFrame(
        [
            Row(
                areaType="nation",
                areaCode="E1",
                date=f"2024-01-{d:02d}",
                newCases=float(d),
            )
            for d in range(1, 10)
        ]
    )
    path = str(tmp_path / "registry")
    long = to_long_store(panel, release_id=1, metric_registry_path=path)
    rows = long.collect()
    assert rows and all(
        r["metric"] == "newCases" and r["metric_id"] == 1 for r in rows
    )
