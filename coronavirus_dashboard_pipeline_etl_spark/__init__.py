"""PySpark-native analytics engine with the query/data-processing
capabilities of UKHSA-Internal/coronavirus-dashboard-pipeline-etl.

Brand-new, Spark-first design: composable DataFrame transforms
(mirroring the reference's pandas ``.pipe()`` chains at
``db_etl/etl.py:996-1022``), Spark SQL for the serving-side queries the
reference runs in PostgreSQL, and partitioned Parquet as the store.

Sub-packages
------------
operators   : panel-table operators (rolling windows, fills, trims,
              suppression, pivot/melt, nesting, hashing).
sources     : readers/writers (nested JSON release, parquet, CSV dims,
              upsert sinks).
functions   : scalar/column function library + large-scale training-data
              pipeline ops (dedup, similarity search, text analysis,
              multimodal plumbing).
plans       : end-to-end composed pipelines (main / demographics / MSOA)
              and the serving SQL layer.
streaming   : Structured Streaming ingest wrappers (Trigger.AvailableNow
              file source -> foreachBatch upsert).
"""

__version__ = "0.1.0"
