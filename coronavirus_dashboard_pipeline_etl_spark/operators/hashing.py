"""Row-identity hashing.

The reference keys every serving-store row with a keyed blake2s digest of
the identifying columns (digest_size=12, key=$RECORD_KEY —
``db_etl_upload/uploader.py:171-179``; digest_size=32 unkeyed in
``db_etl/processors/hash.py:47-56``; same scheme in
``msoa_etl_db/processor.py:113-130`` and
``main_etl_nested_metrics_converter/converter.py:265-273``).

Spark has no keyed blake2s, so exact hash parity runs through an
Arrow-batched pandas UDF (hashlib over a concatenated string column —
vectorised string concat stays JVM-side; only the digest crosses to
Python). When parity with reference-produced hashes is NOT required, use
``row_hash_sha2`` — fully JVM-side and ~10x faster.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType


def _concat_cols(cols: Sequence[str]) -> Column:
    """Reference concat: ``astype(str).sum(axis=1)`` (hash.py:49-52) — plain
    concatenation of the PER-COLUMN stringified values, no separator.

    Nulls stringify per column (``str(None) == 'None'``, the pandas
    object-dtype behaviour) — a bare ``F.concat`` would instead NULL
    the whole concatenation when ANY column is null, collapsing every
    such row onto one digest (blake2 of the UDF-side ``str(None)``) or
    a NULL id (sha2): distinct rows sharing a store key means the
    hash-keyed upsert silently overwrites unrelated rows."""
    return F.concat(
        *[
            F.coalesce(F.col(c).cast("string"), F.lit("None"))
            for c in cols
        ]
    )


def row_hash_blake2(
    df: DataFrame,
    cols: Sequence[str],
    out: str = "hash",
    digest_size: int = 12,
    key: bytes | None = None,
    algo: str = "blake2s",
) -> DataFrame:
    """Keyed blake2 digest of the concatenated columns (hash parity).

    ``key`` defaults to $RECORD_KEY like the reference
    (uploader.py:47: ``RECORD_KEY = getenv("RECORD_KEY").encode()``).
    ``algo``: ``"blake2s"`` matches the uploader/msoa/converter row ids
    (db_etl_upload/uploader.py:171-179); ``"blake2b"`` with
    ``digest_size=20`` matches the private-report record slugs
    (main_etl_postprocessors/private_report/process.py:124-127).
    """
    if algo not in ("blake2s", "blake2b"):
        raise ValueError(f"algo must be blake2s or blake2b, got {algo!r}")
    resolved_key = key if key is not None else os.environ.get("RECORD_KEY", "").encode()

    @pandas_udf(StringType())
    def _digest(s: pd.Series) -> pd.Series:
        import hashlib

        h = getattr(hashlib, algo)
        return s.map(
            lambda x: h(
                str(x).encode(), key=resolved_key, digest_size=digest_size
            ).hexdigest()
        )

    return df.withColumn(out, _digest(_concat_cols(cols)))


def row_hash_sha2(df: DataFrame, cols: Sequence[str], out: str = "hash") -> DataFrame:
    """JVM-side row id (sha256 truncated to 24 hex = 12 bytes, matching the
    reference's digest width). Use when stored-hash parity isn't needed."""
    return df.withColumn(out, F.substring(F.sha2(_concat_cols(cols), 256), 1, 24))
