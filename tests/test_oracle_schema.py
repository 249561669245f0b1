"""Registry-wide oracle output-schema audit.

Round-6 driver lesson: DuckDB widens SUM(integer) to HUGEINT (int128),
which ``duckdb.df()`` converts to float64 — so an oracle emits ``1771.0``
where Spark emits bigint ``1771`` and the driver's value hash fails even
though rows and schema match. Exactly three gates shipped that way in r6
(q12 / lm1 / pipe14). This test makes the whole class unshippable: every
registered oracle is DESCRIBEd against LIMIT-0 views and any
HUGEINT / UHUGEINT / over-wide DECIMAL output column is a failure.

No Spark session and no data scan — DuckDB binds the query against empty
views with the real parquet schemas, so the audit is milliseconds per
gate.
"""

import os
import re
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from coronavirus_dashboard_pipeline_etl_spark.sources import TABLES

SF = "/root/testdata/sf0.001"

BANNED = ("HUGEINT", "UHUGEINT")


@pytest.fixture(scope="module")
def con():
    if not os.path.isdir(SF):
        pytest.skip(f"{SF} not present")
    c = duckdb.connect()
    for t in TABLES:
        # LIMIT 0 views: full schema binding, zero rows scanned
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet' LIMIT 0"
        )
    return c


def _oracle_items():
    return sorted(entry_mod.oracle_sql().items())


@pytest.mark.parametrize("name,sql", _oracle_items(), ids=[n for n, _ in _oracle_items()])
def test_oracle_output_types_hashable(con, name, sql):
    rows = con.execute(f"DESCRIBE {sql}").fetchall()
    bad = []
    for col, col_type, *_ in rows:
        typ = col_type.upper()
        if any(b in typ for b in BANNED):
            bad.append((col, col_type))
        m = re.match(r"DECIMAL\((\d+)", typ)
        if m and int(m.group(1)) > 38:
            bad.append((col, col_type))
    assert not bad, (
        f"oracle {name!r} emits driver-unhashable column types {bad}: "
        "wrap the aggregate in CAST(... AS BIGINT) (DuckDB SUM(int) "
        "returns HUGEINT, which df() converts to float64 and the "
        "driver's value hash rejects)"
    )
