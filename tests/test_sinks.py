"""S8/S9 behavior tests: the distributed ON CONFLICT upsert, driven
end-to-end against sqlite through the injectable connection factory
(no Postgres in the sandbox; sqlite >= 3.24 speaks the same
``ON CONFLICT (...) DO UPDATE SET c = EXCLUDED.c`` dialect, reference
``db_etl_upload/uploader.py:302-336``)."""

import sqlite3

from coronavirus_dashboard_pipeline_etl_spark.sources.sinks import (
    DB_INSERT_MAX_ROWS,
    jdbc_upsert,
    upsert_sql,
)


def test_upsert_sql_text_matches_reference_shape():
    sql = upsert_sql(
        "covid19.time_series",
        ["hash", "partition_id", "release_id", "payload"],
        ("hash", "partition_id"),
        ("payload",),
    )
    assert sql == (
        "INSERT INTO covid19.time_series "
        "(hash, partition_id, release_id, payload) "
        "VALUES (%s, %s, %s, %s) "
        "ON CONFLICT (hash, partition_id) DO UPDATE SET "
        "payload = EXCLUDED.payload"
    )
    # reference chunk size (db_tables/covid19.py:48)
    assert DB_INSERT_MAX_ROWS == 8_000


def _sqlite_connect_factory(db_path: str):
    """DB-API factory for the sink: adapts paramstyle-qmark sqlite and
    audits every executemany batch size into the same database, so
    chunking is observable across the executor process boundary."""

    def connect(dsn):
        real = sqlite3.connect(db_path, timeout=30)

        class Cursor:
            def __init__(self, cur):
                self._cur = cur

            def executemany(self, sql, rows):
                self._cur.executemany(sql, rows)
                self._cur.execute(
                    "INSERT INTO audit(batch_rows) VALUES (?)", (len(rows),)
                )

            def __enter__(self):
                return self

            def __exit__(self, *exc):
                self._cur.close()
                return False

        class Conn:
            def cursor(self):
                return Cursor(real.cursor())

            def commit(self):
                real.commit()

            def rollback(self):
                real.rollback()

            def close(self):
                real.close()

        return Conn()

    return connect


def test_jdbc_upsert_against_sqlite(spark, tmp_path):
    db = str(tmp_path / "store.db")
    with sqlite3.connect(db) as c:
        c.execute(
            "CREATE TABLE ts (hash TEXT, partition_id TEXT, payload TEXT,"
            " PRIMARY KEY (hash, partition_id))"
        )
        c.execute("CREATE TABLE audit (batch_rows INTEGER)")

    rows1 = [(f"h{i}", "p0", f"v{i}") for i in range(5)]
    df1 = spark.createDataFrame(
        rows1, "hash string, partition_id string, payload string"
    ).coalesce(1)  # one partition: single writer, deterministic batches
    jdbc_upsert(
        df1, db, "ts", chunk_rows=2,
        connect=_sqlite_connect_factory(db), placeholder="?",
    )
    with sqlite3.connect(db) as c:
        assert c.execute("SELECT COUNT(*) FROM ts").fetchone()[0] == 5
        # 5 rows at chunk_rows=2 -> executemany batches of 2, 2, 1
        assert sorted(
            r[0] for r in c.execute("SELECT batch_rows FROM audit")
        ) == [1, 2, 2]

    # second release: 3 conflicting rows (updated payload) + 2 new
    rows2 = [(f"h{i}", "p0", f"NEW{i}") for i in range(3)] + [
        ("h9", "p0", "v9"),
        ("h8", "p1", "v8"),
    ]
    df2 = spark.createDataFrame(
        rows2, "hash string, partition_id string, payload string"
    ).coalesce(1)
    jdbc_upsert(
        df2, db, "ts", chunk_rows=DB_INSERT_MAX_ROWS,
        connect=_sqlite_connect_factory(db), placeholder="?",
    )
    with sqlite3.connect(db) as c:
        got = dict(
            ((h, p), v)
            for h, p, v in c.execute(
                "SELECT hash, partition_id, payload FROM ts"
            )
        )
    assert len(got) == 7  # 5 originals, 3 updated in place, 2 new
    for i in range(3):
        assert got[(f"h{i}", "p0")] == f"NEW{i}"  # conflict -> update
    for i in (3, 4):
        assert got[(f"h{i}", "p0")] == f"v{i}"  # untouched
    assert got[("h9", "p0")] == "v9" and got[("h8", "p1")] == "v8"
