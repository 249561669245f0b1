"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB at the same sf, compare
row count, schema width, and order-insensitive values.

Usage: python tools/run_gate.py [sf_dir] [query_name ...]

When run with no query filter it also writes SELFCHECK.json at the repo
root: one row per registered gate (the full registry, not just the first
50 the external harness evaluates), same pass/fail semantics.
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, ".")

import duckdb
import pandas as pd

import __spark_entry__ as entry_mod
from coronavirus_dashboard_pipeline_etl_spark.sources import TABLES


def normalise(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    def norm_cell(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return None
        if isinstance(v, float):
            return float(v)
        if hasattr(v, "item"):
            return v.item()
        return v
    out = df.apply(lambda c: c.map(norm_cell))
    return out.sort_values(by=list(out.columns), key=lambda s: s.map(repr)).reset_index(
        drop=True
    )


def compare(name, spark_pdf, duck_pdf) -> list[str]:
    problems = []
    if list(sorted(spark_pdf.columns)) != list(sorted(duck_pdf.columns)):
        problems.append(
            f"columns differ: spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}"
        )
        return problems
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} duck={len(duck_pdf)}")
        return problems
    s, d = normalise(spark_pdf), normalise(duck_pdf)
    # vectorised per-column equality (a per-cell Python loop is minutes
    # per million-row gate at sf1): equal iff repr-normalised values
    # match, with None==None and NaN==NaN allowed
    for col in s.columns:
        a, b = s[col], d[col].reset_index(drop=True)
        eq = a.map(repr).to_numpy() == b.map(repr).to_numpy()
        if not eq.all():
            import numpy as np

            # repr mismatches re-checked per-cell with NaN == NaN
            # allowed, and equality ONLY between same-typed values.
            # The driver's value hash distinguishes 1 from 1.0 (r6
            # lesson: three HUGEINT->float64 oracle columns shipped
            # "green" through a lenient `av == bv` fallback here and
            # failed the driver hash) — so a cross-dtype match is a
            # FAILURE, not a pass.
            for i in np.flatnonzero(~eq):
                av, bv = a.iloc[int(i)], b.iloc[int(i)]
                if (
                    isinstance(av, float)
                    and isinstance(bv, float)
                    and math.isnan(av)
                    and math.isnan(bv)
                ):
                    continue
                if type(av) is type(bv) and av == bv:
                    continue
                problems.append(f"{col}[{int(i)}]: spark={av!r} duck={bv!r}")
                if len(problems) > 5:
                    return problems
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # Deliberately a PLAIN session (NOT our get_spark()) to replicate the
    # external driver faithfully — round-1 lesson: queries must not depend
    # on session confs only our own builder sets.
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    passed = failed = 0
    results: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        spark_pdf = None
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
            if name in oracles:
                duck_pdf = con.sql(oracles[name]).df()
                problems = compare(name, spark_pdf, duck_pdf)
            else:
                # rows-only check (driver behaviour for non-SQL-expressible
                # ops): the query must run and produce rows, plus cheap
                # structural invariants so "any non-empty frame" can't pass
                # (as of round 5 every registered gate carries an oracle —
                # this path guards future oracle-less additions)
                problems = [] if len(spark_pdf) > 0 else ["no rows"]
                if not problems:
                    if spark_pdf.columns.duplicated().any():
                        # stop here: spark_pdf[c] would return a frame
                        # for a duplicated name and crash the null check
                        problems.append("duplicate column names")
                    else:
                        all_null = [
                            c for c in spark_pdf.columns
                            if spark_pdf[c].isna().all()
                        ]
                        if all_null:
                            problems.append(f"all-null columns: {all_null}")
        except Exception as e:  # noqa: BLE001
            problems = [f"EXCEPTION: {type(e).__name__}: {e}"]
        results[name] = {
            "pass": not problems,
            "rows": None if spark_pdf is None else len(spark_pdf),
            "problems": problems[:6],
        }
        if problems:
            failed += 1
            print(f"FAIL {name} ({len(spark_pdf) if spark_pdf is not None else '?'} rows)", flush=True)
            for p in problems[:6]:
                print(f"     {p}")
        else:
            passed += 1
            print(f"ok   {name} ({len(spark_pdf)} rows)", flush=True)
    print(f"\n{passed} passed, {failed} failed")
    if not only:
        import json
        import os

        out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SELFCHECK.json")
        with open(out, "w") as fh:
            json.dump({"sf_dir": sf_dir, "passed": passed, "failed": failed, "queries": results}, fh, indent=1)
        print(f"wrote {out}")
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
