"""Fourth-leg parity: fuzz the Spark operator against the REFERENCE'S
OWN CODE, executed as the oracle.

`/root/reference/db_etl_upload/uploader.py` cannot be imported whole
(sqlalchemy/azure deps aren't in the container), so `trim_sides` is
AST-extracted from the file at test time and exec'd with the one name
it needs (`NaN`). Nothing is copied into this repo — the reference
runs from its own source, so there is no transcription step where a
misreading could creep in (the failure mode that produced the r8
trailing-strip bug: implementation, DuckDB oracle, and regression test
all encoded the same wrong reading).

Fixtures are generated the way the production frame arrives: sorted by
(metric, date) with a fresh RangeIndex, so the reference's label-based
``.loc`` slices see contiguous ascending labels per metric — the
regime its pandas code was written for.
"""

from __future__ import annotations

import ast

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

REF_UPLOADER = "/root/reference/db_etl_upload/uploader.py"


def _load_reference_trim_sides():
    src = open(REF_UPLOADER, encoding="utf-8").read()
    tree = ast.parse(src)
    fn = next(
        n
        for n in tree.body
        if isinstance(n, ast.FunctionDef) and n.name == "trim_sides"
    )
    mod = ast.Module(body=[fn], type_ignores=[])
    ns: dict = {"NaN": np.nan, "DataFrame": pd.DataFrame}
    exec(compile(mod, REF_UPLOADER, "exec"), ns)  # noqa: S102 - test oracle
    return ns["trim_sides"]


_PAYLOADS = st.sampled_from([None, 0.0, 1.0, 2.0, -1.0, 5.0])


@given(
    series=st.dictionaries(
        keys=st.sampled_from(["cases", "deaths", "variants"]),
        values=st.lists(_PAYLOADS, min_size=0, max_size=12),
        min_size=1,
        max_size=3,
    )
)
@settings(max_examples=25, deadline=None)
def test_trim_sides_matches_reference_code(spark, series):
    from coronavirus_dashboard_pipeline_etl_spark.operators.trim import (
        trim_sides,
    )

    ref_trim = _load_reference_trim_sides()

    rows = []
    for metric, payloads in sorted(series.items()):
        for i, p in enumerate(payloads):
            rows.append(
                {
                    "area_type": "ltla",
                    "area_code": "E1",
                    "metric": metric,
                    "date": f"2021-06-{i + 1:02d}",
                    "payload": p,
                }
            )
    if not rows:
        return
    pdf = pd.DataFrame(rows).reset_index(drop=True)
    pdf["payload"] = pdf["payload"].astype("float64")

    ref_out = ref_trim(pdf.copy())
    expected = {
        (r.metric, r.date): (None if pd.isna(r.payload) else r.payload)
        for r in ref_out.itertuples()
        if not (pd.isna(r.metric) and pd.isna(r.date))
    }

    sdf = spark.createDataFrame(
        pdf.where(pdf.notna(), None),
        "area_type string, area_code string, metric string, "
        "date string, payload double",
    )
    got = {
        (r.metric, r.date): r.payload for r in trim_sides(sdf).collect()
    }
    assert got == expected, (
        f"diverged from the reference's own code on {dict(series)}: "
        f"spark-only={set(got) - set(expected)} "
        f"ref-only={set(expected) - set(got)} "
        f"value-diffs={[k for k in set(got) & set(expected) if got[k] != expected[k]]}"
    )


def test_reference_extraction_sane():
    """The AST extraction really produced the reference function (guards
    against the reference file moving or being renamed silently)."""
    fn = _load_reference_trim_sides()
    df = pd.DataFrame(
        {
            "metric": ["m"] * 8,
            "date": list(range(8)),
            "payload": [0.0, 1.0, 2.0, 3.0, 4.0, 5.0, np.nan, np.nan],
        }
    )
    out = fn(df.copy())
    # the empirically verified behavior: only the payload-3 row survives
    assert len(out) == 1 and out.iloc[0]["payload"] == 3.0
