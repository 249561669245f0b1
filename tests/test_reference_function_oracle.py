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

Where the reference uses a 2-3 line pandas-1.x idiom that pandas 2
rejects or silently re-types (set indexers; ``.loc`` full-column
assignment now keeping the old dtype), the exec namespace supplies a
behavior-faithful shim for THAT HELPER while the function under test
runs verbatim. ``change_by_sum`` is the one reference function that
cannot run verbatim under pandas 2 at all (its groupby().rolling()
reset_index/join chain hits hard API drift) — its third leg stays the
hand-replayed chain in test_pandas_reference_parity.py.
"""

from __future__ import annotations

import ast
import hashlib
import math

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

REF_UPLOADER = "/root/reference/db_etl_upload/uploader.py"

# The reference tree is UNTRUSTED public content that these tests exec
# as an expected-output generator. Pin every exec'd file to the digest
# it had when the parity suite was written, so a swapped or tampered
# tree fails loudly instead of silently executing foreign code (and so
# a legitimately updated reference forces a deliberate re-review of
# the parity contract before its code runs again).
_REF_SHA256 = {
    "/root/reference/db_etl/etl.py":
        "f2ea0bdcab047f6e9d97318a26b6dff4c105c7082085ffa344909225250ff34d",
    "/root/reference/db_etl/processors/converter.py":
        "de5800d8ddca1af90f9264636e740fedd800ee8978c5272e1c278b0d7dc015ce",
    "/root/reference/db_etl/processors/derived_metrics.py":
        "290210be9d98b91cda9123047c575b285c192aa72aa13c5fef75662c1baba0aa",
    "/root/reference/db_etl/processors/generic_rate.py":
        "3e2aace039d365e5c56228d68adda19d0a58c8766f025665dcb94a26658f251b",
    "/root/reference/db_etl/processors/homogenisation.py":
        "2c11030c72d0f160904061b64de94091ca1936bf6f08d72c6185fbedb2b8147d",
    "/root/reference/db_etl/processors/normalisation.py":
        "c6c66d91829e9944ebe8f919f20a100f173dbab687c86376b09fb6a5a955af7e",
    "/root/reference/db_etl/processors/trimmer.py":
        "438e3ef279611f49afb5f1cd4970c647657e66bf07998f82d37d5be901bd62ed",
    "/root/reference/db_etl_upload/uploader.py":
        "2c7832b6e53a527efb3f537278dbb77da12da5a14b9edf3d0da225594bfc7cea",
    "/root/reference/msoa_etl_db/processor.py":
        "302c88147f76735405ce68070507364ffd190768e900980cfe0c34e2974879ae",
}


def _read_pinned(path: str) -> str:
    """Read a reference source file, failing if its content hash is not
    the pinned one (never exec un-reviewed reference code)."""
    raw = open(path, "rb").read()
    digest = hashlib.sha256(raw).hexdigest()
    pinned = _REF_SHA256.get(path)
    assert pinned is not None, (
        f"{path} is exec'd as a parity oracle but has no pinned sha256 — "
        "add its digest to _REF_SHA256 after reviewing the file"
    )
    assert digest == pinned, (
        f"{path} changed since the parity suite pinned it "
        f"(sha256 {digest} != pinned {pinned}); the reference tree is "
        "untrusted content — re-review the file, then update _REF_SHA256"
    )
    return raw.decode("utf-8")


def _load_reference_trim_sides():
    src = _read_pinned(REF_UPLOADER)
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


# ---------------------------------------------------------------------------
# general extraction: run MORE reference functions as oracles
# ---------------------------------------------------------------------------


def _load_ref_functions(path: str, names: list[str], extra_ns: dict | None = None):
    """AST-extract top-level functions by name from a reference source
    file and exec them together (decorators like @func_logger resolve
    against a pass-through stub). Returns the populated namespace.
    The file's sha256 must match the pin in ``_REF_SHA256``."""
    src = _read_pinned(path)
    tree = ast.parse(src)
    wanted = [
        n
        for n in tree.body
        if isinstance(n, ast.FunctionDef) and n.name in names
    ]
    assert {n.name for n in wanted} == set(names), (
        f"missing in {path}: {set(names) - {n.name for n in wanted}}"
    )
    mod = ast.Module(body=wanted, type_ignores=[])
    ns: dict = {
        "NaN": np.nan,
        "DataFrame": pd.DataFrame,
        "func_logger": lambda *a, **k: (lambda f: f),
    }
    if extra_ns:
        ns.update(extra_ns)
    exec(compile(mod, path, "exec"), ns)  # noqa: S102 - test oracle
    return ns


@given(
    newv=st.lists(
        st.sampled_from([None, 0.0, 2.0]), min_size=3, max_size=10
    ),
    cumv=st.lists(
        st.sampled_from([None, 1.0, 4.0]), min_size=3, max_size=10
    ),
)
@settings(max_examples=15, deadline=None)
def test_normalise_records_matches_reference_code(spark, newv, cumv):
    """Reference normalise_records (db_etl/processors/normalisation.py)
    executed as oracle: bounded zero-fill / ffill windows per areaCode
    and areaName propagation, on hypothesis null patterns."""
    from pandas import unique

    from coronavirus_dashboard_pipeline_etl_spark.operators.normalise import (
        normalise_records,
    )

    ns = _load_ref_functions(
        "/root/reference/db_etl/processors/normalisation.py",
        ["normalise_records"],
        {"unique": unique},
    )
    ref_fn = ns["normalise_records"]

    n = max(len(newv), len(cumv))
    newv = (newv + [None] * n)[:n]
    cumv = (cumv + [None] * n)[:n]
    dates = pd.date_range("2021-05-01", periods=n)
    pdf = pd.DataFrame(
        {
            "areaType": ["ltla"] * n,
            "areaCode": ["X1"] * n,
            "areaName": ["Xton" if i == n // 2 else None for i in range(n)],
            "date": dates,
            "newCases": pd.array(newv, dtype="float64"),
            "cumCases": pd.array(cumv, dtype="float64"),
        }
    )
    ref_out = ref_fn(pdf.copy(), zero_filled=["newCases"], cumulative=["cumCases"])

    def clean(v):
        return None if (v is None or (isinstance(v, float) and np.isnan(v))) else v

    expected = {
        r["date"]: (
            clean(r["newCases"]),
            clean(r["cumCases"]),
            None if pd.isna(r["areaName"]) else r["areaName"],
        )
        for _, r in ref_out.iterrows()
    }

    spdf = pdf.copy()
    spdf["date"] = spdf["date"].dt.strftime("%Y-%m-%d")
    sdf = spark.createDataFrame(
        spdf.where(spdf.notna(), None),
        "areaType string, areaCode string, areaName string, date string, "
        "newCases double, cumCases double",
    )
    got = {
        r["date"]: (r["newCases"], r["cumCases"], r["areaName"])
        for r in normalise_records(
            sdf, zero_filled=["newCases"], cumulative=["cumCases"]
        ).collect()
    }
    assert got == expected


def test_pair_summation_and_suppression_match_reference_code(spark):
    """calculate_pair_summations (derived_metrics.py) and
    suppress_by_rolling_sum (msoa_etl_db/processor.py) executed as
    oracles on null/edge fixtures."""
    from coronavirus_dashboard_pipeline_etl_spark.operators.derived import (
        calculate_pair_summations,
    )
    from coronavirus_dashboard_pipeline_etl_spark.operators.suppress import (
        suppress_by_rolling_sum,
    )

    ns = _load_ref_functions(
        "/root/reference/db_etl/processors/derived_metrics.py",
        ["calculate_pair_summations"],
    )
    pdf = pd.DataFrame(
        {
            "id": range(6),
            "first": [1.0, None, 3.0, None, 0.0, -2.5],
            "second": [2.0, 5.0, None, None, 0.0, 2.5],
        }
    )
    ref_out = ns["calculate_pair_summations"](
        pdf.copy(), both=("first", "second")
    )
    sdf = spark.createDataFrame(pdf)
    got = {
        r["id"]: r["both"]
        for r in calculate_pair_summations(
            sdf, [("first", "second", "both")]
        ).collect()
    }
    for i in range(6):
        e = ref_out["both"].iloc[i]
        assert got[i] == (None if pd.isna(e) else e), (i, got[i], e)

    ns2 = _load_ref_functions(
        "/root/reference/msoa_etl_db/processor.py",
        ["suppress_by_rolling_sum"],
    )
    stats = ["RollingSum", "Change", "Direction", "ChangePercentage", "RollingRate"]
    cols = {f"cases{s}": [0.0, 2.0, 2.5, 3.0, None, 10.0] for s in stats}
    spdf = pd.DataFrame({"id": range(6), **cols})
    ref_sup = ns2["suppress_by_rolling_sum"](spdf.copy(), "cases")
    sdf2 = spark.createDataFrame(spdf)
    out2 = suppress_by_rolling_sum(
        sdf2, "casesRollingSum", [f"cases{s}" for s in stats], threshold=2
    )
    got2 = {r["id"]: tuple(r[f"cases{s}"] for s in stats) for r in out2.collect()}
    for i in range(6):
        exp = tuple(
            None if pd.isna(ref_sup[f"cases{s}"].iloc[i]) else ref_sup[f"cases{s}"].iloc[i]
            for s in stats
        )
        assert got2[i] == exp, (i, got2[i], exp)


def test_trim_end_and_row_hash_match_reference_code(spark):
    """trim_end (db_etl/processors/trimmer.py) and generate_row_hash
    (db_etl_upload/uploader.py) executed as oracles."""
    from datetime import datetime, timedelta

    from coronavirus_dashboard_pipeline_etl_spark.operators.hashing import (
        row_hash_blake2,
    )
    from coronavirus_dashboard_pipeline_etl_spark.operators.trim import trim_end

    class _CompatSet(set):
        # pandas 2 rejects set column indexers; the reference's
        # ``set(metrics).intersection(...)`` fed one to .loc under
        # pandas 1.x — intersect to a sorted LIST, same members
        def intersection(self, other):
            return sorted(set(self) & set(other))

    ns = _load_ref_functions(
        "/root/reference/db_etl/processors/trimmer.py",
        ["trim_end"],
        {"datetime": datetime, "timedelta": timedelta, "set": _CompatSet},
    )
    dates = [f"2021-02-{i:02d}" for i in range(1, 11)]
    pdf = pd.DataFrame(
        {
            "date": dates,
            "cases": [float(i) for i in range(10)],
            "other": [float(i * 3) for i in range(10)],
        }
    )
    ref_out = ns["trim_end"](pdf.copy(), ["cases", "ghost"], 5)
    sdf = spark.createDataFrame(pdf)
    got = {
        r["date"]: (r["cases"], r["other"])
        for r in trim_end(sdf, ["cases", "ghost"], days_to_trim=5).collect()
    }
    for i, dt in enumerate(dates):
        e = ref_out["cases"].iloc[i]
        assert got[dt] == (
            None if pd.isna(e) else e,
            ref_out["other"].iloc[i],
        ), dt

    key = b"fourth-leg-key"
    from hashlib import blake2s

    ns3 = _load_ref_functions(
        "/root/reference/db_etl_upload/uploader.py",
        ["generate_row_hash"],
        {"RECORD_KEY": key, "blake2s": blake2s},
    )
    hpdf = pd.DataFrame(
        {
            "date": ["2021-01-01", "2021-01-02T00:00:00"],
            "area_type": ["ltla", "utla"],
            "area_code": ["E1", "E2"],
            "metric_id": [7, 8],
            "release_id": [3, 3],
        }
    )
    ref_hash = list(ns3["generate_row_hash"](hpdf.copy(), hash_only=True))
    sdf3 = spark.createDataFrame(
        pd.DataFrame(
            {
                "date": ["2021-01-01", "2021-01-02"],  # [:10] trim applied
                "area_type": ["ltla", "utla"],
                "area_code": ["E1", "E2"],
                "metric_id": [7, 8],
                "release_id": [3, 3],
            }
        )
    )
    got3 = [
        r["hash"]
        for r in row_hash_blake2(
            sdf3,
            ["date", "area_type", "area_code", "metric_id", "release_id"],
            key=key,
        )
        .orderBy("area_code")
        .collect()
    ]
    assert got3 == ref_hash


@given(
    areas=st.dictionaries(
        keys=st.sampled_from([("ltla", "E1"), ("ltla", "E2"), ("utla", "U9")]),
        values=st.sets(st.integers(min_value=1, max_value=9), min_size=1, max_size=5),
        min_size=1,
        max_size=3,
    )
)
@settings(max_examples=15, deadline=None)
def test_homogenise_dates_matches_reference_code(spark, areas):
    """Reference homogenise_dates (db_etl/processors/homogenisation.py)
    executed verbatim as oracle: the scaffold spans the GLOBAL min..max
    date for every (areaType, areaCode) pair, however sparse each
    area's own dates are."""
    from itertools import product

    from pandas import MultiIndex, concat, date_range, to_datetime, unique

    from coronavirus_dashboard_pipeline_etl_spark.operators.homogenise import (
        homogenise_dates,
    )

    ns = _load_ref_functions(
        "/root/reference/db_etl/processors/homogenisation.py",
        ["homogenise_dates"],
        {
            "to_datetime": to_datetime,
            "date_range": date_range,
            "unique": unique,
            "MultiIndex": MultiIndex,
            "concat": concat,
            "product": product,
        },
    )
    rows = [
        {
            "areaType": at,
            "areaCode": ac,
            "date": f"2021-01-{d:02d}",
            "cases": float(d),
        }
        for (at, ac), days in sorted(areas.items())
        for d in sorted(days)
    ]
    pdf = pd.DataFrame(rows)
    ref_out = ns["homogenise_dates"](pdf.copy())
    expected = {
        (r.areaType, r.areaCode, r.date.strftime("%Y-%m-%d")): (
            None if pd.isna(r.cases) else r.cases
        )
        for r in ref_out.itertuples()
    }

    import pyspark.sql.functions as F

    sdf = spark.createDataFrame(
        pdf, "areaType string, areaCode string, date string, cases double"
    )
    got = {
        (r.areaType, r.areaCode, r.date): r.cases
        for r in homogenise_dates(sdf)
        .withColumn("date", F.date_format("date", "yyyy-MM-dd"))
        .collect()
    }
    assert got == expected


def test_calculate_rates_matches_reference_code(spark):
    """Reference generic_rate.calculate_rates executed verbatim as
    oracle: the leading-window min_count=0 zero-publication, the
    SpecimenDate 5-day event mask, and the non-event global
    last-valid-date mask, against the Spark calculate_rates.
    Populations chosen so every rate is integer-exact (pandas round(1)
    is half-even, Spark HALF_UP — irrelevant off the .05 boundary)."""
    import collections
    import logging
    from datetime import datetime, timedelta
    from typing import Iterable

    from pandas import to_datetime

    from coronavirus_dashboard_pipeline_etl_spark.operators.rates import (
        calculate_rates,
    )

    ns = _load_ref_functions(
        "/root/reference/db_etl/processors/generic_rate.py",
        ["calculate_rates"],
        {
            "logging": logging,
            "to_datetime": to_datetime,
            "datetime": datetime,
            "timedelta": timedelta,
            "RATE_PER_POPULATION_FACTOR": 100_000,
            "Iterable": Iterable,
        },
    )
    PopData = collections.namedtuple("PopData", "general")
    popdf = pd.DataFrame(
        {"population": [1000.0, 2000.0]},
        index=pd.Index(["E1", "E2"], name="areaCode"),
    )

    ev = {
        "E1": [1, 2, 3, 4, 5, 6, 7, 8, 9, None, 11, 12, 13, 14, 15, 16],
        "E2": [0] * 16,
    }
    cum = {
        # E1 stops reporting at day 10; E2 at day 12 -> the GLOBAL
        # last-valid mask cuts after day 12
        "E1": [2, 2, 4, 4, 6, 6, 8, 8, 10, 10, None, None, None, None, None, None],
        "E2": [1] * 12 + [None] * 4,
    }
    rows = []
    for code in ("E1", "E2"):
        for i in range(16):
            rows.append(
                {
                    "areaType": "ltla",
                    "areaCode": code,
                    "date": f"2021-03-{i + 1:02d}",
                    "newCasesBySpecimenDate": ev[code][i],
                    "cumAdmissions": cum[code][i],
                }
            )
    pdf = pd.DataFrame(rows)
    for c in ("newCasesBySpecimenDate", "cumAdmissions"):
        pdf[c] = pdf[c].astype("float64")

    ref_out = ns["calculate_rates"](
        pdf.copy(),
        PopData(general=popdf),
        rolling_rate=["newCasesBySpecimenDate", "cumAdmissions"],
        incidence_rate=[],
        rate_per_n=100_000,
    )
    out_cols = [
        "newCasesBySpecimenDateRollingSum",
        "newCasesBySpecimenDateRollingRate",
        "cumAdmissionsRollingSum",
        "cumAdmissionsRollingRate",
    ]

    def clean(v):
        return None if (v is None or (isinstance(v, float) and np.isnan(v))) else v

    expected = {
        (r["areaCode"], r["date"]): tuple(clean(r[c]) for c in out_cols)
        for _, r in ref_out.iterrows()
    }

    sdf = spark.createDataFrame(
        pdf.where(pdf.notna(), None),
        "areaType string, areaCode string, date string, "
        "newCasesBySpecimenDate double, cumAdmissions double",
    )
    pop_sdf = spark.createDataFrame(
        popdf.reset_index(), "areaCode string, population double"
    )
    got = {
        (r["areaCode"], r["date"]): tuple(r[c] for c in out_cols)
        for r in calculate_rates(
            sdf,
            pop_sdf,
            rolling_rate=["newCasesBySpecimenDate", "cumAdmissions"],
            precision=1,
        ).collect()
    }
    assert got == expected, {
        k: (got[k], expected[k]) for k in got if got[k] != expected[k]
    }


def test_derived_trio_matches_reference_code(spark):
    """negative_to_zero (db_etl/etl.py), ratio_to_percentage
    (processors/converter.py), and calculate_by_adjacent_column
    (processors/derived_metrics.py) executed as oracles. Ratio values
    avoid the .05 rounding boundary (pandas half-even vs Spark
    HALF_UP)."""
    from coronavirus_dashboard_pipeline_etl_spark.operators.derived import (
        calculate_by_adjacent_column,
        negative_to_zero,
        ratio_to_percentage,
    )

    # negative_to_zero: set the reference's configured metric list
    ns = _load_ref_functions(
        "/root/reference/db_etl/etl.py",
        ["negative_to_zero"],
        {"NEGATIVE_TO_ZERO": ["newCases", "ghostMetric"]},
    )
    pdf = pd.DataFrame(
        {
            "id": range(5),
            "newCases": [-3.0, 0.0, 4.0, -0.5, None],
            "untouched": [-9.0] * 5,
        }
    )
    ref_out = ns["negative_to_zero"](pdf.copy())
    got = {
        r["id"]: (r["newCases"], r["untouched"])
        for r in negative_to_zero(
            spark.createDataFrame(pdf), ["newCases", "ghostMetric"]
        ).collect()
    }
    for i in range(5):
        e = ref_out["newCases"].iloc[i]
        assert got[i] == (
            None if pd.isna(e) else e,
            ref_out["untouched"].iloc[i],
        ), i

    # ratio_to_percentage
    class _CompatSet(set):
        def intersection(self, other):
            return sorted(set(self) & set(other))

    ns2 = _load_ref_functions(
        "/root/reference/db_etl/processors/converter.py",
        ["ratio_to_percentage"],
        {"set": _CompatSet},
    )
    rpdf = pd.DataFrame({"id": range(4), "ratio": [0.123, 0.9991, None, 1.2]})
    ref_pct = ns2["ratio_to_percentage"](rpdf.copy(), ["ratio", "nope"])
    got_pct = {
        r["id"]: r["ratio"]
        for r in ratio_to_percentage(
            spark.createDataFrame(rpdf), ["ratio", "nope"]
        ).collect()
    }
    for i in range(4):
        e = ref_pct["ratio"].iloc[i]
        assert got_pct[i] == (None if pd.isna(e) else e), (i, got_pct[i], e)

    # calculate_by_adjacent_column: fill the latest date's nulls from
    # the per-area max of the source column
    apdf = pd.DataFrame(
        [
            ("ltla", "E1", "2021-01-01", 5.0, None),
            ("ltla", "E1", "2021-01-02", 9.0, None),
            ("ltla", "E2", "2021-01-01", 3.0, 7.0),
            ("ltla", "E2", "2021-01-02", 4.0, None),
            ("ltla", "E3", "2021-01-02", None, None),  # no source at all
        ],
        columns=["areaType", "areaCode", "date", "src", "tgt"],
    )
    ns3 = _load_ref_functions(
        "/root/reference/db_etl/processors/derived_metrics.py",
        ["calculate_by_adjacent_column"],
    )
    ref_adj = ns3["calculate_by_adjacent_column"](apdf.copy(), tgt="src")
    expected = {
        (r.areaCode, r.date): (None if pd.isna(r.tgt) else r.tgt)
        for r in ref_adj.itertuples()
    }
    sdf = spark.createDataFrame(
        apdf.where(apdf.notna(), None),
        "areaType string, areaCode string, date string, src double, tgt double",
    )
    got_adj = {
        (r.areaCode, r.date): r.tgt
        for r in calculate_by_adjacent_column(sdf, [("tgt", "src")]).collect()
    }
    assert got_adj == expected, (got_adj, expected)


def test_calculate_cumulative_matches_reference_code(spark):
    """calculate_cumulative (db_etl/etl.py) executed as oracle: per-area
    running totals with pandas' skip-null semantics AND the reference's
    new->cum output naming."""
    import logging

    from coronavirus_dashboard_pipeline_etl_spark.operators.rolling import (
        cumulative_sum,
    )

    ns = _load_ref_functions(
        "/root/reference/db_etl/etl.py",
        ["calculate_cumulative"],
        {"logging": logging},
    )
    rows = []
    for code, vals in (("E1", [1.0, None, 3.0, 0.0]), ("E2", [None, None, 5.0, 2.0])):
        for i, v in enumerate(vals):
            rows.append(
                {
                    "areaType": "ltla",
                    "areaName": code.lower(),
                    "areaCode": code,
                    "date": f"2021-03-{i + 1:02d}",
                    "newCases": v,
                }
            )
    pdf = pd.DataFrame(rows)
    ref_out = ns["calculate_cumulative"](pdf.copy(), ["newCases"])
    assert "cumCases" in ref_out.columns  # the new->cum naming rule
    expected = {
        (r.areaCode, r.date): (None if pd.isna(r.cumCases) else r.cumCases)
        for r in ref_out.itertuples()
    }
    sdf = spark.createDataFrame(
        pdf.where(pdf.notna(), None),
        "areaType string, areaName string, areaCode string, date string, "
        "newCases double",
    )
    got = {
        (r.areaCode, r.date): r.cumCases
        for r in cumulative_sum(sdf, ["newCases"]).collect()
    }
    assert got == expected


def test_homogenise_demographics_matches_reference_code(spark):
    """homogenise_demographics_dates (homogenisation.py:81-130)
    executed verbatim as oracle for the WEEKLY scaffold with a nesting
    key: every (areaType, areaCode, weekly-date, age) combination over
    the global span exists exactly once, existing rows merge in."""
    from itertools import product

    from pandas import MultiIndex, concat, date_range, to_datetime, unique

    import pyspark.sql.functions as F

    from coronavirus_dashboard_pipeline_etl_spark.operators.homogenise import (
        homogenise_dates,
    )

    ns = _load_ref_functions(
        "/root/reference/db_etl/processors/homogenisation.py",
        ["homogenise_demographics_dates"],
        {
            "to_datetime": to_datetime,
            "date_range": date_range,
            "unique": unique,
            "MultiIndex": MultiIndex,
            "concat": concat,
            "product": product,
        },
    )
    # Sundays 2021-02-07/14/21/28 lie in the span; rows exist sparsely
    rows = [
        ("ltla", "E1", "2021-02-07", "00_04", 1.0),
        ("ltla", "E1", "2021-02-21", "05_09", 2.0),
        ("ltla", "E2", "2021-02-14", "00_04", 3.0),
    ]
    pdf = pd.DataFrame(
        rows, columns=["areaType", "areaCode", "date", "age", "cases"]
    )
    ref_out = ns["homogenise_demographics_dates"](
        pdf.copy(),
        base_metrics=["areaType", "areaCode", "date", "age"],
        nesting_param="age",
        frequency="W",
    )
    expected = {
        (r.areaType, r.areaCode, r.date.strftime("%Y-%m-%d"), r.age): (
            None if pd.isna(r.cases) else r.cases
        )
        for r in ref_out.itertuples()
    }

    sdf = spark.createDataFrame(
        pdf, "areaType string, areaCode string, date string, age string, "
        "cases double",
    )
    got = {
        (r.areaType, r.areaCode, r.date, r.age): r.cases
        for r in homogenise_dates(sdf, frequency="W", extra_keys=["age"])
        .withColumn("date", F.date_format("date", "yyyy-MM-dd"))
        .collect()
    }
    assert got == expected, (
        f"spark-only={set(got) - set(expected)} "
        f"ref-only={set(expected) - set(got)}"
    )


# ------------------------------------------------------------- composed chain


def _shim_change_by_sum(data: pd.DataFrame, metrics) -> pd.DataFrame:
    """pandas-2 shim for the reference ``change_by_sum``
    (db_etl/processors/rolling.py:81-233) used ONLY inside the composed
    chain: the verbatim function cannot run under pandas 2 (its
    groupby().rolling() reset_index/join chain hits hard API drift), so
    this replays the same steps, including the load-bearing reuse rule
    the composition exists to test: an existing ``{m}RollingSum``
    column (the rates path's, with its 0-coerced leading windows) is
    REUSED, never recomputed (rolling.py:131-163). pct is left
    unrounded — the composed comparison runs Spark at
    ``pct_precision=None`` and compares with tolerance, keeping the
    half-even-vs-HALF-UP display rounding out of the parity question.
    min_sum handling is omitted (the main chain never passes it)."""
    d = data.sort_values(["areaType", "areaCode", "date"]).reset_index(drop=True)
    keys = ["areaType", "areaCode"]
    for m in sorted(set(metrics) & set(d.columns)):
        rs, ch = f"{m}RollingSum", f"{m}Change"
        dirn, pct = f"{m}Direction", f"{m}ChangePercentage"
        grp = d.groupby(keys, group_keys=False, sort=False)
        if rs not in d.columns:
            d[rs] = (
                grp[m]
                .apply(lambda s: s.astype(float).rolling(7).sum())
                .reset_index(drop=True)
            )
            grp = d.groupby(keys, group_keys=False, sort=False)

        def all_zero(s: pd.Series) -> pd.Series:
            return s.mask(pd.Series([s.sum() == 0] * len(s), index=s.index))

        d[rs] = grp[rs].apply(all_zero).reset_index(drop=True)
        grp = d.groupby(keys, group_keys=False, sort=False)
        d[ch] = grp[rs].diff(7)
        d[dirn] = d[ch].map(
            lambda v: None
            if pd.isna(v)
            else ("DOWN" if v < 0 else "UP" if v > 0 else "SAME")
        )

        def pct_fn(w: pd.Series) -> float:
            cur, prev = w.iloc[7], w.iloc[0]
            if cur == 0 and prev > 0:
                return -100.0
            fraction = cur / (prev or 1) - 1
            if fraction == -1:
                return 0.0
            return fraction * 100

        d[pct] = (
            grp[rs]
            .apply(lambda s: s.rolling(8).apply(pct_fn))
            .reset_index(drop=True)
        )
        raw_null = d[m].isna()
        d.loc[raw_null, [rs, ch, dirn, pct]] = np.nan
    return d


_CHAIN_METRICS = {
    "newCasesBySpecimenDate": [None, 0.0, 1.0, 3.0, 7.0],
    "newCasesByPublishDate": [None, -2.0, 0.0, 2.0, 6.0],
    "cumCasesByPublishDate": [None, 1.0, 4.0, 9.0],
    "newPillarOne": [None, 0.0, 2.0, 5.0],
    "newPillarTwo": [None, 1.0, 3.0],
    "posRatio": [None, 0.1, 0.25, 0.5],
    "vaxSrc": [None, 2.0, 6.0],
    "cumVax": [None, 3.0],
}


def _chain_panel(seed: int) -> pd.DataFrame:
    """A fuzzed 16-day 2-area panel: sparse per-area date coverage (the
    homogenise scaffold must bite), one areaName observation per area,
    pools chosen so every configured operator fires and every rate /
    ratio is exact at 1 dp in both rounding modes. E2 deliberately
    starts LATE and stops EARLY (its candidate dates are indices 3-12)
    — the reference runs the chain per (areaType, areaCode) chunk
    (retrieve.py:147-163 fans out one blob per area; run_direct
    processes it alone), so per-area frame bounds are load-bearing."""
    rng = np.random.RandomState(seed)
    dates = [f"2021-03-{i:02d}" for i in range(1, 17)]
    rows = []
    for code in ("E1", "E2"):
        if code == "E1":
            present = sorted(
                rng.choice(16, size=rng.randint(8, 17), replace=False)
            )
            present = sorted(set(present) | {0, 15})  # spans the range
        else:
            present = sorted(
                3 + rng.choice(10, size=rng.randint(6, 11), replace=False)
            )
        name_at = int(rng.choice(len(present)))
        for j, di in enumerate(present):
            row = {
                "areaType": "ltla",
                "areaCode": code,
                "areaName": f"{code}ton" if j == name_at else None,
                "date": dates[di],
            }
            for m, pool in _CHAIN_METRICS.items():
                row[m] = pool[rng.randint(len(pool))]
            rows.append(row)
    pdf = pd.DataFrame(rows)
    for m in _CHAIN_METRICS:
        pdf[m] = pdf[m].astype("float64")
    return pdf


def test_process_panel_matches_reference_chain_composed(spark):
    """EP1 composed-chain parity (r9 verdict item 5): the reference's
    ACTUAL ``.pipe()`` chain (db_etl/etl.py:996-1022 order) executed on
    fuzzed panels — homogenise_dates, normalise_records,
    negative_to_zero, calculate_pair_summations,
    calculate_by_adjacent_column, calculate_rates, ratio_to_percentage
    and trim_end all VERBATIM from the reference source; change_by_sum
    through the pandas-2 shim above — against ``process_panel``
    end-to-end. Single-operator parity cannot see composition bugs
    (column naming handed between stages, the rates->change RollingSum
    reuse, mask ordering); this does."""
    import collections
    import logging
    from datetime import datetime, timedelta
    from itertools import product
    from typing import Iterable

    from pandas import (
        MultiIndex,
        concat,
        date_range,
        to_datetime,
        unique,
    )

    from coronavirus_dashboard_pipeline_etl_spark.config import MetricConfig
    from coronavirus_dashboard_pipeline_etl_spark.plans.main_pipeline import (
        process_panel,
    )

    class _CompatSet(set):
        def intersection(self, other):
            return sorted(set(self) & set(other))

    ns_h = _load_ref_functions(
        "/root/reference/db_etl/processors/homogenisation.py",
        ["homogenise_dates"],
        {
            "to_datetime": to_datetime,
            "date_range": date_range,
            "unique": unique,
            "MultiIndex": MultiIndex,
            "concat": concat,
            "product": product,
        },
    )
    ns_n = _load_ref_functions(
        "/root/reference/db_etl/processors/normalisation.py",
        ["normalise_records"],
        {"unique": unique},
    )
    ns_z = _load_ref_functions(
        "/root/reference/db_etl/etl.py",
        ["negative_to_zero"],
        {"NEGATIVE_TO_ZERO": ["newCasesByPublishDate"]},
    )
    ns_p = _load_ref_functions(
        "/root/reference/db_etl/processors/derived_metrics.py",
        ["calculate_pair_summations", "calculate_by_adjacent_column"],
    )
    ns_r = _load_ref_functions(
        "/root/reference/db_etl/processors/generic_rate.py",
        ["calculate_rates"],
        {
            "logging": logging,
            "to_datetime": to_datetime,
            "datetime": datetime,
            "timedelta": timedelta,
            "RATE_PER_POPULATION_FACTOR": 100_000,
            "Iterable": Iterable,
        },
    )
    ns_c = _load_ref_functions(
        "/root/reference/db_etl/processors/converter.py",
        ["ratio_to_percentage"],
        {"set": _CompatSet},
    )
    ns_t = _load_ref_functions(
        "/root/reference/db_etl/processors/trimmer.py",
        ["trim_end"],
        {"datetime": datetime, "timedelta": timedelta, "set": _CompatSet},
    )
    PopData = collections.namedtuple("PopData", "general")
    popdf = pd.DataFrame(
        {"population": [1000.0, 2000.0]},
        index=pd.Index(["E1", "E2"], name="areaCode"),
    )

    scd = ["newCasesBySpecimenDate", "newCasesByPublishDate"]
    rr = ["newCasesBySpecimenDate"]
    cfg = MetricConfig(
        sum_change_direction=frozenset(scd),
        rolling_rate=frozenset(rr),
        negative_to_zero=frozenset({"newCasesByPublishDate"}),
        fill_with_zeros=frozenset(
            {"newCasesBySpecimenDate", "newCasesByPublishDate"}
        ),
        start_with_zero=frozenset({"cumCasesByPublishDate"}),
        ratio_to_percentage=frozenset({"posRatio"}),
        trim_end=frozenset({"newCasesBySpecimenDate"}),
        pair_sums=(("newPillarOne", "newPillarTwo", "newPCRTests"),),
        adjacent_fill=(("cumVax", "vaxSrc"),),
    )
    out_cols = (
        list(_CHAIN_METRICS)
        + ["newPCRTests", "areaName"]
        + [f"{m}{s}" for m in scd
           for s in ("RollingSum", "Change", "Direction", "ChangePercentage")]
        + ["newCasesBySpecimenDateRollingRate"]
    )
    pct_cols = {f"{m}ChangePercentage" for m in scd}

    def key_date(v) -> str:
        return v.strftime("%Y-%m-%d") if hasattr(v, "strftime") else str(v)[:10]

    seen_non_null: set[str] = set()
    for seed in (11, 23, 47):
        pdf = _chain_panel(seed)

        expected = {}
        # the reference fans out ONE chunk per (areaType, areaCode)
        # (retrieve.py:147-163) and run_direct processes each alone —
        # so every frame-scoped scalar in the chain (homogenise span,
        # rates last-valid/event cutoffs, trim_end cutoff) is PER AREA
        for code in pdf["areaCode"].unique():
            d = pdf.loc[pdf.areaCode == code, :].reset_index(drop=True)
            d = ns_h["homogenise_dates"](d.copy())
            d = ns_n["normalise_records"](
                d,
                zero_filled=sorted(cfg.fill_with_zeros),
                cumulative=sorted(cfg.start_with_zero),
            )
            d = ns_z["negative_to_zero"](d)
            d = ns_p["calculate_pair_summations"](
                d, newPCRTests=("newPillarOne", "newPillarTwo")
            )
            d = ns_p["calculate_by_adjacent_column"](d, cumVax="vaxSrc")
            d = ns_r["calculate_rates"](
                d,
                PopData(general=popdf),
                rolling_rate=rr,
                incidence_rate=[],
                rate_per_n=100_000,
            )
            d = _shim_change_by_sum(d, scd)
            d = ns_c["ratio_to_percentage"](d, ["posRatio"])
            d = ns_t["trim_end"](d, sorted(cfg.trim_end), 5)

            def clean(v):
                if v is None or (isinstance(v, float) and math.isnan(v)):
                    return None
                return v

            for _, r in d.iterrows():
                expected[(r["areaCode"], key_date(r["date"]))] = tuple(
                    clean(r[c]) for c in out_cols
                )

        sdf = spark.createDataFrame(
            pdf.where(pdf.notna(), None),
            "areaType string, areaCode string, areaName string, date string, "
            + ", ".join(f"{m} double" for m in _CHAIN_METRICS),
        )
        pop_sdf = spark.createDataFrame(
            popdf.reset_index(), "areaCode string, population double"
        )
        got = {
            (r["areaCode"], key_date(r["date"])): tuple(
                r[c] for c in out_cols
            )
            for r in process_panel(
                sdf,
                pop_sdf,
                cfg,
                release_timestamp=None,
                pct_precision=None,
                rate_precision=1,
            ).collect()
        }
        assert set(got) == set(expected), (
            f"seed {seed}: spark-only={set(got) - set(expected)} "
            f"ref-only={set(expected) - set(got)}"
        )
        bad = []
        for k in sorted(got):
            for c, g, e in zip(out_cols, got[k], expected[k]):
                if c in pct_cols and g is not None and e is not None:
                    ok = abs(g - e) < 1e-6
                else:
                    ok = _nan_eq_chain(g, e)
                if not ok:
                    bad.append((k, c, g, e))
        assert not bad, f"seed {seed}: first mismatches: {bad[:8]}"
        seen_non_null.update(
            c
            for vals in expected.values()
            for c, v in zip(out_cols, vals)
            if v is not None
        )
    # non-vacuity: across the three panels every compared column must
    # carry at least one real value — an all-null column would make the
    # parity above trivially true for that operator
    assert seen_non_null == set(out_cols), (
        f"all-null compared columns: {set(out_cols) - seen_non_null}"
    )


def _nan_eq_chain(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        return a == b or abs(a - b) < 1e-9
    return a == b


# -------------------------------------------------------- composed MSOA chain


def _msoa_ref_change(pdf: pd.DataFrame, metric: str, min_sum_allowed, min_sum_sub):
    """The reference change_by_sum hand replay (rolling.py:81-233) with
    the min-sum substitution branch, UNROUNDED pct (the Spark side runs
    pct_precision=None and the comparison uses tolerance, keeping the
    half-even-vs-HALF-UP display rounding out of the parity question)."""
    d = pdf.sort_values(["areaType", "areaCode", "date"]).reset_index(drop=True)
    keys = ["areaType", "areaCode"]
    grp = d.groupby(keys, group_keys=False, sort=False)
    rsum = grp[metric].apply(lambda s: s.astype(float).rolling(7).sum())
    rsum = rsum.reset_index(drop=True)
    if min_sum_allowed is not None:
        rsum = rsum.where(~(rsum < min_sum_allowed), float(min_sum_sub))
    d["rsum"] = rsum

    def all_zero(s: pd.Series) -> pd.Series:
        return s.mask(pd.Series([s.sum() == 0] * len(s), index=s.index))

    grp = d.groupby(keys, group_keys=False, sort=False)
    d["rsum"] = grp["rsum"].apply(all_zero).reset_index(drop=True)
    grp = d.groupby(keys, group_keys=False, sort=False)
    d["chg"] = grp["rsum"].diff(7)
    d["dirn"] = d["chg"].map(
        lambda v: None
        if pd.isna(v)
        else ("DOWN" if v < 0 else "UP" if v > 0 else "SAME")
    )

    def pct_fn(w: pd.Series) -> float:
        cur, prev = w.iloc[7], w.iloc[0]
        if cur == 0 and prev > 0:
            return -100.0
        fraction = cur / (prev or 1) - 1
        if fraction == -1:
            return 0.0
        return fraction * 100

    d["pct"] = (
        grp["rsum"].apply(lambda s: s.rolling(8).apply(pct_fn)).reset_index(drop=True)
    )
    raw_null = d[metric].isna()
    d.loc[raw_null, ["rsum", "chg", "dirn", "pct"]] = np.nan
    if min_sum_allowed is not None:
        sub_rows = d["rsum"] == float(min_sum_sub)
        d.loc[sub_rows, ["rsum", "chg", "dirn", "pct", metric]] = np.nan
    return d


def test_run_msoa_matches_reference_chain_composed(spark):
    """EP3 composed-chain parity: the reference MSOA processor chain
    (msoa_etl_db/processor.py:267-298) replayed per area the way the
    reference actually runs it — get_dataset's trailing zero-pad to the
    GLOBAL max date, then homogenise_dates / normaliser (verbatim),
    change_by_sum(min_sum 3->2) via the replay above,
    calculate_rolling_rate / suppress_by_rolling_sum / to_periodic_data
    (verbatim) — against ``run_msoa`` over the multi-area frame.

    The fixture deliberately includes a LATE-STARTING area with nonzero
    early counts: the reference's per-area frame begins at that area's
    own first observed date, which is the subtle boundary a global
    densify could get wrong."""
    from itertools import product as _product

    from pandas import (
        MultiIndex,
        concat,
        date_range,
        to_datetime,
        unique,
    )

    from coronavirus_dashboard_pipeline_etl_spark.plans.msoa_pipeline import (
        run_msoa,
    )

    from datetime import datetime, timedelta

    ns_h = _load_ref_functions(
        "/root/reference/db_etl/processors/homogenisation.py",
        ["homogenise_dates"],
        {
            "to_datetime": to_datetime,
            "date_range": date_range,
            "unique": unique,
            "MultiIndex": MultiIndex,
            "concat": concat,
            "product": _product,
        },
    )
    ns_m = _load_ref_functions(
        "/root/reference/msoa_etl_db/processor.py",
        [
            "normaliser",
            "calculate_rolling_rate",
            "suppress_by_rolling_sum",
            "to_periodic_data",
            "get_date_periods",
        ],
        {
            "datetime": datetime,
            "timedelta": timedelta,
            "date_range": date_range,
        },
    )

    metric = "newCasesBySpecimenDate"
    release_ts = "2021-03-20"
    dates = [f"2021-03-{i:02d}" for i in range(1, 17)]
    series = {
        # E1 spans the global range, with a small-count stretch so the
        # min-sum substitution and suppression branches fire
        "E1": {dates[i]: v for i, v in enumerate(
            [1, 0, 0, 1, 0, 0, 0, 5, 9, 9, 9, 9, 9, 9, 9, 9]
        )},
        # E2 STARTS LATE (first observation at day 5) with immediate
        # nonzero counts, and stops reporting early (trailing zero-pad)
        "E2": {dates[i]: v for i, v in enumerate(
            [None, None, None, None, 4, 5, 6, 7, 8, 9, 9, 9, None, None, None, None]
        ) if v is not None},
    }
    pops = {"E1": 1000.0, "E2": 2000.0}
    global_max = dates[-1]

    # ---- reference leg, PER AREA (one Azure Function per area) ----
    expected = {}
    for code, obs in series.items():
        rows = [
            {"areaType": "msoa", "areaCode": code, "date": dt,
             metric: float(v)}
            for dt, v in sorted(obs.items())
        ]
        pdf = pd.DataFrame(rows)
        # get_dataset:146-171 — trailing zero-pad to the global max
        area_max = pdf["date"].max()
        if area_max < global_max:
            pad = pd.date_range(
                start=pd.Timestamp(area_max) + pd.Timedelta(days=1),
                end=global_max,
                freq="1D",
            )
            pdf = pd.concat(
                [
                    pdf,
                    pd.DataFrame(
                        [
                            {"areaType": "msoa", "areaCode": code,
                             "date": f"{d:%Y-%m-%d}", metric: 0.0}
                            for d in pad
                        ]
                    ),
                ],
                ignore_index=True,
            )
        d = ns_h["homogenise_dates"](pdf.copy())
        d["date"] = d["date"].map(
            lambda x: x.strftime("%Y-%m-%d") if hasattr(x, "strftime") else x
        )
        d = ns_m["normaliser"](d, column=metric)
        d = _msoa_ref_change(d, metric, min_sum_allowed=3, min_sum_sub=2)
        d["population"] = pops[code]
        d = d.rename(columns={"rsum": f"{metric}RollingSum"})
        d = ns_m["calculate_rolling_rate"](d, metric=metric)
        d = d.rename(
            columns={
                f"{metric}RollingSum": "rsum",
                f"{metric}RollingRate": "rate",
            }
        )
        # suppress_by_rolling_sum works on the suffixed names
        d = d.rename(
            columns={
                "rsum": f"{metric}RollingSum",
                "chg": f"{metric}Change",
                "dirn": f"{metric}Direction",
                "pct": f"{metric}ChangePercentage",
                "rate": f"{metric}RollingRate",
            }
        )
        d = ns_m["suppress_by_rolling_sum"](d, metric=metric)
        d = ns_m["to_periodic_data"](d, timestamp=release_ts)

        def clean(v):
            if v is None or (isinstance(v, float) and math.isnan(v)):
                return None
            return v

        for _, r in d.iterrows():
            expected[(code, r["date"])] = tuple(
                clean(r[f"{metric}{s}"])
                for s in ("RollingSum", "Change", "Direction",
                          "ChangePercentage", "RollingRate")
            )

    # ---- Spark leg: one multi-area frame through run_msoa ----
    rows = [
        (code, dt, float(v))
        for code, obs in series.items()
        for dt, v in sorted(obs.items())
    ]
    cases = spark.createDataFrame(
        rows, f"areaCode string, date string, {metric} double"
    )
    pop = spark.createDataFrame(
        [(k, v) for k, v in pops.items()], "areaCode string, population double"
    )
    out = run_msoa(
        cases, pop, release_timestamp=release_ts,
        pct_precision=None, rate_precision=1,
    )
    got = {
        (r["area_code"], r["date"]): (
            r[f"{metric}RollingSum"],
            r[f"{metric}Change"],
            r[f"{metric}Direction"],
            r[f"{metric}ChangePercentage"],
            r[f"{metric}RollingRate"],
        )
        for r in out.collect()
    }
    assert set(got) == set(expected), (
        f"spark-only={sorted(set(got) - set(expected))} "
        f"ref-only={sorted(set(expected) - set(got))}"
    )
    bad = []
    for k in sorted(got):
        for i, (g, e) in enumerate(zip(got[k], expected[k])):
            if i == 3 and g is not None and e is not None:  # pct: tolerance
                ok = abs(g - e) < 1e-6
            else:
                ok = _nan_eq_chain(g, e)
            if not ok:
                bad.append((k, i, g, e))
    assert not bad, f"first mismatches: {bad[:10]}"


# ------------------------------------------------- composed demographics chain


def test_run_demographics_matches_reference_chain_composed(spark):
    """EP2 nested-pathway composed parity: the reference
    ``run_demographics`` chain (db_etl/etl.py:1285-1322) replayed PER
    AREA the way the per-chunk function runs it —
    homogenise_demographics_dates, normalise_demographics_records, and
    calculate_age_rates all VERBATIM from the reference source, then
    the groupby -> to_dict(records) nested collapse — against
    ``run_demographics`` over the multi-area frame. The payload-format
    tail (column rename to db names, Int64 cast, the wall-clock
    now()-5d row drop) is out of scope: it is formatting, and the
    now() dependence is not replayable.

    The fixture includes a LATE-STARTING area (the boundary the MSOA
    composed test caught run_msoa on) and sparse nulls per (age, date)
    so the zero-fill and the per-band scaffold both bite."""
    from itertools import product as _product

    from pandas import (
        MultiIndex,
        concat,
        date_range,
        to_datetime,
        unique,
    )

    import logging
    from datetime import datetime, timedelta
    from typing import Iterable

    from coronavirus_dashboard_pipeline_etl_spark.plans.demographics_pipeline import (
        run_demographics,
    )

    ns_h = _load_ref_functions(
        "/root/reference/db_etl/processors/homogenisation.py",
        ["homogenise_demographics_dates"],
        {
            "to_datetime": to_datetime,
            "date_range": date_range,
            "unique": unique,
            "MultiIndex": MultiIndex,
            "concat": concat,
            "product": _product,
        },
    )
    class _CompatSet(set):
        # pandas 2 rejects set column indexers; the reference's
        # ``set(zero_filled).intersection(...)`` fed one to .loc under
        # pandas 1.x — intersect to a sorted LIST, same members
        def intersection(self, other):
            return sorted(set(self) & set(other))

    ns_n = _load_ref_functions(
        "/root/reference/db_etl/processors/normalisation.py",
        ["normalise_demographics_records"],
        {
            "unique": unique,
            "product": _product,
            "Iterable": Iterable,
            "set": _CompatSet,
        },
    )
    ns_r = _load_ref_functions(
        "/root/reference/db_etl/processors/generic_rate.py",
        ["calculate_age_rates"],
        {
            "logging": logging,
            "to_datetime": to_datetime,
            "datetime": datetime,
            "timedelta": timedelta,
            "RATE_PER_POPULATION_FACTOR": 100_000,
            "Iterable": Iterable,
        },
    )

    m = "newCasesBySpecimenDate"
    dates = [f"2021-03-{i:02d}" for i in range(1, 13)]
    # (area, age) -> sparse {date: value}. The boundary cases that
    # distinguish per-area-chunk semantics from a global scaffold:
    # E2 starts late (day 4); E3 STOPS EARLY (last observation day 8)
    # and reports only ONE band — the reference chunk must not gain
    # trailing rows past day 8 or invent the missing band.
    series = {
        ("E1", "00_04"): {dates[i]: v for i, v in enumerate(
            [1, None, 0, 2, None, 3, 1, 0, 2, 4, None, 1]
        ) if v is not None},
        ("E1", "05_09"): {dates[i]: v for i, v in enumerate(
            [0, 2, None, 1, 1, None, 0, 3, 1, None, 2, 0]
        ) if v is not None},
        ("E2", "00_04"): {dates[i]: v for i, v in enumerate(
            [None, None, None, 5, 1, 2, 0, 1, 3, 2, 1, 0]
        ) if v is not None},
        ("E2", "05_09"): {dates[i]: v for i, v in enumerate(
            [None, None, None, None, 2, 1, 1, 0, 2, 1, 3, 1]
        ) if v is not None},
        ("E3", "00_04"): {dates[i]: v for i, v in enumerate(
            [2, 1, None, 0, 3, 1, 2, 4]
        ) if v is not None},
    }
    pops = {
        ("E1", "00_04"): 1000.0, ("E1", "05_09"): 2000.0,
        ("E2", "00_04"): 4000.0, ("E2", "05_09"): 1000.0,
        ("E3", "00_04"): 2000.0, ("E3", "05_09"): 1000.0,
    }
    main_metrics = ["areaType", "areaCode", "areaName", "date", "age"]
    out_fields = ["age", m, f"{m}RollingSum", f"{m}RollingRate"]

    def clean(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return None
        return v

    # ---- reference leg, per area (one chunk function per area) ----
    expected = {}
    for code in ("E1", "E2", "E3"):
        rows = []
        for (c, age), obs in sorted(series.items()):
            if c != code:
                continue
            for dt, v in sorted(obs.items()):
                rows.append(
                    {"areaType": "ltla", "areaCode": code,
                     "areaName": f"{code}ton", "date": dt, "age": age,
                     m: float(v)}
                )
        pdf = pd.DataFrame(rows)
        d = ns_h["homogenise_demographics_dates"](
            pdf.copy(),
            base_metrics=["areaType", "areaCode", "date", "age"],
            nesting_param="age",
            frequency="D",
        )
        d = d.set_index(main_metrics)
        d = ns_n["normalise_demographics_records"](
            d,
            zero_filled=[m],
            cumulative=[],
            base_metrics=["areaType", "areaCode", "date", "age"],
            nesting_param="age",
        )
        ages = sorted({a for (c, a) in series if c == code})
        popdf = pd.DataFrame(
            {"population": [pops[(code, a)] for a in ages]},
            index=pd.MultiIndex.from_tuples(
                [(code, a) for a in ages], names=["areaCode", "age"]
            ),
        )
        d = ns_r["calculate_age_rates"](
            d, popdf, max_date=d.date.max(), rolling_rate=[m]
        )
        # the nested collapse (etl.py:1315-1320)
        collapsed = (
            d.groupby(main_metrics[:-1])
            .apply(lambda x: x.loc[:, out_fields].to_dict(orient="records"))
            .reset_index()
            .rename(columns={0: "nested"})
        )
        for _, r in collapsed.iterrows():
            key = (r["areaCode"], r["areaName"], r["date"])
            expected[key] = sorted(
                tuple(clean(rec[f]) for f in out_fields) for rec in r["nested"]
            )

    # ---- Spark leg: one multi-area frame through run_demographics ----
    rows = [
        ("ltla", code, f"{code}ton", dt, age, float(v))
        for (code, age), obs in sorted(series.items())
        for dt, v in sorted(obs.items())
    ]
    sdf = spark.createDataFrame(
        rows,
        f"areaType string, areaCode string, areaName string, date string, "
        f"age string, {m} double",
    )
    pop_sdf = spark.createDataFrame(
        [(c, a, p) for (c, a), p in pops.items()],
        "areaCode string, age string, population double",
    )
    out = run_demographics(
        sdf,
        nesting_param="age",
        value_metrics=[m],
        out_col="nested",
        population=pop_sdf,
        rolling_rate=[m],
        zero_filled=[m],
        frequency="D",
        rate_precision=1,
    )
    import pyspark.sql.functions as F

    out = out.withColumn("date", F.date_format("date", "yyyy-MM-dd"))
    got = {}
    for r in out.collect():
        key = (r["areaCode"], r["areaName"], r["date"])
        got[key] = sorted(
            tuple(rec[f] for f in out_fields) for rec in r["nested"]
        )
    assert set(got) == set(expected), (
        f"spark-only={sorted(set(got) - set(expected))[:6]} "
        f"ref-only={sorted(set(expected) - set(got))[:6]}"
    )
    bad = [
        (k, got[k], expected[k]) for k in sorted(got) if got[k] != expected[k]
    ]
    assert not bad, f"first mismatches: {bad[:4]}"


# ------------------------------------------------------ composed deploy chain


def test_to_long_store_matches_reference_deploy_chain(spark):
    """Load-side composed parity: the reference ``deploy`` value chain
    (db_etl_upload/uploader.py:546-646) replayed PER AREA — the
    camelCase->snake rename (the uploader's metric_names map,
    uploader.py:135-140), datetime coercion, melt, then trim_sides,
    format_weekly_metrics, and convert_values VERBATIM from the
    reference source, the null->None coercion, and the final dropna —
    against ``to_long_store`` over the multi-area wide panel. The
    DB-registry legs (validate_metrics, get_area_data ids, to_sql) and
    the row hash are out of scope here: the hash has its own
    reference-exec leg and the ids are infra.

    The fixture carries the three melt families that hide type bugs:
    a numeric metric with leading/trailing nulls (trim_sides bites), a
    Direction STRING metric (the mixed-type melt union path), and a
    weekly metric with interior nulls (format_weekly_metrics bites)."""
    from pandas import to_datetime

    from coronavirus_dashboard_pipeline_etl_spark.plans.main_pipeline import (
        to_long_store,
    )

    ns = _load_ref_functions(
        REF_UPLOADER,
        ["trim_sides", "format_weekly_metrics", "convert_values"],
        {"ndarray": np.ndarray},
    )
    ref_trim = ns["trim_sides"]
    ref_weekly = ns["format_weekly_metrics"]
    ref_convert = ns["convert_values"]
    # the uploader's column-rename map (uploader.py:135-140) — data,
    # not logic; replicated so the melt id_vars match the reference's
    rename_map = {"areaType": "area_type", "areaCode": "area_code"}

    dates = [f"2021-04-{i:02d}" for i in range(1, 11)]
    panel_rows = []
    for code, off in (("E1", 0.0), ("E2", 10.0)):
        for i, dt in enumerate(dates):
            cases = (
                None if i in (0, 1, 4, 8, 9) else float(i) + off
            )  # null head+tail -> trim_sides; INTERIOR null at i=4
            # survives both trims and must wrap as {"value": null}
            direction = (
                None if i in (0, 9) else ("UP" if i % 2 else "DOWN")
            )
            weekly = (
                None if i % 3 == 0 else 100.0 + i + off
            )  # interior nulls -> weekly dropna
            panel_rows.append(
                ("ltla", code, dt, cases, direction, weekly)
            )
    cols = [
        "areaType", "areaCode", "date",
        "newCases", "casesDirection", "weeklyVaccines",
    ]

    # ---- reference leg, per area (one deploy call per file) ----
    expected = {}
    for code in ("E1", "E2"):
        pdf = pd.DataFrame(
            [r for r in panel_rows if r[1] == code], columns=cols
        )
        d = pdf.assign(
            date=to_datetime(pdf.date, format="%Y-%m-%d"),
            release_id=7,
            partition_id="ltla",
        ).rename(columns=rename_map)
        d = d.melt(
            id_vars=[
                "area_type", "area_code", "date", "release_id",
                "partition_id",
            ],
            var_name="metric",
            value_name="payload",
        )
        d = d.reset_index(drop=True)
        d = ref_trim(d)
        d = ref_weekly(d)
        d.payload = d.payload.where(d.payload.notnull(), None)
        d.payload = d.payload.map(ref_convert)
        d = d.dropna(
            subset=["metric", "area_type", "area_code", "release_id", "date"],
            how="any",
        )
        for _, r in d.iterrows():
            key = (r["area_code"], r["metric"], f"{r['date']:%Y-%m-%d}")
            expected[key] = r["payload"]

    # ---- Spark leg: to_long_store over the multi-area panel ----
    sdf = spark.createDataFrame(
        panel_rows,
        "areaType string, areaCode string, date string, "
        "newCases double, casesDirection string, weeklyVaccines double",
    )
    out = to_long_store(sdf, release_id=7)
    import json as _json

    got = {}
    for r in out.collect():
        key = (r["area_code"], r["metric"], r["date"])
        got[key] = (
            None if r["payload"] is None else _json.loads(r["payload"])
        )
        assert r["release_id"] == 7
        assert r["partition_id"] == "ltla"
        assert r["hash"]  # keyed digest present (parity pinned in h1)
    assert set(got) == set(expected), (
        f"spark-only={sorted(set(got) - set(expected))[:6]} "
        f"ref-only={sorted(set(expected) - set(got))[:6]}"
    )
    bad = [
        (k, got[k], expected[k]) for k in sorted(got)
        if got[k] != expected[k]
    ]
    assert not bad, f"first payload mismatches: {bad[:6]}"
    # non-vacuity: every melt family must survive with real payloads
    kinds = {k[1] for k in got}
    assert kinds == {"newCases", "casesDirection", "weeklyVaccines"}
