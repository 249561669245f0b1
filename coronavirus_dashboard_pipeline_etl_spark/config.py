"""Metric-set registry — the config layer replacing the reference's
hard-coded constant sets (``db_etl/etl.py:83-516``).

The reference configures *which operator applies to which column* through
module-level frozensets (VALUE_COLUMNS, ROLLING_RATE, NEGATIVE_TO_ZERO,
FILL_WITH_ZEROS, START_WITH_ZERO, SUM_CHANGE_DIRECTION, RATIO2PERCENTAGE,
TRIM_END, INCIDENCE_RATE_FIELDS, OUTLIERS...). We keep the same shape —
plain data, no behaviour — so pipelines stay config-driven and new metrics
can be registered without code changes (the reference auto-registers
unknown metrics at load time, ``db_etl_upload/uploader.py:339-350``).

Every operator takes ``set(metrics) & set(df.columns)`` guards exactly like
the reference (``db_etl/processors/rolling.py:100``), so a pipeline run
with a subset of metrics present is always valid.
"""

from __future__ import annotations

from dataclasses import dataclass, field

# Canonical panel key — sort order asc, asc, desc on date in the reference
# (db_etl/etl.py:272-275).
PANEL_KEYS = ["areaType", "areaCode", "areaName", "date"]
GROUP_KEYS = ["areaType", "areaCode"]

# areaType domain (db_etl/etl.py:260-268) + plural->singular rename map
# (main_etl_retrieve_data/retrieve.py:61-67).
AREA_TYPES = [
    "overview",
    "nation",
    "region",
    "nhsRegion",
    "nhsTrust",
    "utla",
    "ltla",
    "msoa",
]
AREA_TYPE_RENAMES = {
    "nations": "nation",
    "regions": "region",
    "nhsRegions": "nhsRegion",
    "nhsTrusts": "nhsTrust",
    "utlas": "utla",
    "ltlas": "ltla",
    "msoas": "msoa",
    "overview": "overview",
}

# Rates are per-100k and rounded to 1 dp (db_etl/processors/generic_rate.py:100-105,
# RATE_PRECISION db_etl/etl.py:478).
RATE_PER = 100_000
RATE_PRECISION = 1

# Event-date metrics are masked for the trailing N days (db_etl/processors/
# trimmer.py:40-50; generic_rate.py:59-60).
TAIL_TRIM_DAYS = 5

# MSOA small-count disclosure control (msoa_etl_db/processor.py:279-281, 211-226).
MSOA_MIN_SUM_ALLOWED = 3
MSOA_MIN_SUM_SUB = 2
MSOA_SUPPRESS_AT_OR_BELOW = 2

# Derived-column suffixes produced by the rolling family
# (db_etl/processors/rolling.py:132-201).
SUFFIX_ROLLING_SUM = "RollingSum"
SUFFIX_ROLLING_RATE = "RollingRate"
SUFFIX_CHANGE = "Change"
SUFFIX_DIRECTION = "Direction"
SUFFIX_CHANGE_PERCENTAGE = "ChangePercentage"

ROLLING_WINDOW = 7  # rolling(7) everywhere (rolling.py:132-144)
CHANGE_PERIOD = 7  # diff(periods=7)   (rolling.py:173-189)


@dataclass(frozen=True)
class MetricConfig:
    """Which operator family applies to which metric columns.

    Mirrors the constant sets in db_etl/etl.py:83-516 but is an instance,
    so tests and alternate deployments can carry their own registry.
    """

    # metrics that get RollingSum/Change/Direction/ChangePercentage
    sum_change_direction: frozenset[str] = frozenset()
    # metrics that additionally get a per-100k RollingRate
    rolling_rate: frozenset[str] = frozenset()
    # incidence-rate style: direct per-100k rate of the raw value
    incidence_rate: frozenset[str] = frozenset()
    # clip negatives to zero (db_etl/etl.py:925-935)
    negative_to_zero: frozenset[str] = frozenset()
    # zero-fill within observed range (normalisation.py:58-66)
    fill_with_zeros: frozenset[str] = frozenset()
    # cumulative metrics: ffill within valid range (normalisation.py:75-84)
    start_with_zero: frozenset[str] = frozenset()
    # ratio -> percentage (*100) (db_etl/etl.py:461-463)
    ratio_to_percentage: frozenset[str] = frozenset()
    # mask trailing TAIL_TRIM_DAYS (db_etl/etl.py:466-472)
    trim_end: frozenset[str] = frozenset()
    # (a, b) -> out pair summations, null unless both present
    # (db_etl/processors/derived_metrics.py:104-136)
    pair_sums: tuple[tuple[str, str, str], ...] = ()
    # adjacent-column fill: fill col a's latest-date NaN with per-area max
    # of col b (derived_metrics.py:58-98): (target, adjacent)
    adjacent_fill: tuple[tuple[str, str], ...] = ()


DEFAULT_METRICS = MetricConfig(
    sum_change_direction=frozenset(
        {
            "newCasesBySpecimenDate",
            "newCasesByPublishDate",
            "newDeaths28DaysByDeathDate",
            "newDeaths28DaysByPublishDate",
            "newAdmissions",
            "newVirusTestsByPublishDate",
            "newPCRTestsByPublishDate",
        }
    ),
    rolling_rate=frozenset(
        {
            "newCasesBySpecimenDate",
            "newCasesByPublishDate",
            "newDeaths28DaysByDeathDate",
            "newAdmissions",
        }
    ),
    incidence_rate=frozenset({"cumCasesBySpecimenDate", "cumDeaths28DaysByDeathDate"}),
    negative_to_zero=frozenset(
        {"newCasesBySpecimenDate", "newCasesByPublishDate", "newAdmissions"}
    ),
    fill_with_zeros=frozenset(
        {"newCasesBySpecimenDate", "newCasesByPublishDate", "newDeaths28DaysByDeathDate"}
    ),
    start_with_zero=frozenset(
        {"cumCasesBySpecimenDate", "cumDeaths28DaysByDeathDate", "cumAdmissions"}
    ),
    ratio_to_percentage=frozenset({"uniqueCasePositivityBySpecimenDateRollingSum"}),
    trim_end=frozenset({"newCasesBySpecimenDate", "newDeaths28DaysByDeathDate"}),
    pair_sums=(
        (
            "newPillarOneTestsByPublishDate",
            "newPillarTwoTestsByPublishDate",
            "newPillarOneTwoTestsByPublishDate",
        ),
    ),
    adjacent_fill=(("cumAdmissions", "cumAdmissionsByAge"),),
)
