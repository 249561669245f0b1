"""Row math over nested age-array cells (SURVEY.md §2.8).

The reference carries demographics as list-of-dict cells — one array of
``{age, value, ...}`` records per (area, date) row — and does per-row
Python over them:

* ``calculate_pair_tested`` (``db_etl/etl.py:760-799``): element-wise sum
  of two age arrays (e.g. male + female tested) with a rate per 100k
  against the per-(area, age) population lookup; the whole result is
  null when either side is missing.
* ``process_outlier`` (``db_etl/etl.py:678-711``): enrich each entry of
  a nested cell with ``rate = value / population[age] * 100k``.
* ``calculate_sex_people_tested`` (``db_etl/etl.py:784-799``): apply the
  pair op for several named pairs in one pass.

Spark shape: the cells are typed ``array<struct>`` columns, so both ops
are pure JVM higher-order functions — ``array_sort`` (align by age) +
``zip_with`` / ``transform`` with ``withField`` — no Python, no extra
shuffle. The population lookup becomes a broadcast-joined
``map<age, population>`` per area (``map_from_entries``), so entry-level
access is an O(1) map probe inside the HOF lambda. At 100 TB the
population dim is tiny (areas × bands) — broadcast is always right.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, functions as F

from ..config import RATE_PER, RATE_PRECISION

_POP_MAP = "__pop_map"


def _with_population_map(
    df: DataFrame,
    population: DataFrame,
    area_key: str,
    age_field: str,
    pop_field: str = "population",
) -> DataFrame:
    """Broadcast-join a per-area ``map<age, population>`` column.

    ``population``: (area_key, age_field, pop_field) dimension rows —
    the Spark form of the reference's ``get_population_set`` dictionary
    lookup (``db_etl/etl.py:646-674``).
    """
    maps = population.groupBy(area_key).agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col(age_field), F.col(pop_field)))
        ).alias(_POP_MAP)
    )
    return df.join(F.broadcast(maps), area_key, "left")


def _age_comparator(age_field: str):
    def cmp(left: Column, right: Column) -> Column:
        return (
            F.when(left[age_field] < right[age_field], F.lit(-1))
            .when(left[age_field] > right[age_field], F.lit(1))
            .otherwise(F.lit(0))
        )

    return cmp


def calculate_pair_tested(
    df: DataFrame,
    pair: Sequence[str],
    out: str,
    population: DataFrame | None = None,
    area_key: str = "areaCode",
    age_field: str = "age",
    value_field: str = "value",
    rate_field: str = "rate",
    rate_factor: float = RATE_PER,
    precision: int | None = RATE_PRECISION,
    population_attached: bool = False,
) -> DataFrame:
    """Element-wise pair sum of two nested age arrays with rate per 100k.

    Reference ``calculate_pair_tested`` (``db_etl/etl.py:760-781``): sort
    both arrays by age, zip them, ``value = a.value + b.value``,
    ``rate = round(value / population[age] * 100k, 1)``; the result is
    NULL for the whole row when either input cell is missing (the
    reference's ``dropna`` guard). ``precision=None`` skips rounding
    (used by the oracle gates — engines round doubles differently).

    ``population_attached=True`` says the population MAP column is
    already joined (and stays for the caller to drop) — multi-pair
    callers attach it once instead of paying one groupBy + broadcast
    join per pair.
    """
    a_col, b_col = pair
    cmp = _age_comparator(age_field)
    a_sorted = F.array_sort(F.col(a_col), cmp)
    b_sorted = F.array_sort(F.col(b_col), cmp)

    use_pop = population is not None or population_attached
    if population is not None and not population_attached:
        df = _with_population_map(df, population, area_key, age_field)
    pop_map = F.col(_POP_MAP)

    def pair_entry(x: Column, y: Column) -> Column:
        new_val = x[value_field] + y[value_field]
        entry = x.withField(value_field, new_val)
        if use_pop:
            rate = new_val.cast("double") / pop_map[x[age_field]] * F.lit(
                float(rate_factor)
            )
            if precision is not None:
                rate = F.round(rate, precision)
            entry = entry.withField(rate_field, rate)
        return entry

    paired = F.when(
        F.col(a_col).isNotNull() & F.col(b_col).isNotNull(),
        F.zip_with(a_sorted, b_sorted, pair_entry),
    )
    result = df.withColumn(out, paired)
    if population is not None and not population_attached:
        result = result.drop(_POP_MAP)
    return result


def calculate_sex_people_tested(
    df: DataFrame,
    population: DataFrame | None = None,
    pairs: Mapping[str, Sequence[str]] | None = None,
    area_key: str = "areaCode",
    age_field: str = "age",
    **kwargs,
) -> DataFrame:
    """Apply ``calculate_pair_tested`` for several named pairs
    (reference ``calculate_sex_people_tested``, ``db_etl/etl.py:784-799``,
    e.g. ``peopleTested=(maleTested, femaleTested)``).

    The population map joins ONCE for all pairs (previously each pair
    re-ran the map's groupBy + broadcast join and dropped the column —
    n identical dimension aggregations where one suffices)."""
    if population is not None and pairs:
        df = _with_population_map(df, population, area_key, age_field)
    for out, pair in (pairs or {}).items():
        df = calculate_pair_tested(
            df,
            pair,
            out,
            population=population,
            area_key=area_key,
            age_field=age_field,
            population_attached=population is not None,
            **kwargs,
        )
    if population is not None and pairs:
        df = df.drop(_POP_MAP)
    return df


def enrich_nested_rates(
    df: DataFrame,
    nested_col: str,
    population: DataFrame,
    out: str | None = None,
    area_key: str = "areaCode",
    age_field: str = "age",
    value_field: str = "value",
    rate_field: str = "rate",
    rate_factor: float = RATE_PER,
    precision: int | None = RATE_PRECISION,
) -> DataFrame:
    """Add ``rate = value / population[age] * 100k`` to every entry of a
    nested age-array cell.

    Reference ``process_outlier`` (``db_etl/etl.py:678-711``): the
    per-date nesting half is ``nest_records``; this is the rate
    enrichment half, as a ``transform`` + ``withField`` over the typed
    array — areas with no population rows get a NULL rate (the
    reference skips the key entirely; a typed struct keeps the field,
    nulled)."""
    df = _with_population_map(df, population, area_key, age_field)
    pop_map = F.col(_POP_MAP)

    def add_rate(x: Column) -> Column:
        rate = x[value_field].cast("double") / pop_map[x[age_field]] * F.lit(
            float(rate_factor)
        )
        if precision is not None:
            rate = F.round(rate, precision)
        return x.withField(rate_field, F.when(pop_map.isNotNull(), rate))

    return df.withColumn(
        out or nested_col, F.transform(F.col(nested_col), add_rate)
    ).drop(_POP_MAP)
