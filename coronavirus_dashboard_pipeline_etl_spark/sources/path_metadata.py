"""Blob-path metadata parsing — the routing step that decides which
ETL category an incoming chunk file belongs to.

The reference parses each blob path with a single verbose regex and a
``data_<ts>.json`` fallback (``utilities/data_files.py:69-116``,
``filename_pattern`` / ``parse_filepath``) and then resolves the
process label from a ``(category, area_type[, subcategory])`` mapping
(``category_label``, ``category2process_name`` at
``utilities/data_files.py:27-67``).

Spark-first re-expression:

* the regex runs as codegen'd ``regexp_extract`` column expressions —
  per-file metadata becomes ordinary columns, so a 100k-blob listing
  parses in one zero-shuffle map over the listing frame (the reference
  parses one path per function call on the driver);
* the label mapping is a 15-row BROADCAST dimension joined null-safely
  on (category, area_type, subcategory), not a driver-side dict lookup
  — the idiomatic way to keep routing declarative and pushdown-friendly;
* ``with_input_file_metadata`` attaches the same columns to rows read
  straight from files via ``input_file_name()``, so a directory-glob
  read recovers the per-file routing the reference gets from its blob
  trigger payload.

Deviations from the reference, on purpose:

* empty captures come back as NULL, not ``''``/``None`` mixed (the
  reference's ``groupdict`` yields ``''`` for empty alternations and
  ``None`` for unmatched optionals; both are "absent" to
  ``category_label``, which tests falsiness);
* the reference's main-file fallback regex-searches a HARD-CODED
  example string (``utilities/data_files.py:90``:
  ``re.search(r"data_(\\d+).json", "data_202109301358.json")``), so
  every non-matching path parses as main @ 2021-09-30T13:58.  Here the
  fallback parses the ACTUAL path and a non-matching path yields NULL
  metadata (the reference's evident intent).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# Java-regex single-line form of the reference's verbose pattern
# (utilities/data_files.py:69-78).  Group order: prefix-date,
# area_type, category, subcategory, timestamp.  Verified to produce
# identical captures under Python re, Java regex, and DuckDB RE2 —
# including the backtracking split of category vs subcategory around
# the optional underscores.
FILENAME_PATTERN = (
    r"(?i)^([0-9-]{10})/(MSOA)?_?([a-z0-9-]*)_?([a-z0-9-]*)_"
    r"(\d{12})\.parquet$"
)
# main-data fallback (the intent of utilities/data_files.py:90-101)
MAIN_PATTERN = r"data_(\d{12})\.json$"

# flattened category2process_name (utilities/data_files.py:27-67):
# (category, area_type, subcategory) -> process label, NULL = absent.
# area_type is matched case-insensitively (the reference uppercases
# before the lookup); subcategory keys come from the nested dicts.
PROCESS_LABELS: tuple[tuple[str, str | None, str | None, str], ...] = (
    ("positivity", None, None, "POSITIVITY & PEOPLE TESTED"),
    ("healthcare", None, None, "HEALTHCARE"),
    ("tests", None, None, "TESTING: MAIN"),
    ("cases", None, None, "CASES: MAIN"),
    ("deaths", None, None, "DEATHS: MAIN"),
    ("main", None, None, "MAIN"),
    ("msoa", None, None, "MSOA"),
    ("cases-by-specimen-date", "MSOA", None, "MSOA"),
    (
        "vaccinations-by-vaccination-date", "MSOA", None,
        "MSOA: VACCINATION - EVENT DATE",
    ),
    (
        "cases-by-specimen-date", None, "age-demographics",
        "AGE DEMOGRAPHICS: CASE - EVENT DATE",
    ),
    (
        "deaths28days-by-death-date", None, "age-demographics",
        "AGE-DEMOGRAPHICS: DEATH28DAYS - EVENT DATE",
    ),
    (
        "vaccinations-by-vaccination-date", None, "age-demographics",
        "AGE-DEMOGRAPHICS: VACCINATION - EVENT DATE",
    ),
    (
        "first-episodes-by-specimen-date", None, "age-demographics",
        "AGE-DEMOGRAPHICS: CASES - FIRST EPISODES",
    ),
    (
        "reinfections-by-specimen-date", None, "age-demographics",
        "AGE-DEMOGRAPHICS: CASES - REINFECTIONS",
    ),
    ("variants", None, "episodes", "EPISODE VARIANTS - EPISODES"),
)

_META_COLS = ("date", "area_type", "category", "subcategory", "timestamp")


def _nullif_empty(c: Column) -> Column:
    return F.when(c != "", c)


def parse_filepaths(
    df: DataFrame, path_col: str = "path", prefix: str = ""
) -> DataFrame:
    """Append (date, area_type, category, subcategory, timestamp)
    parsed from ``path_col`` — parity with the reference's
    ``parse_filepath`` (utilities/data_files.py:89-116), as pure
    column expressions (zero shuffle, fuses into the input's codegen
    stage).

    ``timestamp`` keeps the reference's surface form: the raw 12-digit
    stamp for pattern files, ISO-8601 for the ``data_*.json`` main
    fallback.  Unparseable paths get NULLs in every metadata column.
    ``prefix`` renames the outputs (``prefix + name``) when the frame
    already carries e.g. a ``date`` column.
    """
    p = F.col(path_col)

    def g(i: int) -> Column:
        return F.regexp_extract(p, FILENAME_PATTERN, i)

    matched = g(5) != ""  # timestamp group is non-empty iff matched
    main_ts = F.regexp_extract(p, MAIN_PATTERN, 1)
    is_main = main_ts != ""
    main_t = F.to_timestamp(main_ts, "yyyyMMddHHmm")
    out = {
        "date": F.when(matched, g(1)).when(
            is_main, F.date_format(main_t, "yyyy-MM-dd")
        ),
        "area_type": F.when(matched, _nullif_empty(g(2))),
        "category": F.when(matched, _nullif_empty(g(3))).when(
            is_main, F.lit("main")
        ),
        "subcategory": F.when(matched, _nullif_empty(g(4))),
        "timestamp": F.when(matched, g(5)).when(
            is_main, F.date_format(main_t, "yyyy-MM-dd'T'HH:mm:ss")
        ),
    }
    return df.select(
        "*", *[out[name].alias(prefix + name) for name in _META_COLS]
    )


def with_input_file_metadata(df: DataFrame, prefix: str = "") -> DataFrame:
    """Attach the parsed path metadata of each row's SOURCE FILE —
    ``input_file_name()`` + ``parse_filepaths`` — so a directory-glob
    ``spark.read`` recovers per-file routing (the reference receives
    one blob path per trigger invocation; a Spark job reads the whole
    listing at once and needs the path back as data).

    The full URI is exposed as ``source_path``; metadata columns parse
    from the path's last two segments (the reference's pattern anchors
    on ``date-dir/filename``).
    """
    tail = F.regexp_extract(
        F.input_file_name(), r"([^/]+/[^/]+)$", 1
    )
    with_path = df.select(
        "*",
        F.input_file_name().alias(prefix + "source_path"),
        tail.alias("__path_tail"),
    )
    return parse_filepaths(with_path, "__path_tail", prefix).drop(
        "__path_tail"
    )


def process_label_dim(spark: SparkSession) -> DataFrame:
    """The category->process mapping as a 15-row dimension frame
    (category, area_type, subcategory, process_name)."""
    return spark.createDataFrame(
        list(PROCESS_LABELS),
        "category string, area_type string, subcategory string, "
        "process_name string",
    )


def with_process_label(
    parsed: DataFrame,
    spark: SparkSession | None = None,
    prefix: str = "",
) -> DataFrame:
    """Resolve each parsed path's process label — parity with
    ``category_label`` (utilities/data_files.py:118-130) as ONE
    broadcast join instead of a per-row dict lookup.

    Reference lookup order re-expressed: the key is
    (category or 'main', upper(area_type), subcategory); rows whose
    key has no mapping get NULL ``process_name`` (the reference
    raises KeyError — at scale a poison path must not kill the batch,
    so unmapped rows survive for the caller to quarantine).
    """
    spark = spark or parsed.sparkSession
    dim = F.broadcast(
        process_label_dim(spark).select(
            F.col("category").alias("__m_cat"),
            F.upper("area_type").alias("__m_area"),
            F.col("subcategory").alias("__m_sub"),
            "process_name",
        )
    )
    # category-or-'main' only for rows that PARSED (timestamp present);
    # an unparseable path must not inherit the MAIN label
    cat = F.when(
        F.col(prefix + "timestamp").isNotNull(),
        F.coalesce(F.col(prefix + "category"), F.lit("main")),
    )
    area = F.upper(F.col(prefix + "area_type"))
    sub = F.col(prefix + "subcategory")
    joined = parsed.join(
        dim,
        cat.eqNullSafe(F.col("__m_cat"))
        & area.eqNullSafe(F.col("__m_area"))
        & sub.eqNullSafe(F.col("__m_sub")),
        "left",
    )
    return joined.drop("__m_cat", "__m_area", "__m_sub")
