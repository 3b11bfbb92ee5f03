from meerkat_abacus_spark.functions.epi_week import (
    epi_week_columns,
    epi_year_start_col,
    epi_week_duckdb_sql,
)
from meerkat_abacus_spark.functions.dates import (
    parse_multiformat_timestamp,
    MULTIFORMAT_PATTERNS,
)
from meerkat_abacus_spark.functions.calculation import translate_calculation

__all__ = [
    "epi_week_columns",
    "epi_year_start_col",
    "epi_week_duckdb_sql",
    "parse_multiformat_timestamp",
    "MULTIFORMAT_PATTERNS",
    "translate_calculation",
]
