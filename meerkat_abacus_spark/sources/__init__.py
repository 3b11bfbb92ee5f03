from meerkat_abacus_spark.sources.batch import (
    read_form_csv,
    read_form_parquet,
    read_form_jdbc,
)
from meerkat_abacus_spark.sources.fake_data import generate_form

__all__ = [
    "read_form_csv",
    "read_form_parquet",
    "read_form_jdbc",
    "generate_form",
]
