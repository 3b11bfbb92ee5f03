from meerkat_abacus_spark.config.loaders import (
    load_rules_csv,
    load_links_csv,
    load_data_types_csv,
    load_calculation_parameters,
)

__all__ = [
    "load_rules_csv",
    "load_links_csv",
    "load_data_types_csv",
    "load_calculation_parameters",
]
