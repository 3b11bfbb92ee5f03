from meerkat_abacus_spark.operators.coding import Rule, compile_rule_test, code_dataframe
from meerkat_abacus_spark.operators import quality_control
from meerkat_abacus_spark.operators.to_data_type import DataTypeSpec, fan_out_data_types
from meerkat_abacus_spark.operators.links import LinkDef, add_links
from meerkat_abacus_spark.operators.initial_visit import initial_visit_control
from meerkat_abacus_spark.operators import alerts
from meerkat_abacus_spark.operators.locations import flatten_location_hierarchy

__all__ = [
    "Rule",
    "compile_rule_test",
    "code_dataframe",
    "quality_control",
    "DataTypeSpec",
    "fan_out_data_types",
    "LinkDef",
    "add_links",
    "initial_visit_control",
    "alerts",
    "flatten_location_hierarchy",
]
