"""Parity check against the reference's own demo configuration.

Loads the real demo codes CSVs, links CSV, and data_types CSV from
/root/reference (read-only config data, skipped when absent), compiles
every rule through this engine, and runs the full coding projection over
the reference's manual test fixture (demo_case_test_data.csv) — proving the
plan compiler digests the production-shaped config corpus, not just
hand-picked samples.
"""

import os

import pytest
from pyspark.sql import functions as F

from meerkat_abacus_spark.config.loaders import (
    load_data_types_csv,
    load_links_csv,
    load_rules_csv,
)
from meerkat_abacus_spark.operators.coding import code_dataframe
from meerkat_abacus_spark.sources.batch import read_form_csv

REF = "/root/reference/meerkat_abacus/country_config"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference config not available"
)


def _demo_rules():
    rules = load_rules_csv(f"{REF}/variable_codes/demo_codes.csv")
    rules += load_rules_csv(f"{REF}/variable_codes/demographic_codes.csv")
    return rules


def test_demo_codes_all_compile_and_run(spark):
    rules = _demo_rules()
    assert len(rules) > 150  # 169 + 29 logical rows (757 physical lines)

    # case-type, non-link rules run against the demo_case fixture
    case_rules = [
        r for r in rules
        if r.type == "case" and not r.multiple_link and r.form == "demo_case"
    ]
    assert len(case_rules) > 100

    form = read_form_csv(spark, f"{REF}/demo_case_test_data.csv")
    coded = code_dataframe(form, case_rules)
    rows = coded.select(
        F.col("`meta/instanceID`").alias("uuid"),
        "variables", "categories", "alert",
    ).collect()
    assert rows, "fixture should produce rows"

    # sanity: demographic coding fires — every row with a gender cell gets
    # exactly one gender variable, and categories track the winner
    gendered = [
        r for r in rows if r["variables"].keys() & {"gen_1", "gen_2"}
    ]
    assert gendered
    for r in gendered:
        assert ("gen_1" in r["variables"]) != ("gen_2" in r["variables"])

    # at least one rule family of each method class produced output somewhere
    all_vars = set().union(*[set(r["variables"].keys()) for r in rows])
    assert any(v.startswith("age_") for v in all_vars)   # between (grouped)
    assert any(v.startswith("lab_") for v in all_vars)   # between w/ calc
    assert any(v.startswith("mod_") for v in all_vars)   # sub_match
    assert "submission_date" in all_vars                 # value/date


def test_demo_links_and_data_types_load(spark):
    links = load_links_csv(f"{REF}/demo_links.csv")
    names = {l.name for l in links}
    assert {"alert_investigation", "return_visit", "initial_visit"} <= names

    specs = load_data_types_csv(f"{REF}/data_types.csv")
    by_name = {s.name: s for s in specs}
    assert by_name["Case"].condition == "new"
    assert by_name["Case"].var == "tot_1"
    assert by_name["Visit"].form == "demo_case"
