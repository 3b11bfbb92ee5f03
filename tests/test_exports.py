"""G3 groupify re-nesting + K5 aggregate payload + S5 extended field specs."""

import json

from meerkat_abacus_spark.operators.exports import (
    aggregate_submission_payload,
    nest_groups,
)
from meerkat_abacus_spark.sources.fake_data import generate_form


def test_nest_groups_structs_and_order(spark):
    df = spark.createDataFrame(
        [("u1", "male", "34", "icd10", "2024-01-01T00:00:00")],
        ["meta/instanceID", "pt./gender", "pt./age", "icd_code", "SubmissionDate"],
    )
    out = nest_groups(df)
    # group struct appears at the position of its first member; columns
    # without a "./" separator (incl. meta/instanceID — slash but no dot)
    # stay flat, like the reference's `"./" in key` test
    # (util/__init__.py:405-419)
    assert out.columns == ["meta/instanceID", "pt", "icd_code", "SubmissionDate"]
    row = out.first()
    assert row["pt"]["gender"] == "male" and row["pt"]["age"] == "34"
    assert row["meta/instanceID"] == "u1"
    assert row["icd_code"] == "icd10"


def test_aggregate_submission_payload(spark):
    df = spark.createDataFrame(
        [("uuid:1", "male", "2024-01-01T00:00:00", "clinic_a")],
        ["meta/instanceID", "pt./gender", "SubmissionDate", "clinic"],
    )
    out = aggregate_submission_payload(df, "demo_case")
    assert out.columns == ["uuid", "payload"]
    row = out.first()
    assert row["uuid"] == "uuid:1"
    doc = json.loads(row["payload"])
    # envelope dropped, form id tagged, groups nested
    # (util/__init__.py:422-434)
    assert doc["@id"] == "demo_case"
    assert doc["pt"] == {"gender": "male"}
    assert doc["clinic"] == "clinic_a"
    assert "SubmissionDate" not in doc and "meta" not in doc


def test_fake_data_extended_specs(spark):
    df = generate_form(
        spark,
        200,
        {
            "score": {"range": [0.5, 2.5]},
            "symptoms": {"multiple-spaces": ["cough", "fever", "rash"]},
            "icd_ref": {"data": ["A00", "B01"]},
            "empty_ref": {"data": []},
        },
        seed=7,
    )
    rows = df.collect()
    assert len(rows) == 200
    scores = [float(r["score"]) for r in rows]
    assert all(0.5 <= s <= 2.5 for s in scores)
    assert len(set(round(s, 3) for s in scores)) > 50  # continuous, not binned
    for r in rows:
        assert set(r["symptoms"].split()) <= {"cough", "fever", "rash"}
        assert r["icd_ref"] in ("A00", "B01")
        assert r["empty_ref"] is None
    # deterministic under the same seed + same spec set (per-field seed
    # offsets are positional over the sorted field names)
    again = generate_form(
        spark,
        200,
        {
            "score": {"range": [0.5, 2.5]},
            "symptoms": {"multiple-spaces": ["cough", "fever", "rash"]},
            "icd_ref": {"data": ["A00", "B01"]},
            "empty_ref": {"data": []},
        },
        seed=7,
    ).collect()
    assert [r["score"] for r in again] == [r["score"] for r in rows]
