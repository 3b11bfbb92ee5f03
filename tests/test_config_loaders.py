"""Config loaders parse the reference's exact CSV formats (FIXTURES.md §2)."""

import json

from meerkat_abacus_spark.config.loaders import (
    load_calculation_parameters,
    load_data_types_csv,
    load_links_csv,
    load_rules_csv,
)

CODES_CSV = """id,name,type,form,multiple_link,db_column,alert,alert_type,method,condition,category,calculation,disregard,calculation_group,calculation_priority,classification_casedef,source,source_link,alert_desc,case_def,risk_factors,symptoms,labs_diagnostics,,
submission_date,Submission Date,case,demo_case,,SubmissionDate,,,value,,,date,,,,,,,,,,,,,
gen_1,Male,case,demo_case,,pt1./gender,,,match,male,"gender,demo",,,gender,,,,,,,,,,,
age_1,Age 0-5,case,demo_case,,pt1./age,,,between,"0,5",,pt1./age,,,,,,,,,,,,,
cmd_1,Cholera,case,demo_case,,icd_code,1,individual,match,A00,,,1,,,,,,,,,,,,
ale_1,Investigated,case,alert_investigation,last,alert_labs./return_lab,,,value,,,,,,,,,,,,,,,,
vgen_1,Priority rule,case,demo_case,,x,,,match,hit,,,,grp,2,,,,,,,,,,
"""

LINKS_CSV = """name,type,to_form,from_form,from_column,to_column,method,order_by,uuid,to_condition,aggregate_condition
alert_investigation,Case,demo_alert,demo_case,meta/instanceID,pt./alert_id,alert_match,SubmissionDate;date,meta/instanceID,,
return_visit,Case,demo_case,demo_case,pt./pid;icd_code,pt./pid;icd_code,match;match,pt./visit_date;date,meta/instanceID,intro./visit:return,
"""

DATA_TYPES_CSV = '''"name","type","form","db_column","condition","date","var","uuid","location","multiple_row"
"Case","case","demo_case","intro./visit","new","pt./visit_date","tot_1","meta/instanceID","deviceid",
"Register","register","demo_register",,,"SubmissionDate","reg_1","meta/instanceID","deviceid",
'''


def test_load_rules(tmp_path):
    p = tmp_path / "codes.csv"
    p.write_text(CODES_CSV)
    rules = {r.id: r for r in load_rules_csv(p)}
    assert len(rules) == 6
    assert rules["submission_date"].method == "value"
    assert rules["submission_date"].calculation == "date"
    assert rules["gen_1"].category == ["gender", "demo"]
    assert rules["gen_1"].calculation_group == "gender"
    assert rules["age_1"].condition == "0,5"
    assert rules["cmd_1"].alert and rules["cmd_1"].alert_type == "individual"
    assert rules["cmd_1"].disregard is True
    assert rules["ale_1"].multiple_link == "last"
    assert rules["ale_1"].form == "alert_investigation"
    assert rules["vgen_1"].calculation_priority == 2


def test_load_links(tmp_path):
    p = tmp_path / "links.csv"
    p.write_text(LINKS_CSV)
    links = {l.name: l for l in load_links_csv(p)}
    assert links["alert_investigation"].method == "alert_match"
    assert links["return_visit"].from_column == "pt./pid;icd_code"
    assert links["return_visit"].to_condition == "intro./visit:return"


def test_load_data_types(tmp_path):
    p = tmp_path / "dt.csv"
    p.write_text(DATA_TYPES_CSV)
    specs = {s.name: s for s in load_data_types_csv(p)}
    assert specs["Case"].condition == "new" and specs["Case"].var == "tot_1"
    assert specs["Register"].db_column is None and specs["Register"].condition is None


def test_load_calculation_parameters(tmp_path):
    (tmp_path / "vaccination_vials.json").write_text(
        json.dumps({"bcg": {"doses": 20}})
    )
    params = load_calculation_parameters(tmp_path)
    assert params["vaccination_vials"]["bcg"]["doses"] == 20


def test_load_geojson_polygons(tmp_path, spark):
    from meerkat_abacus_spark.operators.geo import locate_points

    geo = {
        "type": "FeatureCollection",
        "features": [
            {"type": "Feature",
             "geometry": {"type": "Polygon",
                          "coordinates": [[[0, 0], [0, 4], [4, 4], [4, 0], [0, 0]]]},
             "properties": {"Name": "Demo"}},
            {"type": "Feature",
             "geometry": {"type": "MultiPolygon",
                          "coordinates": [[[[10, 10], [10, 12], [12, 12], [12, 10], [10, 10]]]]},
             "properties": {"Name": "Island"}},
        ],
    }
    p = tmp_path / "geo.json"
    p.write_text(json.dumps(geo))
    from meerkat_abacus_spark.config.loaders import load_geojson_polygons

    rows = load_geojson_polygons(p)
    assert [r["name"] for r in rows] == ["Demo", "Island"]

    polys = spark.createDataFrame(
        rows, "name string, priority int, vertices array<struct<x:double,y:double>>"
    )
    pts = spark.createDataFrame(
        [(1, 2.0, 2.0), (2, 11.0, 11.0), (3, 50.0, 50.0)], ["id", "x", "y"]
    )
    located = {
        r["id"]: r["located_in"]
        for r in locate_points(pts, polys, point_id_col="id",
                               poly_priority_col="priority").collect()
    }
    assert located == {1: "Demo", 2: "Island", 3: None}


def test_attach_device_tags(spark):
    from meerkat_abacus_spark.operators.locations import attach_device_tags

    df = spark.createDataFrame([("u1", "d1"), ("u2", "d9")], ["uuid", "deviceid"])
    devices = spark.createDataFrame(
        [("d1", "refugee_camp")], ["deviceid", "tags"]
    )
    out = {r["uuid"]: r["tags"] for r in attach_device_tags(df, devices).collect()}
    assert out == {"u1": "refugee_camp", "u2": None}


def test_reader_option_surfaces():
    """S2/S3 cannot be exercised in the sandbox (no S3 endpoint, no DB);
    the option builders are the testable seam — the readers are the same
    code pointed at s3a:// / jdbc: URIs (round-2 verdict #10)."""
    from meerkat_abacus_spark.sources.batch import (
        csv_reader_options,
        jdbc_reader_options,
    )

    assert csv_reader_options() == {
        "header": "true", "multiLine": "false", "inferSchema": "false",
    }
    assert csv_reader_options(multiline=True)["multiLine"] == "true"

    plain = jdbc_reader_options("jdbc:postgresql://db/meerkat", "data")
    assert plain == {"url": "jdbc:postgresql://db/meerkat", "dbtable": "data"}
    assert "partitionColumn" not in plain

    parted = jdbc_reader_options(
        "jdbc:postgresql://db/meerkat", "data",
        partition_column="id", num_partitions=16,
        lower_bound=5, upper_bound=500,
        properties={"user": "abacus", "fetchsize": 10000},
    )
    assert parted["partitionColumn"] == "id"
    assert parted["numPartitions"] == "16"
    assert parted["lowerBound"] == "5"
    assert parted["upperBound"] == "500"
    assert parted["user"] == "abacus"
    assert parted["fetchsize"] == "10000"
