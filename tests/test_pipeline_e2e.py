"""End-to-end surveillance pipeline over deterministic fake data: the full
reference lifecycle (SURVEY.md §3.1) — QC → fan-out → links → coding →
epi-week — as one composed plan."""

from pyspark.sql import functions as F

from meerkat_abacus_spark.operators.coding import Rule
from meerkat_abacus_spark.operators.links import LinkDef
from meerkat_abacus_spark.operators.to_data_type import DataTypeSpec
from meerkat_abacus_spark.plans.pipeline import surveillance_pipeline
from meerkat_abacus_spark.sources.fake_data import generate_form

FIELDS = {
    "intro./visit": {"one": ["new", "return", "referral"]},
    "intro./module": {"one": ["cd", "ncd", "mh"]},
    "pt./pid": {"patient_id": 40},
    "icd_code": {"one": ["A00", "B05.3", "E10"]},
    "pt1./age": {"integer": [0, 120]},
    "pt1./gender": {"one": ["male", "female"]},
    "deviceid": {"one": ["1", "2", "3", "4", "5", "6", "7"]},
    "SubmissionDate": {"date": ["2017-01-01", "2017-12-31"]},
    "pt./visit_date": {"date": ["2017-01-01", "2017-12-31"]},
}

DATA_TYPES = [
    DataTypeSpec(name="Case", type="case", form="demo_case",
                 db_column="intro./visit", condition="new",
                 date="pt./visit_date", var="tot_1"),
    DataTypeSpec(name="Visit", type="visit", form="demo_case",
                 date="pt./visit_date", var="vis_1"),
]

LINKS = [
    LinkDef(name="return_visit", type="case", to_form="demo_case",
            from_form="demo_case", from_column="pt./pid;icd_code",
            to_column="pt./pid;icd_code", method="match;match",
            order_by="pt./visit_date;date", uuid="meta/instanceID",
            to_condition="intro./visit:return"),
]

RULES = [
    Rule(id="gen_1", method="match", db_column="pt1./gender", condition="male",
         category=["gender"], calculation_group="gender", type="case"),
    Rule(id="gen_2", method="match", db_column="pt1./gender", condition="female",
         category=["gender"], calculation_group="gender", type="case"),
    Rule(id="age_1", method="between", db_column="pt1./age", condition="0,5",
         calculation="pt1./age", type="case"),
    Rule(id="cmd_1", method="match", db_column="icd_code", condition="A00",
         alert=True, alert_type="individual", type="case"),
    Rule(id="ret_1", method="value", db_column="meta/instanceID", condition="",
         multiple_link="count", form="return_visit", type="case"),
]


def test_pipeline_end_to_end(spark):
    form = generate_form(spark, 300, FIELDS, seed=7)
    data = surveillance_pipeline(
        {"demo_case": form}, DATA_TYPES, RULES, LINKS, epi_config="day:0"
    )
    rows = data.collect()

    n_new = form.filter(F.col("`intro./visit`") == "new").count()
    # Case rows = 'new' submissions; Visit rows = everything
    assert len(rows) == n_new + form.count()

    cases = [r for r in rows if r["type"] == "case"]
    visits = [r for r in rows if r["type"] == "visit"]
    assert len(cases) == n_new and len(visits) == form.count()

    for r in cases:
        assert r["variables"].get("tot_1") == "1"
        assert r["variables"].get("data_entry") == "1"
        # gender group: exactly one of gen_1/gen_2
        assert ("gen_1" in r["variables"]) != ("gen_2" in r["variables"])
        assert r["categories"]["gender"] in ("gen_1", "gen_2")
        # epi fields present and sane for 2017 dates
        assert r["epi_year"] in (2016, 2017)
        assert 1 <= r["epi_week"] <= 53
        # individual alert fires exactly on A00
        assert r["alert"] == (r["icd_code"] == "A00")

    # link-count rule appears whenever the patient has 'return' visits with
    # the same (pid, icd) — cross-check one positive exists and values agree
    returns = {
        (r["pt./pid"], r["icd_code"])
        for r in form.filter(F.col("`intro./visit`") == "return").collect()
    }
    linked_cases = [
        r for r in cases if (r["pt./pid"], r["icd_code"]) in returns
    ]
    assert linked_cases, "fixture should produce at least one linked case"
    for r in linked_cases:
        assert int(r["variables"]["ret_1"]) >= 1
    for r in cases:
        if (r["pt./pid"], r["icd_code"]) not in returns:
            assert "ret_1" not in r["variables"]

    # visits carry vis_1, not tot_1
    assert all(r["variables"].get("vis_1") == "1" for r in visits)
    assert all("tot_1" not in r["variables"] for r in visits)


def test_step_monitor_counts_rows_in_one_action(spark):
    """StepMonitor (plans/monitoring.py) mirrors the reference's
    step_monitoring rows via df.observe: per-step row counts materialize
    from the SAME action that drives the plan — no extra jobs."""
    from meerkat_abacus_spark.plans.monitoring import StepMonitor

    mon = StepMonitor()
    df = spark.range(1000).withColumn("v", F.col("id") % 10)
    df = mon.observe(df, "source")
    filtered = mon.observe(df.filter(F.col("v") < 5), "filter")
    agg = filtered.groupBy("v").count()
    assert agg.count() == 5  # the single driving action

    rows = {step: n for step, n, _ in mon.rows()}
    assert rows == {"source": 1000, "filter": 500}
    tbl = mon.to_df(spark)
    assert tbl.columns == ["step", "n", "available_at_s", "elapsed_total_s"]
    assert tbl.count() == 2
