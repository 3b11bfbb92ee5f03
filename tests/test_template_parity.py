"""Template-compiler parity against Jinja2 over the reference's REAL
alert templates (VERDICT r8 residual gap #3): every
``country_config/templates/alerts/*/{text,sms,html}`` file must render
byte-identically through (a) Jinja2 with the reference's identity
gettext and (b) this engine's compiled Catalyst concat expression —
proving a user's existing template files work unmodified."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from meerkat_abacus_spark.functions.templates import (
    TemplateError,
    compile_template,
    parse_template,
)

REF_TPL = "/root/reference/meerkat_abacus/country_config/templates/alerts"

DATA_ROWS = [
    {
        "reason": "Measles", "date": "03 Aug 2026", "clinic": "Clinic A",
        "district": "North", "region": "Region 1", "uuid": "uuid-123456",
        "alert_id": "123456", "alert_gender": "female", "alert_age": "7",
        "received": "10:00 03 Aug 2026", "submitted": "09:55 03 Aug 2026",
    },
    # sparse row: missing keys must fall back to the template default
    {"reason": "Cholera", "uuid": "uuid-zzzzzz", "alert_id": "zzzzzz"},
]


def _jinja_render(source: str, data: dict) -> str:
    jinja2 = pytest.importorskip("jinja2")
    env = jinja2.Environment()
    # the reference's default-locale gettext is the identity
    env.globals["_"] = lambda s: s
    return env.from_string(source).render(data=data)


@pytest.mark.skipif(
    not os.path.isdir(REF_TPL), reason="reference templates not available"
)
def test_reference_alert_templates_render_identically(spark):
    files = sorted(glob.glob(f"{REF_TPL}/*/*"))
    assert len(files) >= 6  # case + register, three channels each
    rows = spark.createDataFrame(
        [tuple(d.get(k) for k in _all_keys()) for d in DATA_ROWS],
        ", ".join(f"`{k}` string" for k in _all_keys()),
    )
    for path in files:
        with open(path) as fh:
            source = fh.read()
        col = compile_template(source, lambda k: F.col(k))
        got = [r["m"] for r in rows.select(col.alias("m")).collect()]
        want = [_jinja_render(source, d) for d in DATA_ROWS]
        assert got == want, path


def _all_keys():
    keys = set()
    for d in DATA_ROWS:
        keys |= set(d)
    return sorted(keys)


def test_parse_subset_and_folding():
    segs = parse_template(
        "{{_('Alert')}}: {{_(data.get(\"reason\", \"Not available\"))}}\n"
        "{{_('x %(c)s y')|format(c=_('<<country>>'))}}"
    )
    assert segs[0] == ("lit", "Alert: ", None)
    assert segs[1] == ("data", "reason", "Not available")
    assert segs[2] == ("lit", "\nx <<country>> y", None)


def test_unsupported_expression_raises():
    with pytest.raises(TemplateError):
        parse_template("{{ for x in y }}")
    with pytest.raises(TemplateError):
        parse_template("{{ data.get(key) }}")  # unquoted key


def test_statement_and_comment_tags_raise():
    """ADVICE r9 #3: Jinja {% %} statements and {# #} comments are outside
    the compiled subset and previously passed through VERBATIM into
    rendered alert text — they must raise at compile time.  But only when
    OUTSIDE expression tags: '{%' inside a supported gettext string
    literal is data, matching Jinja's lexer."""
    with pytest.raises(TemplateError):
        parse_template("{% if x %}hello{% endif %}")
    with pytest.raises(TemplateError):
        parse_template("before {# a comment #} after")
    assert parse_template("{{_('item {#1} at {%}')}}") == [
        ("lit", "item {#1} at {%}", None)
    ]


def test_garbage_between_valid_kwargs_raises():
    """ADVICE r9 #3: the kwarg scan is anchored — an unparseable argument
    BETWEEN two valid ones raises instead of being silently dropped."""
    good = "{{ _('%(a)s and %(b)s') | format(a=_('x'), b=_('y')) }}"
    segs = parse_template(good)
    assert segs == [("lit", "x and y", None)]
    bad = "{{ _('%(a)s and %(b)s') | format(a=_('x'), data.junk, b=_('y')) }}"
    with pytest.raises(TemplateError):
        parse_template(bad)


def test_escaped_quote_in_gettext():
    segs = parse_template(r"{{_('browser\'s bar')}}")
    assert segs == [("lit", "browser's bar", None)]


@pytest.mark.skipif(
    not os.path.isdir(REF_TPL), reason="reference templates not available"
)
def test_render_from_template_dir_end_to_end(spark):
    """The A5 operator surface: alert rows + the reference's template
    tree -> message/sms_message/html_message columns, with per-reason
    template selection (register vs case)."""
    from meerkat_abacus_spark.operators.send_alerts import (
        render_alert_messages_from_template_dir,
    )

    rows = spark.createDataFrame(
        [
            ("Measles", "Clinic A", "03 Aug 2026", "123456"),
            ("Register", "Clinic B", "04 Aug 2026", "654321"),
        ],
        "alert_reason string, clinic string, date string, alert_id string",
    )
    lookup = {
        "reason": F.col("alert_reason"),
        "clinic": F.col("clinic"),
        "date": F.col("date"),
        "alert_id": F.col("alert_id"),
    }
    got = render_alert_messages_from_template_dir(
        rows,
        REF_TPL,
        lambda k: lookup.get(k, F.lit(None).cast("string")),
        reason_templates={"Register": "register"},
    ).collect()
    by_reason = {r["alert_reason"]: r for r in got}
    m = by_reason["Measles"]["message"]
    assert m.startswith("Alert: Measles\nDate: 03 Aug 2026\nClinic: Clinic A")
    assert "District: Not available" in m  # unmapped key -> template default
    assert "<td>Measles</td>" in by_reason["Measles"]["html_message"]
    r = by_reason["Register"]["message"]
    # register template: Region line instead of District, no gettext tags
    assert "Region: Not available" in r and "District" not in r
    assert by_reason["Register"]["sms_message"]
