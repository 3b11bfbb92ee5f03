"""Property test: the template compiler renders byte-identically to
Jinja2 over RANDOM templates drawn from the supported grammar × random
contexts (VERDICT r12 ask #8 — the coding-DSL / epi-week property
pattern applied to functions/templates.py).

Grammar (the closed subset the compiler documents, matching the
reference's country_config/templates/alerts/* usage):

- literal text between tags (unicode, quotes, lone braces, ``}}`` with
  no opener, ``%`` signs, newlines — including one trailing newline,
  which Jinja's default keep_trailing_newline=False strips);
- ``{{_('...')}}`` gettext of a literal (with backslash escapes);
- ``{{data.get("key")}}`` / ``{{data.get('key', 'default')}}`` lookups,
  optionally wrapped in ``_()``;
- ``{{_('fmt %(a)s')|format(a=_('literal'))}}`` compile-time folds.

Deliberate non-model (documented divergence, same as the parity test's
scope): a context key PRESENT with value None renders "None" through
Jinja's dict.get but falls to the template default through the engine's
NULL column — a DataFrame cannot distinguish present-None from missing.
The generator therefore never emits None VALUES (missing keys cover the
fallback path), matching real alert rows, which are all strings.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from meerkat_abacus_spark.functions.templates import compile_template

KEYS = ["reason", "clinic", "uuid", "alert_id", "région", "k_9"]

_LIT_CHARS = (
    "abc XYZ 0123456789 .,:;!?()[]-_/%&*+=<> \n\t'\"é√嗨 } { }} % %( "
    "<<country>> <<id>>"
).split(" ")


def _literal_text(rng: random.Random) -> str:
    n = rng.randrange(0, 6)
    out = " ".join(rng.choice(_LIT_CHARS) for _ in range(n))
    # never an accidental Jinja opener — outside the supported subset
    return out.replace("{{", "{ {").replace("{%", "{ %").replace("{#", "{ #")


def _gettext_arg(rng: random.Random) -> tuple[str, str]:
    """(source fragment inside _(), decoded value)."""
    val = _literal_text(rng)
    if rng.random() < 0.5:
        body = val.replace("\\", "\\\\").replace("'", "\\'")
        return f"_('{body}')", val
    body = val.replace("\\", "\\\\").replace('"', '\\"')
    return f'_("{body}")', val


def _segment(rng: random.Random) -> str:
    kind = rng.randrange(5)
    if kind == 0:
        return _literal_text(rng)
    if kind == 1:
        src, _ = _gettext_arg(rng)
        return "{{" + rng.choice(["", " "]) + src + rng.choice(["", " "]) + "}}"
    if kind == 2:  # data.get, optional default, optional _() wrap
        key = rng.choice(KEYS)
        q = rng.choice(["'", '"'])
        inner = f"data.get({q}{key}{q}"
        if rng.random() < 0.7:
            d = _literal_text(rng).replace("\\", "").replace(q, "")
            inner += f", {q}{d}{q}"
        inner += ")"
        if rng.random() < 0.3:
            inner = f"_({inner})"
        return "{{ " + inner + " }}"
    if kind == 3:  # format fold
        names = rng.sample(["a", "b", "name"], rng.randrange(1, 3))
        fmt = " ".join(
            [_literal_text(rng).replace("%", "")]
            + [f"%({n})s" for n in names]
        )
        fmt_src = fmt.replace("\\", "\\\\").replace("'", "\\'")
        kwargs = []
        for n in names:
            src, _ = _gettext_arg(rng)
            kwargs.append(f"{n}={src}")
        return "{{_('" + fmt_src + "')|format(" + ", ".join(kwargs) + ")}}"
    return rng.choice(["}}", "} }", "%", " %(x)s ", "{", ""])


def _template(rng: random.Random) -> str:
    t = "".join(_segment(rng) for _ in range(rng.randrange(1, 7)))
    if rng.random() < 0.25:
        t += "\n"  # keep_trailing_newline=False edge
    return t


def _context(rng: random.Random) -> dict:
    ctx = {}
    for k in KEYS:
        r = rng.random()
        if r < 0.4:
            continue  # missing -> template default path
        if r < 0.8:
            ctx[k] = _literal_text(rng)
        else:
            ctx[k] = rng.randrange(-5, 10_000)  # ints render via str()
    return ctx


def test_random_templates_render_identically_to_jinja(spark):
    jinja2 = pytest.importorskip("jinja2")
    env = jinja2.Environment()
    env.globals["_"] = lambda s: s

    from meerkat_abacus_spark.functions.templates import TemplateError

    rng = random.Random(0x7E31)
    safe = [f"c{i}" for i in range(len(KEYS))]
    key_to_col = dict(zip(KEYS, safe))

    # The compiler's contract is render-identically OR raise at compile
    # time (loudly wrong beats silently mis-rendered) — e.g. a '}}'
    # inside a gettext string terminates the compiler's tag scan where
    # Jinja's string-aware lexer does not, and the compiler must REJECT
    # such a template, never mis-render it.  So: templates that compile
    # must byte-match Jinja; raised ones are counted and bounded.
    templates, cols, rejected = [], [], 0
    attempts = 0
    while len(templates) < 120 and attempts < 2000:
        attempts += 1
        t = _template(rng)
        try:
            env.from_string(t)
        except jinja2.TemplateError:
            continue  # generator artifact outside Jinja's own grammar
        try:
            col = compile_template(t, lambda k: F.col(key_to_col[k]))
        except TemplateError:
            rejected += 1
            continue
        cols.append(col.alias(f"t{len(templates)}"))
        templates.append(t)
    assert len(templates) == 120
    # the compiled subset must not be vacuously narrow
    assert rejected <= len(templates), (rejected, len(templates))

    contexts = [_context(rng) for _ in range(3)]
    expected = [
        [env.from_string(t).render(data=ctx) for t in templates]
        for ctx in contexts
    ]

    # ONE Spark pass: a row per context (index-tagged so collect order
    # is irrelevant), a compiled column per template.  Values go in as
    # strings (ints via str() — Jinja renders the same), missing keys as
    # NULL so the compiled coalesce takes the default.
    rows = [
        (ci,) + tuple(str(ctx[k]) if k in ctx else None for k in KEYS)
        for ci, ctx in enumerate(contexts)
    ]
    # explicit schema: a key absent from ALL contexts would make its
    # column all-None and break type inference for an unlucky seed
    schema = "ci long, " + ", ".join(f"{c} string" for c in safe)
    df = spark.createDataFrame(rows, schema=schema)
    got_rows = {r["ci"]: r for r in df.select("ci", *cols).collect()}

    for ci in range(len(contexts)):
        row = got_rows[ci]
        for ti in range(len(templates)):
            got = row[f"t{ti}"]
            want = expected[ci][ti]
            assert got == want, (
                f"template {ti} context {ci}:\n"
                f"  template: {templates[ti]!r}\n"
                f"  jinja:    {want!r}\n  engine:   {got!r}"
            )
