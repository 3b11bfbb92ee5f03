"""Property test: the calculation-grammar → Spark SQL translator agrees with
the reference's Python-eval semantics (meerkat_abacus/codes/variable.py:
96-122, 251-319) on randomly generated expressions.

Reference calc semantics reproduced here as the model:
- column values: empty string → 0.0, otherwise float() (variable.py:305-311)
- ``int(x)``: Python truncation toward zero
- any ZeroDivisionError aborts the whole eval → value 0, applicable=True
  (variable.py:315-319)

One Spark job evaluates every generated expression as one projection over a
small table, so the property sweep costs a single collect.
"""

import random

from pyspark.sql import functions as F

from meerkat_abacus_spark.functions.calculation import translate_calculation

COLS = ["a", "b", "c"]

ROWS = [
    {"a": "3", "b": "4", "c": "2"},
    {"a": "", "b": "7", "c": "0"},      # empty → 0; zero divisor
    {"a": "-5", "b": "0", "c": "1.5"},  # negative; float
    {"a": "2.25", "b": "-0.5", "c": ""},
    {"a": "0", "b": "10", "c": "3"},
]


def _gen_expr(rng: random.Random, depth: int = 0) -> str:
    if depth >= 3 or rng.random() < 0.3:
        kind = rng.random()
        if kind < 0.5:
            return rng.choice(COLS)
        if kind < 0.8:
            return str(rng.randint(0, 9))
        return str(rng.choice([0.5, 1.5, 2.0, 3.25]))
    op = rng.choice(["+", "-", "*", "/"])
    left = _gen_expr(rng, depth + 1)
    right = _gen_expr(rng, depth + 1)
    inner = f"({left} {op} {right})"
    if rng.random() < 0.25:
        return f"int{inner}"
    return inner


def _model_eval(expr: str, row: dict) -> float:
    # the reference's semantics: float-coerce with empty→0, int() truncates,
    # ZeroDivisionError → whole result 0 (variable.py:305-319)
    env = {c: float(v) if v != "" else 0.0 for c, v in row.items()}
    try:
        return float(eval(expr, {"int": int, "__builtins__": {}}, env))
    except ZeroDivisionError:
        return 0.0


def test_translator_matches_reference_eval(spark):
    rng = random.Random(20260813)
    exprs = [_gen_expr(rng) for _ in range(60)]

    df = spark.createDataFrame([tuple(r[c] for c in COLS) for r in ROWS], COLS)
    projections = [
        F.expr(translate_calculation(e, COLS, "day:0")).alias(f"e{i}")
        for i, e in enumerate(exprs)
    ]
    got = df.select(*projections).collect()

    for ri, row in enumerate(ROWS):
        for i, e in enumerate(exprs):
            expected = _model_eval(e, row)
            actual = got[ri][f"e{i}"]
            assert actual is not None, (e, row)
            assert abs(actual - expected) < 1e-9, (e, row, actual, expected)


def test_null_handling_consistent_across_operator_mix(spark):
    """The zero-fallback is scoped to actual division-by-zero: a NULL from
    Variable.to_date over an unparseable date stays NULL whether or not the
    calc also contains a '/' (the reference only converts ZeroDivisionError,
    variable.py:315-319 — round-2 ADVICE item 3)."""
    df = spark.createDataFrame([("not-a-date", "2", "0")], ["d", "x", "z"])
    no_div = translate_calculation("Variable.to_date(d) + x", ["d", "x"], "day:0")
    with_div = translate_calculation(
        "Variable.to_date(d) / 86400 + x", ["d", "x"], "day:0"
    )
    null_divisor = translate_calculation(
        "x / Variable.to_date(d)", ["d", "x"], "day:0"
    )
    zero_div = translate_calculation("x / z", ["x", "z"], "day:0")
    row = df.select(
        F.expr(no_div).alias("no_div"),
        F.expr(with_div).alias("with_div"),
        F.expr(null_divisor).alias("null_divisor"),
        F.expr(zero_div).alias("zero_div"),
    ).collect()[0]
    assert row["no_div"] is None
    assert row["with_div"] is None      # NULL stays NULL even with '/'
    assert row["null_divisor"] is None  # NULL divisor is not a zero divisor
    assert row["zero_div"] == 0.0       # genuine zero divisor -> 0


def test_typed_date_columns_skip_multiformat_parse(spark):
    """r16: ``column_types`` lets Variable.to_date over a column the scan
    already typed as timestamp/date compile to a bare CAST instead of the
    11-arm multiformat coalesce — and the two compilations are pointwise
    identical wherever they run (the string render of a typed column
    round-trips through the parse to the same instant under UTC)."""
    typed = translate_calculation(
        "Variable.to_date(d) / 86400", ["d"], "day:0",
        column_types={"d": "timestamp"},
    )
    untyped = translate_calculation("Variable.to_date(d) / 86400", ["d"], "day:0")
    assert "try_to_timestamp" not in typed
    assert "try_to_timestamp" in untyped

    # date-typed columns take the skip as well; strings never do
    assert "try_to_timestamp" not in translate_calculation(
        "Variable.to_date(d)", ["d"], "day:0", column_types={"d": "date"}
    )
    assert "try_to_timestamp" in translate_calculation(
        "Variable.to_date(d)", ["d"], "day:0", column_types={"d": "string"}
    )

    import datetime as dt

    rows = [
        (dt.datetime(2015, 6, 14, 13, 45, 7),),
        (dt.datetime(1999, 12, 31, 23, 59, 59, 123456),),  # fractional secs
        (dt.datetime(1970, 1, 1, 0, 0, 0),),
        (None,),
    ]
    df = spark.createDataFrame(rows, "d timestamp")
    got = df.select(
        F.expr(typed).alias("typed"), F.expr(untyped).alias("untyped")
    ).collect()
    for r in got:
        assert r["typed"] == r["untyped"], r
