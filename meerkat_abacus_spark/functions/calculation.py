"""Calculation-grammar → Spark SQL translator.

The reference compiles ``calculation`` strings (column refs, numeric
literals, ``+-*/()``, ``abs``, ``int()``, ``Variable.to_date``) to Python
bytecode and evals them per row (meerkat_abacus/codes/variable.py:96-122,
251-319).  We translate the same closed grammar once, at plan time, into a
Spark SQL expression string; evaluation is then vectorized JVM codegen with
zero Python in the row loop.

Pieces:
- column refs       → ``coalesce(try_cast(nullif(`col`,'') AS DOUBLE), 0.0)``
                      (calc semantics: empty → 0, variable.py:305-311) or a
                      bare try_cast for `between` (empties are gated out by a
                      separate applicability predicate, variable.py:265-268).
- ``int(x)``        → truncation toward zero (Python int()); emitted as a
                      CAST to BIGINT via a paren-balanced rewrite.
- ``Variable.to_date(col)`` → seconds since the "epi epoch" (the epi-week
                      start day on/after Thursday 1970-01-01), reference
                      variable.py:321-367.
"""

from __future__ import annotations

import ast
import re

from meerkat_abacus_spark.functions.dates import MULTIFORMAT_PATTERNS


def _epi_epoch_offset_days(epi_config: str) -> int:
    """Days between 1970-01-01 (a Thursday) and the first epi-week start day.

    Reference variable.py:344-352: ``(4 + weekday) % 7``.
    """
    if isinstance(epi_config, str) and epi_config.startswith("day:"):
        weekday = int(epi_config.split(":")[1])
    else:
        weekday = 0
    return (4 + weekday) % 7


def _epi_offset_secs_sql(epi_config: str | dict, parsed: str) -> str:
    """SQL expression for the epi-epoch offset in seconds.

    String configs yield a plan-time constant.  Dict configs follow the
    reference (variable.py:344-352): the offset depends on the DATE's year —
    the configured start's weekday for configured years, else the weekday of
    Jan 1 of that year (``country_config['epi_week'].get(year,
    datetime(year,1,1))``).  Emitted as a CASE over ``year(parsed)`` — still
    pure projection, no shuffle; Spark's subexpression elimination dedups the
    repeated parse inside the projection.
    """
    if isinstance(epi_config, dict):
        arms = " ".join(
            f"WHEN {int(year)} THEN {((4 + start.weekday()) % 7) * 86400}"
            for year, start in sorted(epi_config.items())
        )
        default = f"((4 + weekday(make_date(year({parsed}), 1, 1))) % 7) * 86400"
        return f"(CASE year({parsed}) {arms} ELSE {default} END)"
    return str(_epi_epoch_offset_days(epi_config) * 86400)


def _multiformat_parse_sql(inner: str) -> str:
    # datetime patterns contain literal quotes ('T') — escape for SQL strings
    arms = ", ".join(
        "try_to_timestamp({}, '{}')".format(inner, p.replace("'", "''"))
        for p in MULTIFORMAT_PATTERNS
    )
    return f"coalesce({arms}, try_to_timestamp({inner}))"


class _CalcRewriter(ast.NodeTransformer):
    """Two plan-time rewrites over the (valid-Python) calc grammar:

    - ``a / b`` → ``try_divide(a, b)``: the reference evals with Python ``/``
      and catches ZeroDivisionError (variable.py:279-281, 315-319); a plain
      SQL ``/`` would raise DIVIDE_BY_ZERO under an ANSI caller session or
      silently NULL under non-ANSI.  try_divide is NULL-on-zero in both
      modes; the caller maps that NULL to the reference's 0-result.
    - float literals → ``double(lit)``: a bare ``0.5`` parses as SQL
      DECIMAL(1,1), and decimal arithmetic (division scale truncation in
      particular, once ``int()``'s BIGINT cast is in the mix) diverges from
      the reference's Python-float semantics.  Forcing double keeps every
      intermediate in IEEE binary64, exactly like the reference's eval.
      (Caught by tests/test_calc_translator_property.py.)
    """

    def __init__(self) -> None:
        self.divisors: list[str] = []

    def visit_BinOp(self, node: ast.BinOp):
        self.generic_visit(node)
        if isinstance(node.op, ast.Div):
            # Record the divisor so the caller can scope the zero-fallback
            # to actual division-by-zero (not to every NULL result).
            self.divisors.append(ast.unparse(node.right))
            return ast.Call(
                func=ast.Name(id="try_divide", ctx=ast.Load()),
                args=[node.left, node.right],
                keywords=[],
            )
        return node

    def visit_Constant(self, node: ast.Constant):
        if isinstance(node.value, float):
            return ast.Call(
                func=ast.Name(id="double", ctx=ast.Load()),
                args=[node],
                keywords=[],
            )
        return node


def _rewrite_calc_ast(sql: str) -> tuple[str, list[str]]:
    """Run :class:`_CalcRewriter` over the expression (column refs are
    stashed as placeholders, so it parses as Python — no fragile regex over
    nested parens).  Returns (rewritten, divisor expressions)."""
    tmp = re.sub("\x00(\\d+)\x00", r"__ph\1", sql)
    rewriter = _CalcRewriter()
    tree = rewriter.visit(ast.parse(tmp, mode="eval"))
    new = ast.unparse(ast.fix_missing_locations(tree))

    def _unstash(s: str) -> str:
        return re.sub(r"__ph(\d+)", lambda m: f"\x00{m.group(1)}\x00", s)

    return _unstash(new), [_unstash(d) for d in rewriter.divisors]


def _rewrite_int_calls(sql: str) -> str:
    """Rewrite ``int( ... )`` into ``CAST(... AS BIGINT)`` with paren balancing."""
    out = []
    i = 0
    n = len(sql)
    while i < n:
        m = re.match(r"\bint\(", sql[i:])
        if m and (i == 0 or not (sql[i - 1].isalnum() or sql[i - 1] == "_")):
            depth = 1
            j = i + m.end()
            start = j
            while j < n and depth:
                if sql[j] == "(":
                    depth += 1
                elif sql[j] == ")":
                    depth -= 1
                j += 1
            inner = _rewrite_int_calls(sql[start : j - 1])
            out.append(f"CAST({inner} AS BIGINT)")
            i = j
        else:
            out.append(sql[i])
            i += 1
    return "".join(out)


def translate_calculation(
    calculation: str,
    columns: list[str],
    epi_config: str | dict = "international",
    empty_as_zero: bool = True,
    col_prefix: str | None = None,
    column_types: "dict[str, str] | None" = None,
) -> str:
    """Translate a reference calculation string into a Spark SQL expression.

    ``columns`` are the raw column names referenced (reference passes them in
    from ``db_column``, variable.py:107-122); longest-first replacement
    prevents a column name that is a prefix of another from clobbering it.

    ``column_types`` (r16, guide §1.2 "don't compute things you throw
    away"): the caller's ``dict(df.dtypes)``.  A ``Variable.to_date``
    over a column the scan already typed as timestamp/date emits a bare
    ``CAST(col AS TIMESTAMP)`` instead of the 11-arm multiformat
    coalesce — the coalesce is the identity on such columns (the
    timestamp renders as ``yyyy-MM-dd HH:mm:ss[.SSSSSS]`` and either the
    exact-pattern arm or the final permissive-cast arm reconstructs the
    same instant under the UTC session), but it bloated the expression
    tree ~20x: measured 5.0 s of Catalyst analysis + 1.1 s/run on
    coding_calc_to_date at sf0.01.  Only string columns pay the parse.
    """
    sql = calculation

    # Placeholders keep later replacements from touching earlier expansions.
    placeholders: dict[str, str] = {}

    def stash(expr: str) -> str:
        key = f"\x00{len(placeholders)}\x00"
        placeholders[key] = expr
        return key

    for col in sorted(set(columns), key=len, reverse=True):
        quoted = "`" + col.replace("`", "``") + "`"
        typed_date = (
            col_prefix is None
            and (column_types or {}).get(col, "").startswith(
                ("timestamp", "date")
            )
        )
        if col_prefix:
            # struct-field path for multiple_link last/first rules
            quoted = "`" + col_prefix.replace("`", "``") + "`." + quoted
        parsed = (
            f"CAST({quoted} AS TIMESTAMP)"
            if typed_date
            else _multiformat_parse_sql(quoted)
        )
        date_expr = (
            f"(unix_timestamp({parsed}) - {_epi_offset_secs_sql(epi_config, parsed)})"
        )
        # Variable.to_date(col) must win over the bare column replacement.
        sql = sql.replace(f"Variable.to_date({col})", stash(date_expr))
        # cast-to-string first so nullif never compares '' against a numeric
        # column (which would error under an ANSI-mode caller session)
        stringified = f"nullif(CAST({quoted} AS STRING), '')"
        if empty_as_zero:
            num = f"coalesce(try_cast({stringified} AS DOUBLE), 0.0D)"
        else:
            num = f"try_cast({stringified} AS DOUBLE)"
        sql = sql.replace(col, stash(num))

    sql, divisors = _rewrite_calc_ast(sql)
    sql = _rewrite_int_calls(sql)
    if divisors and empty_as_zero:
        # calc semantics: ZeroDivisionError aborts the whole eval and stores
        # 0 with applicable=True (variable.py:315-319, test():163-171).  The
        # fallback is scoped to the divisions themselves — "any divisor
        # evaluates to 0 → whole result 0" — NOT a blanket
        # coalesce(expr, 0): a NULL from e.g. Variable.to_date over an
        # unparseable date must stay NULL exactly as it does in a
        # division-free calc (the reference only converts
        # ZeroDivisionError).  A NULL divisor leaves the CASE arm false and
        # try_divide propagates the NULL.  Divisors appear twice (flag +
        # division); both are projections and Spark's subexpression
        # elimination shares the evaluation.
        flags = " OR ".join(
            f"(({_rewrite_int_calls(d)}) = 0.0D)" for d in divisors
        )
        sql = f"(CASE WHEN {flags} THEN 0.0D ELSE ({sql}) END)"
    for key, expr in placeholders.items():
        sql = sql.replace(key, expr)
    return sql
