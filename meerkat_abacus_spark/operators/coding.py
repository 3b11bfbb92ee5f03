"""The coding engine: config rules → one compiled CASE-WHEN projection.

Reference: meerkat_abacus/codes/variable.py (the 6-primitive boolean DSL) and
meerkat_abacus/codes/to_codes.py (group/priority/category/alert semantics).
The reference interprets each rule per row in Python; here the whole rule
table compiles once into Catalyst expressions:

- each rule        → a boolean ``test`` Column + a ``value`` Column
- calculation_group → a single ``coalesce(when(t1,v1), when(t2,v2), …)`` —
  CASE WHEN gives the reference's first-match-wins for free
  (to_codes.py:197-213, 305-306)
- calculation_priority → the same CASE WHEN with arms ordered by priority
  (to_codes.py:260-281: lowest priority number wins)
- categories       → ``map_concat`` of per-category conditional singleton
  maps (to_codes.py:287-290)
- alert / disregard → boolean columns (to_codes.py:292-309)

At 100 TB this matters: a 600-rule codes file becomes one wide projection
inside a single WholeStageCodegen span — no shuffle, no Python, no per-rule
pass over the data.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from meerkat_abacus_spark.functions.calculation import translate_calculation
from meerkat_abacus_spark.functions.dates import parse_multiformat_timestamp

_PRIMITIVES = ("match", "sub_match", "between", "value", "not_null", "calc")


@dataclass
class Rule:
    """One aggregation_variables row (reference model.py:175-228)."""

    id: str
    method: str
    db_column: str = ""
    condition: str = ""
    calculation: str | None = None
    category: list[str] = field(default_factory=list)
    calculation_group: str | None = None
    calculation_priority: int | None = None
    multiple_link: str | None = None
    alert: bool = False
    alert_type: str | None = None
    disregard: bool = False
    type: str = "case"
    form: str | None = None

    def tests(self) -> tuple[list[str], list[str]]:
        """Split ``method`` into alternating test tokens and and/or operators
        (reference variable.py:34-53)."""
        tokens = self.method.split(" ")
        tests, ops = tokens[0::2], tokens[1::2]
        for t in tests:
            if t not in _PRIMITIVES:
                raise NameError(f"{self.id} has wrong test type {t!r}")
        for o in ops:
            if o not in ("and", "or"):
                raise NameError(f"{self.id} has wrong logic type {o!r}")
        return tests, ops

    def columns_per_test(self) -> list[list[str]]:
        return [
            [c.strip() for c in part.split(",")] if "," in part else [part]
            for part in self.db_column.split(";")
        ]

    def conditions_per_test(self) -> list[list[str]]:
        out = []
        for part in self.condition.split(";"):
            if "," in part:
                out.append([c.strip() for c in part.split(",")])
            else:
                out.append([part])
        return out


def _col(name: str) -> Column:
    return F.col("`" + name.replace("`", "``") + "`")


class Resolver:
    """Maps a config column name to a Column — top-level by default, or a
    field of a (materialized) linked-row struct for multiple_link rules
    (C4, reference codes/to_codes.py:213-242).

    ``available``: the form's column set; a rule referencing an absent
    column is *not applicable* rather than an analysis error (reference
    variable.py:226-231, 251-268, 288-302 all return 0/not_applicable for
    ``column not in row`` — production codes files routinely carry rules
    for fields a given deployment's forms don't collect).

    ``types``: the form's ``dict(df.dtypes)`` when known (r16) — lets the
    calc/value date paths skip the multiformat parse for columns the scan
    already typed (see ``translate_calculation``'s ``column_types``).
    Top-level resolvers only; struct/getter resolvers leave it None.
    """

    def __init__(self, struct_col: str | None = None, getter=None,
                 available: set[str] | None = None,
                 types: "dict[str, str] | None" = None):
        self.struct_col = struct_col
        self._getter = getter
        self.available = available
        self.types = types if struct_col is None and getter is None else None

    def is_missing(self, name: str) -> bool:
        return self.available is not None and name not in self.available

    def __call__(self, name: str) -> Column:
        if self._getter is not None:
            return self._getter(name)
        if self.struct_col is not None:
            return F.expr(
                "`%s`.`%s`" % (self.struct_col.replace("`", "``"),
                               name.replace("`", "``"))
            )
        if self.is_missing(name):
            return F.lit(None).cast("string")
        return _col(name)

    def sql_prefix(self) -> str | None:
        """Prefix for translate_calculation (between/calc SQL paths)."""
        return self.struct_col


_DEFAULT = Resolver()


def _non_empty(name: str, r: Resolver = _DEFAULT) -> Column:
    c = r(name)
    return c.isNotNull() & (c.cast("string") != F.lit(""))


def _test_match(cols: list[str], cond: list[str], r: Resolver = _DEFAULT) -> Column:
    return r(cols[0]).cast("string").isin([c for c in cond if c is not None])


def _test_sub_match(
    cols: list[str], cond: list[str], r: Resolver = _DEFAULT
) -> Column:
    c = r(cols[0]).cast("string")
    exact = c.isin(cond)
    subs = [c.contains(F.lit(v)) for v in cond if v]
    return reduce(lambda a, b: a | b, subs, exact)


def _test_not_null(cols: list[str], r: Resolver = _DEFAULT) -> Column:
    # Reference variable.py:226-231: value not in ("", None, 0) — with CSV
    # string semantics the numeric-0 arm only fires for genuinely numeric
    # columns, handled by the cast-compare.
    return _non_empty(cols[0], r)


def _between(
    cols: list[str],
    cond: list[str],
    calculation: str,
    epi_config: str | dict,
    r: Resolver = _DEFAULT,
) -> tuple[Column, Column]:
    """(applicable, passed) for a between test (variable.py:251-285)."""
    lo, hi = float(cond[0]), float(cond[1])
    if any(r.is_missing(c) for c in cols):
        # column absent from the form → test fails (variable.py:265-268)
        return F.lit(False), F.lit(False)
    applicable = reduce(lambda a, b: a & b, [_non_empty(c, r) for c in cols])
    if r.sql_prefix() is None and r._getter is not None:
        raise NameError("between is not supported inside any/all link rules")
    value = F.expr(
        translate_calculation(
            calculation, cols, epi_config, empty_as_zero=False,
            col_prefix=r.sql_prefix(), column_types=r.types,
        )
    )
    return applicable, applicable & (value >= F.lit(lo)) & (value < F.lit(hi))


def compile_rule_test(
    rule: Rule,
    epi_config: str | dict = "international",
    resolver: Resolver = _DEFAULT,
) -> tuple[Column, Column]:
    """Compile one rule into ``(passed BOOLEAN, value)`` Columns.

    Mirrors Variable.test (reference variable.py:147-173): ``value`` is the
    stored payload when the test passes — 1 for boolean tests, the computed
    number for ``calc``, the raw/ISO value for ``value``.
    """
    r = resolver
    tests, ops = rule.tests()
    columns = rule.columns_per_test()
    conditions = rule.conditions_per_test()
    if len(conditions) != len(tests) and rule.condition:
        raise TypeError(f"need same number of conditions as test types: {rule.id}")

    if "value" in tests:
        if len(tests) > 1:
            raise NameError("value must be only test type")
        col = r(columns[0][0])
        applicable = _non_empty(columns[0][0], r)
        if rule.calculation == "date":
            # Typed timestamp/date columns skip the multiformat parse
            # (r16, same identity argument as translate_calculation's
            # column_types — the string render of a typed column always
            # round-trips through the parse to the same instant).
            typed = (r.types or {}).get(columns[0][0], "").startswith(
                ("timestamp", "date")
            )
            ts = (
                col.cast("timestamp")
                if typed
                else parse_multiformat_timestamp(col.cast("string"))
            )
            value = F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss")
            return applicable & value.isNotNull(), value
        return applicable, col.cast("string")

    if "calc" in tests:
        if len(tests) > 1:
            raise NameError("calc must be only test type")
        if r.sql_prefix() is None and r._getter is not None:
            raise NameError("calc is not supported inside any/all link rules")
        if any(r.is_missing(c) for c in columns[0]):
            # column not in row → not applicable (variable.py:288-302)
            return F.lit(False), F.lit(None).cast("double")
        value = F.expr(
            translate_calculation(
                rule.calculation or "", columns[0], epi_config,
                empty_as_zero=True, col_prefix=r.sql_prefix(),
                column_types=r.types,
            )
        ).cast("double")
        # Reference variable.py:163-171: calc is applicable whenever the
        # columns exist (they always do in a DataFrame); 0 is a real value.
        return value.isNotNull(), value

    calcs = (rule.calculation or "").split(";")
    results: list[Column] = []
    for i, tt in enumerate(tests):
        if tt == "match":
            results.append(_test_match(columns[i], conditions[i], r))
        elif tt == "sub_match":
            results.append(_test_sub_match(columns[i], conditions[i], r))
        elif tt == "not_null":
            results.append(_test_not_null(columns[i], r))
        elif tt == "between":
            calc = calcs[i] if i < len(calcs) else calcs[0]
            _, passed = _between(columns[i], conditions[i], calc, epi_config, r)
            results.append(passed)
        else:
            raise NameError(f"unsupported test {tt} in combination")

    # Python operator precedence (& over |) — the reference evals the
    # compiled boolean expression with the same precedence (variable.py:44-53).
    combined: list[Column | str] = [results[0]]
    for op, res in zip(ops, results[1:]):
        if op == "and":
            combined[-1] = combined[-1] & res
        else:
            combined.extend(["or", res])
    passed = reduce(lambda a, b: a | b, combined[2::2], combined[0])
    passed = F.coalesce(passed, F.lit(False))
    return passed, F.lit(1)


@dataclass
class CodedOutput:
    variables: Column
    categories: Column
    alert: Column
    alert_reason: Column
    disregard: Column


def _compile_entry(
    m: Rule,
    epi_config: str | dict,
    link_structs: dict[str, str] | None,
    available: set[str] | None = None,
    types: dict[str, str] | None = None,
) -> tuple[Column, Column]:
    """(passed, value) for one rule, dispatching C4 multiple_link methods
    over the rule's link array (reference codes/to_codes.py:213-242):

    - ``last``/``first``: the rule test runs against the newest/oldest linked
      row (materialized as a struct column so between/calc SQL paths work);
    - ``count``: value = number of linked rows;
    - ``any``/``all``: the test runs across the array via exists/forall.

    An empty link array means "datum absent" — the rule is not applicable
    (to_codes.py ``if datum:`` gate).
    """
    if not m.multiple_link:
        return compile_rule_test(
            m, epi_config, Resolver(available=available, types=types)
        )
    arr = F.col("`link_" + (m.form or "").replace("`", "``") + "`")
    non_empty = F.size(arr) > 0
    ml = m.multiple_link
    if ml == "count":
        return non_empty, F.size(arr)
    if ml in ("last", "first"):
        if not link_structs or m.id not in link_structs:
            raise ValueError(
                f"rule {m.id}: last/first link rules need code_dataframe "
                "to materialize the linked-row struct"
            )
        r = Resolver(struct_col=link_structs[m.id])
        passed, value = compile_rule_test(m, epi_config, r)
        return non_empty & passed, value
    if ml in ("any", "all"):
        def row_test(x):
            r = Resolver(getter=lambda name: x["row"][name])
            return F.coalesce(
                compile_rule_test(m, epi_config, r)[0], F.lit(False)
            )

        hof = F.exists(arr, row_test) if ml == "any" else F.forall(arr, row_test)
        return non_empty & F.coalesce(hof, F.lit(False)), F.lit(1)
    raise ValueError(f"unknown multiple_link method {ml!r} on rule {m.id}")


def _sparse_map(
    pairs: "list[tuple[Column, Column]]", guard_on: str = "key"
) -> Column:
    """MAP<STRING,STRING> from (key, value) column pairs where entries with
    a NULL key (``guard_on="key"``) or NULL value (``guard_on="value"``)
    are dropped.

    Built as ``map_concat`` of per-entry conditional singleton maps rather
    than ``map_from_entries(filter(array(...)))``: higher-order functions
    (filter) are interpreted per element outside whole-stage codegen, and
    the coding projection sits on every row of every form — the map build
    IS the hot loop.  map_concat/create_map stay inside codegen (~25%
    faster on the flagship shape).  Entry order (and therefore duplicate-
    key behavior under spark.sql.mapKeyDedupPolicy) is identical."""
    if not pairs:
        return F.create_map().cast("map<string,string>")
    empty = F.create_map().cast("map<string,string>")
    maps = []
    for k, v in pairs:
        guard = (k if guard_on == "key" else v).isNotNull()
        maps.append(
            F.when(guard, F.create_map(k, v.cast("string"))).otherwise(empty)
        )
    return F.map_concat(*maps) if len(maps) > 1 else maps[0]


def compile_rules(
    rules: list[Rule],
    epi_config: str | dict = "international",
    link_structs: dict[str, str] | None = None,
    alert_data: dict[str, str] | None = None,
    available: set[str] | None = None,
    types: dict[str, str] | None = None,
) -> CodedOutput:
    """Compile a rule table into the five output Columns of the coding step.

    variables  MAP<STRING,STRING>: var_id → stored value (to_codes.py:250-285)
    categories MAP<STRING,STRING>: category → winning var_id (:287-290)
    alert/alert_reason/disregard: to_codes.py:292-309.
    """
    # Group rules; None group = the rule's own id (every ungrouped rule is its
    # own group — to_codes.py builds groups the same way).
    groups: dict[str, list[Rule]] = {}
    for r in rules:
        groups.setdefault(r.calculation_group or r.id, []).append(r)

    var_entries: list[tuple[Column, Column]] = []
    cat_arms: dict[str, list[Column]] = {}
    alert_arms: list[Column] = []
    alert_reason_arms: list[Column] = []
    disregard_arms: list[Column] = []

    for gid, members in groups.items():
        # Compile each member once, in codes-file order.
        compiled = [
            (m, *_compile_entry(m, epi_config, link_structs, available, types))
            for m in members
        ]
        has_priority = any(
            m.calculation_priority not in ("", None) for m in members
        )
        if has_priority:
            # Winner selection orders the CASE arms by priority (stable: ties
            # keep file order — reference to_codes.py:269-281 only overwrites
            # on a strictly lower priority number).
            win_order = sorted(
                compiled,
                key=lambda e: int(e[0].calculation_priority)
                if e[0].calculation_priority not in ("", None)
                else 1 << 30,
            )
        else:
            win_order = compiled

        # First-match-wins within the group: one CASE WHEN for the id and one
        # for the value; Catalyst short-circuits like the reference's break.
        winner_id = F.coalesce(
            *[F.when(t, F.lit(m.id)) for (m, t, _v) in win_order]
        ) if compiled else F.lit(None)
        winner_val = F.coalesce(
            *[F.when(t, v.cast("string")) for (m, t, v) in win_order]
        ) if compiled else F.lit(None)
        var_entries.append((winner_id, winner_val))

        for m, t, _v in compiled:
            # Side effects (categories/alert/disregard): in NON-priority
            # groups the reference breaks after the first applicable member,
            # so only the winner fires.  In priority groups there is no break
            # (to_codes.py:287-303): EVERY applicable member fires, in file
            # order, even if it loses the variable_json priority contest.
            hit = t if has_priority else t & (winner_id == F.lit(m.id))
            for cat in m.category:
                cat_arms.setdefault(cat, []).append(F.when(hit, F.lit(m.id)))
            if m.alert and m.alert_type == "individual":
                alert_arms.append(hit)
                alert_reason_arms.append(F.when(hit, F.lit(m.id)))
            if m.disregard:
                disregard_arms.append(hit)

    alert = reduce(lambda a, b: a | b, alert_arms, F.lit(False))
    # C6 alert_data: when an individual alert fires, copy the configured
    # form columns into variables as alert_<name>, plus the alert marker
    # entries themselves (to_codes.py:292-301; demo_config.py:148-155).
    if alert_data:
        for name, src in alert_data.items():
            var_entries.append(
                (
                    F.when(alert, F.lit(f"alert_{name}")),
                    _col(src).cast("string"),
                )
            )

    variables = _sparse_map(var_entries, guard_on="key")

    # Reference categories semantics is dict-update per firing member over
    # the file-ordered iteration (to_codes.py:287-290): the LAST write wins,
    # hence coalesce over the arms reversed.
    categories = _sparse_map(
        [(F.lit(cat), F.coalesce(*reversed(arms)))
         for cat, arms in cat_arms.items()],
        guard_on="value",
    )

    # alert_reason is likewise overwritten by every firing individual-alert
    # rule (to_codes.py:295-301) — last write wins.
    alert_reason = F.coalesce(*reversed(alert_reason_arms), F.lit(None).cast("string")) if alert_reason_arms else F.lit(None).cast("string")
    disregard_raw = reduce(lambda a, b: a | b, disregard_arms, F.lit(False))
    # to_codes.py:302-309 — disregard is cancelled unless an individual alert
    # also fired... reference keeps disregard only when alert_type is NOT
    # individual cancelled: `if disregard and alert_type != "individual":
    # disregard = False` — i.e. disregard survives only WITH an individual
    # alert.
    disregard = disregard_raw & alert

    return CodedOutput(variables, categories, alert, alert_reason, disregard)


def code_dataframe(
    df: DataFrame,
    rules: list[Rule],
    epi_config: str | dict = "international",
    extra_variables: dict[str, str] | None = None,
    alert_data: dict[str, str] | None = None,
) -> DataFrame:
    """Apply the compiled coding projection to a form DataFrame.

    Adds ``variables``, ``categories``, ``alert``, ``alert_reason``,
    ``disregard`` columns; ``extra_variables`` are the C8 literal entries
    (data_type var + data_entry, reference process_steps/to_codes.py:106-108).
    Rules with ``multiple_link`` read their ``link_<form>`` array column
    (attach it first with operators.links.add_links).
    """
    # Materialize the newest/oldest linked row once per last/first rule so
    # rule tests (incl. between/calc SQL) bind to a named struct column.
    link_structs: dict[str, str] = {}
    for i, rule in enumerate(rules):
        if rule.multiple_link in ("last", "first"):
            cname = f"__lr_{i}"
            idx = -1 if rule.multiple_link == "last" else 1
            # try_element_at: an empty link array must yield NULL (rule not
            # applicable), not an ANSI INVALID_ARRAY_INDEX error
            df = df.withColumn(
                cname,
                F.try_element_at(
                    F.col("`link_" + (rule.form or "").replace("`", "``") + "`"),
                    F.lit(idx),
                )["row"],
            )
            link_structs[rule.id] = cname
    out = compile_rules(
        rules, epi_config, link_structs, alert_data,
        available=set(df.columns), types=dict(df.dtypes),
    )
    variables = out.variables
    if extra_variables:
        variables = F.map_concat(
            variables,
            F.create_map(
                *[F.lit(x) for kv in extra_variables.items() for x in kv]
            ),
        )
    return df.withColumns(
        {
            "variables": variables,
            "categories": out.categories,
            "alert": out.alert,
            "alert_reason": out.alert_reason,
            "disregard": out.disregard,
        }
    ).drop(*link_structs.values())
