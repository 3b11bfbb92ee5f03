"""Plan invariants over the bench headline queries (r7 verdict ask #5):
the scale contracts — no unjustified cartesian / nested-loop joins, no
unpruned wide-table scans — are ASSERTED here, not just documented in
PLANS.md (tools/explain.py runs the same checks over its full query list
at regeneration, so the two can't drift)."""

from __future__ import annotations

import importlib.util
import os

SF_DIR = "/root/testdata/sf0.001"

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(modname: str, relpath: str):
    spec = importlib.util.spec_from_file_location(
        modname, os.path.join(ROOT, relpath)
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_headline_plans_hold_scale_invariants(spark):
    import pytest

    if not os.path.isdir(SF_DIR):
        pytest.skip("driver testdata not present")
    bench = _load("bench_mod", "bench.py")
    explain = _load("explain_mod", os.path.join("tools", "explain.py"))
    from meerkat_abacus_spark.queries import QUERIES

    widths = explain._table_widths(SF_DIR)
    assert widths.get("lineitem", 0) >= 5  # the checker has real widths
    problems: list[str] = []
    for name in bench.HEADLINE:
        plan = (
            QUERIES[name](spark, SF_DIR)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        problems += explain.check_plan(name, plan, widths)
    assert not problems, "\n".join(problems)


def test_full_registry_plans_hold_scale_invariants(spark):
    """VERDICT r8 ask #7: the bench HEADLINE sweep above reacts fast, but
    a scale-killer in any of the other ~120 registered queries used to be
    caught only at PLANS.md regeneration — this sweeps EVERY registered
    query through the same checker each pytest run (~100 s: plans are
    built, not executed, though index-building queries materialize their
    scratch stores on first call)."""
    import pytest

    if not os.path.isdir(SF_DIR):
        pytest.skip("driver testdata not present")
    explain = _load("explain_full", os.path.join("tools", "explain.py"))
    from meerkat_abacus_spark.queries import QUERIES

    widths = explain._table_widths(SF_DIR)
    problems: list[str] = []
    for name, fn in QUERIES.items():
        plan = (
            fn(spark, SF_DIR)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        problems += explain.check_plan(name, plan, widths)
    assert not problems, "\n".join(problems)


def test_check_plan_flags_violations():
    """The checker itself must catch a cartesian join, an off-whitelist
    nested loop, and a full-width wide scan — and count nested-generic
    schemas correctly."""
    explain = _load("explain_mod2", os.path.join("tools", "explain.py"))
    widths = {"events": 6}
    cart = explain.check_plan("q", "+- CartesianProduct", widths)
    assert any("CartesianProduct" in p for p in cart)
    bnlj = explain.check_plan("q", "+- BroadcastNestedLoopJoin", widths)
    assert any("whitelist" in p for p in bnlj)
    ok_bnlj = explain.check_plan(
        "ann_brute_topk", "+- BroadcastNestedLoopJoin", widths
    )
    assert ok_bnlj == []
    full = (
        "+- FileScan parquet [a,b,c,d,e,f] Batched: true, Location: "
        "InMemoryFileIndex(1 paths)[file:/x/events.parquet], ReadSchema: "
        "struct<event_id:bigint,ts:timestamp,user_id:bigint,"
        "event_type:string,value:double,props:map<string,string>>"
    )
    flagged = explain.check_plan("q", full, widths)
    assert any("all 6 columns" in p for p in flagged), flagged
    pruned = full.replace(
        "struct<event_id:bigint,ts:timestamp,user_id:bigint,"
        "event_type:string,value:double,props:map<string,string>>",
        "struct<event_id:bigint,props:map<string,string>>",
    )
    assert explain.check_plan("q", pruned, widths) == []
    # unpartitioned Window (two bracket groups) flagged; partitioned
    # (three groups) clean — VERDICT r9 ask #7
    glob_w = (
        "+- Window [row_number() windowspecdefinition(k#1 ASC) AS r#2], "
        "[k#1 ASC NULLS FIRST]"
    )
    assert any(
        "unpartitioned Window" in p
        for p in explain.check_plan("q", glob_w, widths)
    )
    part_w = (
        "+- Window [row_number() windowspecdefinition(p#0, k#1 ASC) AS "
        "r#2], [p#0], [k#1 ASC NULLS FIRST]"
    )
    assert explain.check_plan("q", part_w, widths) == []
    # partitioned-but-UNORDERED (min/max-over-partition, the §12
    # dedup_exact shape) also prints two groups — Spark omits empty
    # specs — but the second group is a partition spec, not an order
    # spec: must be CLEAN (the r16 false positive)
    part_unordered_w = (
        "+- Window [min(doc_id#1L) windowspecdefinition(content_hash#2, "
        "specifiedwindowframe(RowFrame, unboundedpreceding$(), "
        "unboundedfollowing$())) AS keep#3L], [content_hash#2]"
    )
    assert explain.check_plan("q", part_unordered_w, widths) == []
    # fully global window (one group: no partition, no order) flagged
    global_unordered_w = (
        "+- Window [min(doc_id#1L) windowspecdefinition("
        "specifiedwindowframe(RowFrame, unboundedpreceding$(), "
        "unboundedfollowing$())) AS keep#3L]"
    )
    assert any(
        "unpartitioned Window" in p
        for p in explain.check_plan("q", global_unordered_w, widths)
    )
    # truncation-robust (ADVICE r16 #3): an order-only window whose spec
    # tail was elided by maxToStringFields ("... N more fields") must
    # still be flagged — the direction marker is detected anywhere in the
    # group, not just at its end
    trunc_order_w = (
        "+- Window [row_number() windowspecdefinition(k#1 ASC) AS r#2], "
        "[k#1 ASC NULLS FIRST, ... 4 more fields]"
    )
    assert any(
        "unpartitioned Window" in p
        for p in explain.check_plan("q", trunc_order_w, widths)
    )
    # a two-group window whose second group is truncated PAST any
    # direction marker is ambiguous — fail closed (flag) rather than
    # silently pass a possibly order-only node
    trunc_ambiguous_w = (
        "+- Window [row_number() windowspecdefinition(k#1 ASC) AS r#2], "
        "[k#1, ... 4 more fields]"
    )
    assert any(
        "unpartitioned Window" in p
        for p in explain.check_plan("q", trunc_ambiguous_w, widths)
    )


def test_basket_pairs_guard_precedes_self_join(spark):
    """VERDICT r10 ask #2: the ≤20-basket-size guard must be applied as a
    LeftSemi on BOTH inputs of the pairwise self-join, not joined onto its
    output — guard-after-join lets one hot basket (10^5 distinct items at
    100 TB) generate ~5×10^9 pairs before the filter.  Asserted on the
    optimized logical plan: the Inner pair join (the one with the
    l_partkey < l_partkey condition) must appear ABOVE two LeftSemi
    guards, i.e. both its inputs are pre-filtered."""
    import pytest

    if not os.path.isdir(SF_DIR):
        pytest.skip("driver testdata not present")
    from meerkat_abacus_spark.queries.warehouse import basket_pairs

    plan = (
        basket_pairs(spark, SF_DIR)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    _assert_guard_precedes_pair_join(plan)


def _pair_join_input_spans(plan: str):
    """Locate the pair Inner join (the one with the `<` tie-break
    condition) and the line spans of its two input subtrees.

    Subtree spans from the indent structure: a node's content column is
    where its operator name starts; its two direct children's content
    sits exactly 3 columns deeper, and its subtree ends at the first
    line whose content column is <= its own.  Tree prints root-first:
    upstream (input) operators are LATER lines."""
    lines, spans = _pair_join_input_spans_multi(plan)
    assert len(spans) == 1, plan
    pi, left_span, right_span = spans[0]
    return lines, pi, left_span, right_span


def _pair_join_input_spans_multi(plan: str):
    """Like :func:`_pair_join_input_spans` but for plans with SEVERAL
    pair joins (the two-band embedding path has one per band): returns
    (lines, [(join_idx, left_span, right_span), ...])."""
    lines = plan.splitlines()
    pair_joins = [
        i for i, ln in enumerate(lines) if "Join Inner" in ln and " < " in ln
    ]
    assert pair_joins, plan

    def _content_col(ln: str) -> int:
        return len(ln) - len(ln.lstrip(": +-"))

    spans = []
    for pi in pair_joins:
        cc = _content_col(lines[pi])
        end = next(
            (i for i in range(pi + 1, len(lines))
             if _content_col(lines[i]) <= cc),
            len(lines),
        )
        kids = [
            i for i in range(pi + 1, end) if _content_col(lines[i]) == cc + 3
        ]
        assert len(kids) == 2, plan  # each pair join has exactly two inputs
        spans.append((pi, range(kids[0], kids[1]), range(kids[1], end)))
    return lines, spans


def _assert_guard_precedes_pair_join(plan: str) -> None:
    """SKIP-policy shape: the pair join must have a LeftSemi guard inside
    EACH of its two input subtrees — not two guards on one side, and
    never a guard on its output."""
    lines, pi, left_span, right_span = _pair_join_input_spans(plan)
    semi = [i for i, ln in enumerate(lines) if "Join LeftSemi" in ln]
    # no semi guard may sit ABOVE (before) the pair join (= on its output)
    assert all(s > pi for s in semi), plan
    # one guard inside EACH input — two guards on one side don't count
    assert any(s in left_span for s in semi), plan
    assert any(s in right_span for s in semi), plan


def _assert_sample_cap_precedes_pair_join(plan: str, cap: int) -> None:
    """SAMPLE-policy shape (r12): EACH pair-join input subtree — of
    EVERY pair join, one per band since r13 — must carry the rank
    filter AND the optimizer-inferred WindowGroupLimit — the node that
    bounds a hot block map-side (Partial) before the shuffle, so
    over-cap rows never reach the pair join OR the exchange in full."""
    lines, spans = _pair_join_input_spans_multi(plan)
    wgl = [
        i
        for i, ln in enumerate(lines)
        if "WindowGroupLimit" in ln and f"row_number(), {cap}" in ln
    ]
    # ADVICE r12 #4: anchor the rank filter to the row_number alias —
    # a bare "<= {cap})" could match an unrelated predicate in a subtree
    rank_filter = [
        i
        for i, ln in enumerate(lines)
        if "Filter" in ln and f"<= {cap})" in ln and "__rn" in ln
    ]
    first_pi = spans[0][0]
    assert all(w > first_pi for w in wgl), plan
    for _, left_span, right_span in spans:
        for span in (left_span, right_span):
            assert any(w in span for w in wgl), plan
            assert any(f in span for f in rank_filter), plan


def test_fuzzy_linkage_block_cap_precedes_self_join(spark):
    """Same pre-join cap discipline for the blocked-levenshtein linkage,
    SAMPLE policy since r12: BOTH self-join inputs must carry the
    ≤1000-member rank filter with its map-side WindowGroupLimit upstream
    of the pair join, so a degenerate hot block (shared surname at
    100 TB) is bounded to a deterministic cap-size subset instead of
    exploded into block² pairs (and instead of being dropped whole, the
    old skip policy)."""
    import pytest

    if not os.path.isdir(SF_DIR):
        pytest.skip("driver testdata not present")
    from meerkat_abacus_spark.queries.surveillance import fuzzy_name_linkage

    plan = (
        fuzzy_name_linkage(spark, SF_DIR)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    _assert_sample_cap_precedes_pair_join(plan, 1000)


def test_embedding_lsh_bucket_cap_precedes_self_join(spark):
    """The sign-LSH-bucketed embedding near-dup (the scale path) must
    bound its buckets pre-join on both self-join inputs — SAMPLE policy
    since r12: rank filter + map-side WindowGroupLimit at 5000, so an
    orthant-hot bucket contributes a deterministic cap-size subset,
    never explodes, and no longer vanishes whole."""
    import pytest

    if not os.path.isdir(SF_DIR):
        pytest.skip("driver testdata not present")
    from meerkat_abacus_spark.queries.dedup import dedup_embedding_lsh

    plan = (
        dedup_embedding_lsh(spark, SF_DIR)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    _assert_sample_cap_precedes_pair_join(plan, 5000)
