"""Rotation-policy invariants (VERDICT r6 ask #8): the driver window is
generated from certification data, the committed snapshot matches
regeneration from the repo-root artifacts, and the policy guarantees
bounded evidence staleness."""

import importlib.util
import os

from meerkat_abacus_spark.queries import QUERIES, ORACLES, _REGISTRY_PRIORITY
from meerkat_abacus_spark.queries import _rotation

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _gen_rotation_module():
    spec = importlib.util.spec_from_file_location(
        "gen_rotation", os.path.join(ROOT, "tools", "gen_rotation.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_snapshot_matches_regeneration():
    """cert_history.json must equal what tools/gen_rotation.py computes
    from the CORRECTNESS_r*.json artifacts **up to the snapshot's own
    as_of_round** — a stale committed snapshot would silently skew the
    window.  Artifacts from NEWER rounds are expected at every round
    boundary (the driver writes CORRECTNESS_r{N+1}.json after the round-N
    commit) and are the builder's round-start regeneration trigger, not
    snapshot skew (VERDICT r7 ask #1) — they only produce a warning here."""
    import glob
    import warnings

    if not glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")):
        import pytest

        pytest.skip("no driver artifacts in this checkout")
    mod = _gen_rotation_module()
    snap = _rotation.load_history()
    assert snap == mod.compute_history(max_round=snap["as_of_round"])
    full = mod.compute_history()
    if full["as_of_round"] > snap["as_of_round"]:
        warnings.warn(
            "newer driver artifacts exist (round "
            f"{full['as_of_round']} > snapshot {snap['as_of_round']}); "
            "run `python tools/gen_rotation.py` at round start",
            UserWarning,
        )


def test_regenerate_if_stale_roundtrip(tmp_path):
    """Round-start automation (VERDICT r8 ask #3): regenerate_if_stale
    rewrites the snapshot exactly when a newer driver artifact changes the
    computed history, and is a no-op (no write, no mtime churn) when the
    snapshot is already fresh."""
    import json

    mod = _gen_rotation_module()
    root = str(tmp_path)
    out = tmp_path / "cert_history.json"
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps({
        "q_a": {"rows_match": True, "schema_match": True,
                "hash_match": True, "err": None},
        "q_b": {"rows_match": False, "err": "boom"},
    }))
    assert mod.regenerate_if_stale(root=root, out=str(out)) is True
    snap = json.loads(out.read_text())
    assert snap == {"as_of_round": 1, "last_certified": {"q_a": 1}}
    # fresh snapshot: second call must not rewrite
    before = out.stat().st_mtime_ns
    assert mod.regenerate_if_stale(root=root, out=str(out)) is False
    assert out.stat().st_mtime_ns == before
    # a newer artifact certifying q_b triggers a rewrite
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps({
        "q_b": {"rows_match": True, "schema_match": True,
                "hash_match": True, "err": ""},
    }))
    assert mod.regenerate_if_stale(root=root, out=str(out)) is True
    snap = json.loads(out.read_text())
    assert snap == {
        "as_of_round": 2,
        "last_certified": {"q_a": 1, "q_b": 2},
    }


def test_registry_order_is_policy_output():
    hist = _rotation.load_history()
    expect = _rotation.build_priority(
        sorted(QUERIES), hist["last_certified"],
        as_of_round=hist["as_of_round"],
    )
    assert list(QUERIES) == expect
    assert list(ORACLES) == [n for n in expect if n in ORACLES]
    assert _REGISTRY_PRIORITY == expect


def test_max_staleness_invariant():
    """After the current round (as_of + 1) certifies the window, every
    registered query must have been driver-certified within the last
    MAX_STALENESS rounds."""
    hist = _rotation.load_history()
    this_round = hist["as_of_round"] + 1
    last = dict(hist["last_certified"])
    window = set(list(QUERIES)[: _rotation.WINDOW])
    for name in window:
        last[name] = this_round
    floor = this_round - _rotation.MAX_STALENESS + 1
    stale = {n: r for n, r in last.items() if n in QUERIES and r < floor}
    assert not stale, f"queries left stale beyond {_rotation.MAX_STALENESS} rounds: {stale}"


def test_watch_queries_inside_window():
    hist = _rotation.load_history()
    active = _rotation.active_watch(hist["as_of_round"] + 1)
    window = set(list(QUERIES)[: _rotation.WINDOW])
    missing = [n for n in active if n in QUERIES and n not in window]
    assert not missing, missing


def test_watch_is_round_scoped():
    """The r9 failure mode (VERDICT r9 ask #1): a WATCH list recorded for
    a PREVIOUS round is spent — it must not occupy window slots that
    stale queries need this round."""
    watch = {"round": 9, "names": ("q_fresh",)}
    hist = {"q_fresh": 9, "q_stale": 7, "q_ok": 9}
    # current round = 10: the r9 WATCH is inert, the stale query leads
    order = _rotation.build_priority(
        sorted(hist), hist, watch=watch, window=2, as_of_round=9
    )
    assert order[0] == "q_stale"
    assert _rotation.active_watch(10, watch) == ()
    assert _rotation.active_watch(9, watch) == ("q_fresh",)


def test_stale_queries_win_slots_over_fresh_watch():
    """On an overfull plan, mandatory recertifications (evidence at the
    staleness floor) always outrank touched-but-fresh WATCH entries."""
    watch = {"round": 10, "names": ("w1", "w2")}
    hist = {"s1": 7, "s2": 7, "w1": 9, "w2": 9, "r1": 8}
    order = _rotation.build_priority(
        sorted(hist), hist, watch=watch, window=3, as_of_round=9
    )
    assert order[:2] == ["s1", "s2"]
    assert set(order[2:4]) == {"w1", "w2"}


def test_oversubscribed_plan_raises_at_generation():
    """validate_window raises — at import/generation time, not in a later
    assertion — when must+WATCH cannot fit the window."""
    import pytest

    watch = {"round": 10, "names": ("w1", "w2")}
    hist = {
        "as_of_round": 9,
        "last_certified": {"s1": 7, "s2": 7, "s3": 7, "w1": 9, "w2": 9},
    }
    with pytest.raises(_rotation.RotationOversubscribedError):
        _rotation.validate_window(
            sorted(hist["last_certified"]), hist, watch=watch, window=4
        )
    # the exact-fit plan (3 must + 2 watch = window 5) must NOT raise
    plan = _rotation.plan_window(
        sorted(hist["last_certified"]), hist["last_certified"],
        as_of_round=9, watch=watch, window=5,
    )
    assert plan["overflow"] == 0


def test_runtime_snapshot_preferred_only_when_newer(tmp_path, monkeypatch):
    """ADVICE r9 #4: automated regeneration targets a gitignored RUNTIME
    snapshot; load_history prefers it only when it covers a newer round
    than the committed file, so a stale leftover can never skew the
    window backwards."""
    import json

    committed = tmp_path / "cert_history.json"
    runtime = tmp_path / "_cert_history_runtime.json"
    committed.write_text(json.dumps(
        {"as_of_round": 9, "last_certified": {"q": 9}}
    ))
    monkeypatch.setattr(_rotation, "COMMITTED_SNAPSHOT", str(committed))
    monkeypatch.setattr(_rotation, "RUNTIME_SNAPSHOT", str(runtime))
    assert _rotation.load_history()["as_of_round"] == 9
    # stale runtime (same or older round): ignored
    runtime.write_text(json.dumps(
        {"as_of_round": 9, "last_certified": {"q": 8}}
    ))
    assert _rotation.load_history()["last_certified"] == {"q": 9}
    # newer runtime (round boundary, before CLI promotion): preferred
    runtime.write_text(json.dumps(
        {"as_of_round": 10, "last_certified": {"q": 10}}
    ))
    assert _rotation.load_history()["as_of_round"] == 10
    # corrupt runtime: fall back to committed, no crash
    runtime.write_text("{not json")
    assert _rotation.load_history()["as_of_round"] == 9


def test_regenerate_targets_runtime_not_committed(tmp_path):
    """Automated runs must never rewrite the tracked snapshot (ADVICE r9
    #4): with a fresh committed file, regenerate_if_stale is a no-op; with
    newer artifacts it writes ONLY the runtime path."""
    import json

    mod = _gen_rotation_module()
    root = str(tmp_path)
    committed = tmp_path / "c.json"
    runtime = tmp_path / "r.json"
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps({
        "q": {"rows_match": True, "schema_match": True,
              "hash_match": True, "err": None},
    }))
    committed.write_text(json.dumps(
        {"as_of_round": 1, "last_certified": {"q": 1}}
    ))
    # fresh committed snapshot: nothing written anywhere
    import unittest.mock as mock

    with mock.patch.object(mod, "OUT", str(committed)):
        assert mod.regenerate_if_stale(root=root, out=str(runtime)) is False
        assert not runtime.exists()
        # newer artifact: runtime written, committed untouched
        (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps({
            "q2": {"rows_match": True, "err": ""},
        }))
        before = committed.read_text()
        assert mod.regenerate_if_stale(root=root, out=str(runtime)) is True
        assert committed.read_text() == before
        snap = json.loads(runtime.read_text())
        assert snap["as_of_round"] == 2


def test_next_round_plan_remains_satisfiable():
    """The r9 failure was discovered only AT the round boundary.  Guard
    one round ahead: assume this round's window certifies green, advance
    the clock, and the NEXT round's plan (its mandatory recertifications,
    with this round's WATCH spent/inert) must still fit the window."""
    hist = _rotation.load_history()
    this_round = hist["as_of_round"] + 1
    last = dict(hist["last_certified"])
    for name in list(QUERIES)[: _rotation.WINDOW]:
        last[name] = this_round
    future = {n: r for n, r in last.items() if n in QUERIES}
    plan = _rotation.plan_window(
        sorted(QUERIES), future, as_of_round=this_round,
        watch=_rotation.WATCH,
    )
    assert plan["overflow"] == 0, (
        f"round {this_round + 1} would be oversubscribed the moment this "
        f"round certifies: {len(plan['must'])} mandatory + "
        f"{len(plan['watch'])} watch > {plan['window']}"
    )
    # and with a full fresh WATCH of typical size there must be slack
    assert len(plan["must"]) <= _rotation.WINDOW - 5, (
        "next round leaves fewer than 5 WATCH slots - retire or merge "
        "queries now, not at the boundary"
    )


def test_registry_within_lifetime_budget():
    """VERDICT r9 ask #2: every registered query permanently consumes
    recurring window slots; the registry must stay within
    WINDOW * MAX_STALENESS - REGISTRY_MARGIN."""
    assert len(QUERIES) <= _rotation.REGISTRY_BUDGET, (
        f"{len(QUERIES)} queries > budget {_rotation.REGISTRY_BUDGET}: "
        "consolidate before adding more"
    )


def test_new_queries_lead_window():
    """Never-certified queries (this round's additions) must occupy the
    head of the window so they get first-time driver certification."""
    hist = _rotation.load_history()["last_certified"]
    fresh = [n for n in QUERIES if n not in hist]
    head = list(QUERIES)[: len(fresh)] if fresh else []
    assert sorted(head) == sorted(fresh)
