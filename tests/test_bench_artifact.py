"""Bench artifact parseability (VERDICT r11 ask #1).

The driver records a FIXED-SIZE TAIL of bench stdout (~2215 chars
observed in BENCH_r11.json) and parses a JSON line out of it; r11's
single detailed line outgrew the window and the round's suite totals
became machine-unreadable (``"parsed": null``).  bench.py now prints a
compact totals-only line LAST — these tests pipe the exact two-line
stdout through a simulated tail window and parse it the way a
tail-capturing driver would, so the format can't silently regress.

No Spark session needed: the artifact lines are pure functions of the
timing dicts.
"""

from __future__ import annotations

import importlib.util
import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The raw capture window: BENCH_r11.json's "tail" field held 2215 chars
# of payload.  Simulate slightly tighter to keep margin honest.
TAIL_WINDOW = 2048


def _bench():
    spec = importlib.util.spec_from_file_location(
        "bench_mod_artifact", os.path.join(ROOT, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _fake_detailed(bench) -> dict:
    """A detailed artifact shaped exactly like main()'s, with the REAL
    headline names (so the compact line's size reflects the shipping
    query set) and a full 21-sentinel vector."""
    timings = {
        name: {
            "cold": 1.234,
            "warm": 0.987,
            "cal": 0.0449,
            "warm_norm": 1.001,
        }
        for name in bench.HEADLINE
    }
    n_sent = len(bench.HEADLINE) + 1
    return {
        "metric": "headline_suite_total",
        "value": 11.853,
        "value_cold": 28.614,
        "value_normalized": 12.001,
        "unit": "sec",
        "queries": timings,
        "index_build_sec": {"lsh_index_lifecycle": 17.512},
        "sf": 0.1,
        "runs_per_query": 3,
        "calibration": {
            "pre": 0.0441,
            "post": 0.0448,
            "ref": 0.0445,
            "spread": 1.05,
            "sentinels": [0.0441 + i * 1e-4 for i in range(n_sent)],
        },
    }


def _stdout_lines(bench, detailed: dict) -> str:
    """Render stdout exactly as main() prints it: detailed line, then
    the compact line last."""
    return (
        json.dumps(detailed) + "\n" + json.dumps(
            bench.compact_artifact(detailed)
        ) + "\n"
    )


def _driver_parse(tail: str):
    """How a tail-capturing driver recovers the artifact: the LAST
    JSON-loadable line inside the window."""
    parsed = None
    for line in tail.splitlines():
        try:
            candidate = json.loads(line)
        except json.JSONDecodeError:
            continue
        if isinstance(candidate, dict):
            parsed = candidate
    return parsed


def test_compact_line_survives_tail_window():
    bench = _bench()
    detailed = _fake_detailed(bench)
    stdout = _stdout_lines(bench, detailed)
    # Precondition that motivated the fix: the detailed line alone does
    # NOT fit the window (if it ever shrinks below it, the compact line
    # is redundant but still harmless).
    tail = stdout[-TAIL_WINDOW:]
    parsed = _driver_parse(tail)
    assert parsed is not None, "no JSON line survived the tail window"
    assert parsed["metric"] == "headline_suite_total"
    for key in ("value", "value_cold", "value_normalized", "sf"):
        assert key in parsed, key
    # per-query map: every headline query, warm seconds as a number
    assert set(parsed["queries"]) == set(bench.HEADLINE)
    assert all(
        isinstance(v, (int, float)) for v in parsed["queries"].values()
    )
    assert parsed["index_build_sec"] == {"lsh_index_lifecycle": 17.512}


def test_compact_line_within_budget_with_margin():
    bench = _bench()
    line = json.dumps(bench.compact_artifact(_fake_detailed(bench)))
    # Enough slack under the simulated window that one more query or a
    # longer name doesn't break capture between rounds.
    assert len(line) <= bench._COMPACT_BUDGET
    assert bench._COMPACT_BUDGET <= TAIL_WINDOW - 100


def test_compact_budget_guard_trips_on_growth():
    bench = _bench()
    detailed = _fake_detailed(bench)
    for i in range(60):  # a runaway headline set must fail LOUDLY
        detailed["queries"][f"some_future_query_with_a_long_name_{i}"] = {
            "cold": 1.0, "warm": 1.0, "cal": 0.05, "warm_norm": 1.0
        }
    try:
        bench.compact_artifact(detailed)
    except ValueError as e:
        assert "tail capture" in str(e)
    else:
        raise AssertionError("oversized compact line did not raise")


def _verify_all():
    spec = importlib.util.spec_from_file_location(
        "verify_all_mod", os.path.join(ROOT, "tools", "verify_all.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_verify_consumes_compare_json_summary():
    """tools/verify_all.py parses compare.py's final JSON summary line
    (VERDICT r11 ask #7) instead of scraping the OK/FAIL text."""
    va = _verify_all()
    registry = ["q1", "q2", "q3", "q4"]
    stdout = (
        "OK    q1: 10 rows match (0.1s spark)\n"
        "FAIL  q2: value hash mismatch (3 rows)\n"
        "SKIP  q3: no oracle (rows=5, 0.1s)\n"
        "OK    q4: 2 rows match (0.1s spark)\n"
        + json.dumps(
            {
                "summary": "compare",
                "sf_dir": "/x",
                "total": 4,
                "ok": 2,
                "skip": 1,
                "failures": ["q2"],
                "skipped": ["q3"],
            }
        )
        + "\n"
    )
    out = va.parse_compare_output(stdout, "", registry)
    assert out["source"] == "json_summary"
    assert out["ok"] == 2 and out["skip"] == 1
    assert out["failures"] == ["q2"]
    assert out["missing"] == []


def test_verify_compare_fallback_scrape_on_crash():
    """A compare run that dies before its summary line still yields a
    named report via the scrape fallback."""
    va = _verify_all()
    registry = ["q1", "q2", "q3"]
    stdout = (
        "OK    q1: 10 rows match (0.1s spark)\n"
        "FAIL  q2: spark error: Py4JJavaError: boom\n"
        "Traceback (most recent call last):\n  ...\n"
    )
    out = va.parse_compare_output(stdout, "", registry)
    assert out["source"] == "scrape_fallback"
    assert out["ok"] == 1
    assert out["failures"] == ["q2"]
    assert out["missing"] == ["q3"]


def test_verify_compare_detects_unreached():
    """A truncated sweep (summary present but short) reports unreached
    registry entries instead of silently passing."""
    va = _verify_all()
    registry = [f"q{i}" for i in range(10)]
    stdout = json.dumps(
        {
            "summary": "compare",
            "sf_dir": "/x",
            "total": 4,
            "ok": 4,
            "skip": 0,
            "failures": [],
            "skipped": [],
        }
    )
    out = va.parse_compare_output(stdout, "", registry)
    assert out["missing"] == ["<6 unreached>"]


def test_contention_banner_fires_on_contended_sentinels():
    """VERDICT r13 ask #8: a synthetic contended sentinel list (spread
    3.1 > 2) must produce the explicit CONTENDED banner naming the
    spread and the A/B remedy; a quiet list must stay silent, and the
    banner must never be a JSON-loadable line (it would shadow the
    compact artifact in a tail-parsing driver)."""
    bench = _bench()
    contended = [0.05, 0.052, 0.155, 0.051, 0.05]
    banner = bench.contention_banner(contended)
    assert banner is not None
    assert "CONTENDED" in banner
    assert "3.10" in banner  # quotes the spread
    assert "A/B" in banner
    try:
        json.loads(banner)
        raise AssertionError("banner must not parse as JSON")
    except json.JSONDecodeError:
        pass
    # quiet host: ~1.0-1.5 spread stays silent
    assert bench.contention_banner([0.05, 0.052, 0.06, 0.051]) is None
    # degenerate inputs: no judgement possible, no banner
    assert bench.contention_banner([]) is None
    assert bench.contention_banner([0.05]) is None
    assert bench.contention_banner([0.0, 0.0]) is None
    # boundary: exactly the limit is NOT contended
    assert bench.contention_banner([1.0, 2.0]) is None


def test_totals_consistent_between_lines():
    """The compact line is a projection of the detailed one — totals and
    per-query warms must agree exactly (no recomputation drift)."""
    bench = _bench()
    detailed = _fake_detailed(bench)
    compact = bench.compact_artifact(detailed)
    assert compact["value"] == detailed["value"]
    assert compact["value_cold"] == detailed["value_cold"]
    assert compact["value_normalized"] == detailed["value_normalized"]
    for name, t in detailed["queries"].items():
        assert compact["queries"][name] == t["warm"]


def test_codegen_scan_catches_janino_fallbacks():
    """VERDICT r14 ask #4: the verify harness must fail loudly on janino
    codegen errors that do NOT fail queries (Spark logs ERROR and runs
    interpreted).  Pins the scan used by both tools/ansi_sim.py and
    tools/verify_all.py's ansi leg."""
    import os
    import sys

    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tools"),
    )
    from ansi_sim import scan_codegen_errors

    log = (
        "26/08/16 12:00:00 WARN SomeOtherThing: benign\n"
        "26/08/16 12:00:01 ERROR CodeGenerator: failed to compile: "
        "org.codehaus.janino.InternalCompilerException: Compiling "
        '"GeneratedClass": Code of method grows beyond 64 KB\n'
        "OK    ann_lsh_multiprobe (1.2s)\n"
    )
    hits = scan_codegen_errors(log)
    assert len(hits) == 1 and "CodeGenerator" in hits[0]
    assert scan_codegen_errors("all queries ANSI-clean\n") == []
    # each marker fires independently (reformatted log layouts)
    assert scan_codegen_errors("x InternalCompilerException y")
    assert scan_codegen_errors("... grows beyond 64 KB ...")


def test_artifact_stamp_and_staleness_classification():
    """VERDICT r15 ask #7: rehearsal artifacts carry a commit stamp and
    the verify gate classifies them mechanically — current (code diff vs
    HEAD empty), stale (code changed since, or produced on a dirty code
    tree, or unresolvable commit).  Pins the pieces: the code-path
    filter, the live-repo stamp, and the unknown-sha fallback."""
    import os
    import sys

    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tools"),
    )
    from _stamp import _code_only, artifact_stamp, code_diff_vs_head

    # code-path filter: docs/artifacts never count, code always does
    assert _code_only(
        ["VERDICT.md", "SCALE_r16.json", "PLANS.md", "notes/x.md"]
    ) == []
    assert _code_only(
        ["meerkat_abacus_spark/datapipe/similarity.py", "bench.py",
         "tools/verify_all.py", "tests/test_coding.py", "BENCH_r16.json"]
    ) == [
        "bench.py",
        "meerkat_abacus_spark/datapipe/similarity.py",
        "tests/test_coding.py",
        "tools/verify_all.py",
    ]
    # prefix discipline: "toolsmith.py" is not under "tools/"
    assert _code_only(["toolsmith.py", "benchmark.py"]) == []

    # per-artifact relevance (r16): a narrowed prefix set ignores code
    # that cannot feed the artifact's numbers
    narrowed = ("meerkat_abacus_spark", "tools/scale_rehearsal.py")
    assert _code_only(
        ["tools/ann_scale_rehearsal.py", "tools/scale_rehearsal.py",
         "meerkat_abacus_spark/datapipe/dedup.py", "tests/test_coding.py"],
        narrowed,
    ) == [
        "meerkat_abacus_spark/datapipe/dedup.py",
        "tools/scale_rehearsal.py",
    ]

    # live stamp: resolves HEAD, diff-vs-self is empty (current)
    stamp = artifact_stamp()
    assert stamp["commit"] and len(stamp["commit"]) == 40
    assert code_diff_vs_head(stamp["commit"]) == []

    # unknown sha / empty commit: unverifiable, must read as stale
    assert code_diff_vs_head("0" * 40) is None
    assert code_diff_vs_head("") is None


def test_verify_artifact_stamp_gate_rows():
    """The verify_all classification over synthetic artifact files:
    unstamped ⇒ stale, stamped-at-HEAD ⇒ current, missing ⇒ reported but
    not stale (the pre-rehearsal verify pass runs before they exist)."""
    import importlib.util
    import json
    import os
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(root, "tools"))
    spec = importlib.util.spec_from_file_location(
        "verify_all", os.path.join(root, "tools", "verify_all.py")
    )
    va = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(va)

    n = va.current_round()
    assert n >= 16  # this repo carries CORRECTNESS_r01..r{n-1}

    out = va.run_artifact_stamps()
    assert out["round"] == n
    # every classified artifact is exactly one of current/stale/missing
    names = {
        f"SCALE_r{n:02d}.json",
        f"SCALE_ANN_r{n:02d}.json",
        f"STREAM_SCALE_r{n:02d}.json",
    }
    classified = set(out["artifacts"]) | set(out["missing"])
    assert classified == names
    for fname, row in out["artifacts"].items():
        is_stale = fname in out["stale"]
        current = (
            row.get("commit")
            and row.get("code_diff_vs_head") == []
            and not row.get("dirty_code_paths")
        )
        assert bool(current) != is_stale


def test_dispatch_gate_decisive_vs_coinflip_cells():
    """VERDICT r15 ask #3: the restated dispatch gate — decisive cells
    (direct paths >20% apart) hold auto to 1.05x of best; coin-flip
    cells hold it to the paths' own observed spread (floored at 1.05x).
    r15's sf0.1 q20 cell (auto 1.27x, paths within 20%, spreads ~1.4x)
    must PASS under the restated gate; a genuine dispatch miss in a
    decisive cell must still FAIL."""
    import os
    import sys

    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tools"),
    )
    from ann_scale_rehearsal import dispatch_gate

    def cell(isin, join, auto, hint, isin_samples=None, join_samples=None):
        best = min(min(isin_samples or [isin]), min(join_samples or [join]))
        return {
            "isin_collect": {"sec": isin, "samples": isin_samples or [isin]},
            "join_dpp": {"sec": join, "samples": join_samples or [join]},
            "auto": {"sec": auto, "samples": [auto],
                     "vs_best_direct": round(auto / best, 3)},
            "auto_hint": {"sec": hint, "samples": [hint],
                          "vs_best_direct": round(hint / best, 3)},
        }

    def xover(q20, q2000):
        out = {"index_rows": 2000}
        for label, c in (("q20", q20), ("q2000", q2000)):
            for k, v in c.items():
                out[f"{label}_{k}"] = v
        return out

    # the r15 shape: q20 coin-flip (1.377 vs 1.58 direct, within 20%;
    # within-path spreads ~1.4x), auto at 1.27x — passes restated gate.
    # q2000 decisive (isin 2.4 vs join 5.2), auto on best within 5%.
    r15_like = xover(
        cell(1.377, 1.58, 1.745, 1.91,
             isin_samples=[1.377, 1.91, 1.52], join_samples=[1.58, 2.2, 1.7]),
        cell(2.4, 5.2, 2.45, 2.42),
    )
    g = dispatch_gate(r15_like)
    assert g["q20"]["decisive"] is False
    assert g["q20"]["pass"] is True          # bound = spread (~1.39x)
    assert g["q2000"]["decisive"] is True
    assert g["q2000"]["bound"] == 1.05
    assert g["q2000"]["pass"] is True

    # a real miss: decisive cell, auto 1.5x of best — must fail
    bad = xover(
        cell(1.0, 2.0, 1.5, 1.02),
        cell(2.4, 5.2, 2.45, 2.42),
    )
    g2 = dispatch_gate(bad)
    assert g2["q20"]["decisive"] is True
    assert g2["q20"]["auto_pass"] is False and g2["q20"]["pass"] is False

    # coin-flip with tight within-path spread: bound floors at 1.05
    tight = xover(
        cell(1.0, 1.1, 1.04, 1.03),
        cell(2.4, 5.2, 2.45, 2.42),
    )
    g3 = dispatch_gate(tight)
    assert g3["q20"]["bound"] == 1.05 and g3["q20"]["pass"] is True

    # mechanism rescue (the r16 10x q2000 shape): dispatcher picked the
    # measured-best path (isin, 6x faster than join), auto's tight
    # samples sit inside the direct leg's wide spread — min-vs-min says
    # 1.13x but auto's best is under the picked path's median, so the
    # cell passes with the rescue recorded
    rescue = xover(
        cell(2.4, 5.2, 2.45, 2.42),
        {
            "isin_collect": {"sec": 5.842,
                             "samples": [7.182, 5.842, 7.47, 7.953, 6.796]},
            "join_dpp": {"sec": 33.791,
                         "samples": [35.5, 33.791, 36.1, 41.2, 36.5]},
            "auto": {"sec": 6.629,
                     "samples": [6.766, 6.769, 6.629, 6.795, 6.791],
                     "picked": "lsh_topk_from_index",
                     "vs_best_direct": round(6.629 / 5.842, 3)},
            "auto_hint": {"sec": 6.623,
                          "samples": [6.84, 6.879, 6.645, 6.623, 8.218],
                          "vs_best_direct": round(6.623 / 5.842, 3)},
        },
    )
    g4 = dispatch_gate(rescue)
    assert g4["q2000"]["decisive"] is True
    assert g4["q2000"]["auto"] > 1.05          # min-vs-min alone fails...
    assert g4["q2000"]["auto_pass"] is True    # ...rescued vs picked median
    assert g4["q2000"]["auto_rescued_vs_picked_median"] <= 1.05
    assert g4["q2000"]["pass"] is True

    # the rescue must NOT fire when auto is genuinely slow (2x the
    # picked path's median) or when the dispatcher picked the WRONG path
    slow = xover(
        cell(2.4, 5.2, 2.45, 2.42),
        {
            "isin_collect": {"sec": 5.8, "samples": [7.0, 5.8, 7.4]},
            "join_dpp": {"sec": 33.8, "samples": [35.5, 33.8, 36.1]},
            "auto": {"sec": 14.0, "samples": [14.0, 14.2, 14.1],
                     "picked": "lsh_topk_from_index",
                     "vs_best_direct": round(14.0 / 5.8, 3)},
            "auto_hint": {"sec": 6.0, "samples": [6.0, 6.1, 6.2],
                          "vs_best_direct": round(6.0 / 5.8, 3)},
        },
    )
    assert dispatch_gate(slow)["q2000"]["auto_pass"] is False
    wrong_pick = xover(
        cell(2.4, 5.2, 2.45, 2.42),
        {
            "isin_collect": {"sec": 5.8, "samples": [7.0, 5.8, 7.4]},
            "join_dpp": {"sec": 33.8, "samples": [35.5, 33.8, 36.1]},
            "auto": {"sec": 34.0, "samples": [34.0, 34.2, 34.1],
                     "picked": "lsh_topk_from_index_join",
                     "vs_best_direct": round(34.0 / 5.8, 3)},
            "auto_hint": {"sec": 6.0, "samples": [6.0, 6.1, 6.2],
                          "vs_best_direct": round(6.0 / 5.8, 3)},
        },
    )
    assert dispatch_gate(wrong_pick)["q2000"]["auto_pass"] is False
