"""Artifact↔commit provenance (VERDICT r15 ask #7).

Round 15's rehearsal artifacts predated two later behavior-identical
commits, and adjudicating that required reading diffs by hand.  This
module makes the discipline mechanical instead of argumentative:

- every rehearsal tool stamps its JSON with :func:`artifact_stamp` — the
  commit it ran on plus any *code* paths dirty in the working tree at
  run time;
- ``tools/verify_all.py`` asserts, for the current round's committed
  rehearsal artifacts, that the stamped commit differs from HEAD by
  doc/artifact-only changes (:func:`code_diff_vs_head`) and that the
  tree was code-clean when the artifact was produced.

"Code" is anything that can change measured behavior: the package,
the entry module, bench, tools, tests.  Markdown/JSON artifacts and
memory files are not code — re-running every rehearsal because a round
note was edited would be the opposite of discipline.
"""

from __future__ import annotations

import os
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Paths whose change can alter measured behavior.  tools/ is included on
# purpose: the rehearsal harnesses themselves are part of what a number
# means.
CODE_PATHS = (
    "meerkat_abacus_spark",
    "tests",
    "tools",
    "bench.py",
    "__spark_entry__.py",
)


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=REPO, capture_output=True, text=True, timeout=60
    ).stdout.strip()


def _code_only(paths, prefixes=CODE_PATHS) -> list[str]:
    out = []
    for p in paths:
        p = p.strip()
        if p and any(
            p == c or p.startswith(c.rstrip("/") + "/") for c in prefixes
        ):
            out.append(p)
    return sorted(out)


def artifact_stamp() -> dict:
    """The provenance stamp a rehearsal tool embeds in its report:
    ``{"commit": <HEAD sha>, "dirty_code_paths": [...]}``.  A non-empty
    ``dirty_code_paths`` means the numbers were produced on code not in
    any commit — the verify gate treats that as unverifiable."""
    commit = _git("rev-parse", "HEAD")
    dirty = _git("status", "--porcelain")
    dirty_paths = [ln[3:] for ln in dirty.splitlines() if len(ln) > 3]
    return {
        "commit": commit or None,
        "dirty_code_paths": _code_only(dirty_paths),
    }


def code_diff_vs_head(commit: str, prefixes=CODE_PATHS) -> list[str] | None:
    """Code paths that changed between ``commit`` and HEAD — empty means
    the artifact is current (any remaining diff is docs/artifacts only).
    ``prefixes`` narrows "code" to the paths that can actually feed the
    artifact's numbers (verify_all passes, per rehearsal artifact, the
    package plus that rehearsal's own harness — a gate amendment in one
    harness must not invalidate a different rehearsal's numbers).
    ``None`` means git could not resolve the commit (unknown sha, shallow
    history): the caller must treat that as stale, not as clean."""
    if not commit:
        return None
    probe = subprocess.run(
        ["git", "cat-file", "-e", f"{commit}^{{commit}}"],
        cwd=REPO, capture_output=True, text=True, timeout=60,
    )
    if probe.returncode != 0:
        return None
    diff = _git("diff", "--name-only", commit, "HEAD")
    return _code_only(diff.splitlines(), prefixes)
