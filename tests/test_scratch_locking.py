"""Cross-process safety of the shared-scratch build lock (r12).

Two verification processes on one host (the driver's bench alongside a
compare run) previously raced the marker-gated index builds: both saw
not-ready, both built into the same /tmp path, and one rmtree landed on
the other's half-written tree.  ``build_shared_scratch`` serializes the
build on an O_EXCL lock with wait-for-ready semantics; these tests pin
the arbitration (threads share the path exactly like processes do — the
lock is a filesystem artifact, not a threading primitive)."""

from __future__ import annotations

import os
import threading
import time

import pytest

from meerkat_abacus_spark.queries._shared import (
    ScratchBuildTimeout,
    _proc_scratch_tag,
    _scratch_tag,
    build_shared_scratch,
)


def test_build_happens_once_under_concurrency(tmp_path):
    base = str(tmp_path / "artifact")
    marker = base + ".READY"
    builds = []

    def ready():
        return os.path.exists(marker)

    def build():
        builds.append(threading.get_ident())
        time.sleep(0.3)  # long enough that every other caller must wait
        open(marker, "w").close()

    errs = []

    def call():
        try:
            build_shared_scratch(base, ready, build, poll_sec=0.02)
        except Exception as e:  # pragma: no cover - failure detail
            errs.append(e)

    threads = [threading.Thread(target=call) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errs == []
    assert len(builds) == 1  # exactly one builder; the rest waited
    assert ready()
    assert not os.path.exists(base + ".build.lock")  # released


def test_crashed_build_releases_lock_and_next_caller_rebuilds(tmp_path):
    base = str(tmp_path / "artifact")
    marker = base + ".READY"

    def ready():
        return os.path.exists(marker)

    def bad_build():
        raise RuntimeError("boom")

    with pytest.raises(RuntimeError, match="boom"):
        build_shared_scratch(base, ready, bad_build)
    # lock must not leak: the artifact is still not ready, and a healthy
    # caller can immediately acquire and build
    assert not os.path.exists(base + ".build.lock")

    def good_build():
        open(marker, "w").close()

    build_shared_scratch(base, ready, good_build)
    assert ready()


def test_stale_lock_is_broken(tmp_path):
    base = str(tmp_path / "artifact")
    marker = base + ".READY"
    lock = base + ".build.lock"
    open(lock, "w").close()
    old = time.time() - 7200
    os.utime(lock, (old, old))  # holder "crashed" two hours ago

    def build():
        open(marker, "w").close()

    build_shared_scratch(
        base, lambda: os.path.exists(marker), build, stale_sec=1800
    )
    assert os.path.exists(marker)
    assert not os.path.exists(lock)


def test_fresh_foreign_lock_times_out(tmp_path):
    base = str(tmp_path / "artifact")
    lock = base + ".build.lock"
    open(lock, "w").close()  # fresh: another process is "building"

    with pytest.raises(ScratchBuildTimeout):
        build_shared_scratch(
            base,
            lambda: False,
            lambda: None,
            wait_timeout=0.3,
            poll_sec=0.05,
        )
    # the foreign lock is not ours to remove
    assert os.path.exists(lock)


def test_waiter_returns_when_artifact_turns_ready(tmp_path):
    """A caller blocked on a foreign lock returns as soon as ready_fn
    flips true, without ever acquiring the lock itself."""
    base = str(tmp_path / "artifact")
    marker = base + ".READY"
    lock = base + ".build.lock"
    open(lock, "w").close()

    def flip():
        time.sleep(0.2)
        open(marker, "w").close()

    t = threading.Thread(target=flip)
    t.start()
    build_shared_scratch(
        base,
        lambda: os.path.exists(marker),
        lambda: (_ for _ in ()).throw(AssertionError("must not build")),
        wait_timeout=5.0,
        poll_sec=0.05,
    )
    t.join()
    assert os.path.exists(lock)  # still the foreign process's lock


def test_proc_scratch_tag_is_pid_scoped(tmp_path):
    d = str(tmp_path)
    assert _proc_scratch_tag(d) == f"{_scratch_tag(d)}_p{os.getpid()}"
    # per-process, same within the process (stable rmtree-reuse lifecycle)
    assert _proc_scratch_tag(d) == _proc_scratch_tag(d)
