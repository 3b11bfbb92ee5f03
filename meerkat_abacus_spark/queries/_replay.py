"""Fixture-replay staging shared by the streaming certified queries
(r7 verdict ask #8): the registered callables should read as
slice-definition → run-stream → aggregate; the filesystem plumbing that
turns slice DataFrames into an ordered file-source replay lives HERE,
once, instead of being copy-pasted into every query body.

The replay contract: each slice becomes exactly ONE parquet file under
``<base>/src`` with strictly ascending mtimes, so a
``maxFilesPerTrigger=1`` + ``availableNow`` file stream consumes the
slices as ordered micro-batches — the harness stand-in for a queue
source's arrival order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stage_replay_files(base: str, slices: list[DataFrame]) -> tuple[str, str]:
    """Write each slice DataFrame as one parquet file under ``base/src``
    (ascending mtimes, slice order) and return ``(src, ckpt)`` paths.

    ``base`` is recreated from scratch each call — replays are
    per-invocation fixtures, never reused across runs (a stale checkpoint
    would make the stream skip files)."""
    import glob
    import os
    import shutil

    src, ckpt = base + "/src", base + "/ckpt"
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(src)
    for k, sl in enumerate(slices):
        tmp = f"{base}/tmp{k}"
        sl.coalesce(1).write.parquet(tmp)
        part = glob.glob(f"{tmp}/part-*.parquet")[0]
        dest = f"{src}/slice{k}.parquet"
        shutil.move(part, dest)
        shutil.rmtree(tmp)
        os.utime(dest, (1_700_000_000 + k, 1_700_000_000 + k))
    return src, ckpt


def time_quartile_slices(
    events: DataFrame, ts_col: str = "ts"
) -> list[DataFrame]:
    """Four global time slices at the ts quartiles — every user's events
    arrive in time order across micro-batches (the ordering contract the
    stateful operators document)."""
    bounds = events.selectExpr(
        f"percentile_approx({ts_col}, array(0.25, 0.5, 0.75), 10000) q"
    ).collect()[0]["q"]
    lo = [None] + list(bounds)
    hi = list(bounds) + [None]
    out = []
    for a, b in zip(lo, hi):
        sl = events
        if a is not None:
            sl = sl.filter(F.col(ts_col) > F.lit(a))
        if b is not None:
            sl = sl.filter(F.col(ts_col) <= F.lit(b))
        out.append(sl)
    return out
