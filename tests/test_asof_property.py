"""Property test: the asof_join composition (tag + union + running
last/first-non-null window, operators/temporal.py) agrees with a direct
Python reference model on randomized keyed event sets, in BOTH directions
and in the chained backward+forward shape the consolidated ``asof_join``
registry query uses (r10: asof_join_forward folded in).

The model is the textbook definition: for every left row, the right row
with the max ts <= left.ts (backward) / min ts >= left.ts (forward)
sharing the key, ties on (key, ts) pre-resolved to the largest tiebreaker.
Seeded random data, one Spark collect per direction.
"""

import random

from pyspark.sql import functions as F

from meerkat_abacus_spark.operators.temporal import asof_join


def _gen(seed: int, n_users: int = 8, n_clicks: int = 120, n_purch: int = 90):
    rng = random.Random(seed)
    clicks = [
        (i, rng.randrange(n_users), rng.randrange(0, 500))
        for i in range(n_clicks)
    ]
    purchases = [
        (1000 + i, rng.randrange(n_users), rng.randrange(0, 500),
         round(rng.uniform(0, 100), 2))
        for i in range(n_purch)
    ]
    return clicks, purchases


def _model(clicks, purchases, direction):
    # tie-break: same (user, ts) purchases resolve to the max event_id
    best = {}
    for (e, u, t, v) in purchases:
        k = (u, t)
        if k not in best or e > best[k][0]:
            best[k] = (e, v)
    out = {}
    for (e, u, t) in clicks:
        if direction == "backward":
            cands = [(pt, pv) for (pu, pt), (_pe, pv) in best.items()
                     if pu == u and pt <= t]
            pick = max(cands) if cands else None
        else:
            cands = [(pt, pv) for (pu, pt), (_pe, pv) in best.items()
                     if pu == u and pt >= t]
            pick = min(cands) if cands else None
        out[e] = pick  # (matched_ts, value) or None
    return out


def test_asof_join_matches_model_both_directions(spark):
    for seed in (1, 7, 42):
        clicks, purchases = _gen(seed)
        left = spark.createDataFrame(
            clicks, "event_id long, user_id long, ts long"
        )
        right = spark.createDataFrame(
            purchases, "event_id long, user_id long, ts long, value double"
        )
        for direction in ("backward", "forward"):
            got = {
                r["event_id"]: (
                    (r["ts_r"], r["value_r"]) if r["ts_r"] is not None else None
                )
                for r in asof_join(
                    left, right, on=["user_id"], ts_col="ts",
                    payload_cols=["value"], tiebreak_col="event_id",
                    direction=direction,
                ).collect()
            }
            assert got == _model(clicks, purchases, direction), (
                f"seed={seed} direction={direction}"
            )


def test_asof_join_chained_both_directions_matches_model(spark):
    """The consolidated registry query chains backward then forward over
    the backward output — the forward pass must see every left row
    unchanged (left-outer both times) and attach its own match."""
    clicks, purchases = _gen(99)
    left = spark.createDataFrame(
        clicks, "event_id long, user_id long, ts long"
    )
    right = spark.createDataFrame(
        purchases, "event_id long, user_id long, ts long, value double"
    )
    back = asof_join(
        left, right, on=["user_id"], ts_col="ts",
        payload_cols=["value"], tiebreak_col="event_id",
    ).select(
        "event_id", "user_id", "ts",
        F.col("ts_r").alias("b_ts"), F.col("value_r").alias("b_val"),
    )
    both = asof_join(
        back, right, on=["user_id"], ts_col="ts",
        payload_cols=["value"], tiebreak_col="event_id",
        direction="forward",
    )
    rows = both.collect()
    assert len(rows) == len(clicks)  # left-outer: every click survives
    mb = _model(clicks, purchases, "backward")
    mf = _model(clicks, purchases, "forward")
    for r in rows:
        want_b = mb[r["event_id"]]
        want_f = mf[r["event_id"]]
        got_b = (r["b_ts"], r["b_val"]) if r["b_ts"] is not None else None
        got_f = (r["ts_r"], r["value_r"]) if r["ts_r"] is not None else None
        assert got_b == want_b and got_f == want_f, r["event_id"]


def test_minhash_signature_matches_python_model(spark):
    """The per-slot rehash arithmetic (ADVICE r9 #1 + the 32-bit
    truncation) pinned against an exact Python model over random 60-bit
    digests — any engine-side precision or precedence drift flips this."""
    from meerkat_abacus_spark.datapipe.dedup import (
        _MERSENNE61,
        _affine_consts,
        minhash_signature,
    )

    rng = random.Random(13)
    docs = [
        [rng.randrange(0, 1 << 60) for _ in range(rng.randrange(1, 6))]
        for _ in range(40)
    ]
    df = spark.createDataFrame([(hs,) for hs in docs], "hs array<long>")
    got = [
        r["sig"]
        for r in df.select(minhash_signature(F.col("hs")).alias("sig")).collect()
    ]
    consts = _affine_consts(64)
    for hs, sig in zip(docs, got):
        want = [
            min(
                (a * (h % (1 << 30)) + b * (h >> 30) + c)
                % _MERSENNE61 % (1 << 32)
                for h in hs
            )
            for (a, b, c) in consts
        ]
        assert sig == want
