"""Registry plumbing shared by every query family: the QUERIES/ORACLES
maps, the ``_register`` decorator, defensive parquet readers, and the
synthetic doc/embedding corpora used by the LLM-pipeline families."""

from __future__ import annotations

from collections.abc import Callable
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


QueryFn = Callable[[SparkSession, str], DataFrame]



QUERIES: dict[str, QueryFn] = {}


ORACLES: dict[str, str] = {}




def _register(name: str, oracle: str | None = None):
    def wrap(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return wrap




_SCRATCH_TAG_MEMO: dict[str, str] = {}


def _scratch_tag(sf_dir: str) -> str:
    """Stable per-DATASET scratch-path tag: md5 of the sf_dir path plus each
    table file's (name, size, mtime) — regenerating the testdata changes the
    fingerprint, so scratch derived from an older dataset is never silently
    reused against a fresh oracle.  md5, NOT python hash(): str hash is
    salted per process, so hash()-keyed /tmp/msa_* dirs would multiply
    across runs instead of being reused.

    Memoized per (process, sf_dir) — VERDICT r12 ask #2: every query
    invocation called this, so a bench warm pass paid a listdir + ~10
    stats + md5 per call.  The memo is safe because the invalidation the
    fingerprint exists for (driver regenerates testdata between rounds)
    happens across PROCESSES, never mid-process: bench/compare/rehearsal
    are all fresh interpreters per run, and nothing in this repo rewrites
    an sf_dir it is simultaneously querying."""
    return _scratch_tag_ok(sf_dir)[0]


def _scratch_tag_ok(sf_dir: str) -> "tuple[str, bool]":
    """:func:`_scratch_tag` plus a validity flag (ADVICE r14 #1): ``ok``
    is False when the directory listing failed and the tag is therefore
    PATH-ONLY — it no longer fingerprints the dataset's contents, so
    caches keyed on it must not insert or serve under it (a regenerated
    dataset behind a flaky FS would otherwise be served a stale pinned
    frame).  The memo already skips such tags; in-process frame caches
    (queries/multimodal._EMB_CACHE) skip them via this flag."""
    cached = _SCRATCH_TAG_MEMO.get(sf_dir)
    if cached is not None:
        return cached, True
    import hashlib
    import os

    h = hashlib.md5(sf_dir.encode())
    listed_ok = True
    try:
        for entry in sorted(os.listdir(sf_dir)):
            st = os.stat(os.path.join(sf_dir, entry))
            h.update(f"{entry}:{st.st_size}:{st.st_mtime_ns}".encode())
    except OSError:
        # Don't memoize a path-only fingerprint: a transient FS error on
        # the first call would otherwise permanently disable the
        # dataset-regeneration invalidation for this process (ADVICE r13).
        listed_ok = False
    tag = h.hexdigest()[:8]
    if listed_ok:
        _SCRATCH_TAG_MEMO[sf_dir] = tag
    return tag, listed_ok


def _scratch_ready(path: str) -> bool:
    """A scratch dataset is reusable only if its write COMPLETED: Spark
    drops a ``_SUCCESS`` marker at job commit, so a crashed/partial prior
    write (directory present, marker absent) triggers a rewrite instead of
    being silently reused."""
    import os

    return os.path.exists(os.path.join(path, "_SUCCESS"))


def _proc_scratch_tag(sf_dir: str) -> str:
    """Per-PROCESS variant of :func:`_scratch_tag` for rebuild-per-call
    fixtures (streaming replays, upsert targets): those sites ``rmtree``
    their scratch at the top of every invocation, so a dataset-shared path
    buys no reuse — it only lets two concurrent verification processes
    (e.g. the driver's bench alongside a compare run) delete each other's
    live checkpoints mid-stream.  The pid suffix makes each process's
    fixture private; within one process the path is still stable, so the
    rmtree-then-rebuild lifecycle is unchanged."""
    import os

    return f"{_scratch_tag(sf_dir)}_p{os.getpid()}"


class ScratchBuildTimeout(RuntimeError):
    """Waited too long for another process's shared-scratch build."""


def build_shared_scratch(
    lock_base: str,
    ready_fn,
    build_fn,
    stale_sec: float = 1800.0,
    wait_timeout: float = 1200.0,
    poll_sec: float = 0.25,
) -> None:
    """Cross-process-safe gated build of a SHARED scratch artifact (the
    persisted ANN indexes, the csv/orc/jsonl round-trip fixtures).

    The unguarded pattern ``if not ready(): rmtree(); build(); mark()``
    races under concurrent processes: both see not-ready, both build into
    the same path, and one rmtree lands on the other's half-written tree
    (observed this round: two verification runs colliding on a streaming
    fixture).  Same failure class as the compaction race closed by
    ``similarity._CompactLock`` (ADVICE r11 #2) — this is the BUILD-side
    lock, with wait-for-ready semantics instead of raise-on-contention:

    - fast path: ``ready_fn()`` true → return, no lock traffic;
    - O_EXCL lock acquired → re-check ``ready_fn`` UNDER the lock (the
      previous holder may have finished the build), run ``build_fn``;
      the lock is released in a finally, so a crashed build leaves the
      path not-ready and the next caller rebuilds;
    - lock held by another process → poll until it releases or the
      artifact turns ready; a lock older than ``stale_sec`` is presumed
      crashed and broken (O_EXCL re-arbitrates racing breakers).

    ``build_fn`` must leave the artifact in a state ``ready_fn`` accepts
    (write the marker last); ``ready_fn`` must be cheap — it runs once per
    poll tick while waiting."""
    import os
    import time

    lock = lock_base + ".build.lock"
    deadline = time.time() + wait_timeout
    while True:
        if ready_fn():
            return
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            try:
                age = time.time() - os.path.getmtime(lock)
            except OSError:
                continue  # holder just released; retry immediately
            if age > stale_sec:
                try:
                    os.unlink(lock)  # breakers re-race on O_EXCL
                except OSError:
                    pass
                continue
            if time.time() > deadline:
                raise ScratchBuildTimeout(
                    f"waited {wait_timeout:.0f}s for another process's "
                    f"build lock at {lock}; artifact still not ready"
                )
            time.sleep(poll_sec)
            continue
        try:
            os.write(fd, f"{os.getpid()} {time.time()}".encode())
            os.close(fd)
            if not ready_fn():  # re-check under the lock
                build_fn()
        finally:
            try:
                os.unlink(lock)
            except OSError:
                pass
        return




# Reader-handle memo (r16, guide §7.3/§6: file listing + footer schema
# inference are DRIVER-side work, ~85 ms per spark.read.parquet call —
# and every query function rebuilds its DataFrames on every invocation,
# so the registry paid it on every run of every query).  The memo stores
# the IMMUTABLE DataFrame handle (a logical plan), never rows: every
# action still computes from the parquet files, so this is plan/metadata
# reuse in the same class as Spark's own FileIndex cache, not result
# caching.  Keyed on (appId, path, mtime_ns, size) so a new session or a
# rewritten input file misses the memo — same staleness contract as the
# serving-index reader memos in datapipe/similarity.py.
_TABLE_MEMO: dict[tuple, DataFrame] = {}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    import os as _os

    path = f"{sf_dir}/{name}.parquet"
    # Defensive reader configs, set BEFORE any read and for EVERY table (not
    # just events): orders.o_orderdate / lineitem.l_shipdate are also naive
    # timestamp[us] parquet columns, so on a caller-owned session without
    # get_spark's defaults they would read as TIMESTAMP_NTZ and mix with LTZ
    # literals downstream — and gating the conf on one table would make
    # schemas order-dependent across reads.  UTC session time keeps the
    # naive→LTZ cast instant-preserving (matches DuckDB's naive reader).
    # Set on every call (not just memo misses): the confs must hold in the
    # session at ACTION time for the nanos scan path, even on a
    # caller-owned session that reset them between calls.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    try:
        st = _os.stat(path)
        key = (
            spark.sparkContext.applicationId,
            _os.path.abspath(path),
            st.st_mtime_ns,
            st.st_size,
        )
    except OSError:
        key = None  # non-local or vanished: read uncached, fail there
    if key is not None and key in _TABLE_MEMO:
        return _TABLE_MEMO[key]
    if name != "events":
        df = spark.read.parquet(path)
    else:
        # events carries TIMESTAMP(NANOS) which Spark's vectorized reader
        # rejects; read nanos as long (exact) and rebuild a µs timestamp
        # with integer division — no double round-trip, no precision loss.
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif dict(df.dtypes).get("ts") == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    if key is not None:
        if len(_TABLE_MEMO) >= 256:  # bounded: ~tables × sf dirs × sessions
            _TABLE_MEMO.clear()
        _TABLE_MEMO[key] = df
    return df




# ===========================================================================
# Large-scale data-pipeline operators (BASELINE.json north star): dedup,
# similarity search, text analysis, multimodal plumbing.  The dedup queries
# plant deterministic near-duplicates (a perturbed copy of each document /
# a scaled copy of each embedding) so the operators have real positives to
# find, reproducibly in both engines.
# ===========================================================================

_DOC_CORPUS_SQL = """
    SELECT doc_id, text, lang FROM documents
    UNION ALL
    SELECT doc_id + 1000000, text || ' zz qq ww', lang FROM documents
"""




def _doc_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    copies = docs.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz qq ww")).alias("text"),
        "lang",
    )
    return docs.unionByName(copies)




_EMB_CORPUS_SQL = """
    SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings
    UNION ALL
    SELECT vec_id + 1000000, list_transform(embedding::DOUBLE[], x -> x * 2.0),
           label
    FROM embeddings
"""


_COS_SQL = (
    "(list_dot_product(a.v, b.v) / "
    "(sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))))"
)


def render_two_band_oracle(
    corpus_sql: str,
    id_col: str,
    b1_sql: str,
    b2_sql: str,
    cos_sql: str,
    cap: int,
    min_cosine: float,
) -> str:
    """ONE renderer for every two-band near-dup oracle (r13 review
    follow-up): dedup_embedding_lsh and multimodal_embed_neardup share
    the identical band/cap/union/verify SQL shape, and a fix applied to
    one hand-copied oracle but not the other would silently de-certify
    the twin.  ``corpus_sql`` must yield ``({id_col}, v)``; the band
    expressions are ``str.format``-templated on ``side``; the antithetic
    discipline is fixed here — g1 ascending md5 ranks, g2 descending —
    mirroring ``dedup._apply_block_cap(descending=bool(band % 2))``."""
    return f"""
    WITH corpus AS ({corpus_sql}),
    bucketed AS (
        SELECT c.*, ({b1_sql.format(side='c')}) AS b1,
               ({b2_sql.format(side='c')}) AS b2
        FROM corpus c
    ),
    g1 AS (
        SELECT * FROM (
            SELECT {id_col}, b1 AS bucket, ROW_NUMBER() OVER (
                PARTITION BY b1
                ORDER BY md5(CAST({id_col} AS VARCHAR)), {id_col}) AS rn
            FROM bucketed) WHERE rn <= {cap}
    ),
    g2 AS (
        SELECT * FROM (
            SELECT {id_col}, b2 AS bucket, ROW_NUMBER() OVER (
                PARTITION BY b2
                ORDER BY md5(CAST({id_col} AS VARCHAR)) DESC, {id_col} DESC) AS rn
            FROM bucketed) WHERE rn <= {cap}
    ),
    cand AS (
        SELECT a.{id_col} AS id_a, b.{id_col} AS id_b
        FROM g1 a JOIN g1 b ON a.bucket = b.bucket AND a.{id_col} < b.{id_col}
        UNION
        SELECT a.{id_col}, b.{id_col}
        FROM g2 a JOIN g2 b ON a.bucket = b.bucket AND a.{id_col} < b.{id_col}
    )
    SELECT c.id_a, c.id_b, ROUND({cos_sql}, 3) AS cosine
    FROM cand c
    JOIN bucketed a ON a.{id_col} = c.id_a
    JOIN bucketed b ON b.{id_col} = c.id_b
    WHERE {cos_sql} >= {min_cosine}
    """


def _emb_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("embedding"),
        "label",
    )
    copies = emb.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 2.0).alias("embedding"),
        "label",
    )
    return emb.unionByName(copies)




# --- Dedup clusters: LSH pairs → connected components → keep-one ----------
# A three-generation corpus (original, perturbed, doubly-perturbed) produces
# transitive A—B—C duplicate chains; components must merge them.

_DOC_CORPUS3_SQL = """
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 1000000, text || ' zz qq ww' FROM documents
    UNION ALL
    SELECT doc_id + 2000000, text || ' zz qq ww kk ll' FROM documents
"""




def _doc_corpus3(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    p1 = docs.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat("text", F.lit(" zz qq ww")).alias("text"),
    )
    p2 = docs.select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        F.concat("text", F.lit(" zz qq ww kk ll")).alias("text"),
    )
    return docs.unionByName(p1).unionByName(p2)
