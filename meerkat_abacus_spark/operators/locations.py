"""Location hierarchy (J5/J9): adjacency → flattened broadcast dimension.

Reference: meerkat_abacus/codes/to_codes.py:106-152 walks ``parent_location``
per record to fill clinic→district→region→zone→country.  Depth is fixed
(≤ 4 hops), so the walk flattens at build time into a wide dimension via
iterative self-joins; record enrichment is then a single broadcast hash join
(the dimension is a few thousand rows even nationally) — zero shuffles on the
fact side, and J9's ``is_child`` collapses to ``parent IN (clinic, district,
region, zone, country)``.

Multi-valued ``deviceid`` cells (comma-separated per clinic,
util/__init__.py:200-220) are exploded on the *dimension* side, never the
facts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# (appId, plan semanticHash, leaf level, column names) triples already
# validated this session — the check is an eager Spark job, so memoizing
# keeps repeated dimension builds pure plan construction.
_LEAF_PARENT_VALIDATED: set = set()


def _assert_no_leaf_parents(
    locations: DataFrame,
    id_col: str,
    parent_col: str,
    level_col: str,
    levels: tuple[str, ...],
) -> None:
    try:
        # ADVICE r10 #3: semanticHash alone is a PLAN hash — overwriting
        # the files behind the same source path yields an identical hash,
        # so a rewrite that introduces a leaf-parented row would skip
        # validation.  Fold a data fingerprint into the key: the backing
        # file listing plus (mtime, size) per local file.  In-memory
        # frames (LocalRelation) list no files, and there semanticHash
        # does cover the embedded data.
        import os as _os

        files = sorted(locations.inputFiles())
        stamps = []
        for f in files:
            p = f[len("file:"):] if f.startswith("file:") else f
            try:
                st = _os.stat(p)
                stamps.append((f, int(st.st_mtime_ns), st.st_size))
            except OSError:  # non-local / vanished: path identity only
                stamps.append((f, 0, 0))
        key = (
            locations.sparkSession.sparkContext.applicationId,
            locations.semanticHash(),
            tuple(stamps),
            levels[0], id_col, parent_col, level_col,
        )
    except Exception:  # semanticHash is a developer API — degrade to always-check
        key = None
    if key is not None and key in _LEAF_PARENT_VALIDATED:
        return
    leaf_parents = (
        locations.alias("__c")
        .join(
            locations.filter(F.col(level_col) == levels[0])
            .select(F.col(id_col).alias("__leaf_id")),
            F.col(f"__c.{parent_col}") == F.col("__leaf_id"),
            "left_semi",
        )
        .count()
    )
    if leaf_parents:
        raise ValueError(
            f"flatten_location_hierarchy: {leaf_parents} location row(s) "
            f"are parented under a {levels[0]!r}-level (leaf) node; the "
            "interior-only hop skeleton cannot resolve their ancestors. "
            "Fix the location table or pass a levels tuple whose first "
            "entry is the true leaf level."
        )
    if key is not None:
        if len(_LEAF_PARENT_VALIDATED) >= 512:
            _LEAF_PARENT_VALIDATED.clear()
        _LEAF_PARENT_VALIDATED.add(key)


def flatten_location_hierarchy(
    locations: DataFrame,
    id_col: str = "id",
    parent_col: str = "parent_location",
    level_col: str = "level",
    levels: tuple[str, ...] = ("clinic", "district", "region", "zone", "country"),
) -> DataFrame:
    """Adjacency table → one row per leaf with an id column per level.

    A clinic may hang directly off a region (NULL district —
    to_codes.py:138-146); the join chain is left outer so missing
    intermediate levels stay NULL.
    """
    # Only NON-LEAF nodes can be ancestors (the reference location model —
    # model.py:57-78 — never parents a row under a clinic), so the per-hop
    # broadcast carries the administrative skeleton (districts/regions/
    # zones/country), not the clinic list: O(interior nodes), which stays
    # in the thousands while the leaf count grows with the data.  Without
    # the filter the broadcast is O(clinics) and stops fitting at scale.
    #
    # ADVICE r9 #5: the assumption is ASSERTED, not silent — a location
    # table that parents a node under a leaf-level row (e.g. clinic under
    # clinic) would previously flatten correctly and now resolve NULL
    # ancestors, so detect it up front and fail loudly.  The dim is
    # broadcast-small by construction; one aggregate over it is noise
    # next to the hop joins — and it runs ONCE per distinct input plan
    # (memoized on (appId, semanticHash)), so query functions that
    # rebuild the same dimension per sweep stay lazy after the first
    # validation.
    _assert_no_leaf_parents(locations, id_col, parent_col, level_col, levels)

    def _q(ident: str) -> str:
        return "`" + ident.replace("`", "``") + "`"

    def _s(lit: str) -> str:
        return "'" + lit.replace("'", "''") + "'"

    nodes = locations.where(
        f"{_q(level_col)} IN ({', '.join(_s(lvl) for lvl in levels[1:])})"
    ).selectExpr(
        f"{_q(id_col)} AS __id",
        f"{_q(parent_col)} AS __parent",
        f"{_q(level_col)} AS __level",
    )
    # One selectExpr per hop instead of per-level withColumns (r16, guide
    # §7.3: every DataFrame op re-analyzes the whole accumulated plan
    # eagerly, and every Column-object construction is its own py4j
    # round-trip — 7 ops/hop with ~35 expression round-trips cost ~2.5×
    # the driver time of 2 ops/hop with string expressions parsed in one
    # call, on an identical final plan).  Column order and expressions
    # are equivalent to the historical withColumn chain: in-place
    # replacement for existing columns, append-in-levels-order for new
    # ones.  ``hop`` must be rebuilt per iteration: after the first join
    # its plan is part of ``out``'s lineage, and reusing the same object
    # would make the next join's column references ambiguous self-join
    # refs.
    out = locations.selectExpr(
        "*",
        f"{_q(parent_col)} AS __cursor",
        f"CASE WHEN {_q(level_col)} = {_s(levels[0])} "
        f"THEN {_q(id_col)} END AS {_q(levels[0] + '_id')}",
    )
    lvl_ids = {f"{lvl}_id": lvl for lvl in levels[1:]}
    for _hop in range(len(levels) - 1):
        hop = nodes.selectExpr(
            "__id AS __hop_id",
            "__parent AS __hop_parent",
            "__level AS __hop_level",
        )
        have = set(out.columns)
        hit = (
            "CASE WHEN __hop_level = {lvl} THEN __hop_id END"
        )
        proj = []
        for c in out.columns:
            if c == "__cursor":
                proj.append("__hop_parent AS __cursor")
            elif c in lvl_ids:
                proj.append(
                    f"coalesce({_q(c)}, "
                    f"{hit.format(lvl=_s(lvl_ids[c]))}) AS {_q(c)}"
                )
            else:
                proj.append(_q(c))
        for lvl in levels[1:]:
            c = f"{lvl}_id"
            if c not in have:
                proj.append(
                    f"coalesce(NULL, {hit.format(lvl=_s(lvl))}) AS {_q(c)}"
                )
        out = out.join(
            F.broadcast(hop), out["__cursor"] == hop["__hop_id"], "left"
        ).selectExpr(*proj)
    return out.drop("__cursor")


def explode_deviceids(clinics: DataFrame, deviceid_col: str = "deviceid") -> DataFrame:
    """One dimension row per device: split comma-joined deviceid cells
    (util/__init__.py:200-220)."""
    return clinics.withColumn(
        deviceid_col,
        F.explode(F.split(F.col(deviceid_col).cast("string"), ",\\s*")),
    )


def enrich_with_location(
    df: DataFrame,
    flattened_clinics: DataFrame,
    device_col: str = "deviceid",
    dim_device_col: str = "deviceid",
    prefix: str = "",
) -> DataFrame:
    """J5 — broadcast-join facts to the flattened clinic dimension on
    deviceid (optionally prefixed, location spec ``deviceid:column:prefix``,
    to_codes.py:106-131)."""
    dim = F.broadcast(
        flattened_clinics.withColumnRenamed(dim_device_col, "__dim_dev")
    )
    key = (
        F.concat(F.lit(prefix), F.col(device_col).cast("string"))
        if prefix
        else F.col(device_col).cast("string")
    )
    return df.join(dim, key == F.col("__dim_dev"), "left").drop("__dim_dev")


def is_child(parent_id_col, row_level_cols: list[str]):
    """J9 — hierarchy membership over the flattened dim
    (util/__init__.py:49-72)."""
    return F.col(parent_id_col).isin([F.col(c) for c in row_level_cols])


def population_rollup(
    flattened_leaves: DataFrame,
    levels: tuple[str, ...] = ("clinic", "district", "region", "zone", "country"),
    population_col: str = "population",
) -> DataFrame:
    """A6 — sum leaf (clinic) population into every ancestor level.

    Reference ``consumer/database_setup.py:156-166`` walks ``parent_location``
    per clinic row and increments each ancestor's population with one UPDATE
    per hop.  Over the flattened dimension the same answer is a single pass:
    explode each leaf row into one (level, ancestor_id) pair per non-null
    level column, then one groupBy — one shuffle total (on a dimension-sized
    table), no iteration, no per-row updates.

    Output: ``level``, ``location_id``, ``population`` — one row per location
    node that has at least one populated descendant (the clinic itself
    included, matching the reference where the clinic keeps its own value).
    """
    pairs = F.array(
        *[
            F.struct(
                F.lit(lvl).alias("level"),
                F.col(f"{lvl}_id").cast("long").alias("location_id"),
            )
            for lvl in levels
        ]
    )
    return (
        flattened_leaves.select(
            F.explode(pairs).alias("node"),
            F.col(population_col).alias("__pop"),
        )
        .filter(F.col("node.location_id").isNotNull())
        .groupBy(
            F.col("node.level").alias("level"),
            F.col("node.location_id").alias("location_id"),
        )
        .agg(F.sum("__pop").alias("population"))
    )


def attach_device_tags(
    df: DataFrame,
    devices: DataFrame,
    device_col: str = "deviceid",
    tags_col: str = "tags",
) -> DataFrame:
    """Attach per-device tags as ``tags`` (reference model.py:81-84;
    codes/to_codes.py:127 joins device tags onto each record).  Broadcast
    join — the device table is a dimension."""
    dim = F.broadcast(
        devices.select(
            F.col(device_col).alias("__dev"), F.col(tags_col).alias("tags")
        )
    )
    key = F.col("`" + device_col.replace("`", "``") + "`").cast("string")
    return df.join(dim, key == F.col("__dev").cast("string"), "left").drop("__dev")
