"""Driver-facing query registry, assembled from the per-family modules.

Conventions (every family module follows them):
- every callable takes (spark, sf_dir) and returns a DataFrame;
- every computed column is aliased identically in Spark and oracle SQL
  (the driver hash-compares values after sorting columns by name);
- floating-point outputs are rounded so cross-engine summation-order noise
  cannot flip the hash.

Importing the family modules registers their queries; ``_REGISTRY_PRIORITY``
below is the SINGLE ordering source (the driver's correctness gate snapshots
the first 50 entries) and ``_reorder_registry`` raises on any drift between
the priority list and the registered names.
"""

from __future__ import annotations

from ._shared import ORACLES, QUERIES, QueryFn, _doc_corpus, _scratch_tag, _t
from . import ann as _ann            # noqa: F401  (registration side-effect)
from . import dedup as _dedup        # noqa: F401
from . import graph as _graph        # noqa: F401
from . import multimodal as _mm      # noqa: F401
from . import streaming as _str      # noqa: F401
from . import surveillance as _sur   # noqa: F401
from . import text as _text          # noqa: F401
from . import warehouse as _wh       # noqa: F401
from .dedup import MINHASH_CFG

__all__ = [
    "MINHASH_CFG",
    "ORACLES",
    "QUERIES",
    "QueryFn",
]



# ===========================================================================
# Registry ordering.  The driver's correctness gate snapshots the FIRST 50
# registry entries, so the order below is curated, not incidental.  Round-6
# rotation (VERDICT r5 item #1): the 33 queries added in r5
# (dataset_split .. events_debounce), which had only local tools/compare.py
# certification, now occupy the head of the window; new r6 queries slot in
# right after them; the remaining slots keep the scale-watch queries
# (dedup_minhash_lsh / dedup_clusters / streaming_sessionize / asof_join —
# asof_join also guards this round's struct-payload rewrite) under
# continuous driver observation.  Queries after position 50 all carry
# driver-certified rows from CORRECTNESS_r01..r05 and stay oracle-verified
# by tools/compare.py's full-registry sweep (tools/verify_all.py).
# ===========================================================================

_REGISTRY_PRIORITY = [
    # -- head of window: 33 r5-added queries, driver-certified for the
    #    first time this round --
    "dataset_split",
    "corpus_shuffle",
    "multimodal_embed_neardup",
    "incremental_dedup_equals_batch",
    "ann_ivf_indexed",
    "ann_quantized_recall",
    "fuzzy_decontaminate",
    "streaming_dedup",
    "vocab_topk",
    "cases_rollup",
    "epi_curve_rolling",
    "dedup_keep_best",
    "jsonl_source_roundtrip",
    "quality_percentile_filter",
    "tfidf_top_terms",
    "snapshot_diff",
    "inverted_index",
    "streaming_interval_join",
    "quality_quantiles_by_source",
    "funnel_conversion",
    "alert_seasonal_baseline",
    "fuzzy_name_linkage",
    "json_props_extract",
    "csv_source_roundtrip",
    "embedding_dim_stats",
    "streaming_session_window",
    "inverted_index_salted",
    "market_share",
    "text_reject_reasons",
    "retention_cohorts",
    "asof_join_forward",
    "sample_n_per_group",
    "events_debounce",
    # -- r6 additions: first driver certification this round --
    "pagerank_docs",                    # fixed-iteration graph propagation
    "bigram_topk",                      # corpus n-gram table
    "mixture_report",                   # per-(source,lang) composition
    "weighted_sample",                  # exponential-race weighted draw
    "cube_report",                      # full grouping-set lattice
    "returned_item_revenue",            # TPC-H Q10 shape
    "unpivot_report",                   # native melt
    "ann_ivf_dpp",                      # join/DPP probe of the IVF index
    "orc_source_roundtrip",             # S1 columnar format leg
    "streaming_sessionize_tws",         # successor state API (OPTIONAL:
                                        # registered only when protobuf is
                                        # present — see queries/streaming.py)
    # -- remaining slots to 50: scale-watch queries + this round's
    #    touched-code guards kept under driver observation --
    "dedup_minhash_lsh",                # scale-watch (LSH discipline)
    "dedup_clusters",                   # scale-watch (components; r6 probe batching)
    "dedup_simhash_wide",               # r6 guard rewrite (aggregate+broadcast)
    "streaming_sessionize",             # stateful streaming watch
    "asof_join",                        # r6 struct-payload rewrite
    "flagship_cases_region_epiweek",    # r6 broadcast-hint drop
    # ---- position 51+: driver-certified in r01..r05; compare.py keeps them green ----
    "pipeline_composed",                # C8 + end-to-end composition
    "incremental_links_equals_batch",   # J2
    "streaming_equals_batch",           # S4
    "range_join_windows",               # temporal join
    "upsert_idempotent",                # K2
    "upsert_partition_move",            # K2 partition-boundary watch
    "alert_double_double",              # A3
    "links_ordered",                    # J1 J3
    "ann_ivf_topk",
    "dedup_exact",
    "ann_lsh_topk",
    "alert_threshold_weekly",           # A2
    "coding_multiple_link",             # C4
    "ann_recall",
    "dedup_embedding",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "event_sessionize",
    "skew_salted_agg",
    "stratified_sample",
    "quality_topk_per_source",
    "doc_packing",
    "text_clean",
    "text_redact_pii",
    "text_repetition",
    "category_pivot",
    "coding_calc_to_date_dict",
    "epiweek_dict_config",
    "links_any_all",
    "sql_api_cases",
    "pricing_summary",
    "shipping_priority",
    "local_supplier_volume",
    "ann_lsh_multiprobe",
    "dedup_embedding_lsh",
    "dedup_repeated_spans",
    "streaming_windowed_counts",
    "qc_clinic_start_filter",
    "qc_import_rules",
    "qc_flatten_lists",
    "locations_is_child",
    "qc_date_validity",
    "deadletter_split",
    "decontaminate_overlap",
    "qc_filters",                       # F2 F3 F4
    "fanout_data_types",                # G1
    "multirow_split",                   # G2
    "coding_variables",                 # V1 V3 C1
    "coding_groups_priority",           # C2 C3 C5
    "coding_sub_match",                 # V2
    "coding_value_date",                # V6 C10
    "coding_calc_to_date",              # V5 + calc grammar
    "epiweek_counts",                   # C9 international
    "epiweek_strategies",               # C9 week-0/53 strategies
    "links_self_union",                 # J4
    "initial_visit_dedup",              # J7
    "alert_threshold",                  # A1 A4
    "alert_masters_data",               # J8
    "send_alerts_topics",               # A5 fan-out
    "send_alerts_messages",             # A5 template parity
    "location_rollup",                  # J5
    "population_rollup",                # A6
    "point_in_polygon",                 # J6
    "deterministic_sample",             # F1
    "ann_brute_topk",
    "text_stats",
    "text_langid",
    "text_quality",
    "doc_fingerprint",
    "multimodal_decode",
    "multimodal_resize",
    "multimodal_frames",
]




# Queries whose registration is environment-gated (import-guarded optional
# deps).  They hold a priority slot but their absence is not drift.
_OPTIONAL = {"streaming_sessionize_tws"}


def _reorder_registry() -> None:
    missing = [
        n for n in _REGISTRY_PRIORITY
        if n not in QUERIES and n not in _OPTIONAL
    ]
    unlisted = [n for n in QUERIES if n not in _REGISTRY_PRIORITY]
    if missing or unlisted:
        raise RuntimeError(
            f"registry/priority drift: missing={missing} unlisted={unlisted}"
        )
    for d in (QUERIES, ORACLES):
        ordered = {n: d[n] for n in _REGISTRY_PRIORITY if n in d}
        d.clear()
        d.update(ordered)




_reorder_registry()
