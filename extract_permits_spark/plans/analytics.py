"""Query registry: one entry per SURVEY.md §2 operator class (+ LLM ops).

Each query has a Spark implementation (idiomatic DataFrame API, built-in
functions only unless noted) and, where SQL-expressible, a DuckDB oracle
returning identical column names/values. Conventions to keep the
order-insensitive value hash stable across engines:

- every computed column is explicitly aliased, identically on both sides;
- date/timestamp outputs are formatted to strings (engine-independent);
- double aggregations are computed in DECIMAL(18,2) (exact, associative —
  no float summation-order drift) and cast to DOUBLE at the end;
- ratios are a single double division of exact operands (deterministic);
- string collation is binary on both engines.
"""

from __future__ import annotations

# Registry machinery and the cross-chunk memo caches live in _registry
# (cycle-free; see its docstring). Re-exported here so every existing
# importer keeps addressing them as analytics.<name> — the cache DICTS
# are the same objects (bench.py clears them through this module).
from extract_permits_spark.plans._registry import (  # noqa: F401
    _COMPONENTS_CACHE,
    _IVF_CENTROID_CACHE,
    _JACCARD_PAIRS_CACHE,
    _ORACLES,
    _QUERIES,
    QueryFn,
    _collapsed_edges,
    _components_cached,
    _dec,
    _ivf_centroids_cached,
    _jaccard_pairs_cached,
    _jaccard_pairs_uncached,
    register,
)
from extract_permits_spark.sources.readers import load_table  # noqa: F401

# The driver's correctness check covers the first 50 registry entries per
# round; _CHECK_FIRST controls that window and is rotated each round so
# every entry earns a driver row (see the r9 NOTE below the list).
_CHECK_FIRST = [
    # r11 window (6 changed + 3 stale + 41 oldest = 50): the 6 entries
    # whose implementation changed this round (the four global ranks
    # rewired onto distributed_rank — docs_shard_shuffle,
    # docs_shard_manifest, docs_quality_bins, sample_negatives — plus
    # both semantic-decon gates, now uncapped with the dim probe on the
    # eval side), then the 3 r6-cohort entries displaced from the r10
    # window (last witnessed CORRECTNESS_r06), then the first 41 of the
    # 46-entry r7 cohort in driver order. ~3.5-round cadence.
    # --- changed this round ---
    "docs_shard_shuffle",
    "docs_shard_manifest",
    "docs_quality_bins",
    "sample_negatives",
    "emb_cross_decontaminate",
    "stream_semantic_decon_ingest",
    # --- r6 cohort (last witnessed r6, displaced from the r10 window) ---
    "ev_retention",
    "emb_prototypicality",
    "dedup_winnowing",
    # --- r7 cohort (last witnessed r7, driver order, first 41 of 46) ---
    "docs_pii_redact",
    "ev_cube",
    "q6_forecast_revenue",
    "q10_returned_items",
    "w6_rank_family",
    "ev_transitions",
    "x5_scd2_intervals",
    "j9_fuzzy_symspell",
    "graph_pagerank",
    "stream_stream_join",
    "ev_time_weighted_avg",
    "x6_merge_upsert",
    "a9_mode",
    "j10_null_safe_join",
    "stream_cdc_apply",
    "ev_variant_agg",
    "vocab_bpe_train",
    "a10_regression",
    "sketch_cms_topk",
    "ev_attribution",
    "x7_date_spine",
    "a11_histogram",
    "sample_leakage_safe_split",
    "profile_documents",
    "ev_anomaly_zscore",
    "graph_triangles",
    "j7b_asof_forward",
    "q1_incremental_maintenance",
    "ev_dau_wau",
    "docs_dup_rate_by_source",
    "sample_weighted_per_source",
    "q4_priority_exists",
    "q7_nation_trade",
    "q8_market_share",
    "q9_profit_by_nation",
    "q14_promo_revenue",
    "q17_small_quantity",
    "q19_disjunctive",
    "q22_idle_customers",
    "q15_top_supplier",
    "q2_min_balance_supplier",
]

# r12 NOTE: continue the staleness rotation — next up are the 5 r7-cohort
# entries displaced from this window (jsonl_corpus_roundtrip, q13_custdist,
# q16_supplier_cnt, ev_gap_fill, ev_entropy), then the oldest r8 cohort
# (45 more to fill 50); as always, any entry whose implementation changed
# since its last driver row jumps the queue.



def _reordered(d: dict) -> dict:
    head = {k: d[k] for k in _CHECK_FIRST if k in d}
    return head | {k: v for k, v in d.items() if k not in head}


def queries() -> dict[str, QueryFn]:
    return _reordered(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return _reordered(_ORACLES)


# ---------------------------------------------------------------------------
# The query surface itself lives in four chunk modules, split from this
# file in r12 (it had grown past 9k lines). They are imported HERE, in
# original accretion order, because each @register call appends to
# _QUERIES/_ORACLES and the resulting iteration order — which the
# driver's 50-entry correctness window reads through _CHECK_FIRST — must
# stay bit-identical to the pre-split single file. tpch_extra is pulled
# in by analytics_rag at its original position for the same reason.
# ---------------------------------------------------------------------------

from extract_permits_spark.plans import analytics_core as _core  # noqa: E402
from extract_permits_spark.plans import analytics_corpus as _corpus  # noqa: E402
from extract_permits_spark.plans import analytics_events as _events  # noqa: E402
from extract_permits_spark.plans import analytics_rag as _rag  # noqa: E402

# Re-export every chunk-defined name so existing importers (tests, bench,
# tools) keep addressing them as analytics.<name>. setdefault: hub-owned
# names (register, caches, queries, ...) always win.
for _mod in (_core, _corpus, _events, _rag):
    for _k, _v in vars(_mod).items():
        if not _k.startswith("__"):
            globals().setdefault(_k, _v)
del _mod, _k, _v
