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
    # Current window (see the rotation NOTE below the list): the round's
    # 9 NEW entries first (phash/audio-fp multimodal dedup rails +
    # streaming ingest, k-center coreset, power-iteration PCA, LPA
    # communities, link prediction, skew audit, minhash recall eval),
    # then the carried never-driver-witnessed cohort (the r12/r13
    # changed/new entries — no driver correctness run has happened since
    # they landed), then the r7 stragglers and the oldest r8 cohort to
    # fill 50.
    # --- changed/new this round ---
    "mm_image_phash",
    "emb_kcenter_coreset",
    "graph_lpa_communities",
    "diag_skew_report",
    "emb_pca_project",
    "graph_link_prediction",
    "mm_audio_fingerprint",
    "stream_phash_ingest",
    "dedup_minhash_recall",
    "text_fertility",
    "emb_pca_top2",
    "ev_decayed_counts",
    "mm_video_shots",
    "mm_image_dedup_clusters",
    "docs_bigram_xent",
    "rag_colbert_maxsim",
    "dedup_containment",
    "docs_zorder_layout",
    "sample_hard_negatives",
    "rag_mmr_rerank",
    "docs_quality_bins_approx",
    "emb_neardup_components",
    "emb_cross_decontaminate",
    "stream_semantic_decon_ingest",
    "text_tfidf",
    "rag_context_assembly",
    "docs_shard_shuffle",
    "docs_shard_manifest",
    "docs_quality_bins",
    "sample_negatives",
    "dedup_cluster_components",
    "dedup_cluster_canonical",
    "sample_leakage_safe_split",
    "dedup_exact_keep_first",
    "docs_pretrain_filter",
    "llm_pretrain_pipeline",
    # --- r7 cohort (last witnessed r7, driver order) ---
    "jsonl_corpus_roundtrip",
    "q13_custdist",
    "q16_supplier_cnt",
    "ev_gap_fill",
    "ev_entropy",
    # --- r8 cohort (last witnessed r8, driver order, first 36 of 47) ---
    "llm_tokenize_pack",
    "text_hash_embed",
    "rag_hash_retrieval",
    "rag_bm25_topk",
    "rag_rrf_fusion",
    "docs_snapshot_diff",
    "docs_quality_prune",
    "ev_grouping_sets",
    "a12_winsorize",
]

# r13 NOTE: the window above is carried over VERBATIM from r12 — round 12
# ended without a driver correctness run (no CORRECTNESS_r12.json exists),
# so the r12 cohort at the head (including the round's 16 changed/new
# entries) is still driver-unwitnessed and must get its first driver row
# in r13. Entries changed in r13 jump the queue as usual (r13 additions:
# docs_zorder_layout, sample_hard_negatives, and rag_mmr_rerank at head,
# displacing q20_potential_promotion, q12_late_ship_priority, and
# q11_important_stock to the r14 queue; the round-12 restart session adds
# dedup_containment at head, displacing llm_corpus_curation — well
# covered: driver-green r10/r11, paired-benchmarked every sitting —
# and docs_bigram_xent + rag_colbert_maxsim (NEW) at head, displacing
# docs_span_mask and docs_corpus_report to the r14 queue; the second
# restart session adds mm_image_phash + emb_kcenter_coreset (NEW) at
# head, displacing ann_matryoshka_mrr and docs_span_dup_rate, then
# graph_lpa_communities + diag_skew_report (NEW), displacing
# ann_matryoshka_topk and ann_matryoshka_recall, then emb_pca_project
# (NEW), displacing ann_matryoshka_rerank, then graph_link_prediction
# (NEW), displacing mm_frame_sample, then mm_audio_fingerprint (NEW),
# displacing mm_audio_stats, then stream_phash_ingest (NEW), displacing
# mm_image_stats, then dedup_minhash_recall (NEW), displacing
# x8_schema_evolution_union, then text_fertility (NEW), displacing
# ann_batch_topk, then emb_pca_top2 (NEW), displacing
# docs_quality_score, then ev_decayed_counts (NEW), displacing
# docs_unigram_xent, then mm_video_shots (NEW), displacing
# vocab_bpe_encode, then mm_image_dedup_clusters (NEW), displacing
# u4_except_all).
# The deferred rotation for r14+: llm_corpus_curation,
# docs_span_mask, docs_corpus_report, ann_matryoshka_mrr,
# docs_span_dup_rate, ann_matryoshka_topk, ann_matryoshka_recall,
# ann_matryoshka_rerank, mm_frame_sample, mm_audio_stats,
# mm_image_stats, x8_schema_evolution_union, ann_batch_topk,
# docs_quality_score, docs_unigram_xent, vocab_bpe_encode,
# u4_except_all, plus
# those three displaced entries plus the 18 r8-cohort
# entries displaced from this window
# (stream_corpus_ingest, q21_waiting_supplier, q18_large_volume,
# basket_brand_pairs, permit_pipeline_upload, q1_pricing_summary,
# dedup_exact, dedup_simhash, ann_cosine_topk, s1_socrata_pull,
# s2_dim_join_filter, e1_validate_partition, j1_preagg_join, j2_anti_join,
# w3_line_numbers_batches, x1_explode_pipe_list, ev_sessionize, ev_funnel),
# then the oldest r9 cohort to fill 50.

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
