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
    # r13 window (rotated per VERDICT r12 #1): (a) the 8 entries whose
    # code paths changed this session (decayed-count age clamp, k-center
    # guards/persist, streaming await_or_raise + scratch_dir hygiene,
    # the rag/curation perf work), (b) the 4 stale-witness entries whose
    # shared LSH helpers were pinned in r13-builder AFTER their last
    # driver witness (dedup_minhash_lsh/md5 r9, dedup_simhash r8,
    # emb_neardup_lsh r10), (c) 3 of the touched streaming entries with
    # the oldest witnesses, (d) the ENTIRE remaining r8 cohort — after
    # this window lands green, no entry's last witness predates r9.
    "emb_kcenter_batch",  # NEW in r13 (batched farthest-point coreset)
    "docs_hll_distinct",  # NEW in r13 (deterministic HLL sketch)
    "text_cm_heavy_hitters",  # NEW in r13 (Count-Min heavy hitters)
    "docs_kmv_source_overlap",  # NEW in r13 (KMV bottom-k overlap)
    "stream_hll_distinct",  # NEW in r13 (streaming max-merge HLL)
    "stream_cm_heavy_hitters",  # NEW in r13 (streaming sum-merge CM)
    # plan-shape-touched this session (the multimodal id-spread adds a
    # RoundRobin exchange below every codec rail; graph/BPE loops now
    # free scratch checkpoints) — all re-oracle-checked green locally,
    # queued for a driver witness per the changed-entries rule
    "mm_video_shots", "mm_image_phash", "mm_audio_fingerprint",
    "mm_image_dedup_clusters", "graph_pagerank", "graph_lpa_communities",
    "ev_decayed_counts",
    "emb_kcenter_coreset",
    "rag_context_assembly",
    "llm_corpus_curation",
    "stream_phash_ingest",
    "stream_corpus_ingest",
    "xlsx_review_roundtrip",
    "emb_ivfpq_indexed_topk",
    "dedup_minhash_lsh",
    "dedup_minhash_md5",
    "dedup_simhash",
    "emb_neardup_lsh",
    "stream_tumbling_agg",
    "stream_dedup",
    "stream_decontaminate_ingest",
    "q1_pricing_summary",
    "s2_dim_join_filter",
    "x1_explode_pipe_list",
    "j1_preagg_join",
    "j2_anti_join",
    "e1_validate_partition",
    "dedup_exact",
    "w3_line_numbers_batches",
    "ev_sessionize",
    "ann_cosine_topk",
    "s1_socrata_pull",
    "permit_pipeline_upload",
    "ev_funnel",
    "basket_brand_pairs",
    "q18_large_volume",
    "q21_waiting_supplier",
    "q11_important_stock",
    "q12_late_ship_priority",
    "q20_potential_promotion",
    "u4_except_all",
    "vocab_bpe_encode",
    # docs_unigram_xent displaced to r14 by stream_cm_heavy_hitters
    # docs_quality_score displaced to r14 by stream_hll_distinct
    # ann_batch_topk displaced to r14 by docs_kmv_source_overlap
    # x8_schema_evolution_union displaced to r14 by text_cm_heavy_hitters
    "mm_image_stats",
    "mm_audio_stats",
    # mm_frame_sample displaced to r14 by the new docs_hll_distinct
    # displaced to r14 by this session's plan-touched cohort (all
    # pytest-pinned meanwhile): ann_matryoshka_topk/_rerank/_recall/
    # _mrr, docs_span_dup_rate, docs_span_mask, docs_corpus_report
]

# r13 rotation NOTE: 50 slots cannot hold this round's full changed set
# PLUS the entire r8 cohort; the window holds every entry whose VALUES
# or PLAN SHAPE could have moved (rag rework, decayed-count clamp,
# k-center guards, multimodal id-spread, graph/BPE scratch frees, the
# helper-stale LSH four) and 31 of the 38 r8-witnessed entries. Deferred
# to r14 FIRST, all re-oracle-checked green locally this session:
# (a) r8-witnessed, displaced: ann_matryoshka_topk/_rerank/_recall/_mrr,
#     docs_span_dup_rate, docs_span_mask, docs_corpus_report,
#     mm_frame_sample, x8_schema_evolution_union, ann_batch_topk,
#     docs_quality_score (the last four gave their slots to the round's
#     new entries: emb_kcenter_batch, docs_hll_distinct,
#     text_cm_heavy_hitters, docs_kmv_source_overlap,
#     stream_hll_distinct);
# (b) hygiene-only streaming (timeout/cleanup behavior, values
#     untouched): stream_session_agg, stream_ann_index_ingest,
#     stream_neardup_ingest, stream_stateful_totals (r10),
#     stream_stream_join, stream_cdc_apply (r11),
#     stream_semantic_decon_ingest (r12);
# (c) vocab_bpe_train / vocab_bpe_pairs (scratch-free only; the shared
#     loop is witnessed via vocab_bpe_encode in this window);
# then the r9 cohort oldest-first.
# The rotation rule is now TRANSITIVE over helper imports: run
# tools/rotation_audit.py <git-ref> to list every registry entry whose
# defining chunk OR transitively-imported engine module changed since
# the ref — those jump the queue alongside directly-edited entries.


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
