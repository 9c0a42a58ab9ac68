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
    # r14 window (rotated per VERDICT r13 #1): (a) the ENTIRE deferred
    # r8-witness cohort leads — after this window lands green, no
    # entry's last driver witness predates r9; (b) the entries this
    # session's edits changed (rotation_audit output against _AUDIT_BASE
    # minus the documented hygiene modules — pinned by
    # tests/test_rotation.py); (c) this round's new entries; (d) the r9
    # cohort oldest-first, 34 of 39 (see the r14 NOTE below the list).
    "ann_matryoshka_topk",
    "ann_matryoshka_rerank",
    "ann_matryoshka_recall",
    "ann_matryoshka_mrr",
    "ann_batch_topk",
    "docs_span_dup_rate",
    "docs_span_mask",
    "docs_corpus_report",
    "docs_quality_score",
    "docs_unigram_xent",
    "mm_frame_sample",
    "x8_schema_evolution_union",
    # (b) changed this session: is_center now computed as
    # vec_id == assigned center_id, matching the oracle's
    # `a.vec_id = a.center_id` (r13 ADVICE medium — a VALUE change on
    # duplicate-embedding inputs); vocab_bpe_train frees its final-round
    # checkpoint (post-return hygiene, values untouched, queued because
    # its body changed and the audit rule is body-granular)
    "emb_kcenter_coreset",
    "emb_kcenter_batch",
    "vocab_bpe_train",
    "vocab_bpe_encode",  # calls vocab_bpe_train — transitive rule
    # (c) NEW in r14: streaming bottom-k KMV overlap (batch SQL verbatim
    # as oracle, completing the merge-semantics triptych with HLL/CM)
    "stream_kmv_overlap",
    # (b continued) the distributed_rank/-group_rank ReuseExchange pin
    # (operators/windows.py — VERDICT r13 #3 root cause: column pruning
    # de-duplicated the counts branch's range exchange) changes the
    # executed PLAN of every consumer; all re-oracle-checked green
    # locally, queued per the plan-shape rule. w2/w4/e3 are flagged too
    # and already sit in the r9 cohort below.
    "llm_pretrain_pipeline",
    "docs_quality_prune",
    "docs_quality_bins",
    "docs_shard_shuffle",
    "docs_shard_manifest",
    "docs_zorder_layout",
    "w3_line_numbers_batches",
    "sample_negatives",
    # (b continued) lsh_cross_hits gained exact-duplicate collapse (r14,
    # the 100x-flood finding — functions/similarity.py): values
    # identical by construction, plan changed; its two consumers queue
    "emb_cross_decontaminate",
    "stream_semantic_decon_ingest",
    # (d) the r9 cohort, original registration order
    "s1_scan_filter_order",
    "s3_scalar_max",
    "p_clean_bundle",
    "p9_keyword_tag",
    "j6_semi_flag",
    "w2_first_per_group",
    "w4_dup_flag",
    "p3_date_functions",
    "x3_unpivot",
    "e3_legacy_flags",
    "text_quality",
    "text_language_id",
    "ev_tumbling_agg",
    "ann_lsh_topk",
    "dedup_ngram_jaccard",
    "p5_pin_normalize",
    "ann_ivf_topk",
    "permit_pipeline_review",
    "docs_decontaminate",
    "docs_domain_mix",
    "llm_pack_stats",
    "rag_hybrid_recall",
    "mm_decode_quarantine",
]

# Base ref for this round's rotation audit (r13 final commit) and the
# modules whose r14 edits are exempt from the changed-entry rule. BUMP
# _AUDIT_BASE to the new round-boundary sha (the driver's "round N:
# verdict/..." commit) at the START of each builder session and clear
# the exemptions — otherwise the audit re-flags the previous round's
# already-witnessed entries forever. Exemptions are per-round and only
# for edits that cannot move any entry's VALUES or result-plan shape —
# each needs the reason an auditor would check. tests/test_rotation.py
# asserts rotation_audit(_AUDIT_BASE) minus these modules ⊆ _CHECK_FIRST
# so the transitive rule can't silently regress (VERDICT r13 #1).
_AUDIT_BASE = "7cba7fd7977beee7fbf58e79d4749379e64a87cf"
_AUDIT_HYGIENE_MODULES = {
    # free_local_checkpoint now descends Project/Filter wrappers and the
    # new assert_no_scratch_refs guard — post-evaluation block
    # reclamation + an insert-time assertion; no query value or plan of
    # any returned frame changes (r13 ADVICE lows #2/#4)
    "extract_permits_spark.session",
    # clear_frame_caches / memo-insert guard calls only (same ADVICE
    # items); the memoized VALUES are bit-identical
    "extract_permits_spark.plans._registry",
}

# r14 rotation NOTE: the full r8 cohort (12) + changed (14: the two
# kcenter value fixes, the two bpe, the eight rank-pin consumers, the
# two lsh_cross_hits-collapse consumers) + new (1) leaves 23 slots for
# the 39 r9-witnessed entries. Deferred to r15 FIRST, all
# re-oracle-checked green locally this session:
# (a) six recall/variant twins whose PRIMARY entries sit in this window
#     or were witnessed r13 and exercise the identical machinery:
#     ann_lsh_recall (ann_lsh_topk in window), ann_ivf_recall
#     (ann_ivf_topk), emb_ivfpq_recall / emb_ivfpq_batch_topk /
#     emb_ivfpq_topk (emb_ivfpq_indexed_topk witnessed r13; topk gave
#     its slot to vocab_bpe_encode per the transitive rule),
#     dedup_simhash_recall (dedup_simhash witnessed r13);
# (b) ten r9 entries displaced by the rank-pin consumers and the
#     lsh_cross_hits collapse consumers, each with its machinery pinned
#     by an in-window or r13-witnessed family twin plus pytests:
#     dedup_embedding_cosine (brute-force twin of the witnessed LSH
#     family), mm_binary_features (multimodal rails witnessed r13),
#     text_tokens / text_fingerprint (text_quality + text_language_id
#     stay), ev_json_extract (ev_tumbling_agg stays; ev_sessionize
#     witnessed r13), q3_shipping_priority / q5_nation_volume
#     (q1/q18/q21/q11/q12/q20 witnessed r13), j3_crosswalk_override
#     (the coalesce-override machinery is inside the r13-witnessed
#     permit_pipeline_upload), u2_union_distinct (union machinery in
#     the r13-witnessed u4_except_all), s4_range_scan (range-scan
#     pushdown pinned by in-window s1_scan_filter_order + the
#     test_plan_quality pushdown assertions).
# The rotation rule is TRANSITIVE over helper imports and BODY-GRANULAR
# within chunk modules: tools/rotation_audit.py <git-ref> lists every
# registry entry whose own function body, same-chunk helper, or
# transitively-imported engine module changed since the ref — those
# jump the queue alongside directly-edited entries, minus the
# per-round documented hygiene modules above (pinned by
# tests/test_rotation.py).


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
