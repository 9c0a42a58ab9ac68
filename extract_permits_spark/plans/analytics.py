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
    # r15 window (rotated per VERDICT r14 #1/#7): (a) the ENTIRE
    # r9-witness cohort leads, all 16 — including the IVFPQ serving
    # family — so after this window lands green no entry's last driver
    # witness predates r10; (b) the entries this session's edits
    # changed (rotation_audit output against _AUDIT_BASE, no hygiene
    # exemptions this round — pinned by tests/test_rotation.py);
    # (c) the 13 oldest r10-witnessed entries, filling the window to
    # exactly 50. Witness ages are now computed, not hand-tallied:
    # python tools/witness_ledger.py (tests/test_witness_age.py pins
    # the ≤5-round bound against this list).
    # (a) the r9 cohort — oldest witnesses in the registry
    "ann_ivf_recall",
    "ann_lsh_recall",
    "dedup_embedding_cosine",
    "dedup_simhash_recall",
    "emb_ivfpq_batch_topk",
    "emb_ivfpq_recall",
    "emb_ivfpq_topk",
    "ev_json_extract",
    "j3_crosswalk_override",
    "mm_binary_features",
    "q3_shipping_priority",
    "q5_nation_volume",
    "s4_range_scan",
    "text_fingerprint",
    "text_tokens",
    "u2_union_distinct",
    # (b) changed this session — r14 ADVICE fixes:
    # operators/windows.py (cumsum native-type weights + overflow
    # guard, map-hashable ReuseExchange pin) flags every distributed_*
    # consumer plus the module's window helpers (module scope moved);
    # functions/similarity.py (lsh_cross_hits multiplicity-weighted
    # bucket cap) flags its two consumers;
    # plans/analytics_events.py (_budget_mix guard fix) flags
    # llm_pretrain_pipeline
    "llm_pretrain_pipeline",
    "docs_domain_mix",
    "docs_quality_prune",
    "docs_quality_bins",
    "docs_shard_shuffle",
    "docs_shard_manifest",
    "docs_zorder_layout",
    "w3_line_numbers_batches",
    "sample_negatives",
    "w2_first_per_group",
    "w4_dup_flag",
    "e3_legacy_flags",
    "emb_cross_decontaminate",
    "stream_semantic_decon_ingest",
    # (b continued) both minhash pair generators gained the
    # exact-duplicate rep collapse (r15 — values identical by
    # construction, pinned by the two duplicate-expansion parity tests
    # incl. the capped variant's flood/cap interplay) and then the r15b
    # lazy-checkpoint materialization of the collapse's intermediates
    # (SCALE.md r15-s4); the recall twin calls the md5 function and the
    # streaming ingest calls minhash_md5_bands (whose body the r15b fix
    # refactored), both queued per the transitive rule
    "dedup_minhash_md5",
    "dedup_minhash_recall",
    "dedup_minhash_lsh",
    "stream_neardup_ingest",
    # ... then the r15c dup-mass gate (collapse only when measured
    # exact-duplicate pair mass exceeds one linear pass; SCALE.md
    # r15-s6) — same function bodies, same consumers, already queued
    # above.
    # (b continued) functions/multimodal.py: phash_pairs' hash-frame
    # checkpoint went eager -> lazy (r15d — one DAG, no job barrier;
    # values unchanged, ~0.7-0.9 s per codec row), flagging its three
    # consumers per the transitive rule
    "mm_image_phash",
    "mm_audio_fingerprint",
    "mm_image_dedup_clusters",
    # (b continued, r15e construction-overhead pass): the wide
    # expression builders in functions/similarity.py (simhash_table
    # votes/assembly, _lsh_sig_frame bit-pack, lsh_bands, the minhash
    # sig agg, the table-struct/Hamming-ball explodes) became parsed
    # SQL strings — identical expression trees, ~5-25× cheaper
    # driver-side construction (OPTIMIZATION_r15.md §8) — and
    # session.py turned off pyspark's per-API-call DataFrame-debugging
    # decoration (error-message call sites only; cannot move values).
    # Newly flagged consumers queued here per the transitive rule:
    "dedup_simhash",
    "emb_neardup_lsh",
    "emb_neardup_components",
    "stream_decontaminate_ingest",
    # (c) the 9 oldest r10-witnessed entries (ledger order; the last
    # eleven — docs_url_dedup, emb_pq_adc_topk, emb_pq_codes,
    # emb_quantize, j11_salted_skew_join, j7_asof_join, j8_range_join,
    # jsonl_corrupt_quarantine, ev_hopping_agg, ev_rollup and
    # ev_session_window — gave their slots to the minhash family, the
    # phash consumers and the r15e construction-pass consumers above
    # and defer to r16 with the rest, where the age bound will force
    # them into the window)
    "a7_quantiles",
    "a8_salted_agg",
    "dedup_semantic",
    "docs_chunk",
    "docs_dsir_weights",
    "docs_host_cap",
    "docs_incremental_dedup",
    "docs_segment_dedup",
    "docs_source_overlap_matrix",
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
_AUDIT_BASE = "637295d3e96976a24c87b707362989ccbdbcc683"
_AUDIT_HYGIENE_MODULES: set[str] = set()

# r15 rotation NOTE: witness-age arithmetic is no longer hand-tallied
# here (the r14 NOTE needed a fix commit, e9f7e7c) — run
# `python tools/witness_ledger.py` for the computed per-entry
# last-green-round table, and see tests/test_witness_age.py for the
# enforced bound: every entry whose witness would age past 5 rounds at
# the upcoming driver round must sit in this window. Deferred to r16:
# the 25 youngest r10-witnessed entries (j11_salted_skew_join,
# j7_asof_join, j8_range_join, jsonl_corrupt_quarantine, ev_hopping_agg,
# ev_rollup, ev_session_window, then pack_sequences .. x4_pivot in
# ledger order) — at age 5 next round they hit the bound and the test
# will force them into the r16 window.
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
