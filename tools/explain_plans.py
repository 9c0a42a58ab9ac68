"""Plan-quality audit: .explain("formatted") for key queries, with grep-able
verdicts on pushdown / pruning / broadcast / codegen.

    python tools/explain_plans.py [name ...]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHECKS = {
    # note: formatted plans under AQE don't print WholeStageCodegen spans;
    # codegen coverage is asserted via explain("codegen") below
    "q1_pricing_summary": ["PushedFilters", "HashAggregate"],
    "s1_scan_filter_order": ["PushedFilters", "ReadSchema"],
    "s2_dim_join_filter": ["BroadcastHashJoin"],
    "j1_preagg_join": ["BroadcastHashJoin"],
    "j2_anti_join": ["LeftAnti"],
    "q3_shipping_priority": ["PushedFilters"],
    "q5_nation_volume": ["BroadcastHashJoin"],
    "dedup_exact": ["HashAggregate"],
    # r6 session-3 additions
    "q6_forecast_revenue": ["PushedFilters"],
    "q10_returned_items": ["TakeOrderedAndProject", "BroadcastHashJoin"],
    "text_tfidf": ["BroadcastHashJoin"],
    "basket_brand_pairs": ["HashAggregate", "Generate"],
    "j9_fuzzy_symspell": ["HashAggregate"],
    "ev_funnel": ["HashAggregate"],
    "x6_merge_upsert": ["SortMergeJoin"],
    "sketch_cms_topk": ["BroadcastHashJoin"],
    # r6 session-4: adapted classics + curation stats
    "q4_priority_exists": ["LeftSemi", "PushedFilters"],
    "q7_nation_trade": ["BroadcastHashJoin"],
    "q8_market_share": ["LeftSemi", "BroadcastHashJoin"],
    "q9_profit_by_nation": ["BroadcastHashJoin"],
    "q17_small_quantity": ["LeftSemi", "BroadcastHashJoin"],
    "q18_large_volume": ["LeftSemi", "BroadcastHashJoin"],
    "q19_disjunctive": ["PushedFilters", "BroadcastHashJoin"],
    "q21_waiting_supplier": ["LeftSemi", "HashAggregate"],  # r7 rewrite: single-pass, no anti join
    "q22_idle_customers": ["LeftAnti", "BroadcastHashJoin"],
    "q2_min_balance_supplier": ["Window", "BroadcastHashJoin"],
    "ev_gap_fill": ["Window", "Generate"],
    "ev_entropy": ["HashAggregate"],
    "a12_winsorize": ["BroadcastHashJoin"],
    "q13_custdist": ["HashAggregate"],
    "q16_supplier_cnt": ["LeftAnti", "BroadcastHashJoin"],
    "ann_batch_topk": ["WindowGroupLimit"],
    # r7: the classics completing the 22 (Q11/Q12/Q20 adapted)
    "q11_important_stock": ["HashAggregate", "BroadcastNestedLoopJoin"],
    "q12_late_ship_priority": ["HashAggregate", "HashJoin"],
    "q20_potential_promotion": ["LeftSemi", "BroadcastHashJoin"],
    # r7: MRL funnel, span dedup, multimodal codec path
    "ann_matryoshka_rerank": ["BroadcastHashJoin", "TakeOrderedAndProject"],
    "ann_matryoshka_mrr": ["Window", "BroadcastNestedLoopJoin"],
    "docs_span_dup_rate": ["HashAggregate", "Generate"],
    "mm_image_stats": ["MapInPandas"],
    "mm_audio_stats": ["MapInPandas"],
    "llm_corpus_curation": ["Window"],
    "llm_tokenize_pack": ["FlatMapGroupsInPandas", "Generate"],
    "rag_hash_retrieval": ["BroadcastHashJoin", "TakeOrderedAndProject"],
    "rag_bm25_topk": ["BroadcastHashJoin", "TakeOrderedAndProject"],
    "docs_quality_prune": ["Window"],
    "docs_snapshot_diff": ["SortMergeJoin"],
    # r9: RAG serving composition, decontamination probe, budget sampler,
    # pack audit
    "rag_context_assembly": ["BroadcastHashJoin", "Window"],
    "docs_decontaminate": ["BroadcastHashJoin", "Generate"],
    "docs_domain_mix": ["Window"],
    "llm_pack_stats": ["FlatMapGroupsInPandas", "HashAggregate"],
    # r9: IVFADC family — one Arrow kernel, probe pruning before anything
    # wide, broadcast-joined query batch, WindowGroupLimit serving
    "emb_ivfpq_topk": ["ArrowEvalPython", "TakeOrderedAndProject"],
    "emb_ivfpq_batch_topk": ["ArrowEvalPython", "WindowGroupLimit"],
    # r10: cross-dataset semantic decon (Arrow sig kernel + bucket join),
    # salted join (hash family on the widened key), shard manifest
    # (rank window + 8-group aggregate), negative sampler (rank join)
    "emb_cross_decontaminate": ["ArrowEvalPython", "Generate", "HashJoin"],
    "j11_salted_skew_join": ["HashAggregate", "Generate"],
    "docs_shard_manifest": ["Window", "HashAggregate"],
    "sample_negatives": ["Window", "HashJoin"],
}


def main() -> int:
    from extract_permits_spark.plans import analytics
    from extract_permits_spark.session import get_spark

    only = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("explain")
    # AQE wraps every plan in an un-finalized AdaptiveSparkPlan, under
    # which explain("codegen") always reports 0 subtrees — disable it
    # for the audit so the codegen count is the real span count (the
    # production session keeps AQE on; this is an inspection-only knob).
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    qs = analytics.queries()
    for name in only or CHECKS:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        print(f"===== {name} =====")
        for want in CHECKS.get(name, []):
            mark = "OK " if want in plan else "MISS"
            print(f"  [{mark}] {want}")
        cbuf = io.StringIO()
        with redirect_stdout(cbuf):
            df.explain("codegen")
        head = cbuf.getvalue().splitlines()[0] if cbuf.getvalue() else ""
        print(f"  {head}")  # 'Found N WholeStageCodegen subtrees.'
        if only:
            print(plan)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
