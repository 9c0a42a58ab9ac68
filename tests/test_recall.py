"""Recall harnesses for the approximate family (VERDICT r1 items 2-3).

The approximate operators (banded SimHash, LSH/IVF ANN) previously rode on
rows-only checks; these tests pin their QUALITY against exact ground truth:

- simhash_pairs at the guaranteed radius must equal brute-force
  bit_count(xor) exactly (pigeonhole: hamming ≤ n_bands-1 ⇒ ≥1 shared band);
- the guard refuses a radius beyond the banding guarantee;
- ANN recall@k floors measured on the sf0.001 embeddings fixture.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from extract_permits_spark.functions import similarity as simfn
from extract_permits_spark.sources.readers import load_table

SF_DIR = "/root/testdata/sf0.001"


def _pair_set(df):
    return {(r["id_a"], r["id_b"], r["hamming"]) for r in df.collect()}


def test_simhash_banded_equals_bruteforce(spark):
    docs = load_table(spark, SF_DIR, "documents")
    banded = simfn.simhash_pairs(docs, max_hamming=7)
    exact = simfn.simhash_pairs_bruteforce(docs, max_hamming=7)
    got, want = _pair_set(banded), _pair_set(exact)
    assert got == want, (
        f"banded missed {len(want - got)} pairs / invented {len(got - want)}"
    )


def test_simhash_guard_rejects_unguaranteed_radius(spark):
    docs = load_table(spark, SF_DIR, "documents")
    with pytest.raises(ValueError, match="banding guarantee"):
        simfn.simhash_pairs(docs, max_hamming=8, band_bits=8)
    # explicit opt-in documents the recall loss instead of hiding it
    simfn.simhash_pairs(docs, max_hamming=8, band_bits=8, allow_recall_loss=True)


def _query_vec(emb):
    return [
        float(x)
        for x in emb.where(F.col("vec_id") == 0).select("embedding").first()[0]
    ]


def _recall_at_k(approx, exact, k):
    hits = exact.select("vec_id").join(
        approx.select("vec_id"), "vec_id", "left_semi"
    )
    return hits.count() / k


# The embeddings fixture is near-uniform random (20th neighbor at cosine
# ≈0.24) — the WORST case for any LSH/IVF family. Measured on it:
# multi-table LSH (8 tables × 8 planes, probe≤2) = 0.80; IVF with the
# deterministic Lloyd k-means fit (16 clusters, 6 probed, 3 rounds) = 0.90
# at sf0.001 / 0.80 at sf0.01. Both runs are fully deterministic; floors
# sit at/just below measured to catch regressions. (The r2 sampled-centroid
# IVF measured 0.50 here — the k-means fit is the r2-VERDICT item-2 fix.)


def test_ann_lsh_recall_floor(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    q = _query_vec(emb)
    exact = simfn.brute_force_topk(emb, q, k=20)
    approx = simfn.lsh_bucketed_topk(emb, q, k=20)
    assert _recall_at_k(approx, exact, 20) >= 0.70


def test_ann_ivf_recall_floor(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    q = _query_vec(emb)
    exact = simfn.brute_force_topk(emb, q, k=20)
    approx = simfn.ivf_topk(emb, q, k=20, num_clusters=16, num_probes=6)
    assert _recall_at_k(approx, exact, 20) >= 0.80


def test_lsh_neardup_pairs_planted_duplicates(spark):
    """Planted near-identical vectors MUST be surfaced by the bucketed
    pair path (per-table Hamming <= 1, OR over 8 tables of 16 planes:
    miss prob ~2e-17 per pair at the planted cosine ~0.999)."""
    import math

    base = load_table(spark, SF_DIR, "embeddings").limit(50)
    # plant: for each of 5 ids, a near-copy (tiny deterministic nudge)
    rows = base.collect()
    planted = []
    for r in rows[:5]:
        v = [float(x) for x in r["embedding"]]
        nudged = [x * 1.001 + (0.0005 if i == 0 else 0.0) for i, x in enumerate(v)]
        planted.append((int(r["vec_id"]) + 100000, nudged, 0))
    dup = spark.createDataFrame(
        planted, "vec_id long, embedding array<double>, label int"
    )
    allv = base.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"), "label"
    ).unionByName(dup)
    got = simfn.lsh_neardup_pairs(allv, min_cosine=0.99)
    pairs = {(r["id_a"], r["id_b"]) for r in got.collect()}
    for r in rows[:5]:
        vid = int(r["vec_id"])
        assert (vid, vid + 100000) in pairs, f"planted dup of {vid} missed"
    # precision: every returned pair is genuinely >= 0.99 by exact cosine
    # (verification IS exact cosine, so this is structural — check anyway)
    for row in got.collect():
        assert row["cosine_sim"] >= 0.99
    # sanity: math above holds — planted cosine really is ~1
    v0 = [float(x) for x in rows[0]["embedding"]]
    n0 = [x * 1.001 + (0.0005 if i == 0 else 0.0) for i, x in enumerate(v0)]
    dot_ = sum(a * b for a, b in zip(v0, n0))
    cos = dot_ / (
        math.sqrt(sum(a * a for a in v0)) * math.sqrt(sum(b * b for b in n0))
    )
    assert cos > 0.999


def test_lsh_cross_hits_planted_contamination(spark):
    """Semantic decontamination recall: a training vector that is a
    near-copy of an eval vector (cosine ~0.999; per-pair LSH miss prob
    ~2e-17 at 8 tables x 16 planes) MUST flag, clean vectors must not,
    and every corpus row appears exactly once in the output."""
    base = load_table(spark, SF_DIR, "embeddings").limit(40)
    rows = base.collect()
    evs = rows[:5]  # the "eval suite"
    eval_df = spark.createDataFrame(
        [(int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in evs],
        "vec_id long, embedding array<double>",
    )
    # corpus: the other 35 (clean) + one planted near-copy of eval row 0
    clean = rows[5:]
    v0 = [float(x) for x in evs[0]["embedding"]]
    leaked = [x * 1.001 + (0.0005 if i == 0 else 0.0) for i, x in enumerate(v0)]
    corpus_rows = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in clean
    ] + [(999999, leaked)]
    corpus_df = spark.createDataFrame(
        corpus_rows, "vec_id long, embedding array<double>"
    )
    got = {
        r["vec_id"]: (r["n_hits"], r["is_contaminated"])
        for r in simfn.lsh_cross_hits(
            eval_df, corpus_df, min_cosine=0.99
        ).collect()
    }
    assert len(got) == len(corpus_rows)  # every corpus row, exactly once
    assert got[999999] == (1, True), f"planted leak missed: {got[999999]}"
    for r in clean:
        assert got[int(r["vec_id"])] == (0, False)


def test_matryoshka_funnel_consistency_and_floor(spark):
    """MRL funnel invariants on the RANDOM fixture embeddings — the
    adversarial case for truncation (no matryoshka training, so prefix
    dims carry only 16/64 of the signal; recall ~0.2 here is expected
    and documented, where trained MRL embeddings sit near 1.0):

    1. rerank output == exact full-dim ranking OF the coarse shortlist
       (the funnel's own contract — rerank can't invent candidates);
    2. funnel recall >= coarse-only recall (rerank never hurts);
    3. recall in (0, 1]."""
    from pyspark.sql import functions as F

    from extract_permits_spark.functions import similarity as simfn
    from extract_permits_spark.plans import analytics
    from extract_permits_spark.sources.readers import load_table

    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, sf, "embeddings")
    q = [float(v) for v in emb.where(F.col("vec_id") == 0).select("embedding").first()[0]]

    rer = [(r["vec_id"], r["cosine_sim"]) for r in analytics.ann_matryoshka_rerank(spark, sf).collect()]
    trunc = emb.select("vec_id", F.slice("embedding", 1, 16).alias("embedding"))
    shortlist = [r["vec_id"] for r in simfn.brute_force_topk(trunc, q[:16], k=100).collect()]
    exact_over_shortlist = [
        (r["vec_id"], r["cosine_sim"])
        for r in simfn.brute_force_topk(
            emb.where(F.col("vec_id").isin(shortlist)), q, k=20
        ).collect()
    ]
    assert rer == exact_over_shortlist  # (1)

    exact20 = {r["vec_id"] for r in simfn.brute_force_topk(emb, q, k=20).collect()}
    funnel_recall = len(exact20 & {v for v, _ in rer}) / 20
    coarse20 = {r["vec_id"] for r in simfn.brute_force_topk(trunc, q[:16], k=20).collect()}
    coarse_recall = len(exact20 & coarse20) / 20
    assert funnel_recall >= coarse_recall  # (2)

    got = analytics.ann_matryoshka_recall(spark, sf).first()
    assert 0 < got["recall"] <= 1 and got["recall"] == coarse_recall  # (3)


def test_ivfpq_recall_floor_and_ivf_dominance(spark):
    """IVFADC (emb_ivfpq_recall) on the random fixture: recall@20 is the
    COMPOUND of probe pruning and lossy 8-byte codes. Measured 0.35 at
    sf0.001 (deterministic — both fits seeded); floor 0.30 catches
    regressions. Structural invariant: IVFADC's candidates are exactly
    the probed members that ann_ivf ranks by EXACT cosine, so the
    code-lossy ADC ranking can never beat IVF's recall from the same
    probe set."""
    from extract_permits_spark.plans import analytics

    got = analytics.emb_ivfpq_recall(spark, SF_DIR).first()
    assert got["k"] == 20
    assert 0.30 <= got["recall"] <= 1.0
    ivf = analytics.ann_ivf_recall(spark, SF_DIR).first()["recall"]
    assert got["recall"] <= ivf


def test_lsh_cross_hits_empty_probe_all_clean(spark):
    """An empty eval suite must yield every corpus row with n_hits=0 and
    is_contaminated=false — not an empty frame and not an error (the
    gate must be total when a benchmark list is momentarily empty)."""
    corpus = load_table(spark, SF_DIR, "embeddings").limit(10).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    empty = corpus.where(F.lit(False))
    got = simfn.lsh_cross_hits(empty, corpus, min_cosine=0.5).collect()
    assert len(got) == 10
    assert all(r["n_hits"] == 0 and r["is_contaminated"] is False for r in got)


def test_lsh_cross_hits_degenerate_bucket_salted(spark):
    """r11 VERDICT #2: the uncapped gate's hot-bucket bound. Plant a
    degenerate corpus — 2,000 near-identical vectors that all land in
    ONE (t, sig) bucket per table — and pin three things: (1) salting
    is a pure key refinement (salt_shards=8 vs =1 return identical
    rows, every planted copy flagged — nothing dropped, the failure
    mode a bucket CAP would have); (2) the candidate join's key really
    is refined (physical plan joins on _salt); (3) the planted bucket's
    per-(t, sig, _salt) fan-in is divided by the shard count (max shard
    ≤ 2x the even split, on the same xxhash64(id) % shards the
    implementation uses)."""
    base = load_table(spark, SF_DIR, "embeddings").limit(1)
    v0 = [float(x) for x in base.collect()[0]["embedding"]]
    eval_df = spark.createDataFrame(
        [(0, v0)], "vec_id long, embedding array<double>"
    )
    # 2,000 copies with a tiny common-direction jitter: same LSH
    # signature (sign pattern unchanged), cosine ~1.0 to the eval vector
    n = 2000
    corpus_df = spark.createDataFrame(
        [(i + 1, [x * (1.0 + 0.0001 * (i % 7)) for x in v0]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    salted = simfn.lsh_cross_hits(eval_df, corpus_df, min_cosine=0.99)
    plain = simfn.lsh_cross_hits(
        eval_df, corpus_df, min_cosine=0.99, salt_shards=1
    )
    got_s = sorted(map(tuple, salted.collect()))
    got_p = sorted(map(tuple, plain.collect()))
    assert got_s == got_p  # pure key refinement: bit-identical results
    assert len(got_s) == n
    assert all(hits == 1 and flagged for _, hits, flagged in got_s)
    # the salted plan joins on _salt; the unsalted one must not
    assert "_salt" in salted._jdf.queryExecution().optimizedPlan().toString()
    assert "_salt" not in plain._jdf.queryExecution().optimizedPlan().toString()
    # fan-in bound: the degenerate bucket splits over the 8 shards on
    # xxhash64(vec_id) % 8 — no shard may exceed 2x the even split
    shard_counts = (
        corpus_df.groupBy(
            F.pmod(F.xxhash64("vec_id"), F.lit(8)).alias("s")
        )
        .count()
        .collect()
    )
    assert len(shard_counts) == 8
    assert max(r["count"] for r in shard_counts) <= 2 * (n // 8)


@pytest.mark.parametrize("shards", [1, 2, 3, 16])
def test_lsh_cross_hits_shard_count_invariance(spark, shards):
    """The salt is a pure key refinement for ANY shard count: results on
    mixed (clean + leaked) data must be identical to the canonical
    default-8 run — bit-for-bit, including n_hits counts."""
    base = load_table(spark, SF_DIR, "embeddings").limit(24)
    rows = base.collect()
    evs = rows[:4]
    eval_df = spark.createDataFrame(
        [(int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in evs],
        "vec_id long, embedding array<double>",
    )
    leaked = [
        (900000 + i, [x * 1.0005 for x in [float(v) for v in evs[i]["embedding"]]])
        for i in range(4)
    ]
    corpus_df = spark.createDataFrame(
        [(int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in rows[4:]]
        + leaked,
        "vec_id long, embedding array<double>",
    )
    want = sorted(
        map(tuple, simfn.lsh_cross_hits(eval_df, corpus_df, min_cosine=0.99).collect())
    )
    got = sorted(
        map(
            tuple,
            simfn.lsh_cross_hits(
                eval_df, corpus_df, min_cosine=0.99, salt_shards=shards
            ).collect(),
        )
    )
    assert got == want
    assert sum(1 for _, h, f in want if f) == 4  # all four leaks flagged


def test_emb_components_collapse_equals_uncollapsed_graph(spark):
    """The exact-vector collapse behind emb_neardup_components must yield
    EXACTLY the components of the uncollapsed pair graph. Plant a
    120-copy exact flood (one degenerate bucket), a 3-vector exact twin
    group attached to a near-dup, and leave the rest as background:
    components computed from (reps-only LSH pairs + twin stars) must
    equal components computed from lsh_neardup_pairs over ALL vectors —
    while the collapsed path never materializes an intra-flood pair
    (120 copies → 119 star edges, not 7,140 pairs)."""
    from extract_permits_spark.operators.graph import connected_components

    base = load_table(spark, SF_DIR, "embeddings").limit(30).collect()
    vecs = [[float(x) for x in r["embedding"]] for r in base]
    rows = [(i, vecs[i]) for i in range(20)]              # background
    rows += [(1000 + i, vecs[20]) for i in range(120)]    # exact flood
    rows += [(2000 + i, vecs[21]) for i in range(3)]      # twin group
    rows += [(3000, [x * 1.0004 for x in vecs[21]])]      # near-dup of it
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    from pyspark.sql import Window as W

    wt = W.partitionBy("embedding")
    mem = emb.select("vec_id", "embedding", F.min("vec_id").over(wt).alias("_rep"))
    reps = mem.where(F.col("vec_id") == F.col("_rep")).select("vec_id", "embedding")
    rep_pairs = simfn.lsh_neardup_pairs(reps, min_cosine=0.99).select("id_a", "id_b")
    stars = mem.where(F.col("vec_id") != F.col("_rep")).select(
        F.col("_rep").alias("id_a"), F.col("vec_id").alias("id_b")
    )
    collapsed = connected_components(rep_pairs.unionByName(stars))

    # ground truth: the uncollapsed pair graph (cap lifted far above the
    # flood so nothing is dropped from the quadratic bucket)
    full_pairs = simfn.lsh_neardup_pairs(
        emb, min_cosine=0.99, max_bucket_size=10**6
    ).select("id_a", "id_b")
    full = connected_components(full_pairs)

    got = sorted(map(tuple, collapsed.collect()))
    want = sorted(map(tuple, full.collect()))
    assert got == want
    # the flood is one cluster labeled by its min id...
    comp = {i: c for i, c in got}
    assert all(comp[1000 + i] == 1000 for i in range(120))
    # ...and the twin group fused with its near-dup
    assert comp[3000] == comp[2000] == comp[2001] == comp[2002] == 2000
    # the collapsed edge list is LINEAR in the flood: 119 stars + rep
    # pairs, vs the uncollapsed 7,140 intra-flood pairs
    n_stars = stars.count()
    assert n_stars == 120 - 1 + 3 - 1
    assert full_pairs.count() >= 120 * 119 // 2


def test_lsh_cross_hits_bucket_cap_weighs_duplicates(spark):
    """r14 ADVICE low: after the exact-duplicate collapse,
    max_bucket_size must size buckets by EXPANDED multiplicity — a
    flood of N identical embeddings is still a size-N bucket. With
    cap < N the flood's bucket drops in every table (identical vectors
    share all signatures) so no flood row hits, exactly as the
    pre-collapse code behaved; with cap >= N every flood row hits."""
    base = load_table(spark, SF_DIR, "embeddings").limit(1)
    v0 = [float(x) for x in base.collect()[0]["embedding"]]
    eval_df = spark.createDataFrame(
        [(0, v0)], "vec_id long, embedding array<double>"
    )
    n = 6
    corpus_df = spark.createDataFrame(
        [(i + 1, v0) for i in range(n)], "vec_id long, embedding array<double>"
    )
    capped = simfn.lsh_cross_hits(
        eval_df, corpus_df, min_cosine=0.99, max_bucket_size=n - 1
    ).collect()
    assert len(capped) == n
    assert all(
        r["n_hits"] == 0 and r["is_contaminated"] is False for r in capped
    )
    roomy = simfn.lsh_cross_hits(
        eval_df, corpus_df, min_cosine=0.99, max_bucket_size=n
    ).collect()
    assert len(roomy) == n
    assert all(r["n_hits"] == 1 and r["is_contaminated"] for r in roomy)
