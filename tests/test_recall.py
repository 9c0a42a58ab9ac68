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
