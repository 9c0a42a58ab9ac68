"""Product quantization (functions/pq.py): fit shape, encode quality,
ADC-vs-exact agreement, and plan hygiene."""

import pytest
from pyspark.sql import functions as F

from extract_permits_spark.functions.pq import pq_adc_topk, pq_encode, pq_fit
from extract_permits_spark.sources.readers import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings")


@pytest.fixture(scope="module")
def book(spark, emb):
    return pq_fit(emb, m=8, k=16, rounds=1)


def test_codebook_shape_and_determinism(spark, emb, book):
    assert len(book) == 8
    assert all(len(sub) == 16 for sub in book)
    assert all(len(c) == 8 for sub in book for c in sub)
    assert book == pq_fit(emb, m=8, k=16, rounds=1)


def test_lloyd_round_reduces_reconstruction_error(spark, emb, book):
    init_only = pq_fit(emb, m=8, k=16, rounds=0)
    mse = lambda b: (
        pq_encode(emb, b).agg(F.avg("recon_mse")).first()[0]
    )
    assert mse(book) < mse(init_only)


def test_encode_codes_in_range(spark, emb, book):
    rows = pq_encode(emb, book).select("codes").collect()
    for r in rows:
        parts = [int(p) for p in r["codes"].split("-")]
        assert len(parts) == 8 and all(0 <= p < 16 for p in parts)


def test_adc_topk_overlaps_exact(spark, emb, book):
    """ADC is lossy but must still retrieve a solid share of the exact
    L2 top-20 (the fixture is near-uniform random — the hard case)."""
    from extract_permits_spark.functions.similarity import (
        _py_round_half_up,
        brute_force_topk,
    )

    raw = [float(x) for x in emb.where(F.col("vec_id") == 0).first()["embedding"]]
    norm = sum(x * x for x in raw) ** 0.5
    qvec = [_py_round_half_up(x / norm, 9) for x in raw]
    adc = {r["vec_id"] for r in pq_adc_topk(emb, book, qvec, topk=20).collect()}
    exact = {r["vec_id"] for r in brute_force_topk(emb, raw, k=20).collect()}
    # 8 subspaces × 16 centroids = 32-bit codes on 64 near-uniform random
    # dims — the information-theoretic hard case. Measured overlap is a
    # deterministic 6/20 on this fixture (everything in the fit is
    # seeded); the floor of 5 guards regressions without flaking.
    assert len(adc & exact) >= 5


def test_encode_plan_is_narrow(spark, emb, book):
    plan = (
        pq_encode(emb, book)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, "PQ encode must be a zero-shuffle map"
    assert "BatchEvalPython" not in plan and "PythonUDF" not in plan


def test_argmin_kernel_equals_column_spelling(spark):
    """_argmin_l2_arrow must agree with _nearest_by_l2 row-for-row on the
    fixture (the kernel replaced the Column spelling at the four
    assignment call sites; DuckDB replays pin parity per entry, this
    pins the two in-engine spellings against each other directly —
    including the ties→lowest-cid rule)."""
    from pyspark.sql import functions as F

    from extract_permits_spark.functions import similarity as simfn
    from extract_permits_spark.plans.analytics import _ivf_centroids_cached
    from extract_permits_spark.sources.readers import load_table

    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, sf, "embeddings")
    cents = _ivf_centroids_cached(spark, emb, sf)
    n = simfn.unit_normalized(emb)
    both = n.select(
        "vec_id",
        simfn._argmin_l2_arrow(cents)(F.col("e")).alias("kern"),
        simfn._nearest_by_l2(F.col("e"), cents).alias("col"),
    )
    diffs = both.where(F.col("kern") != F.col("col")).count()
    assert diffs == 0
