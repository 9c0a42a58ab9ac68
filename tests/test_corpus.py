"""Sequence packing + mixture interleave (functions/corpus.py) and int8
quantization (functions/similarity.py)."""

from pyspark.sql import functions as F

from extract_permits_spark.functions.corpus import interleave_sources, next_fit_pack
from extract_permits_spark.functions import similarity as simfn


def _pack(spark, rows, budget):
    df = spark.createDataFrame(rows, "doc_id long, shard long, w long")
    out = next_fit_pack(df, id_col="doc_id", weight_col="w", shard_col="shard", budget=budget)
    return {r.doc_id: r.bin for r in out.collect()}


def test_pack_basic_next_fit(spark):
    # shard 0, budget 10: [4,4,4] -> 4+4 fits, third overflows
    got = _pack(spark, [(1, 0, 4), (2, 0, 4), (3, 0, 4)], budget=10)
    assert got == {1: 0, 2: 0, 3: 1}


def test_pack_oversized_doc_gets_own_bin(spark):
    # first doc never opens a new bin even when oversized; a later
    # oversized doc opens one and the next doc starts after it
    got = _pack(spark, [(1, 0, 99), (2, 0, 3), (3, 0, 99), (4, 0, 3)], budget=10)
    assert got == {1: 0, 2: 1, 3: 2, 4: 3}


def test_pack_zero_weight_rows_ride_along(spark):
    got = _pack(spark, [(1, 0, 0), (2, 0, 0), (3, 0, 7), (4, 0, 7)], budget=10)
    assert got == {1: 0, 2: 0, 3: 0, 4: 1}


def test_pack_shards_are_independent(spark):
    got = _pack(spark, [(1, 0, 8), (2, 1, 8), (3, 0, 8), (4, 1, 8)], budget=10)
    assert got == {1: 0, 3: 1, 2: 0, 4: 1}


def test_interleave_quotas_and_determinism(spark):
    rows = [(i, f"src{i % 3}") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out1 = interleave_sources(df, "doc_id", "source", {"src0": 5, "src1": 2})
    got1 = sorted((r.doc_id, r.source, r.mix_rank) for r in out1.collect())
    assert len(got1) == 7
    assert {s for _, s, _ in got1} == {"src0", "src1"}  # src2 has no quota
    out2 = interleave_sources(df, "doc_id", "source", {"src0": 5, "src1": 2})
    assert got1 == sorted((r.doc_id, r.source, r.mix_rank) for r in out2.collect())


def test_int8_quantize_known_vector(spark):
    df = spark.createDataFrame([(1, [2.0, -1.0, 0.5]), (2, [0.0, 0.0, 0.0])],
                               "id long, v array<float>")
    q, scale = simfn.int8_quantize(F.col("v"))
    rows = {r.id: (r.q, round(r.s, 9)) for r in
            df.select("id", q.alias("q"), scale.alias("s")).collect()}
    # scale = 2/127; 2.0 -> 127, -1.0 -> floor(-63.5+0.5) = -63, 0.5 -> 32
    assert rows[1] == ([127, -63, 32], round(2.0 / 127.0, 9))
    assert rows[2] == ([0, 0, 0], 0.0)
