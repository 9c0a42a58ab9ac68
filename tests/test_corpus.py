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


# ---------------------------------------------------------------------------
# r6: segment dedup, decontamination, mixture weights, repetition metrics.
# ---------------------------------------------------------------------------


def test_segment_dedup_drops_repeated_segment(spark):
    from extract_permits_spark.functions.corpus import segment_dedup

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j"),          # segs: "a..h", "i j"
            (2, "a b c d e f g h x y"),          # first seg duplicates doc 1's
            (3, ""),                               # empty -> no output row
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in segment_dedup(docs, seg_tokens=8).collect()}
    assert set(out) == {1, 2}
    assert out[1]["n_segs"] == 2 and out[1]["n_kept"] == 2
    assert out[1]["clean_text"] == "a b c d e f g h i j"
    assert out[2]["n_segs"] == 2 and out[2]["n_kept"] == 1
    assert out[2]["clean_text"] == "x y"


def test_segment_dedup_keep_first_is_positional(spark):
    from extract_permits_spark.functions.corpus import segment_dedup

    # the SAME segment twice within one doc: first occurrence survives
    docs = spark.createDataFrame([(7, "p q r s p q r s")], ["doc_id", "text"])
    row = segment_dedup(docs, seg_tokens=4).collect()[0]
    assert row["n_segs"] == 2 and row["n_kept"] == 1
    assert row["clean_text"] == "p q r s"


def test_decontaminate_flags_ngram_overlap(spark):
    from extract_permits_spark.functions.corpus import decontaminate

    ev = spark.createDataFrame([(100, "the quick brown fox jumps over")], ["doc_id", "text"])
    train = spark.createDataFrame(
        [
            (1, "something the quick brown fox jumps here"),  # shares a 5-gram
            (2, "totally unrelated content with no overlap at all"),
            (3, "tiny"),                                       # < n tokens
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in decontaminate(train, ev, n=5).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1]["is_contaminated"] and out[1]["n_hits"] == 1
    assert not out[2]["is_contaminated"] and out[2]["n_hits"] == 0
    assert not out[3]["is_contaminated"]


def test_mixture_weights_sqrt_temperature(spark):
    from extract_permits_spark.functions.corpus import mixture_weights

    docs = spark.createDataFrame(
        [(i, "web") for i in range(9)] + [(90, "books")], ["doc_id", "source"]
    )
    out = {r["source"]: r for r in mixture_weights(docs, "source", 0.5).collect()}
    # sqrt(9)=3, sqrt(1)=1 -> web 0.75, books 0.25
    assert out["web"]["weight"] == 0.75
    assert out["books"]["weight"] == 0.25
    assert out["web"]["n_docs"] == 9


def test_repetition_metrics_known_values(spark):
    from extract_permits_spark.functions.text import repetition_metrics

    docs = spark.createDataFrame(
        [
            (1, "a a a a"),        # 4 tokens, 1 distinct; bigrams: 3x "a a"
            (2, "w x y z"),        # all unique
            (3, ""),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in repetition_metrics(docs).collect()}
    assert out[1]["dup_token_frac"] == 0.75
    assert out[1]["top_bigram_frac"] == 1.0
    assert out[1]["top_trigram_frac"] == 1.0
    assert out[2]["dup_token_frac"] == 0.0
    assert out[2]["top_bigram_frac"] == round(1 / 3, 6)
    assert out[3]["dup_token_frac"] == 0.0 and out[3]["top_bigram_frac"] == 0.0


def test_dup_line_fraction(spark):
    from pyspark.sql import functions as F

    from extract_permits_spark.functions.text import dup_line_fraction

    docs = spark.createDataFrame(
        [
            (1, "header\nbody one\nheader\n\n  \nbody two"),  # 4 non-empty, 1 dup
            (2, None),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r["f"]
        for r in docs.select("doc_id", dup_line_fraction(F.col("text")).alias("f")).collect()
    }
    assert out[1] == 0.25
    assert out[2] == 0.0


def test_importance_weights_ranks_target_like_docs(spark):
    """A raw doc written in the target's vocabulary must outscore a raw
    doc with disjoint vocabulary (DSIR's defining property)."""
    from extract_permits_spark.functions.corpus import importance_weights

    target = spark.createDataFrame(
        [(100, "alpha beta gamma alpha beta"), (101, "alpha gamma delta")],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "zig zag zoom quux")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in importance_weights(raw, target).collect()}
    assert out[1]["importance_weight"] > out[2]["importance_weight"]
    assert out[1]["n_tokens"] == 3 and out[2]["n_tokens"] == 4


def test_bloom_no_false_negatives_and_some_rejections(spark):
    """Bloom contract: every base key is a candidate (no false negatives
    — the filter would otherwise drop true duplicates); keys far outside
    the base mostly probe false. m=256 with 20 keys keeps FP low but >0
    possible — only the no-false-negative side is a hard guarantee."""
    from extract_permits_spark.functions.corpus import (
        bloom_bitmask_words,
        bloom_member,
    )

    base = spark.createDataFrame(
        [(f"key-{i}",) for i in range(20)], "key string"
    )
    words = bloom_bitmask_words(base, "key", m=256, k_hashes=2)
    # membership of the base keys themselves: all true
    hits = base.select(
        bloom_member("key", words, 256, 2).alias("hit")
    ).collect()
    assert all(r["hit"] for r in hits)
    # probe 200 unseen keys: at least half must be rejected (expected FP
    # ~ (1-exp(-40/256))^2 ≈ 2% — 50% is a generous flake margin)
    probe = spark.createDataFrame(
        [(f"other-{i}",) for i in range(200)], "key string"
    )
    n_cand = probe.where(bloom_member("key", words, 256, 2)).count()
    assert n_cand < 100


def test_incremental_dedup_flags(spark):
    """Exact copies are dups; fresh text is not; every incoming row gets
    exactly one verdict and non-candidates are never dups."""
    from extract_permits_spark.functions.corpus import incremental_dedup

    base = spark.createDataFrame(
        [(1, "aaa"), (2, "bbb"), (3, "ccc")], "doc_id long, key string"
    ).select("doc_id", "key")
    inc = spark.createDataFrame(
        [(11, "aaa"), (12, "zzz"), (13, "ccc"), (14, "yyy")],
        "doc_id long, key string",
    )
    out = {
        r["doc_id"]: r
        for r in incremental_dedup(
            base.select("key"), inc, m=512, k_hashes=2
        ).collect()
    }
    assert len(out) == 4
    assert out[11]["is_dup"] and out[13]["is_dup"]
    assert not out[12]["is_dup"] and not out[14]["is_dup"]
    for r in out.values():
        if not r["bloom_candidate"]:
            assert not r["is_dup"]


def test_span_mask_owner_survives_twin_fully_masked(spark, tmp_path):
    """docs_span_mask semantics pinned on a constructed corpus: the span
    owner (min doc_id) keeps its text verbatim, an exact-copy doc is
    fully masked (empty text, 0 kept tokens — the COUNT(tok)-vs-COUNT(*)
    edge), and sub-window docs are untouched."""
    import os

    from extract_permits_spark.plans import analytics

    words = " ".join(f"w{i}" for i in range(16))
    df = spark.createDataFrame(
        [(1, words), (2, words), (3, "short text")], "doc_id long, text string"
    )
    d = str(tmp_path / "corpus")
    df.write.parquet(os.path.join(d, "documents.parquet"))
    out = {
        r["doc_id"]: (r["masked_text"], r["n_kept_tokens"])
        for r in analytics.docs_span_mask(spark, d).collect()
    }
    assert out[1] == (words, 16)
    assert out[2] == ("", 0)
    assert out[3] == ("short text", 2)


def test_hll_registers_merge_by_max(spark):
    """The property that makes HLL a 100-TB sketch: per-shard register
    vectors union by element-wise MAX. Build the (reg, rank) max over
    two disjoint halves of the corpus, merge, and require exact equality
    with the full-corpus registers — plus the estimate within the
    theoretical band (sigma ~= 1.04/sqrt(256))."""
    from pyspark.sql import functions as F

    from extract_permits_spark.sources.readers import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    h = F.md5(F.coalesce(F.col("text"), F.lit("")).cast("binary"))
    reg = F.conv(F.substring(h, 1, 2), 16, 10).cast("int")
    v = F.conv(F.substring(h, 3, 14), 16, 10).cast("long")
    rank = F.when(v == 0, F.lit(57)).otherwise(
        F.lit(56) - F.length(F.conv(v, 10, 2)) + F.lit(1)
    )

    def registers(df):
        rows = (
            df.select(reg.alias("reg"), rank.alias("r"))
            .groupBy("reg")
            .agg(F.max("r").alias("r"))
            .collect()
        )
        return {row["reg"]: row["r"] for row in rows}

    full = registers(d)
    h1 = registers(d.where(F.col("doc_id") % 2 == 0))
    h2 = registers(d.where(F.col("doc_id") % 2 == 1))
    merged = {k: max(h1.get(k, 0), h2.get(k, 0)) for k in set(h1) | set(h2)}
    assert merged == full

    from extract_permits_spark.plans import analytics

    row = analytics._QUERIES["docs_hll_distinct"](
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    assert abs(row["rel_err"]) < 3 * 1.04 / 16  # 3 sigma at m=256


def test_budget_mix_cap_guard_semantics(spark):
    """r14 ADVICE low on llm_pretrain_pipeline's _MIX_CAP guard: the
    budget-exhaustion assert must fire ONLY when a row beyond the
    prefilter cap actually exists. Three shapes pin it:
    (1) exactly cap survivors, total under budget -> no row dropped, no
    fire (the old guard tripped here spuriously);
    (2) a row beyond the cap exists and the cap-th cum is under budget
    -> a survivor may have been dropped, the job must fail loudly;
    (3) beyond-cap rows exist but the budget exhausts within the cap ->
    truncation is correct, no fire."""
    import pytest

    from extract_permits_spark.plans.analytics_events import _budget_mix

    schema = "doc_id long, source string, tk array<int>, _src_n long"

    exact = spark.createDataFrame(
        [(i, "s", [0, 1], 4) for i in range(1, 5)], schema
    )
    out = _budget_mix(exact, cap=4, budget=100).collect()
    assert len(out) == 4  # all kept, guard silent

    beyond = spark.createDataFrame(
        [(i, "s", [0, 1], 5) for i in range(1, 6)], schema
    )
    with pytest.raises(Exception, match="mix budget was not exhausted"):
        _budget_mix(beyond, cap=4, budget=100).collect()

    exhausted = spark.createDataFrame(
        [(i, "s", list(range(30)), 5) for i in range(1, 6)], schema
    )
    got = _budget_mix(exhausted, cap=4, budget=100).collect()
    # cum = 30, 60, 90, 120 over the capped four -> three fit the budget
    assert len(got) == 3
