"""Corpus-assembly operators for training-data pipelines.

Ops a pretraining pipeline runs around cleaning/dedup — sub-document
dedup (``segment_dedup``), benchmark decontamination (``decontaminate``),
temperature-scaled source mixing (``mixture_weights``), plus the two
assembly steps:

- **Sequence packing** (``next_fit_pack``): concatenate documents into
  fixed-budget bins (context windows) so batches carry minimal padding.
  Next-fit is inherently sequential *within a shard* — bin state depends
  on every prior document — so the Spark shape is ``groupBy(shard)
  .applyInPandas`` (Arrow-batched, one pandas call per shard, plain
  loop inside). Shards are independent, so parallelism = shard count;
  at 100 TB you shard to O(cores × 4) and each shard packs locally
  with zero cross-shard coordination. This is honest stateful logic,
  not a UDF-for-convenience: no composition of built-in operators
  expresses a running sum with data-dependent resets.

- **Mixture interleaving** (``interleave_sources``): draw a deterministic
  sample matching target per-source quotas. Selection key is
  ``md5(id)`` so the "random" subset is reproducible across engines and
  runs, and ranking is one window per source (single shuffle on the
  source key; skew-safe because quotas bound the output per source).
"""

from __future__ import annotations

from typing import Mapping

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def next_fit_pack(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    shard_col: str,
    budget: int,
) -> DataFrame:
    """Next-fit packing: walk each shard in ``id_col`` order, accumulate
    ``weight_col``; the first document of a shard opens bin 0, and any
    later document that would push the running total past ``budget``
    opens a new bin (an oversized document therefore gets a bin of its
    own). Returns ``(shard, id, weight, bin)``.

    The exact rule (first row never opens a new bin; overflow check is
    ``used + w > budget``) is mirrored by the DuckDB recursive-CTE oracle
    in ``plans/analytics.py:pack_sequences`` — keep them in lockstep.
    """
    out_schema = f"shard long, {id_col} long, weight long, bin long"

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        bins: list[int] = []
        used = 0
        b = 0
        for i, w in enumerate(pdf["_w"]):
            w = int(w)
            if i > 0 and used + w > budget:
                b += 1
                used = 0
            used += w
            bins.append(b)
        return pd.DataFrame(
            {
                "shard": pdf["_shard"],
                id_col: pdf[id_col],
                "weight": pdf["_w"],
                "bin": bins,
            }
        )

    prepared = df.select(
        F.col(shard_col).cast("long").alias("_shard"),
        F.col(id_col),
        F.col(weight_col).cast("long").alias("_w"),
    )
    return prepared.groupBy("_shard").applyInPandas(pack, out_schema)


def segment_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seg_tokens: int = 8,
) -> DataFrame:
    """Sub-document exact dedup (the paragraph-level pass of RefinedWeb-style
    pipelines, at segment grain): split each document into consecutive
    ``seg_tokens``-token segments, drop every segment whose exact text
    appeared earlier in the corpus (first occurrence in ``(id, position)``
    order survives), and reassemble the remaining text in original order.

    Returns ``(id, n_segs, n_kept, clean_text)``.

    Shape: one narrow explode (tokenize + arithmetic starts), one shuffle on
    the segment text for the global keep-first window, one shuffle back on
    the document id to reassemble. Both keys hash-distribute; no driver
    state, no all-pairs work — the same plan at 100 TB just widens. A
    pathologically hot segment (e.g. boilerplate appearing in every crawl
    page) skews the window key; AQE skew-split handles it because rank
    only needs the per-key minimum, which partial-aggregates.
    """
    from extract_permits_spark.functions.similarity import tokens

    toks = tokens(F.col(text_col))
    with_toks = docs.select(F.col(id_col), toks.alias("_t")).where(F.size("_t") > 0)
    starts = F.sequence(F.lit(1), F.size("_t"), F.lit(seg_tokens))
    segs = with_toks.select(
        id_col, "_t", F.posexplode(starts).alias("seg_idx", "_start")
    ).select(
        id_col,
        "seg_idx",
        F.concat_ws(" ", F.slice("_t", F.col("_start"), seg_tokens)).alias("seg"),
    )
    w = Window.partitionBy("seg").orderBy(id_col, "seg_idx")
    ranked = segs.withColumn("_keep", F.row_number().over(w) == 1)
    kept_struct = F.when(F.col("_keep"), F.struct("seg_idx", "seg"))
    return ranked.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_segs"),
        F.sum(F.col("_keep").cast("long")).alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.sort_array(F.collect_list(kept_struct)), lambda s: s["seg"]
            ),
        ).alias("clean_text"),
    )


def doc_ngrams(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 5
) -> DataFrame:
    """(id, g) — one row per overlapping word n-gram occurrence. THE
    tokenize/n-gram contract of decontamination; the streaming ingest
    gate imports this same function so batch ≡ stream is structural, not
    copy-paste (r9 review finding)."""
    from extract_permits_spark.functions.similarity import tokens
    from extract_permits_spark.functions.text import _word_ngrams

    g = _word_ngrams(tokens(F.col(text_col)), n)
    return df.select(F.col(id_col), F.explode(g).alias("g"))


def contamination_hits(
    train: DataFrame,
    eval_grams: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """(id, n_hits, is_contaminated) for every row of ``train`` against a
    prebuilt DISTINCT eval n-gram set — the probe+epilogue shared by the
    batch `decontaminate` and the streaming per-micro-batch scorer."""
    hits = (
        doc_ngrams(train, id_col, text_col, n)
        .join(F.broadcast(eval_grams), "g")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        train.select(id_col)
        .distinct()
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("is_contaminated"),
        )
    )


def decontaminate(
    train: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any word
    ``n``-gram with the evaluation set (the n-gram-overlap rule used for
    pretraining-corpus hygiene). Returns every training document as
    ``(id, n_hits, is_contaminated)`` where ``n_hits`` counts the training
    document's n-gram occurrences that appear anywhere in the eval set.

    Shape: the distinct eval n-gram set is small relative to the corpus
    (eval suites are fixed-size) — broadcast it, so the contamination
    check is a map-side hash probe over the exploded training n-grams
    with zero shuffle of the 100-TB side; the per-doc count then
    partial-aggregates on the id key."""
    ev = doc_ngrams(eval_docs, id_col, text_col, n).select("g").distinct()
    return contamination_hits(train, ev, id_col, text_col, n)


def mixture_weights(
    docs: DataFrame, source_col: str = "source", alpha: float = 0.5
) -> DataFrame:
    """Temperature-scaled source mixture weights: ``w_s ∝ n_s^alpha``
    normalized to sum 1 (alpha < 1 upweights small sources — the standard
    multi-source sampling temperature). One aggregation plus a scalar
    normalizer; returns ``(source, n_docs, weight)``."""
    counts = docs.groupBy(source_col).agg(F.count(F.lit(1)).alias("n_docs"))
    total = Window.partitionBy()
    return counts.select(
        source_col,
        "n_docs",
        F.round(
            F.pow("n_docs", F.lit(alpha))
            / F.sum(F.pow("n_docs", F.lit(alpha))).over(total),
            6,
        ).alias("weight"),
    )


def interleave_sources(
    df: DataFrame,
    id_col: str,
    source_col: str,
    quotas: Mapping[str, int],
) -> DataFrame:
    """Deterministic mixture sample: for each source with a quota, keep
    the ``quota`` documents with the smallest ``md5(id)`` (ties broken
    by id). Sources without a quota are dropped. Returns the selected
    ``(id, source, mix_rank)`` rows.

    One shuffle (window on source). Output size is bounded by
    ``sum(quotas)`` regardless of input skew.
    """
    quota_expr = F.create_map(
        *[F.lit(x) for kv in quotas.items() for x in (kv[0], int(kv[1]))]
    )[F.col(source_col)]
    w = Window.partitionBy(source_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.select(F.col(id_col), F.col(source_col))
        .withColumn("_quota", quota_expr)
        .where(F.col("_quota").isNotNull())
        .withColumn("mix_rank", F.row_number().over(w))
        .where(F.col("mix_rank") <= F.col("_quota"))
        .drop("_quota")
    )


def importance_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score each raw document
    by the log-likelihood ratio of its hashed-unigram features under
    add-1-smoothed bag-of-words models of the target corpus vs the raw
    corpus. High weight ⇒ the document looks like the target domain;
    selection is then top-k or Gumbel resampling on the weight.

    Shape at scale: tokens hash into ``n_buckets`` (cross-engine md5), so
    model state is a BOUNDED ``n_buckets``-row table regardless of corpus
    size — it broadcasts; the per-document score is then a map-side probe
    plus one partial-aggregating shuffle on the id. The only full-corpus
    shuffles are the two bucket-count aggregations, each over compact
    (bucket, count) pairs with perfect partial (map-side) combine.
    """
    from extract_permits_spark.functions.similarity import md5_long60, tokens

    def buckets(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(id_col), F.explode(tokens(F.col(text_col))).alias("_tok")
        ).select(
            id_col, F.pmod(md5_long60("_tok"), F.lit(n_buckets)).alias("bucket")
        )

    raw_b = buckets(raw)
    stats = (
        raw_b.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("rc"))
        .join(
            buckets(target).groupBy("bucket").agg(F.count(F.lit(1)).alias("tc")),
            "bucket",
            "full_outer",
        )
        .select(
            "bucket",
            F.coalesce("rc", F.lit(0)).alias("rc"),
            F.coalesce("tc", F.lit(0)).alias("tc"),
        )
    )
    totals = stats.agg(F.sum("rc").alias("R"), F.sum("tc").alias("T"))
    # 1×1-row scalar join (same pattern as the registry's scalar
    # normalizers) — never a data-sized crossJoin
    ratio = stats.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            F.log((F.col("tc") + F.lit(1.0)) / (F.col("T") + F.lit(float(n_buckets))))
            - F.log((F.col("rc") + F.lit(1.0)) / (F.col("R") + F.lit(float(n_buckets))))
        ).alias("lr"),
    )
    return (
        raw_b.join(F.broadcast(ratio), "bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            # no engine-side rounding: the comparison harness normalizes
            # floats identically on both sides; double-rounding with two
            # different engines' modes is the only way to lose
            F.sum("lr").alias("importance_weight"),
        )
    )


# ---------------------------------------------------------------------------
# Incremental (cross-snapshot) dedup with a Bloom prefilter — the
# continuous-crawl refresh op: a new snapshot arrives, and only documents
# whose content key *might* exist in the base corpus pay the exact
# anti-join. The Bloom filter is an m-bit bitmask built once from the base
# side (bounded driver state: m/8 bytes regardless of corpus size),
# shipped to every executor as literals, and probed entirely map-side —
# this is the hand-rolled, oracle-replayable form of the runtime bloom
# filters Spark itself injects under AQE.
# ---------------------------------------------------------------------------

_BLOOM_BITS_PER_WORD = 32  # packed into longs; 32 bits/word sidesteps the
# sign bit of both IntegerType and (bit 63 of) LongType literals


def bloom_positions(key, m: int, k_hashes: int):
    """array<long> of ``k_hashes`` bit positions for a string key.

    Position_i = first 60 bits of md5(i || key) mod m — the repo's
    cross-engine hash (similarity.md5_long60), so DuckDB replays the
    positions digit-identically via ('0x' || substr(md5(...),1,15))."""
    from extract_permits_spark.functions.similarity import md5_long60

    k = F.col(key) if isinstance(key, str) else key
    return F.array(
        *[
            F.pmod(md5_long60(F.concat(F.lit(str(i)), k)), F.lit(m))
            for i in range(k_hashes)
        ]
    )


def bloom_bitmask_words(
    base: DataFrame, key_col: str, m: int = 4096, k_hashes: int = 2
) -> list[int]:
    """Build the m-bit Bloom bitmask from the base corpus' keys.

    One distinct over ≤ m positions — the collect is bounded by the filter
    size (m/32 words), never the corpus, same legitimacy class as the
    k-means centroid state. At 100 TB this runs as a partial-agg shuffle
    of at most m distinct longs."""
    rows = (
        base.select(
            F.explode(bloom_positions(key_col, m, k_hashes)).alias("p")
        )
        .where(F.col("p").isNotNull())
        .distinct()
        .collect()
    )
    words = [0] * ((m + _BLOOM_BITS_PER_WORD - 1) // _BLOOM_BITS_PER_WORD)
    for r in rows:
        p = int(r["p"])
        words[p // _BLOOM_BITS_PER_WORD] |= 1 << (p % _BLOOM_BITS_PER_WORD)
    return words


def bloom_member(key, words: list[int], m: int, k_hashes: int):
    """Boolean probe: all k bit positions set in the literal bitmask.

    Pure codegen — element_at into a words-array literal + getbit with a
    computed bit index. No join, no shuffle, no driver round-trip."""
    mask = F.array(*[F.lit(w).cast("long") for w in words])
    k = F.col(key) if isinstance(key, str) else key
    conds = []
    for i in range(k_hashes):
        from extract_permits_spark.functions.similarity import md5_long60

        p = F.pmod(md5_long60(F.concat(F.lit(str(i)), k)), F.lit(m))
        word = F.element_at(mask, (p / _BLOOM_BITS_PER_WORD).cast("int") + 1)
        conds.append(
            F.getbit(word, F.pmod(p, F.lit(_BLOOM_BITS_PER_WORD))) == 1
        )
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


def incremental_dedup(
    base: DataFrame,
    incoming: DataFrame,
    id_col: str = "doc_id",
    key_col: str = "key",
    m: int = 4096,
    k_hashes: int = 2,
    words: list[int] | None = None,
) -> DataFrame:
    """Flag incoming-snapshot documents already present in the base corpus.

    Returns (id, bloom_candidate, is_dup) for every incoming row:
    ``bloom_candidate`` is the map-side Bloom probe (false ⇒ definitely
    new — those rows NEVER enter the key join); ``is_dup`` is the exact
    verdict, computed by joining ONLY the candidate subset against the
    base keys. The join input shrinks from |incoming| to
    |dups| + |false positives| — at a ~5 % FP rate the exact-check
    shuffle carries ~5 % of the snapshot instead of all of it."""
    if words is None:
        words = bloom_bitmask_words(base, key_col, m, k_hashes)
    flagged = incoming.select(
        id_col, key_col, bloom_member(key_col, words, m, k_hashes).alias(
            "bloom_candidate"
        )
    )
    base_keys = base.select(key_col).distinct().withColumn("_hit", F.lit(True))
    cand = (
        flagged.where(F.col("bloom_candidate"))
        .join(base_keys, key_col, "left")
        .select(
            id_col,
            "bloom_candidate",
            F.coalesce(F.col("_hit"), F.lit(False)).alias("is_dup"),
        )
    )
    fresh = flagged.where(~F.col("bloom_candidate")).select(
        id_col, "bloom_candidate", F.lit(False).alias("is_dup")
    )
    return cand.unionByName(fresh)
