"""Stream-static near-dup scoring on ingest: every arriving document is
checked against a STATIC MinHash band index of the existing corpus — the
production shape of "does today's crawl contain near-copies of what we
already hold", answered at ingest time instead of by a full-corpus
re-dedup.

The static index is built ONCE (batch, one shuffle) with the exact same
md5 hash family as the batch dedup (`similarity.minhash_md5_bands`), so
the streaming decision is bit-consistent with what the nightly batch
job would conclude. Each micro-batch computes its own band signatures
(a bounded batch-local aggregation inside foreachBatch — no streaming
state) and probes the index with a semi join; at scale the index side
is a bucketed/partitioned table and the probe is a co-located join.
Docs too short to shingle (< n tokens) carry is_neardup = false.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def score_batch_against_index(
    batch: DataFrame, static_bands: DataFrame
) -> DataFrame:
    """(doc_id, is_neardup) for one batch of new docs: true iff the doc
    shares ≥1 LSH band bucket with the static corpus."""
    from extract_permits_spark.functions.similarity import minhash_md5_bands

    new_bands = minhash_md5_bands(batch)
    hits = (
        new_bands.join(static_bands, ["band_idx", "band_hash"], "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("_hit", F.lit(True))
    )
    return (
        batch.select("doc_id")
        .distinct()
        .join(hits, "doc_id", "left")
        .select(
            "doc_id", F.coalesce(F.col("_hit"), F.lit(False)).alias("is_neardup")
        )
    )


def run_neardup_ingest_available_now(
    spark: SparkSession,
    src_dir: str,
    static_docs: DataFrame,
    checkpoint: str,
    table_name: str,
):
    """availableNow file-source run: score every arriving doc against the
    static corpus index, appending (doc_id, is_neardup) to table_name.
    maxFilesPerTrigger=1 forces multiple micro-batches so the per-batch
    scoring path (not a single batch-like pass) is what executes."""
    from extract_permits_spark.functions.similarity import minhash_md5_bands

    static_bands = minhash_md5_bands(static_docs).persist()
    static_bands.count()  # build the index once, before the stream starts

    def apply_batch(bdf: DataFrame, batch_id: int) -> None:
        score_batch_against_index(bdf, static_bands).write.mode(
            "append"
        ).saveAsTable(table_name)

    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
