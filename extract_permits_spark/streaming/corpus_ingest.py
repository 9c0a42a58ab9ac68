"""Streaming JSONL corpus ingest with the corrupt-quarantine rail.

The continuous-crawl shape: shards land in a directory, Structured
Streaming drains them (file source, availableNow for bounded runs),
every line parses through the SAME schema-explicit from_json contract
as the batch reader (sinks/corpus_io.py — PERMISSIVE, corrupt field in
the struct, NULL-struct lines quarantined), clean rows append to the
sink and corrupt raw lines go to a side table with the line as
evidence. Nothing is silently dropped and no bad shard kills the job —
at 100 TB/day of crawl this is the difference between an ingest
pipeline and a babysitting rotation.

The engine sees two independent sinks from one source; each keeps its
own checkpoint, so replays are idempotent per sink (file source +
deterministic parse = same rows on re-delivery).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from extract_permits_spark.sinks.corpus_io import CORRUPT_COL


def parse_stream(raw: DataFrame, schema: T.StructType) -> DataFrame:
    """The batch reader's parse contract applied to a streaming text
    frame: PERMISSIVE from_json with the corrupt column IN the struct,
    NULL-struct (literal `null`) lines quarantined with the raw line as
    evidence, blank lines dropped. Kept in lockstep with
    sinks/corpus_io.py:read_jsonl_corpus — change both together."""
    full = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    parsed = raw.select(
        F.col("value"),
        F.from_json(
            F.col("value"),
            full,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ).alias("_r"),
    )
    fields = [
        F.col(f"_r.{f.name}").alias(f.name)
        for f in full.fields
        if f.name != CORRUPT_COL
    ]
    corrupt = F.coalesce(
        F.col(f"_r.{CORRUPT_COL}"),
        F.when(F.col("_r").isNull() & (F.trim("value") != ""), F.col("value")),
    ).alias(CORRUPT_COL)
    return parsed.where(F.trim("value") != "").select(*fields, corrupt)


def run_ingest_available_now(
    spark: SparkSession,
    src_dir: str,
    checkpoint_dir: str,
    schema: T.StructType,
    clean_table: str,
    quarantine_table: str,
):
    """Drain `src_dir` once (availableNow): clean rows append to the
    memory sink `clean_table`, corrupt raw lines to `quarantine_table`.
    Returns (clean_query, quarantine_query); callers awaitTermination
    both. Memory sinks stand in for the parquet/Delta appenders in
    tests and the registry entry — the plan is identical up to the sink."""
    raw = spark.readStream.text(src_dir)
    parsed = parse_stream(raw, schema)
    clean = parsed.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = parsed.where(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    q_clean = (
        clean.writeStream.format("memory")
        .queryName(clean_table)
        .option("checkpointLocation", checkpoint_dir + "/clean")
        .trigger(availableNow=True)
        .start()
    )
    q_bad = (
        bad.writeStream.format("memory")
        .queryName(quarantine_table)
        .option("checkpointLocation", checkpoint_dir + "/bad")
        .trigger(availableNow=True)
        .start()
    )
    return q_clean, q_bad
