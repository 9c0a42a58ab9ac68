"""JSONL + ORC corpus interop (LLM-pipeline source/sink surface).

JSON-Lines is the de-facto interchange format for LLM training corpora
(one document object per line, usually gzip-compressed shards); ORC is
the other columnar format Spark speaks natively. Parquet stays the
engine-canonical format (writers.py) — these exist so corpora can enter
and leave the engine in the formats the ecosystem actually ships.

Reference parity: the reference ingests schemaless JSON from Socrata
(chicago/permit_cleaning.py:539-554) and trusts the frame downstream;
here every JSONL read carries an explicit schema plus a PERMISSIVE
corrupt-record column, so a malformed line yields evidence, not a
silently-null row.

Scale notes (100 TB):
- both readers/writers are fully distributed (per-partition files, no
  driver collection); a gzip JSONL shard is NOT splittable, so shard
  size is controlled at write time (`repartition(n)` upstream decides
  shard count — document that, don't hide a shuffle in here);
- ORC gets the same predicate-pushdown / column-pruning treatment as
  parquet from the DSv2 scan (asserted in tests);
- JSON parsing cost is per-byte and codegen'd (JacksonParser), but it is
  still ~5-10x a parquet scan — the intended flow is: land JSONL once,
  convert to parquet/ORC, query columnar after.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt"


def write_jsonl_corpus(
    df: DataFrame, path: str, compression: str | None = "gzip"
) -> None:
    """One JSON object per line, one shard per partition. Upstream
    partitioning controls shard count/size — a 100 TB corpus wants
    shards of a few hundred MB (gzip kills splittability, so a shard is
    the unit of read parallelism)."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def read_jsonl_corpus(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """Schema-explicit JSONL read. Malformed lines survive with their raw
    text in `_corrupt` so the pipeline can count/quarantine them (never
    silent nulls, never a job-killing FAILFAST on one bad shard). No
    schema inference — that double-reads the corpus and can flip types
    between runs.

    Deliberately NOT `spark.read.json`: its corrupt-record column is
    query-restricted (QUERY_ONLY_CORRUPT_RECORD_COLUMN forbids the
    quarantine count unless the frame is cached — a non-starter at
    100 TB). Reading the shard as text and parsing with `from_json`
    uses the same JacksonParser codegen path but makes corrupt handling
    ordinary column logic with no source restriction."""
    from pyspark.sql import functions as F

    full = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    raw = spark.read.text(path)
    # PERMISSIVE from_json with the corrupt field IN the struct schema:
    # a parseable line fills the data fields and leaves _corrupt null; an
    # unparseable line yields all-null data fields with the raw line in
    # _corrupt — ordinary column logic from here on.
    parsed = raw.select(
        F.col("value"),
        F.from_json(
            F.col("value"),
            full,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ).alias("_r"),
    )
    # A blank line or a literal `null` line makes from_json return a NULL
    # struct — every field including _corrupt comes back null, which would
    # read as a clean all-null row. Quarantine those too (raw line as
    # evidence), keeping only genuinely-blank lines out of both rails.
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


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean_rows_without_the_evidence_column, quarantined_raw_lines)."""
    clean = df.where(df[CORRUPT_COL].isNull()).drop(CORRUPT_COL)
    bad = df.where(df[CORRUPT_COL].isNotNull()).select(CORRUPT_COL)
    return clean, bad


def write_orc(df: DataFrame, path: str, **options) -> None:
    """ORC sink (zlib default). Same distributed layout rules as the
    parquet sinks; accepts e.g. orc.stripe.size to bound stripe span."""
    w = df.write.mode("overwrite")
    if options:
        w = w.options(**options)
    w.orc(path)


def read_orc(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """ORC source; schema optional because ORC carries one (unlike JSONL
    there is no inference pass to avoid). Predicate pushdown and column
    pruning work as for parquet (plan-asserted in tests)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)
