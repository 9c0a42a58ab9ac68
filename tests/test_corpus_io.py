"""JSONL + ORC corpus interop: round-trips, corrupt-line quarantine,
and ORC pushdown/pruning staying visible in the plan."""

from __future__ import annotations

import glob
import gzip
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from extract_permits_spark.sinks.corpus_io import (
    CORRUPT_COL,
    read_jsonl_corpus,
    read_orc,
    split_corrupt,
    write_jsonl_corpus,
    write_orc,
)
from extract_permits_spark.sources.readers import load_table

SF_DIR = "/root/testdata/sf0.001"

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def _sorted_rows(df, cols=("doc_id", "text", "lang", "source", "n_chars")):
    return [tuple(r) for r in df.select(*cols).orderBy("doc_id").collect()]


def test_jsonl_roundtrip_gzip(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents")
    path = str(tmp_path / "corpus_jsonl")
    write_jsonl_corpus(docs.repartition(3), path)
    shards = glob.glob(os.path.join(path, "part-*.json.gz"))
    assert len(shards) == 3  # shard count == upstream partition count
    back = read_jsonl_corpus(spark, path, DOC_SCHEMA)
    clean, bad = split_corrupt(back)
    assert bad.count() == 0
    assert _sorted_rows(clean) == _sorted_rows(docs)


def test_jsonl_corrupt_lines_quarantined_not_nulled(spark, tmp_path):
    path = str(tmp_path / "mixed")
    os.makedirs(path)
    with gzip.open(os.path.join(path, "part-0.json.gz"), "wt") as f:
        f.write('{"doc_id": 1, "text": "ok", "lang": "en", "source": "a", "n_chars": 2}\n')
        f.write("this is not json at all\n")
        f.write('{"doc_id": 2, "text": "also ok", "lang": "en", "source": "a", "n_chars": 7}\n')
    back = read_jsonl_corpus(spark, path, DOC_SCHEMA)
    clean, bad = split_corrupt(back)
    assert clean.count() == 2
    quarantined = [r[0] for r in bad.collect()]
    assert quarantined == ["this is not json at all"]  # raw evidence kept
    assert CORRUPT_COL not in clean.columns


def test_jsonl_null_struct_lines_quarantined_blank_lines_dropped(spark, tmp_path):
    # a literal `null` line (and a whitespace-only line) make from_json
    # return a NULL struct — every field including _corrupt null. Those
    # must NOT pass as clean all-null rows: `null` is quarantined with
    # the raw line as evidence; genuinely blank lines are dropped.
    path = str(tmp_path / "nulls")
    os.makedirs(path)
    with open(os.path.join(path, "part-0.json"), "w") as f:
        f.write('{"doc_id": 1, "text": "ok", "lang": "en", "source": "a", "n_chars": 2}\n')
        f.write("null\n")
        f.write("\n")
        f.write("   \n")
        f.write('{"doc_id": 2, "text": "ok2", "lang": "en", "source": "a", "n_chars": 3}\n')
    back = read_jsonl_corpus(spark, path, DOC_SCHEMA)
    clean, bad = split_corrupt(back)
    assert clean.count() == 2
    assert clean.where(F.col("doc_id").isNull()).count() == 0  # no silent all-null rows
    assert [r[0] for r in bad.collect()] == ["null"]


def test_jsonl_schema_is_explicit_never_inferred(spark, tmp_path):
    # a field missing from the declared schema must not resurrect via
    # inference — it is simply absent (schema is the contract)
    path = str(tmp_path / "extra")
    os.makedirs(path)
    with open(os.path.join(path, "part-0.json"), "w") as f:
        f.write('{"doc_id": 7, "text": "x", "lang": "en", "source": "s", "n_chars": 1, "surprise": true}\n')
    back = read_jsonl_corpus(spark, path, DOC_SCHEMA)
    assert "surprise" not in back.columns
    clean, bad = split_corrupt(back)
    assert clean.count() == 1 and bad.count() == 0


def test_orc_roundtrip_and_pushdown(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents")
    path = str(tmp_path / "corpus_orc")
    write_orc(docs, path)
    back = read_orc(spark, path)
    assert _sorted_rows(back) == _sorted_rows(docs)
    # predicate pushdown + column pruning reach the ORC scan like parquet
    q = back.where(F.col("lang") == "en").select("doc_id", "lang")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)" in plan
    assert "text" not in plan.split("ReadSchema")[1][:200]


def test_orc_events_timestamp_fidelity(spark, tmp_path):
    # timestamps survive a parquet -> ORC -> read round-trip to the
    # microsecond (the events loader's probed NTZ semantics included)
    ev = load_table(spark, SF_DIR, "events").select("event_id", "ts")
    path = str(tmp_path / "events_orc")
    write_orc(ev, path)
    back = read_orc(spark, path)
    a = {r[0]: r[1] for r in ev.collect()}
    b = {r[0]: r[1] for r in back.collect()}
    assert a == b
