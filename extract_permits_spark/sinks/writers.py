"""Canonical data sinks (SURVEY.md §2.1 S5, S9, S10 analogs).

The engine's canonical outputs are parquet (optionally partitioned); the
Excel presentation layer is a separate driver-side adapter
(excel_sink.py). At 100 TB every sink here is a distributed write — no
driver collection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from extract_permits_spark.operators.windows import batch_ids


def write_canonical(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """Parquet sink, optionally hive-partitioned (e.g. by validation bucket
    or batch id). Mirrors the reference's CSV cache/materialization
    (chicago/permit_cleaning.py:510-513) with a format that scales."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_upload_batches(
    df: DataFrame,
    path: str,
    order_cols: list[str],
    batch_size: int = 250,
) -> None:
    """S9/O5: the reference writes upload files in 250-row chunks with
    per-batch renumbered ``# [LLINE]``
    (format_reviewed_permits_for_upload.py:279-299). Distributed analog:
    batch id via window → one directory per batch via partitionBy."""
    batched = batch_ids(df, order_cols, batch_size=batch_size)
    batched.write.mode("overwrite").partitionBy("batch").parquet(path)


def cached_dimension(
    spark: SparkSession, build, cache_path: str, schema=None
) -> DataFrame:
    """S5: year-keyed dimension cache — read if materialized, else build
    and persist (reference: PIN-universe CSV cache,
    chicago/permit_cleaning.py:510-536,1158-1167)."""
    import os

    if os.path.exists(os.path.join(cache_path, "_SUCCESS")):
        reader = spark.read
        if schema is not None:
            reader = reader.schema(schema)
        return reader.parquet(cache_path)
    df = build()
    df.write.mode("overwrite").parquet(cache_path)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(cache_path)


def split_write(
    df: DataFrame,
    upload_path: str,
    review_path: str,
    flag_col: str = "has_error",
) -> None:
    """E1 partition as a single-scan write: persist the validated parent,
    then two filtered writes (reference writes two workbooks,
    chicago/permit_cleaning.py:1209-1230)."""
    df = df.persist()
    try:
        df.where(~F.col(flag_col)).drop(flag_col).write.mode("overwrite").parquet(
            upload_path
        )
        df.where(F.col(flag_col)).write.mode("overwrite").parquet(review_path)
    finally:
        df.unpersist()
