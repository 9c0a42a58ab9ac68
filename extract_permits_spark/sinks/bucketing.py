"""Bucketed-table layout for shuffle-free co-located joins.

At 100 TB, the fact-to-fact joins (orders⋈lineitem on orderkey,
permits⋈warehouse on the dedup key) dominate shuffle volume. Writing both
sides bucketed by the join key means every subsequent join is a
zero-exchange zip of co-located buckets — pay the shuffle once at layout
time, never per query.

Spark bucketing needs `saveAsTable` (bucket metadata lives in the
catalog); locally that is the `spark-warehouse/` dir + in-memory/derby
catalog, on a cluster it's the metastore.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    w = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def bucketed_join_ready(spark: SparkSession, left: str, right: str, on: str):
    """Read two same-bucketed tables; joining them on the bucket key plans
    without an Exchange on either side (verify with .explain)."""
    return spark.table(left).join(spark.table(right), on)
