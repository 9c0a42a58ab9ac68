"""Streaming ANN-index maintenance: arriving vectors are coarse-assigned
and PQ-encoded per micro-batch and APPENDED to the persisted IVFPQ index
— the write path that keeps a serving index fresh without full rebuilds
(the streaming twin of ``pq.write_ivfpq_index``).

The index artifacts (k-means centroids + PQ codebook) are FROZEN at
ingest time — the production contract for IVF-family indexes: quantizers
are fit offline on a sample and only re-fit on drift, because re-fitting
invalidates every previously written code. Each micro-batch therefore
runs the same Arrow kernel as the batch build (one narrow map, no state,
no shuffle of vectors), clusters its codes on cluster_id, and appends to
the partition directories; queries see partition pruning over the union
of everything ingested so far. Exactly-once comes from the file-source
checkpoint: a replayed batch rewrites the same rows (append of identical
content — deduplicated downstream by vec_id if an overwrite-free store
is required; the fixture run asserts exact row parity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

VEC_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)


def run_index_ingest_available_now(
    spark: SparkSession,
    src_dir: str,
    book: list[list[list[float]]],
    centroids: list[list[float]],
    index_path: str,
    checkpoint: str,
):
    """availableNow file-source run: encode every arriving vector with the
    frozen quantizers and append (vec_id, code_arr) partitioned by
    cluster_id to ``index_path``. maxFilesPerTrigger=1 forces multiple
    micro-batches so the incremental append path (not one batch-like
    pass) is what executes."""
    from extract_permits_spark.functions.pq import _assign_codes_arrow

    kern = _assign_codes_arrow(book, centroids)

    def apply_batch(bdf: DataFrame, batch_id: int) -> None:
        (
            bdf.select(F.col("vec_id"), kern(F.col("embedding")).alias("_a"))
            .select(
                "vec_id",
                F.col("_a.cluster_id").alias("cluster_id"),
                F.col("_a.code_arr").alias("code_arr"),
            )
            # same small-files rule as the batch build: cluster the CODES
            # so each micro-batch adds one file per cluster directory,
            # not one per task x cluster
            .repartition(F.col("cluster_id"))
            .write.mode("append")
            .partitionBy("cluster_id")
            .parquet(index_path)
        )

    stream = (
        spark.readStream.schema(VEC_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
