"""Window-shaped operators (SURVEY.md §2.6, W1-W4) and batching (O5).

The reference's pandas idioms (cumcount, slice(1), range-index line numbers,
duplicated-flag) are all window functions in disguise. Spark needs explicit
deterministic ordering keys where pandas relied on input order
(SURVEY §7.4.1).

Scale note: global row numbers (W3) serialize into one partition. That is
fine at review-file cardinality (≤ a few thousand rows, reference batch
size 250), but ``global_line_numbers`` also offers a distributed
``zipWithIndex``-style path for large frames: per-partition counts →
cumulative offsets (driver-side, #partitions values) → partition-local
row_number + offset. Same API, no single-partition shuffle.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def position_in_group(
    df: DataFrame, group_cols: Sequence[str], order_cols: Sequence[str], out_col: str
) -> DataFrame:
    """W1: 1-based position within group under an explicit order.

    Reference: groupby('permit_').cumcount()+1,
    chicago/permit_cleaning.py:598-601.
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return df.withColumn(out_col, F.row_number().over(w))


def first_row_per_group(
    df: DataFrame, group_cols: Sequence[str], order_cols: Sequence[str]
) -> DataFrame:
    """W2: first row per group under an explicit order.

    Reference: group_by(PIN, PermitNo) %>% slice(1),
    chicago/legacy_permits/2021/format_legacy_2021.R:48-56 (R relies on
    input order; we demand explicit order columns).
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")
    )


def duplicate_pair_flag(
    df: DataFrame, key_cols: Sequence[str], out_col: str = "is_duplicate"
) -> DataFrame:
    """W4/A5: flag every member of a key-duplicated set (keep=False).

    Reference: df.duplicated(subset=[PIN, PermitNo], keep=False),
    chicago/legacy_permits/helper.py:150-153.
    """
    w = Window.partitionBy(*key_cols)
    return df.withColumn(out_col, F.count(F.lit(1)).over(w) > 1)


def global_line_numbers(
    df: DataFrame,
    order_cols: Sequence[str],
    out_col: str = "lline",
    distributed: bool = False,
) -> DataFrame:
    """W3: global sequential line number starting at 1.

    Reference: ``# [LLINE] = range(1, n+1)``,
    chicago/legacy_permits/helper.py:167,171.

    ``distributed=True`` switches to the scale path: sort, then compute the
    line number as partition-offset + local row_number, avoiding the
    single-partition window. Offsets come from per-partition counts — one
    tiny extra job, no wide shuffle beyond the sort itself.
    """
    if not distributed:
        w = Window.orderBy(*order_cols)
        return df.withColumn(out_col, F.row_number().over(w))
    ordered = df.repartitionByRange(*order_cols).sortWithinPartitions(*order_cols)
    wp = Window.partitionBy(F.spark_partition_id()).orderBy(*order_cols)
    with_local = ordered.withColumn("_pid", F.spark_partition_id()).withColumn(
        "_local_rn", F.row_number().over(wp)
    )
    counts = with_local.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn("_off", F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)))
    return (
        with_local.join(F.broadcast(offsets.select("_pid", "_off")), "_pid")
        .withColumn(out_col, (F.col("_off") + F.col("_local_rn")).cast("int"))
        .drop("_pid", "_local_rn", "_off")
    )


def batch_ids(
    df: DataFrame,
    order_cols: Sequence[str],
    batch_size: int = 250,
    line_col: str = "lline",
    batch_col: str = "batch",
) -> DataFrame:
    """O5/S9: assign upload-batch ids of ``batch_size`` rows and renumber
    lines within each batch (1-based).

    Reference: iloc[start:start+250] slicing with per-batch renumber,
    chicago/legacy_permits/format_reviewed_permits_for_upload.py:279-299.
    Downstream, ``df.write.partitionBy(batch_col)`` yields one file per
    batch — the distributed analog of the reference's per-file loop.
    """
    numbered = global_line_numbers(df, order_cols, out_col="_gline")
    return (
        numbered.withColumn(
            batch_col, F.floor((F.col("_gline") - 1) / batch_size).cast("int")
        )
        .withColumn(
            line_col, (F.col("_gline") - F.col(batch_col) * batch_size).cast("int")
        )
        .drop("_gline")
    )
