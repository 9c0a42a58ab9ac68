"""Banded range join — |left.value − right.value| ≤ width without a
quadratic conditional join.

Naive Spark planning of ``a JOIN b ON abs(a.v - b.v) <= w`` is a
BroadcastNestedLoopJoin (O(n·m) comparisons) — unusable at scale. The
banded shape bucketizes both sides by ``floor(v / width)`` and equi-joins
each left bucket to its three candidate right buckets (b-1, b, b+1): any
pair within ``width`` must share adjacent buckets, so the equi-join is
lossless; the exact predicate then filters band-mates that are too far.
Cost: one shuffle on compact bucket ids, candidate set linear in data for
bounded density.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def banded_range_join(
    left: DataFrame,
    right: DataFrame,
    left_val: str,
    right_val: str,
    width: float,
    how: str = "inner",
) -> DataFrame:
    """Join rows with ``abs(left_val - right_val) <= width``.

    Columns from both frames are kept (caller pre-selects/aliases to avoid
    collisions). ``how`` supports 'inner' only — the lossless-band argument
    does not extend to outer joins without a distinct fallback branch.
    """
    if how != "inner":
        raise ValueError("banded_range_join supports inner joins only")
    band = lambda c: F.floor(F.col(c) / width).cast("long")  # noqa: E731
    l_banded = left.withColumn("_band", band(left_val))
    r_banded = right.withColumn(
        "_rband", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1)))
    ).withColumn("_band", band(right_val) + F.col("_rband"))
    joined = l_banded.join(r_banded.drop("_rband"), "_band")
    return joined.where(
        F.abs(F.col(left_val) - F.col(right_val)) <= width
    ).drop("_band")
