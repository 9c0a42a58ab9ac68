"""Physical-layout maintenance: Z-order clustering and small-file
compaction.

Two operational realities of a 100 TB table that no query operator
fixes:

1. A sort on ONE column (writers.write_sorted_for_pruning) gives tight
   row-group stats on that column only — a filter on a second column
   still reads everything. Z-ORDERING interleaves the bits of several
   columns' normalized values into one sort key, so every file/row-group
   covers a small HYPER-RECTANGLE of the combined domain and point/range
   filters on ANY of the clustered columns skip most of the data.
2. Streaming/incremental ingestion produces thousands of KB-sized files
   ("small-file problem"); scan planning, footer reads, and shuffle
   fan-in all degrade. COMPACTION rewrites a directory into
   target-sized files, preserving (or establishing) a sort layout.

Both are plain DataFrame jobs — distributed, no driver collection; the
only driver-side state is per-column min/max bounds (a 1-row aggregate)
and the source byte count (filesystem metadata).
"""

from __future__ import annotations

import math
import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def zvalue(cols: list[Column], bounds: list[tuple[float, float]], bits: int = 16) -> Column:
    """Bit-interleaved Z-curve key over numeric columns.

    Each column is min-max normalized to an integer cell id in
    [0, 2^bits) using the provided bounds, then the cell ids' bits are
    interleaved (column i contributes bit b to output position
    b * n_cols + i). Pure integer expressions — codegen'd, no UDF.

    Bounds come from the caller (one bounded agg over the data, or
    known domain constants) so the expression itself stays
    deterministic and data-independent.

    bits is capped so len(cols) * bits <= 63: the interleaved key must
    fit the positive range of a signed bigint (a bit in position 63
    flips the sign and breaks Z-curve sort monotonicity; positions >= 64
    would wrap silently)."""
    n = len(cols)
    bits = min(bits, 63 // n)
    cells = []
    for c, (lo, hi) in zip(cols, bounds):
        span = (hi - lo) or 1.0
        scaled = (c.cast("double") - F.lit(float(lo))) / F.lit(float(span))
        clamped = F.least(F.greatest(scaled, F.lit(0.0)), F.lit(1.0))
        cells.append(
            F.least(
                (clamped * F.lit(float(1 << bits))).cast("bigint"),
                F.lit((1 << bits) - 1),
            )
        )
    z = F.lit(0).cast("bigint")
    for b in range(bits):
        for i, cell in enumerate(cells):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(cell, b).bitwiseAND(F.lit(1)), b * n + i)
            )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    num_files: int,
    bits: int = 16,
) -> None:
    """Cluster on the Z-curve of `cols` and write `num_files` parquet
    files, each covering a compact hyper-rectangle of the combined
    domain (so per-file min/max stats prune on ANY clustered column).

    repartitionByRange on the z-key does the global clustering (one
    range shuffle — same cost class as any global sort), then rows are
    sorted within each file so row-group stats are tight too. The z-key
    is dropped before writing; it is derivable, not data."""
    bounds_row = df.select(
        *[f for c in cols for f in (F.min(c).alias(f"_lo_{c}"), F.max(c).alias(f"_hi_{c}"))]
    ).first()
    bounds = [
        (float(bounds_row[f"_lo_{c}"]), float(bounds_row[f"_hi_{c}"])) for c in cols
    ]
    z = zvalue([F.col(c) for c in cols], bounds, bits=bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def dir_bytes(path: str) -> int:
    """Total data bytes under a (local) table directory."""
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_bytes: int = 256 * 1024 * 1024,
    sort_cols: list[str] | None = None,
) -> int:
    """Rewrite a fragmented parquet directory into ~target-sized files;
    returns the file count written.

    File count = ceil(current_bytes / target) — compression ratio is
    preserved by construction since the data is the same. With
    sort_cols the rewrite ALSO (re)establishes a range-clustered sort
    layout (repartitionByRange + sortWithinPartitions — the
    write_sorted_for_pruning contract); without, a plain repartition
    round-robins rows for even file sizes. On a real cluster this runs
    per-partition-directory (compact yesterday's partition, not the
    whole table)."""
    n = max(1, math.ceil(dir_bytes(src) / target_file_bytes))
    df = spark.read.parquet(src)
    if sort_cols:
        out = df.repartitionByRange(n, *sort_cols).sortWithinPartitions(*sort_cols)
    else:
        out = df.repartition(n)
    out.write.mode("overwrite").parquet(dst)
    return n
