"""As-of (most-recent-match) join — a custom operator Spark lacks.

For each left row, attach the right row with the greatest right-time ≤
left-time within the same key (the standard time-series enrichment join;
DuckDB/kdb call it ASOF JOIN).

Implementation is the scalable merge shape, NOT a range self-join:
tag both sides, union, and run one ``last(ignorenulls)`` window over
(key, time) — a single shuffle on the key, linear in rows, no quadratic
candidate explosion regardless of time-range density. At 100 TB this is
the only shape that survives: a conditional range join would fan out, and
per-key ``collect_list`` would OOM on hot keys.

Ties: right rows sort before left rows at equal time (≤ semantics). Right
side should be unique per (key, time) — callers pre-aggregate (pick a
deterministic winner) when it isn't; ``asof_join`` does not dedupe.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_time: str,
    right_time: str,
    payload_cols: Sequence[str],
    direction: str = "backward",
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row + the latest ``right`` payload
    with ``right_time <= left_time`` on the same key (NULLs when none).

    ``direction="forward"`` flips the semantics to the EARLIEST right row
    with ``right_time >= left_time`` (next-event enrichment); the plan is
    identical — only the scan order reverses. ``tolerance_seconds``
    bounds the match window (|right_time − left_time| ≤ tolerance);
    out-of-window matches null out, exactly pandas.merge_asof semantics.
    Returns all of ``left``'s columns plus ``payload_cols`` from right.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    lcols = left.columns
    l_tagged = left.select(
        F.col(left_on).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_p_{c}") for c in payload_cols],
    )
    r_tagged = right.select(
        F.col(right_on).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"_p_{c}") for c in payload_cols],
    )
    # carry the matched right time so a tolerance can null out-of-window
    # matches after the fill
    r_tagged = r_tagged.withColumn("_p__rt", F.col("_t"))
    l_tagged = l_tagged.withColumn("_p__rt", F.lit(None).cast(r_tagged.schema["_p__rt"].dataType))
    merged = l_tagged.unionByName(r_tagged)
    order = (
        [F.col("_t").asc(), F.col("_side").asc()]
        if direction == "backward"
        else [F.col("_t").desc(), F.col("_side").asc()]
    )
    w = (
        Window.partitionBy("_k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fill_cols = [*payload_cols, "_rt"]
    filled = merged.select(
        *[F.col(c) for c in ["_k", "_t", "_side", *lcols]],
        *[
            F.last(f"_p_{c}", ignorenulls=True).over(w).alias(f"_f_{c}")
            for c in fill_cols
        ],
    )
    out = filled.where(F.col("_side") == 1)
    if tolerance_seconds is not None:
        gap = F.abs(
            F.unix_micros(F.col("_t").cast("timestamp"))
            - F.unix_micros(F.col("_f__rt").cast("timestamp"))
        )
        in_window = gap <= tolerance_seconds * 1_000_000
        out = out.select(
            *[F.col(c) for c in ["_k", "_t", "_side", *lcols]],
            *[
                F.when(in_window, F.col(f"_f_{c}")).alias(f"_f_{c}")
                for c in fill_cols
            ],
        )
    return out.select(
        *[F.col(c) for c in lcols],
        *[F.col(f"_f_{c}").alias(c) for c in payload_cols],
    )
