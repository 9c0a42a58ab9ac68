"""Single-pass pipeline metrics via the Observation API.

The reference counts its partitions by materializing each side
(reference: chicago/permit_cleaning.py:1186-1207 — separate len() calls
on the valid/error frames). Observation metrics piggyback on the ONE
action that already runs: named aggregate expressions are evaluated
inside the job and collected on the driver as a dict — zero extra scans,
zero extra shuffles, exactly-once semantics per action.

At 100 TB this is the difference between "write the output" and "write
the output, then re-read it twice to count rows": quality telemetry
(row counts, error counts, null rates, value bounds) should always ride
the write job itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observe_quality(
    df: DataFrame,
    error_flag: str | None = None,
    amount_col: str | None = None,
    name: str = "quality",
) -> tuple[DataFrame, Observation]:
    """Attach standard quality metrics to ``df``'s next action.

    Returns (instrumented_df, observation); read ``observation.get``
    AFTER an action ran. Metrics: n_rows, plus n_errors (count of true
    ``error_flag``) and amount_min/amount_max when the columns are given.
    """
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    if error_flag is not None:
        metrics.append(
            F.sum(F.col(error_flag).cast("long")).alias("n_errors")
        )
    if amount_col is not None:
        metrics.append(F.min(amount_col).alias("amount_min"))
        metrics.append(F.max(amount_col).alias("amount_max"))
    obs = Observation(name)
    return df.observe(obs, *metrics), obs
