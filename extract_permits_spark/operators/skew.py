"""Skew-handling primitives: salted aggregation and salted joins.

AQE's skew-join splitting covers sort-merge joins at runtime; these
helpers cover the cases AQE can't re-plan — hot grouping keys in
aggregations, and replicated-broadcast joins where one key dominates
(the classic "null key / boilerplate document" hot spot in 100 TB
corpora).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    num_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed keys.

    ``aggs`` maps output column → (input column, fn) with fn ∈
    {count, sum, min, max}. Phase 1 aggregates on (keys, random salt) —
    spreading a hot key over ``num_salts`` reducers — phase 2 merges the
    partials on the true keys. Results are identical to a direct groupBy
    for these decomposable aggregates (sums in whatever type the caller
    pre-cast — use decimal for exactness).
    """
    salted = df.withColumn("_salt", (F.rand(seed=42) * num_salts).cast("int"))
    phase1_aggs = []
    for out, (col, fn) in aggs.items():
        if fn == "count":
            phase1_aggs.append(F.count(F.lit(1)).alias(f"_p_{out}"))
        elif fn in ("sum", "min", "max"):
            phase1_aggs.append(getattr(F, fn)(col).alias(f"_p_{out}"))
        else:
            raise ValueError(f"non-decomposable aggregate {fn!r}")
    partial = salted.groupBy(*keys, "_salt").agg(*phase1_aggs)
    phase2_aggs = []
    for out, (_col, fn) in aggs.items():
        merge = "sum" if fn == "count" else fn
        phase2_aggs.append(getattr(F, merge)(f"_p_{out}").alias(out))
    return partial.groupBy(*keys).agg(*phase2_aggs)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the (large, skewed) left side, replicate
    the right side once per salt value, join on (key, salt).

    Right-side rows multiply by ``num_salts`` — use when the right side is
    small-ish but too big (or wrong-shaped) to broadcast outright. Output
    equals the unsalted join for the supported join types; 'right'/'full'
    outer are rejected because an unmatched right-side row exists once per
    salt replica and would surface num_salts duplicate null-extended rows.
    """
    # normalize before checking so every Spark-accepted spelling of a safe
    # type ('leftouter', 'left_semi', 'semi', ...) passes the same gate
    normalized = how.lower().replace("_", "")
    allowed = {"inner", "left", "leftouter", "semi", "leftsemi", "anti", "leftanti"}
    if normalized not in allowed:
        raise ValueError(
            f"salted_join supports {sorted(allowed)} (any underscore "
            f"spelling); got {how!r} "
            "(right/full outer would duplicate unmatched right rows per salt)"
        )
    salts = F.array(*[F.lit(i) for i in range(num_salts)])
    l_salted = left.withColumn("_salt", (F.rand(seed=42) * num_salts).cast("int"))
    r_replicated = right.withColumn("_salt", F.explode(salts))
    out = l_salted.join(r_replicated, [key, "_salt"], how)
    return out.drop("_salt")


def with_skew_hint(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Attach a rebalance hint on the given keys — AQE splits oversized
    partitions on write/exchange (`REBALANCE` hint)."""
    return df.hint("rebalance", *[F.col(k) for k in keys])
