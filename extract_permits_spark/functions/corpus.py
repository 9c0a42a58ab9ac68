"""Corpus-assembly operators for training-data pipelines.

Two ops a pretraining pipeline runs after cleaning/dedup:

- **Sequence packing** (``next_fit_pack``): concatenate documents into
  fixed-budget bins (context windows) so batches carry minimal padding.
  Next-fit is inherently sequential *within a shard* — bin state depends
  on every prior document — so the Spark shape is ``groupBy(shard)
  .applyInPandas`` (Arrow-batched, one pandas call per shard, plain
  loop inside). Shards are independent, so parallelism = shard count;
  at 100 TB you shard to O(cores × 4) and each shard packs locally
  with zero cross-shard coordination. This is honest stateful logic,
  not a UDF-for-convenience: no composition of built-in operators
  expresses a running sum with data-dependent resets.

- **Mixture interleaving** (``interleave_sources``): draw a deterministic
  sample matching target per-source quotas. Selection key is
  ``md5(id)`` so the "random" subset is reproducible across engines and
  runs, and ranking is one window per source (single shuffle on the
  source key; skew-safe because quotas bound the output per source).
"""

from __future__ import annotations

from typing import Mapping

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def next_fit_pack(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    shard_col: str,
    budget: int,
) -> DataFrame:
    """Next-fit packing: walk each shard in ``id_col`` order, accumulate
    ``weight_col``; the first document of a shard opens bin 0, and any
    later document that would push the running total past ``budget``
    opens a new bin (an oversized document therefore gets a bin of its
    own). Returns ``(shard, id, weight, bin)``.

    The exact rule (first row never opens a new bin; overflow check is
    ``used + w > budget``) is mirrored by the DuckDB recursive-CTE oracle
    in ``plans/analytics.py:pack_sequences`` — keep them in lockstep.
    """
    out_schema = f"shard long, {id_col} long, weight long, bin long"

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        bins: list[int] = []
        used = 0
        b = 0
        for i, w in enumerate(pdf["_w"]):
            w = int(w)
            if i > 0 and used + w > budget:
                b += 1
                used = 0
            used += w
            bins.append(b)
        return pd.DataFrame(
            {
                "shard": pdf["_shard"],
                id_col: pdf[id_col],
                "weight": pdf["_w"],
                "bin": bins,
            }
        )

    prepared = df.select(
        F.col(shard_col).cast("long").alias("_shard"),
        F.col(id_col),
        F.col(weight_col).cast("long").alias("_w"),
    )
    return prepared.groupBy("_shard").applyInPandas(pack, out_schema)


def interleave_sources(
    df: DataFrame,
    id_col: str,
    source_col: str,
    quotas: Mapping[str, int],
) -> DataFrame:
    """Deterministic mixture sample: for each source with a quota, keep
    the ``quota`` documents with the smallest ``md5(id)`` (ties broken
    by id). Sources without a quota are dropped. Returns the selected
    ``(id, source, mix_rank)`` rows.

    One shuffle (window on source). Output size is bounded by
    ``sum(quotas)`` regardless of input skew.
    """
    quota_expr = F.create_map(
        *[F.lit(x) for kv in quotas.items() for x in (kv[0], int(kv[1]))]
    )[F.col(source_col)]
    w = Window.partitionBy(source_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.select(F.col(id_col), F.col(source_col))
        .withColumn("_quota", quota_expr)
        .where(F.col("_quota").isNotNull())
        .withColumn("mix_rank", F.row_number().over(w))
        .where(F.col("mix_rank") <= F.col("_quota"))
        .drop("_quota")
    )
