"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship permit pipeline (SURVEY.md §3.1) on the
sf0.001 fixtures adapted to permit shape. ``queries()`` / ``oracle_sql()``
expose one entry per implemented operator from SURVEY.md §2 plus the
LLM-data-pipeline operators; the registry hub is
``extract_permits_spark/plans/analytics.py`` (entries live in its four
chunk modules, imported in registration order — see plans/_registry.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from extract_permits_spark.plans.permits import permits_from_tpch, run_pipeline  # noqa: E402
from extract_permits_spark.plans import analytics  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full permit pipeline (explode → clean → enrich → validate
    → partition) over /root/testdata/sf0.001; returns the upload partition."""
    sf_dir = "/root/testdata/sf0.001"
    permits_raw, universe = permits_from_tpch(spark, sf_dir)
    upload, review = run_pipeline(permits_raw, universe)
    return upload


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ LLM ops).

    Each callable takes (spark, sf_dir) and returns a DataFrame. Every
    computed column is aliased identically to its oracle_sql counterpart.
    """
    return analytics.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per queries() key (pre-registered
    views: region nation customer supplier part orders lineitem events
    documents embeddings). Non-SQL-expressible ops are omitted → driver
    records a rows-only check."""
    return analytics.oracle_sql()
