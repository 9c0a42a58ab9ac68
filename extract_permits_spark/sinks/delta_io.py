"""Delta Lake availability probe + gated read/write.

The lakehouse sink surface is Parquet-first (sinks/writers.py,
sinks/layout.py); Delta adds ACID commits, time travel, and OPTIMIZE
Z-ORDER on top of the same parquet files. The `delta-spark` package and
its JVM jars are NOT present in this container, so — like PIL for
non-PNG decode (functions/multimodal.py) and protobuf for
transformWithStateInPandas (streaming/stateful_v2.py) — Delta is an
explicit ENVIRONMENT GATE, not silent absence: `delta_available()`
probes honestly, and the read/write wrappers raise a documented error
pointing at the probe instead of failing deep inside py4j.

In deployment (delta-spark installed + `spark.jars.packages`
configured), these wrappers are the complete integration: Delta's
DataFrame API is format-string deep ("delta" in place of "parquet"),
so every layout rule in this repo (partitioning, Z-order via
write_zordered before OPTIMIZE exists, compaction) carries over
unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def delta_available() -> bool:
    """True iff the delta-spark Python package is importable. (The JVM
    jar matters too, but the Python package is the deployment marker —
    pip installs both in the standard setup.)"""
    try:
        import delta  # noqa: F401

        return True
    except ImportError:
        return False


def _require_delta() -> None:
    if not delta_available():
        raise NotImplementedError(
            "delta-spark is not installed in this environment; the Delta "
            "sink/source is an environment gate (see sinks/delta_io.py). "
            "Install delta-spark and configure spark.jars.packages to enable."
        )


def write_delta(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """Delta sink: same layout contract as the parquet writers, plus the
    transactional commit Delta provides."""
    _require_delta()
    w = df.write.format("delta").mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)


def read_delta(spark: SparkSession, path: str, version: int | None = None) -> DataFrame:
    """Delta source; `version` selects a time-travel snapshot."""
    _require_delta()
    r = spark.read.format("delta")
    if version is not None:
        r = r.option("versionAsOf", version)
    return r.load(path)
