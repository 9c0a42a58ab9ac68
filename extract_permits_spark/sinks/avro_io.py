"""Avro availability probe + gated read/write, sibling of delta_io.py.

Avro is Spark's built-in-but-external format (the `spark-avro` jar ships
separately since 2.4); this container has no jar, so — like Delta,
PIL-for-JPEG, and protobuf-for-stateful-v2 — it is an explicit
ENVIRONMENT GATE. `avro_available()` probes by attempting a 1-row write
to a temp path (the only reliable check: the Python side has no marker
package, the JVM classpath decides), and the wrappers raise a
documented error instead of the raw py4j ClassNotFound.

In deployment (`--packages org.apache.spark:spark-avro_2.13:<ver>`)
these wrappers are the whole integration; Avro is a row format, so the
layout guidance in sinks/writers.py (shard sizing, partitioning)
applies unchanged, while columnar pruning/pushdown do NOT — prefer
parquet/ORC for analytics tables, Avro for row-oriented interchange.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

# Probe cache keyed by Spark application id: a later session created
# with --packages must get a fresh probe, not the first session's
# negative answer (the classpath is per-JVM, and applicationId changes
# whenever a new JVM/session context comes up).
_AVAILABLE: dict[str, bool] = {}


def reset_avro_probe() -> None:
    """Drop all cached probe results (test hook / post-config change)."""
    _AVAILABLE.clear()


def avro_available(spark: SparkSession) -> bool:
    """True iff the spark-avro jar is on the JVM classpath (probed once
    per Spark application with a 1-row temp write)."""
    key = spark.sparkContext.applicationId
    if key not in _AVAILABLE:
        d = tempfile.mkdtemp(prefix="avro_probe_")
        try:
            spark.range(1).write.format("avro").mode("overwrite").save(d + "/t")
            _AVAILABLE[key] = True
        except Exception:
            _AVAILABLE[key] = False
        finally:
            shutil.rmtree(d, ignore_errors=True)
    return _AVAILABLE[key]


def _require_avro(spark: SparkSession) -> None:
    if not avro_available(spark):
        raise NotImplementedError(
            "spark-avro is not on the JVM classpath in this environment; the "
            "Avro source/sink is an environment gate (see sinks/avro_io.py). "
            "Deploy with --packages org.apache.spark:spark-avro to enable."
        )


def write_avro(df: DataFrame, path: str, **options) -> None:
    _require_avro(df.sparkSession)
    w = df.write.format("avro").mode("overwrite")
    if options:
        w = w.options(**options)
    w.save(path)


def read_avro(spark: SparkSession, path: str, schema=None) -> DataFrame:
    _require_avro(spark)
    r = spark.read.format("avro")
    if schema is not None:
        r = r.schema(schema)
    return r.load(path)
