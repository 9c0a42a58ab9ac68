"""SparkSession factory with scale-aware defaults.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32 threads in a
single JVM), but every config here is chosen so the same code ships to a
1000-executor cluster unchanged:

- AQE on (runtime coalescing of small shuffle partitions, skew-join
  splitting) so a plan tuned at sf0.1 re-plans itself at 100 TB.
- ``spark.sql.shuffle.partitions`` defaults to 2×cores locally; on a real
  cluster AQE's ``advisoryPartitionSizeInBytes`` governs and the static
  number only caps the initial stage.
- Arrow enabled for any pandas interchange (similarity / multimodal UDFs).
- Session timezone pinned to UTC so timestamp semantics are
  environment-independent (matches the DuckDB oracle harness).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(app_name: str = "extract-permits-spark") -> SparkSession:
    cpus = default_parallelism()
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(2 * cpus))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.python.filterPushdown.enabled", "true")
        # Whole-stage codegen only for stages of <=16 fields. Wide stages
        # (the ~28-column permit frame: explode -> cleaning -> 2 broadcast
        # joins -> validation -> keyword tag) fuse into ONE generated method
        # far past the JVM JIT HugeMethodLimit (8 KB) and execute as
        # interpreted bytecode; per-operator codegen compiles each Project
        # into its own JIT-able class instead. Measured at sf0.1 local[32]:
        # permit pipeline 26s -> 15.8s, headline-total 22.9s -> 18.6s, no
        # query regresses (SCALE.md "Codegen method size"). The JIT limit is
        # per-executor-JVM, so the same knob carries to a real cluster.
        .config("spark.sql.codegen.maxFields", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        # local-mode: ALL task threads share the driver JVM heap, so this
        # is the de-facto executor memory. 8g on this 125 GB box caused GC
        # storms on the heavy dedup jobs — measured 20s -> 45s -> (after
        # full GC) 12.5s for the SAME amplified minhash query; 48g holds
        # the working set. On a real cluster executors size independently
        # (spark.executor.memory) and this only governs the driver.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .getOrCreate()
    )
