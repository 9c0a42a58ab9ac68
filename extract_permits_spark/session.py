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
        # Codegen field cap: r2 measured maxFields=16 winning (the wide
        # permit stage fused past the JVM JIT HugeMethodLimit and ran
        # interpreted). After r6 staged the permit-level expressions below
        # the explode, the hot stage is narrow again and Spark's default
        # (100) wins across the board: headline 31.2s -> 28.9s, pipeline
        # 9.6s -> 7.7s at sf0.1, no query regresses (SCALE.md "Codegen
        # method size" records both measurements). Env-overridable for
        # re-testing if the stage shapes change again.
        .config(
            "spark.sql.codegen.maxFields",
            os.environ.get("SPARK_GRAFT_CODEGEN_MAXFIELDS", "100"),
        )
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


def free_local_checkpoint(df) -> None:
    """Release the storage blocks of a localCheckpoint'ed DataFrame.

    ``spark.catalog.clearCache()`` only clears cache-manager entries —
    a LogicalRDD's blocks live until the JVM happens to GC the RDD
    object (ContextCleaner reference tracking), which under heap
    pressure is exactly when they're most harmful: iterative loops that
    checkpoint per round accumulate dead rounds' blocks and the
    shrinking heap turns into full-GC tails (r13 probe: the third
    settled curation run spiked 8 s → 26 s with zero code change).
    Verified on pyspark 4.1: analyzed() is a LogicalRDD for a
    checkpointed frame and unpersisting its RDD drops the blocks.
    Silently no-ops on non-checkpointed frames or API drift — this is
    an allocator hint, never a correctness dependency.
    """
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() == "LogicalRDD":
            plan.rdd().unpersist(False)
    except Exception:
        pass


# Per-evaluation scratch checkpoints: frames a function materializes
# (localCheckpoint) INSIDE a returned lazy plan, so the function itself
# can never free them (the caller's action happens later, and a freed
# localCheckpoint cannot recompute). Long-lived sessions that re-run
# entries (bench, the oracle checker) free them at safe points instead.
_SCRATCH_CKPTS: list = []


def register_scratch_checkpoint(df) -> None:
    """Record a checkpointed frame whose blocks should be reclaimed at
    the caller's next safe point (after the consuming action finished).
    See free_local_checkpoint for why explicit freeing matters."""
    _SCRATCH_CKPTS.append(df)


def free_scratch_checkpoints() -> None:
    """Free every registered scratch checkpoint's blocks. ONLY call
    between evaluations (a freed localCheckpoint cannot recompute, so a
    still-pending lazy plan that references one would fail)."""
    while _SCRATCH_CKPTS:
        free_local_checkpoint(_SCRATCH_CKPTS.pop())
