"""Streaming CDC apply: foreachBatch upsert materialization.

The reference's closest analog is the dedup-then-append cycle each CI run
performs against iasworld.permit (reference: chicago/permit_cleaning.py:
821-871 — pull existing keys, anti-join, upload the remainder). This
module is the engine-native upgrade: a continuously-maintained "current
state per key" table fed by a stream, written exactly-once.

Pattern: readStream → foreachBatch(merge) → atomic swap of a parquet
snapshot. foreachBatch gives the batch DataFrame API (joins, windows,
arbitrary sinks) inside the streaming engine; the checkpoint tracks which
micro-batches committed, and the merge itself is idempotent (latest-wins
by (ts, event_id)), so a re-delivered batch after a crash converges to
the same table — the standard recipe when the sink has no transactional
table format underneath.

Scale notes: the per-batch merge is one full-outer equi-join on the key,
co-partitioned both sides; the snapshot rewrite is the cost to cut (a
real deployment points this at Delta/Iceberg MERGE or a key-value store —
the plan shape is identical). State lives in the sink, not the engine, so
executor memory is flat regardless of key cardinality.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def latest_per_key(df: DataFrame) -> DataFrame:
    """Current-state rows: for each user the value at the latest
    (ts, event_id) — the deterministic max-by struct trick, one shuffle."""
    pick = F.max(F.struct("ts", "event_id", "value", "event_type")).alias("_m")
    return df.groupBy("user_id").agg(pick).select(
        "user_id",
        F.col("_m.ts").alias("ts"),
        F.col("_m.event_id").alias("event_id"),
        F.col("_m.value").alias("value"),
        F.col("_m.event_type").alias("event_type"),
    )


def merge_snapshot(base: DataFrame | None, updates: DataFrame) -> DataFrame:
    """Latest-wins merge of an updates frame into the previous snapshot.
    Pure DataFrame logic so the same function serves batch backfill and
    the streaming foreachBatch path."""
    cols = ["user_id", "ts", "event_id", "value", "event_type"]
    updates = updates.select(*cols)
    if base is None:
        return latest_per_key(updates)
    return latest_per_key(base.select(*cols).unionByName(updates))


def apply_cdc_batch(
    spark: SparkSession, bdf: DataFrame, batch_id: int, out_dir: str
) -> None:
    """Apply one micro-batch: read prior snapshot → latest-wins merge →
    write to a scratch dir → atomic directory swap (never read and
    overwrite the same files in one job). Module-level so the replay
    contract is unit-testable (tests/test_streaming.py pins it).

    Replay semantics: foreachBatch is at-least-once, and this sink is
    idempotent WITHOUT batch_id scoping because the merge is — replaying
    a batch against a snapshot that already incorporates it re-derives
    the same latest-wins winners (deterministic tie-break), so the swap
    installs an identical snapshot. The scratch/old dirs are
    batch_id-named so a replay never collides with its own leftovers.

    Crash windows in the swap itself are recovered at batch start
    (``_recover_crashed_swap``): a crash between rename(live→old) and
    rename(scratch→live) leaves no live dir but an ``_old_*`` with the
    full prior state — restore the newest one as live before merging
    (replaying the batch against it re-derives the intended snapshot);
    a crash after the second rename but before the rmtree leaves BOTH
    live and a stale ``_old_*`` — drop the stale dir so the replay's
    own rename(live→old) cannot collide. Stale ``_scratch_*`` dirs from
    either window are removed (the overwrite write would only have
    cleaned this batch's own)."""
    live = os.path.join(out_dir, "live")
    _recover_crashed_swap(out_dir, live)
    scratch = os.path.join(out_dir, f"_scratch_{batch_id}")
    base = spark.read.parquet(live) if os.path.exists(live) else None
    merged = merge_snapshot(base, bdf)
    merged.write.mode("overwrite").parquet(scratch)
    old = os.path.join(out_dir, f"_old_{batch_id}")
    if os.path.exists(live):
        os.rename(live, old)
    os.rename(scratch, live)
    if os.path.exists(old):
        shutil.rmtree(old)


def _recover_crashed_swap(out_dir: str, live: str) -> None:
    """Make the swap's two crash windows invisible to the replay: restore
    the newest ``_old_{bid}`` as live when live is missing (crash between
    the two renames — the old dir IS the complete prior snapshot), then
    delete every remaining ``_old_*`` and ``_scratch_*`` leftover."""
    if not os.path.isdir(out_dir):
        return
    olds = sorted(
        (n for n in os.listdir(out_dir) if n.startswith("_old_")),
        key=lambda n: int(n.rsplit("_", 1)[1]),
    )
    if olds and not os.path.exists(live):
        os.rename(os.path.join(out_dir, olds.pop()), live)
    for n in olds:
        shutil.rmtree(os.path.join(out_dir, n))
    for n in os.listdir(out_dir):
        if n.startswith("_scratch_"):
            shutil.rmtree(os.path.join(out_dir, n))


def run_cdc_apply_available_now(
    spark: SparkSession,
    dir_path: str,
    checkpoint: str,
    out_dir: str,
):
    """Drain the events backlog, maintaining a current-state-per-user
    parquet snapshot via foreachBatch (apply_cdc_batch per micro-batch —
    see its docstring for the replay/idempotency contract)."""
    from .events import read_events_stream

    def apply_batch(bdf: DataFrame, batch_id: int) -> None:
        apply_cdc_batch(spark, bdf, batch_id, out_dir)

    stream = read_events_stream(spark, dir_path)
    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
