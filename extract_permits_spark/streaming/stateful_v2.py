"""Spark 4 arbitrary stateful streaming: transformWithStateInPandas.

The successor API to applyInPandasWithState (streaming/stateful.py keeps
the classic form): a StatefulProcessor object with named, typed state
variables managed by the state store, lifecycle hooks, and optional
timers/TTL. Same engine contract — keyed state, Arrow-batched Python,
update-mode emission — but state is declared per-variable instead of one
opaque tuple, which is what lets the engine evolve/expire each variable
independently at 100 TB-of-stream scale.

Operator: per-user running totals (count + exact integer cents), the
same semantics as the classic processor (streaming/stateful.py), which
IS oracle-checked end-to-end (`stream_stateful_totals`).

ENVIRONMENT GATE: executing transformWithStateInPandas requires
`google.protobuf` (the Python↔JVM state-server protocol speaks proto);
this container has no protobuf and no network to install it, so only the
classic API runs here. The processor, wiring, and logical plan are real
and tested (tests/test_stateful_streaming.py builds the streaming plan
and asserts the TransformWithStateInPySpark node); `run_available_now`
raises a clear error up front when protobuf is missing rather than
crashing the Python runner mid-query.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value_cents", T.LongType()),
    ]
)


class RunningTotalsProcessor(StatefulProcessor):
    """Per-key running (count, cents) via a single ValueState variable.

    handleInputRows receives the key's rows as Arrow-fed pandas batches;
    the emitted row carries the post-batch totals (update semantics).
    Cents are exact integers — no float accumulation drift across
    micro-batches, restarts, or partitionings."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState(
            "totals", "n BIGINT, cents BIGINT"
        )

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        n, cents = (0, 0)
        if self._totals.exists():
            n, cents = self._totals.get()
        for pdf in rows:
            n += len(pdf)
            cents += int(round(pdf["value"] * 100).astype("int64").sum())
        self._totals.update((n, cents))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value_cents": [cents],
            }
        )

    def close(self) -> None:
        pass


def totals_transform_with_state(events: DataFrame) -> DataFrame:
    """Wire the processor: group by user, update mode, processing time."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotalsProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def protobuf_available() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def run_available_now(
    spark: SparkSession,
    dir_path: str,
    checkpoint: str,
    table_name: str = "ev_tws_totals",
):
    """Drain the backlog through the v2 stateful operator into a memory
    sink (update mode → the sink keeps the latest row per key)."""
    if not protobuf_available():
        raise RuntimeError(
            "transformWithStateInPandas needs google.protobuf for its "
            "state-server protocol; not installed in this environment — "
            "use streaming.stateful (applyInPandasWithState) instead"
        )
    from .events import read_events_stream

    stream = read_events_stream(spark, dir_path)
    agg = totals_transform_with_state(stream)
    return (
        agg.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
