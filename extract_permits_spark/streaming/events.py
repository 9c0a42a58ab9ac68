"""Structured Streaming over the events table (SURVEY.md §2.11 stretch).

The reference is batch-only; its "incremental" mechanism is
mutually-exclusive date ranges per CI run (extract-chicago-permits.yaml).
The streaming layer here is the engine-native upgrade of that pattern:
file-source readStream → event-time tumbling windows with a watermark →
append sink. The same aggregation also exists as a batch query
(``ev_tumbling_agg`` in plans/analytics.py) so correctness is
oracle-checkable; the streaming path is tested with availableNow + memory
sink in tests/.

Scale notes: watermark bounds state; partitioned parquet sinks with
checkpointing give exactly-once; per-key sessionization would use
``applyInPandasWithState`` (demonstrated in permit terms: a permit-number
keyed "activity session").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

def _events_schema(ts_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


def read_events_stream(
    spark: SparkSession, dir_path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over the events parquet directory.

    readStream needs a static schema, so the ts precision is probed from
    the parquet footer first (sources.readers.probe_events_ts_unit) —
    the fixture has shipped both TIMESTAMP(NANOS) and timestamp[us]
    across rounds, and a wrong static schema here fails *silently*
    (timestamps 1000x off collapse every window)."""
    from ..sources.readers import probe_events_ts_unit

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    unit = probe_events_ts_unit(dir_path)
    if unit in ("ns", "int64"):
        # TIMESTAMP(NANOS): vectorized reader rejects it — read the raw
        # int64 nanos and rebuild micros. LTZ output; session tz pinned to
        # UTC so wall-clock matches the batch (NTZ) path exactly.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        reader = (
            spark.readStream.schema(_events_schema(T.LongType()))
            .format("parquet")
            .option("path", dir_path)
        )
        if max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        raw = reader.load()
        return raw.withColumn(
            "ts", F.timestamp_micros(F.floor(F.col("ts") / 1000).cast("long"))
        )
    # micro/milli/second precision: read natively as NTZ (the fixture is
    # written isAdjustedToUTC=false), then cast to LTZ for the watermark;
    # UTC session tz keeps the wall clock identical to batch.
    reader = (
        spark.readStream.schema(_events_schema(T.TimestampNTZType()))
        .format("parquet")
        .option("path", dir_path)
    )
    if max_files_per_trigger:
        # bounded-backlog drain: availableNow still processes EVERYTHING
        # available, but in micro-batches of at most N files — how a
        # 100 TB backlog replays without one giant batch sizing the
        # cluster. (The option caps batch size; it never drops data.)
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.load()
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def tumbling_counts(
    events: DataFrame,
    window_len: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Event-time tumbling window counts + exact decimal sums with a
    late-data watermark. Works on both batch and streaming frames."""
    src = events
    if src.isStreaming:
        src = src.withWatermark("ts", watermark)
    return (
        src.groupBy(
            F.window("ts", window_len).alias("w"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def session_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Event-time session windows per user: events within ``gap`` of the
    previous event merge into one session — Spark merges sessions whose
    windows overlap or touch, so a gap of exactly ``gap`` still merges.
    Works on both batch and streaming frames — the batch run is the
    oracle for the streaming one, and both match the gaps-and-islands SQL
    formulation (``new session when ts − lag(ts) > gap``).

    Streaming state is bounded by the watermark: a session closes (and
    emits) once the watermark passes its end, so state size tracks the
    number of users active within the watermark horizon, not history."""
    src = events
    if src.isStreaming:
        src = src.withWatermark("ts", watermark)
    return (
        src.groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("user_id"),
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


def run_sessions_available_now(
    spark: SparkSession,
    dir_path: str,
    checkpoint: str,
    table_name: str = "ev_stream_sessions",
):
    """Drain the events backlog through streaming session windows into a
    memory sink (availableNow). Complete mode keeps every closed-or-open
    session visible for the batch comparison."""
    stream = read_events_stream(spark, dir_path)
    agg = session_counts(stream)
    return (
        agg.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def run_available_now(
    spark: SparkSession, dir_path: str, checkpoint: str, table_name: str = "ev_stream_out"
):
    """Drain all currently-available files through the streaming engine into
    an in-memory sink; returns the query (caller awaits termination).
    availableNow = incremental batch — the streaming analog of the
    reference's date-range CI runs."""
    stream = read_events_stream(spark, dir_path)
    agg = tumbling_counts(stream)
    return (
        agg.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def run_dedup_available_now(
    spark: SparkSession,
    dir_path: str,
    checkpoint: str,
    table_name: str = "ev_stream_dedup",
):
    """Exactly-once counts over AT-LEAST-ONCE delivery: the input
    directory deliberately contains duplicated files (every event arrives
    ≥ twice); ``dropDuplicates("event_id")`` collapses redeliveries before
    the aggregation, so the result equals the batch COUNT(DISTINCT
    event_id) per type. Unbounded dedup state is the right call for an
    availableNow drain of a bounded backlog; a continuous job would use
    ``dropDuplicatesWithinWatermark`` to bound state by event time
    (at the cost of re-admitting duplicates older than the watermark).
    """
    stream = read_events_stream(spark, dir_path)
    deduped = stream.dropDuplicates(["event_id"])
    agg = deduped.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_events"))
    return (
        agg.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def interval_join_clicks_before_purchases(
    purchases: DataFrame,
    clicks: DataFrame,
    lookback: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream inner join: every (purchase, click) pair for the same
    user where the click lands inside the ``lookback`` window strictly
    before the purchase — last-touch attribution's candidate set.

    Both sides carry watermarks and the join predicate bounds c_ts in
    [p_ts − lookback, p_ts), so the engine can prove when a buffered row
    can never match again and evict it: state is O(events inside the
    watermark + lookback horizon), not O(stream). Works identically on
    batch frames (no watermark, plain range join) — the batch run is the
    oracle for the streaming one."""
    if purchases.isStreaming:
        purchases = purchases.withWatermark("p_ts", watermark)
    if clicks.isStreaming:
        clicks = clicks.withWatermark("c_ts", watermark)
    return purchases.join(
        clicks,
        F.expr(
            f"user_id = c_user AND c_ts >= p_ts - interval {lookback} AND c_ts < p_ts"
        ),
    ).select("purchase_id", "click_id", "user_id")


def _purchase_click_streams(spark: SparkSession, dir_path: str):
    purchases = (
        read_events_stream(spark, dir_path)
        .where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("p_ts"),
        )
    )
    clicks = (
        read_events_stream(spark, dir_path)
        .where(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
    )
    return purchases, clicks


def run_interval_join_available_now(
    spark: SparkSession,
    dir_path: str,
    checkpoint: str,
    table_name: str = "ev_stream_ssjoin",
):
    """Drain the backlog through the stream-stream interval join into a
    memory sink. Append mode — stream-stream inner joins emit exactly the
    matched pairs, each once, after both sides' watermarks pass."""
    purchases, clicks = _purchase_click_streams(spark, dir_path)
    joined = interval_join_clicks_before_purchases(purchases, clicks)
    return (
        joined.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
