"""applyInPandasWithState running totals == batch groupBy aggregate."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from extract_permits_spark.sources.readers import load_events
from extract_permits_spark.streaming import stateful


def test_stateful_totals_match_batch(spark):
    sf_dir = "/root/testdata/sf0.001"
    batch = load_events(spark, sf_dir)
    expected = {
        r["user_id"]: (r["n"], r["cents"])
        for r in batch.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
        )
        .collect()
    }

    with tempfile.TemporaryDirectory() as work:
        src = os.path.join(work, "in")
        os.makedirs(src)
        shutil.copy(f"{sf_dir}/events.parquet", src)
        q = stateful.run_available_now(
            spark, src, os.path.join(work, "ckpt"), "stateful_out"
        )
        q.awaitTermination(180)
        got = {
            r["user_id"]: (r["n_events"], r["total_value_cents"])
            for r in spark.sql("SELECT * FROM stateful_out").collect()
        }
    assert got == expected


def test_cdc_apply_snapshot_matches_batch(spark, tmp_path):
    """foreachBatch upsert materialization: after draining the backlog,
    the parquet snapshot must equal the batch latest-per-key result; a
    second drain over the SAME checkpoint must be a no-op (exactly-once),
    and re-delivering the input under a fresh checkpoint must converge to
    the same table (idempotent merge)."""
    import os
    import shutil

    from extract_permits_spark.sources.readers import load_events
    from extract_permits_spark.streaming import cdc_apply

    sf_dir = "/root/testdata/sf0.001"
    batch = load_events(spark, sf_dir)
    expected = {
        r["user_id"]: (r["event_id"], round(r["value"], 2))
        for r in cdc_apply.latest_per_key(
            batch.withColumn("ts", batch["ts"].cast("timestamp"))
        ).collect()
    }
    assert expected

    work = str(tmp_path)
    src = os.path.join(work, "in")
    out = os.path.join(work, "out")
    ckpt = os.path.join(work, "ckpt")
    os.makedirs(src)
    shutil.copy(f"{sf_dir}/events.parquet", src)

    def snapshot():
        rows = spark.read.parquet(os.path.join(out, "live")).collect()
        return {r["user_id"]: (r["event_id"], round(r["value"], 2)) for r in rows}

    q = cdc_apply.run_cdc_apply_available_now(spark, src, ckpt, out)
    q.awaitTermination(120)
    assert snapshot() == expected

    # same checkpoint: no new data -> no-op, table unchanged
    q = cdc_apply.run_cdc_apply_available_now(spark, src, ckpt, out)
    q.awaitTermination(120)
    assert snapshot() == expected

    # fresh checkpoint = full redelivery: latest-wins merge is idempotent
    q = cdc_apply.run_cdc_apply_available_now(
        spark, src, os.path.join(work, "ckpt2"), out
    )
    q.awaitTermination(120)
    assert snapshot() == expected


def test_transform_with_state_plan_wiring(spark):
    """transformWithStateInPandas (Spark 4 stateful API): the processor
    and plan wiring are real — the streaming logical plan must carry the
    TransformWithStateInPySpark node with the declared output schema.
    EXECUTION is environment-gated (google.protobuf absent here; the
    state-server protocol needs it), so the run path raises a clear
    up-front error instead of crashing the Python runner mid-query."""
    import tempfile

    from extract_permits_spark.streaming import stateful_v2
    from extract_permits_spark.streaming.events import read_events_stream

    with tempfile.TemporaryDirectory() as work:
        import os
        import shutil

        src = os.path.join(work, "in")
        os.makedirs(src)
        shutil.copy("/root/testdata/sf0.001/events.parquet", src)
        stream = read_events_stream(spark, src)
        agg = stateful_v2.totals_transform_with_state(stream)
        assert agg.isStreaming
        assert [f.name for f in agg.schema.fields] == [
            "user_id",
            "n_events",
            "total_value_cents",
        ]
        plan = agg._jdf.queryExecution().logical().toString()
        assert "TransformWithStateInPySpark" in plan

        if not stateful_v2.protobuf_available():
            import pytest

            with pytest.raises(RuntimeError, match="protobuf"):
                stateful_v2.run_available_now(
                    spark, src, os.path.join(work, "ckpt")
                )
        else:  # pragma: no cover - environment-dependent
            q = stateful_v2.run_available_now(spark, src, os.path.join(work, "ckpt"))
            q.awaitTermination(120)
            assert spark.sql("SELECT * FROM ev_tws_totals").count() > 0
