"""Structured Streaming: availableNow drain must equal the batch aggregate
(SURVEY.md §2.11 — streaming is engine-native incremental processing)."""

from __future__ import annotations

import tempfile

from extract_permits_spark.streaming import events as ev


def test_streaming_matches_batch(spark):
    sf_dir = "/root/testdata/sf0.001"
    from extract_permits_spark.sources.readers import load_events

    batch = load_events(spark, sf_dir)
    expected = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in ev.tumbling_counts(batch).collect()
    }
    assert expected  # non-empty fixture

    with tempfile.TemporaryDirectory() as work:
        import os
        import shutil

        src_dir = os.path.join(work, "in")
        ckpt = os.path.join(work, "ckpt")
        os.makedirs(src_dir)
        shutil.copy(f"{sf_dir}/events.parquet", src_dir)
        q = ev.run_available_now(spark, src_dir, ckpt, table_name="ev_test_out")
        q.awaitTermination(120)
        got = {
            (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
            for r in spark.sql("SELECT * FROM ev_test_out").collect()
        }
    assert got == expected
