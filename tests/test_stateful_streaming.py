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
