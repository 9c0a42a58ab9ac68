"""Fixture-schema canary (round-5 postmortem).

The driver's events.parquet changed precision between rounds
(TIMESTAMP(NANOS) -> timestamp[us]); the old hard-coded loaders broke
loudly in batch and *silently* in streaming. These tests pin the contract:
whatever the footer says, load_events must yield TIMESTAMP_NTZ micros with
sane wall-clock values, and the streaming reader must agree with batch.
"""

from __future__ import annotations

import datetime as dt
import os

import pytest

from extract_permits_spark.sources.readers import (
    load_events,
    probe_events_ts_unit,
)

SF_DIR = "/root/testdata/sf0.001"


def test_probe_reports_known_unit():
    unit = probe_events_ts_unit(os.path.join(SF_DIR, "events.parquet"))
    assert unit in ("ns", "us", "ms", "s", "int64")


def test_load_events_ts_is_ntz_and_sane(spark):
    df = load_events(spark, SF_DIR)
    assert dict(df.dtypes)["ts"] == "timestamp_ntz"
    row = df.selectExpr("min(ts) AS lo", "max(ts) AS hi").first()
    # nanos misread as micros would land in 1970; micros misread as nanos
    # would overflow far into the future — either trips this window
    assert dt.datetime(2000, 1, 1) < row["lo"] <= row["hi"] < dt.datetime(2100, 1, 1)


def test_stream_schema_matches_batch_wallclock(spark, tmp_path):
    from extract_permits_spark.streaming.events import read_events_stream

    batch = load_events(spark, SF_DIR)
    want = batch.selectExpr(
        "date_format(min(ts), 'yyyy-MM-dd HH:mm:ss') AS lo",
        "date_format(max(ts), 'yyyy-MM-dd HH:mm:ss') AS hi",
    ).first()

    # the file stream source requires a directory of part files
    import shutil

    src_dir = tmp_path / "src"
    src_dir.mkdir()
    shutil.copy(os.path.join(SF_DIR, "events.parquet"), src_dir / "part-0.parquet")
    stream = read_events_stream(spark, str(src_dir))
    q = (
        stream.selectExpr(
            "date_format(ts, 'yyyy-MM-dd HH:mm:ss') AS s"
        )
        .writeStream.format("memory")
        .queryName("canary_ts")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT min(s) AS lo, max(s) AS hi FROM canary_ts"
    ).first()
    assert got["lo"] == want["lo"] and got["hi"] == want["hi"]


def test_all_fixture_tables_load_with_expected_columns(spark):
    """Every fixture table must load through its reader with exactly the
    documented columns and >0 rows — any driver-side schema/encoding shift
    (the round-5 failure mode) surfaces here as one red test naming the
    table, instead of N cryptic downstream query failures."""
    from extract_permits_spark.sources.readers import TABLES, load_table

    for name, cols in TABLES.items():
        df = load_table(spark, SF_DIR, name)
        assert df.columns == cols, f"{name}: {df.columns} != {cols}"
        assert df.limit(1).count() == 1, f"{name}: empty"


def test_temporal_columns_stay_temporal(spark):
    """The date/timestamp columns the query surface formats and filters on
    must keep temporal types after load — a silent string/int regression
    would flip every date-formatting oracle."""
    from extract_permits_spark.sources.readers import load_table

    expect = {
        ("orders", "o_orderdate"): ("date", "timestamp", "timestamp_ntz"),
        ("lineitem", "l_shipdate"): ("date", "timestamp", "timestamp_ntz"),
        ("events", "ts"): ("timestamp_ntz",),
    }
    for (tbl, col), allowed in expect.items():
        dt = dict(load_table(spark, SF_DIR, tbl).dtypes)[col]
        assert dt in allowed, f"{tbl}.{col} is {dt}, expected one of {allowed}"
