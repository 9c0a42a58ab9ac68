"""Skew salting correctness + bucketed join produces no Exchange."""

from __future__ import annotations

from pyspark.sql import functions as F

from extract_permits_spark.operators import skew
from extract_permits_spark.sinks import bucketing


def test_salted_agg_equals_direct(spark):
    # heavily skewed: 90% of rows share one key
    rows = [("hot" if i % 10 else f"k{i}", float(i)) for i in range(1000)]
    df = spark.createDataFrame(rows, "k string, v double")
    direct = {
        r["k"]: (r["n"], r["s"])
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(F.col("v").cast("decimal(18,1)")).alias("s"))
        .collect()
    }
    salted = {
        r["k"]: (r["n"], r["s"])
        for r in skew.salted_agg(
            df.withColumn("v", F.col("v").cast("decimal(18,1)")),
            ["k"],
            {"n": ("v", "count"), "s": ("v", "sum")},
        ).collect()
    }
    assert salted == direct


def test_salted_join_equals_direct(spark):
    left = spark.createDataFrame(
        [("hot" if i % 5 else f"k{i}", i) for i in range(500)], "k string, lv int"
    )
    right = spark.createDataFrame(
        [("hot", 1), ("k5", 2), ("k10", 3)], "k string, rv int"
    )
    direct = sorted(
        (r["k"], r["lv"], r["rv"]) for r in left.join(right, "k").collect()
    )
    salted = sorted(
        (r["k"], r["lv"], r["rv"]) for r in skew.salted_join(left, right, "k").collect()
    )
    assert salted == direct


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    import shutil

    spark.sql("DROP TABLE IF EXISTS t_orders_b")
    spark.sql("DROP TABLE IF EXISTS t_lineitem_b")
    for leftover in ("t_orders_b", "t_lineitem_b"):
        shutil.rmtree(f"spark-warehouse/{leftover}", ignore_errors=True)
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    bucketing.write_bucketed(
        orders.withColumnRenamed("o_orderkey", "key"), "t_orders_b", ["key"], 8
    )
    bucketing.write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "key"), "t_lineitem_b", ["key"], 8
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketing.bucketed_join_ready(
            spark, "t_orders_b", "t_lineitem_b", "key"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located buckets: sort-merge join with NO shuffle exchange
        assert "SortMergeJoin" in plan, plan
        assert "Exchange hashpartitioning" not in plan, plan
        expected = orders.join(
            lineitem, orders.o_orderkey == lineitem.l_orderkey
        ).count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_salted_join_accepts_spark_aliases(spark):
    """r2-ADVICE: every Spark-accepted safe spelling passes the guard."""
    import pytest as _pytest

    from extract_permits_spark.operators import skew

    left = spark.createDataFrame([(1, "a")], "k int, lv string")
    right = spark.createDataFrame([(1, "b")], "k int, rv string")
    for how in ["leftouter", "left_outer", "semi", "left_semi", "anti", "inner"]:
        skew.salted_join(left, right, "k", num_salts=2, how=how).collect()
    with _pytest.raises(ValueError, match="salted_join supports"):
        skew.salted_join(left, right, "k", how="full")


def test_aqe_splits_skewed_join_partition(spark):
    """AQE's OptimizeSkewedJoin must split a hot key's shuffle partition
    into parallel sub-reads (SortMergeJoin(skew=true) + AQEShuffleRead
    skewed in the FINAL adaptive plan). This is the runtime complement
    to the explicit salting path (a8_salted_agg): at 100 TB the hot key
    you didn't anticipate is handled by the engine, not a rewrite. Size
    thresholds are cluster-scale, so they're lowered to reproduce the
    decision on test-sized data; the final plan only materializes on
    the frame's own query execution, hence collect(), not a write."""
    from pyspark.sql import functions as F

    keys = [
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.coalescePartitions.enabled",
        "spark.sql.shuffle.partitions",
    ]
    saved = {k: spark.conf.get(k) for k in keys}
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        # 2/3 of rows land on key 0 (the hot key); the rest spread over 100
        left = spark.range(0, 100000).select(
            F.when(F.col("id") % 3 != 2, 0)
            .otherwise(F.col("id") % 100 + 1)
            .alias("k"),
            F.md5(F.col("id").cast("string")).alias("pad"),
        )
        right = spark.range(0, 101).select(
            F.col("id").alias("k"), F.lit("dim").alias("name")
        )
        j = left.join(right.hint("merge"), "k").select("k", "pad", "name")
        assert len(j.collect()) == 100000  # row fidelity across the split
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "SortMergeJoin(skew=true)" in plan
        assert "AQEShuffleRead skewed" in plan
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_with_skew_hint_plans_rebalance(spark):
    """with_skew_hint attaches a REBALANCE hint that survives analysis —
    the logical plan must carry RebalancePartitions on the keys (AQE
    consumes it at exchange planning time)."""
    from extract_permits_spark.operators import skew

    df = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    hinted = skew.with_skew_hint(df, ["k"])
    logical = hinted._jdf.queryExecution().analyzed().toString()
    assert "RebalancePartitions" in logical, logical
