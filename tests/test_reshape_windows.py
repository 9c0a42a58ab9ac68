"""Unit tests for explode/unpivot (X1-X3) and window ops (W1-W4, O5)."""

from __future__ import annotations

from extract_permits_spark.operators import reshape, windows


def test_explode_multi_value_keeps_null_rows_and_tags(spark):
    # reference: expand_multi_pin_permits chicago/permit_cleaning.py:557-611
    df = spark.createDataFrame(
        [("p1", "a | b | a"), ("p2", None), ("p3", "c")], ["permit_", "pin_list"]
    )
    out = reshape.explode_multi_value(df, "pin_list").collect()
    rows = {(r["permit_"], r["solo_pin"], r["pin_type"]) for r in out}
    assert rows == {
        ("p1", "a", "pin1"),
        ("p1", "b", "pin2"),  # ordered dedupe: first occurrence wins
        ("p2", None, None),  # NULL-list row survives (posexplode_outer)
        ("p3", "c", "pin1"),
    }


def test_string_sorted_pin_type(spark):
    # 'pin10' < 'pin2' lexicographically — replicate, don't fix (§7.4.4)
    df = spark.createDataFrame(
        [("p", " | ".join(f"v{i}" for i in range(11)))], ["permit_", "pin_list"]
    )
    out = reshape.explode_multi_value(df, "pin_list")
    tags = [r["pin_type"] for r in out.orderBy("pin_type").collect()]
    assert tags[0] == "pin1"
    assert tags[1] == "pin10"  # string sort
    assert tags[2] == "pin11"


def test_unpivot_drops_nulls(spark):
    df = spark.createDataFrame(
        [("p1", "a", None), ("p2", "b", "c")], ["permit", "PIN1", "PIN2"]
    )
    out = reshape.unpivot_wide_columns(df, ["permit"], ["PIN1", "PIN2"]).collect()
    assert {(r["permit"], r["pin_col"], r["extra_pin"]) for r in out} == {
        ("p1", "PIN1", "a"),
        ("p2", "PIN1", "b"),
        ("p2", "PIN2", "c"),
    }


def test_first_row_per_group_and_position(spark):
    df = spark.createDataFrame(
        [("g1", 2, "x"), ("g1", 1, "y"), ("g2", 5, "z")], ["g", "ord", "v"]
    )
    first = windows.first_row_per_group(df, ["g"], ["ord"]).collect()
    assert {(r["g"], r["v"]) for r in first} == {("g1", "y"), ("g2", "z")}

    pos = windows.position_in_group(df, ["g"], ["ord"], "rank").collect()
    assert {(r["g"], r["ord"], r["rank"]) for r in pos} == {
        ("g1", 1, 1),
        ("g1", 2, 2),
        ("g2", 5, 1),
    }


def test_duplicate_pair_flag_keep_false(spark):
    # pandas duplicated(keep=False): every member flagged
    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("b", 2)], ["pin", "permit"]
    )
    out = windows.duplicate_pair_flag(df, ["pin", "permit"]).collect()
    flags = sorted((r["pin"], r["is_duplicate"]) for r in out)
    assert flags == [("a", True), ("a", True), ("b", False)]


def test_global_line_numbers_both_paths(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], ["k"])
    simple = windows.global_line_numbers(df, ["k"]).collect()
    assert sorted(r["lline"] for r in simple) == list(range(1, 101))
    assert [r["lline"] for r in sorted(simple, key=lambda r: r["k"])] == list(
        range(1, 101)
    )
    dist = windows.global_line_numbers(df, ["k"], distributed=True).collect()
    assert [r["lline"] for r in sorted(dist, key=lambda r: r["k"])] == list(
        range(1, 101)
    )


def test_distributed_rank_matches_global_window(spark):
    """distributed_rank must be bit-identical to Window.orderBy row_number
    under a total order — including desc sort orders and computed
    (expression) keys — and total_col must equal the global row count.
    Shuffled multi-partition input so partition-local indices genuinely
    need the offsets."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = (
        spark.range(0, 500)
        .repartition(7)  # scramble away from insertion order
        .select(
            F.col("id"),
            F.md5(F.col("id").cast("string").cast("binary")).alias("h"),
        )
    )
    order = [F.col("h").desc(), F.col("id")]
    want = {
        (r["id"], r["rn"])
        for r in df.withColumn(
            "rn", F.row_number().over(Window.orderBy(*order))
        ).collect()
    }
    got = windows.distributed_rank(df, order, "rn", total_col="n").collect()
    assert {(r["id"], r["rn"]) for r in got} == want
    assert {r["n"] for r in got} == {500}
    # zero_based shifts every rank down by one, nothing else
    got0 = windows.distributed_rank(df, order, "rn", zero_based=True).collect()
    assert {(r["id"], r["rn"] + 1) for r in got0} == want


def test_distributed_rank_empty_frame(spark):
    from pyspark.sql import functions as F

    df = spark.range(0, 10).where(F.col("id") < 0)
    assert windows.distributed_rank(df, [F.col("id")], "rn").count() == 0


def test_batch_ids_renumber(spark):
    # reference: 250-row upload batches with per-batch renumbered lines
    df = spark.createDataFrame([(i,) for i in range(600)], ["k"])
    out = windows.batch_ids(df, ["k"], batch_size=250).collect()
    by_k = sorted(out, key=lambda r: r["k"])
    assert by_k[0]["batch"] == 0 and by_k[0]["lline"] == 1
    assert by_k[249]["batch"] == 0 and by_k[249]["lline"] == 250
    assert by_k[250]["batch"] == 1 and by_k[250]["lline"] == 1
    assert by_k[599]["batch"] == 2 and by_k[599]["lline"] == 100


def test_batch_ids_distributed_parity(spark):
    """The distributed=True scale path (distributed_rank underneath, no
    single-partition window) must assign bit-identical (batch, lline)
    pairs to the default single-window path — this is the tested scale
    story behind w3_line_numbers_batches' by-name exemption in
    tests/test_plan_quality.py."""
    df = spark.createDataFrame([((i * 37) % 600,) for i in range(600)], ["k"])
    key = lambda r: r["k"]  # noqa: E731
    plain = sorted(windows.batch_ids(df, ["k"], batch_size=250).collect(), key=key)
    dist = sorted(
        windows.batch_ids(df, ["k"], batch_size=250, distributed=True).collect(),
        key=key,
    )
    assert [tuple(r) for r in plain] == [tuple(r) for r in dist]
    # and the distributed spelling really is window-free at the plan level
    from test_plan_quality import _partitionless_windows_over_unbounded

    d2 = windows.batch_ids(df, ["k"], batch_size=250, distributed=True)
    assert _partitionless_windows_over_unbounded(d2) == 0


def test_distributed_rank_partition_overflow_guard(spark):
    """The mid-bit-layout guard (r11 ADVICE): a range partition holding
    ≥ 2^33 rows would silently corrupt ranks (local counter overflows
    into the pid bits), so the offsets frame must raise instead. The
    planted check monkeypatches the threshold comparison indirectly by
    verifying the guard expression wiring: a healthy frame passes (+0
    offset), and the assert_true column is not pruned from the plan."""
    from pyspark.sql import functions as F

    df = spark.range(0, 100)
    out = windows.distributed_rank(df, [F.col("id")], "rn")
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # the optimizer rewrites assert_true(c, m) → if(c) null else
    # raise_error(m); either spelling proves pruning kept the guard
    assert "raise_error" in plan or "assert_true" in plan
    assert out.where(F.col("rn") != F.col("id") + 1).count() == 0


def test_asof_join_edges(spark):
    from extract_permits_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10, "e1"), (1, 5, "e2"), (2, 7, "e3"), (3, 1, "e4")],
        "k long, t long, eid string",
    )
    right = spark.createDataFrame(
        [(1, 5, "r5"), (1, 8, "r8"), (2, 7, "r7"), (2, 9, "r9")],
        "k long, rt long, payload string",
    )
    out = {
        r["eid"]: r["payload"]
        for r in asof_join(
            left, right, "k", "k", "t", "rt", payload_cols=["payload"]
        ).collect()
    }
    assert out["e1"] == "r8"  # most recent ≤ 10
    assert out["e2"] == "r5"  # tie at equal time matches (≤ semantics)
    assert out["e3"] == "r7"  # later right rows ignored
    assert out["e4"] is None  # no match → NULL


def test_asof_forward_and_tolerance(spark):
    """Forward direction picks the EARLIEST right row at-or-after the
    left time; tolerance nulls matches outside the window; boundary is
    inclusive; missing matches are NULL."""
    from pyspark.sql import functions as F

    from extract_permits_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (1, "2024-01-01 13:00:00"), (2, "2024-01-01 10:00:00")],
        ["k", "t"],
    ).select("k", F.to_timestamp("t").alias("t"))
    right = spark.createDataFrame(
        [
            (1, "2024-01-01 09:00:00", "early"),
            (1, "2024-01-01 10:30:00", "next"),
            (1, "2024-01-01 11:00:00", "later"),
        ],
        ["k", "t", "tag"],
    ).select("k", F.to_timestamp("t").alias("t"), "tag")

    fwd = asof_join(
        left, right, "k", "k", "t", "t", ["tag"], direction="forward"
    )
    got = {(r["k"], str(r["t"])): r["tag"] for r in fwd.collect()}
    assert got[(1, "2024-01-01 10:00:00")] == "next"   # earliest >= 10:00
    assert got[(1, "2024-01-01 13:00:00")] is None     # nothing after 13:00
    assert got[(2, "2024-01-01 10:00:00")] is None     # no rows for key 2

    tol = asof_join(
        left, right, "k", "k", "t", "t", ["tag"],
        direction="forward", tolerance_seconds=1800,
    )
    got = {(r["k"], str(r["t"])): r["tag"] for r in tol.collect()}
    assert got[(1, "2024-01-01 10:00:00")] == "next"   # exactly 30 min: inclusive

    tight = asof_join(
        left, right, "k", "k", "t", "t", ["tag"],
        direction="forward", tolerance_seconds=1799,
    )
    got = {(r["k"], str(r["t"])): r["tag"] for r in tight.collect()}
    assert got[(1, "2024-01-01 10:00:00")] is None     # 30 min > 29:59 window

    back_tol = asof_join(
        left, right, "k", "k", "t", "t", ["tag"],
        direction="backward", tolerance_seconds=3600,
    )
    got = {(r["k"], str(r["t"])): r["tag"] for r in back_tol.collect()}
    assert got[(1, "2024-01-01 10:00:00")] == "early"  # 60 min back: inclusive
    assert got[(1, "2024-01-01 13:00:00")] is None     # 11:00 is 2h back


def test_distributed_group_rank_parity(spark):
    """distributed_group_rank must be bit-identical to
    row_number() OVER (PARTITION BY g ORDER BY q DESC, k) — including a
    skewed group 50x the others — and carry the per-group total."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    rows = [("hot", (i * 17) % 997, i) for i in range(500)]
    rows += [(f"g{j}", (j * 31) % 97, 10000 + j * 10 + i) for j in range(7) for i in range(10)]
    df = spark.createDataFrame(rows, ["g", "q", "k"])
    got = sorted(
        map(
            tuple,
            windows.distributed_group_rank(
                df, ["g"], [F.col("q").desc(), F.col("k")], "rn", total_col="n"
            )
            .select("g", "q", "k", "rn", "n")
            .collect(),
        )
    )
    w = W.partitionBy("g").orderBy(F.col("q").desc(), F.col("k"))
    wn = W.partitionBy("g")
    want = sorted(
        map(
            tuple,
            df.withColumn("rn", F.row_number().over(w).cast("long"))
            .withColumn("n", F.count(F.lit(1)).over(wn))
            .select("g", "q", "k", "rn", "n")
            .collect(),
        )
    )
    assert got == want


def test_distributed_group_cumsum_matches_window(spark):
    """distributed_group_cumsum ≡ sum() OVER (PARTITION BY g ORDER BY o
    ROWS UNBOUNDED PRECEDING) on a corpus with a 50x-skewed group, ZERO
    weights (the case the budget-capped pipeline spelling cannot
    handle), and enough rows to span multiple range partitions."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    rows = [("hot", (i * 17) % 997, i, (i * 7) % 13) for i in range(500)]
    rows += [
        (f"g{j}", (j * 31) % 97, 10000 + j * 10 + i, 0 if i % 3 == 0 else i)
        for j in range(7)
        for i in range(10)
    ]
    df = spark.createDataFrame(rows, ["g", "o", "k", "wt"])
    got = sorted(
        map(
            tuple,
            windows.distributed_group_cumsum(
                df, ["g"], [F.col("o"), F.col("k")], "wt", "cum"
            )
            .select("g", "o", "k", "wt", "cum")
            .collect(),
        )
    )
    w = (
        W.partitionBy("g")
        .orderBy(F.col("o"), F.col("k"))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    want = sorted(
        map(
            tuple,
            df.withColumn("cum", F.sum("wt").over(w).cast("long"))
            .select("g", "o", "k", "wt", "cum")
            .collect(),
        )
    )
    assert got == want


def test_distributed_group_cumsum_reuses_range_exchange(spark):
    """The counts branch and the local-window branch must share ONE
    range shuffle (the _gc_pin contract) — a Column-typed weight keeps
    extra payload columns alive, the exact shape that defeated reuse in
    the rank ops before the pin (r13 VERDICT #3)."""
    import re

    from pyspark.sql import functions as F

    rows = [("a", i, i, f"payload-{i}") for i in range(100)]
    rows += [("b", i * 2, 1000 + i, f"p{i}") for i in range(50)]
    df = spark.createDataFrame(rows, ["g", "o", "k", "extra"])
    out = windows.distributed_group_cumsum(
        df, ["g"], [F.col("o"), F.col("k")], F.length("extra"), "cum"
    )
    out.collect()
    plan = (
        out._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    live_ranges = [
        ln
        for ln in plan.splitlines()
        # a ReusedExchange line EMBEDS the referenced exchange's text —
        # count only live range-exchange nodes
        if "Exchange rangepartitioning" in ln and "ReusedExchange" not in ln
    ]
    assert len(live_ranges) == 1, plan
    assert len(re.findall(r"ReusedExchange", plan)) == 1, plan


def test_distributed_group_cumsum_decimal_weights_exact(spark):
    """r14 ADVICE medium: fractional weights must not be truncated. A
    decimal weight keeps its native type end-to-end and the cumulative
    sums are EXACT — identical to the sequential window spelling."""
    from decimal import Decimal

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    rows = [
        ("a" if i % 3 else "b", (i * 13) % 101, i, Decimal(i % 7) / 2)
        for i in range(300)
    ]
    df = spark.createDataFrame(
        rows, "g string, o long, k long, wt decimal(10,2)"
    )
    out = windows.distributed_group_cumsum(
        df, ["g"], [F.col("o"), F.col("k")], "wt", "cum"
    )
    # native type preserved: the output is decimal, not a long truncation
    assert out.schema["cum"].dataType.typeName() == "decimal"
    got = sorted(
        (r["g"], r["o"], r["k"], r["cum"])
        for r in out.select("g", "o", "k", "cum").collect()
    )
    w = (
        W.partitionBy("g")
        .orderBy(F.col("o"), F.col("k"))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    want = sorted(
        (r["g"], r["o"], r["k"], r["cum"])
        for r in df.withColumn("cum", F.sum("wt").over(w))
        .select("g", "o", "k", "cum")
        .collect()
    )
    assert got == want  # Decimal comparison is numeric-exact
    # a weight of exactly 1.5 must contribute 1.5, not 1 (the old cast)
    one = spark.createDataFrame(
        [("g", 1, 1, Decimal("1.50")), ("g", 2, 2, Decimal("1.50"))],
        "g string, o long, k long, wt decimal(10,2)",
    )
    cums = {
        r["k"]: r["cum"]
        for r in windows.distributed_group_cumsum(
            one, ["g"], [F.col("o"), F.col("k")], "wt", "cum"
        ).collect()
    }
    assert cums == {1: Decimal("1.50"), 2: Decimal("3.00")}


def test_distributed_group_cumsum_double_weights_native(spark):
    """Double weights keep their type (no long truncation); values match
    the window spelling to float tolerance (regrouped addition)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    rows = [("g1" if i % 2 else "g2", i, i, 0.25 * (i % 5)) for i in range(200)]
    df = spark.createDataFrame(rows, "g string, o long, k long, wt double")
    out = windows.distributed_group_cumsum(
        df, ["g"], [F.col("o"), F.col("k")], "wt", "cum"
    )
    assert out.schema["cum"].dataType.typeName() == "double"
    got = {r["k"]: r["cum"] for r in out.collect()}
    w = (
        W.partitionBy("g")
        .orderBy(F.col("o"), F.col("k"))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    want = {
        r["k"]: r["cum"]
        for r in df.withColumn("cum", F.sum("wt").over(w)).collect()
    }
    assert all(abs(got[k] - want[k]) < 1e-9 for k in want)


def test_distributed_group_cumsum_overflow_guard_in_plan(spark):
    """r14 ADVICE medium: the 2^33-rows-per-partition mid-layout guard
    the rank siblings carry must protect the cumsum too — the
    assert_true must survive optimization (not be pruned) and a healthy
    frame must pass with +0 offset."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("g", i, i, 1) for i in range(100)], "g string, o long, k long, wt long"
    )
    out = windows.distributed_group_cumsum(
        df, ["g"], [F.col("o"), F.col("k")], "wt", "cum"
    )
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "raise_error" in plan or "assert_true" in plan
    assert out.where(F.col("cum") != F.col("o") + 1).count() == 0


def test_distributed_ops_accept_map_typed_payload(spark):
    """r14 ADVICE low: the ReuseExchange pin hashes every column, but
    Spark's hash functions reject MapType — map-bearing payloads must
    ride through the pin (to_json wrap) instead of raising
    AnalysisException. Values must still match the window spellings."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("g" + str(i % 3), i, i % 4 + 1) for i in range(60)],
        "g string, k long, wt long",
    ).withColumn("m", F.create_map(F.lit("id"), F.col("k")))

    ranked = windows.distributed_rank(df, [F.col("k")], "rn").collect()
    assert sorted(r["rn"] for r in ranked) == list(range(1, 61))
    assert all(r["rn"] == r["k"] + 1 for r in ranked)

    granked = windows.distributed_group_rank(
        df, ["g"], [F.col("k")], "rn"
    ).collect()
    w = W.partitionBy("g").orderBy("k")
    want_g = {
        r["k"]: r["rn"]
        for r in df.withColumn("rn", F.row_number().over(w)).collect()
    }
    assert {r["k"]: r["rn"] for r in granked} == want_g

    csummed = windows.distributed_group_cumsum(
        df, ["g"], [F.col("k")], "wt", "cum"
    ).collect()
    wc = w.rowsBetween(W.unboundedPreceding, 0)
    want_c = {
        r["k"]: r["cum"]
        for r in df.withColumn("cum", F.sum("wt").over(wc)).collect()
    }
    assert {r["k"]: r["cum"] for r in csummed} == want_c
    # the map column itself survives untouched
    assert all(r["m"] == {"id": r["k"]} for r in csummed)
