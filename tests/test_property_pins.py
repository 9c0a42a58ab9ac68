"""Property-based check: the Spark PIN normalizers agree with a direct
Python model of the reference logic on arbitrary inputs.

Model mirrors chicago/legacy_permits/helper.py:42-58 (legacy 4-case) and
chicago/permit_cleaning.py:615-630 (main path). Each hypothesis example is
a BATCH of strings → one Spark job per example, keeping runtime sane.
"""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st

from extract_permits_spark.operators.clean import format_pin, normalize_pin_legacy

PIN_CHARS = st.text(alphabet="0123456789-abcZ ½", min_size=0, max_size=20)


def model_legacy(s: str | None) -> str | None:
    if s is None:
        return None
    d = re.sub(r"[^0-9]", "", s)
    if len(d) == 13:
        return "0" + d
    if len(d) == 10:
        return d + "0000"
    if len(d) == 9:
        return "0" + d + "0000"
    return d


def model_main(s: str | None) -> str:
    if s is None:
        return ""
    d = s.replace("-", "")
    if len(d) == 10:
        return d + "0000"
    return d


@settings(max_examples=8, deadline=None)
@given(st.lists(st.one_of(st.none(), PIN_CHARS), min_size=1, max_size=40))
def test_pin_normalizers_match_python_model(spark, pins):
    df = spark.createDataFrame([(p,) for p in pins], "p string")
    got = df.select(
        normalize_pin_legacy("p").alias("legacy"), format_pin("p").alias("main")
    ).collect()
    for s, row in zip(pins, got):
        assert row["legacy"] == model_legacy(s), repr(s)
        assert row["main"] == model_main(s), repr(s)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "hot"]),      # group (skewed)
            st.integers(min_value=0, max_value=50),  # order key
            st.integers(min_value=-40, max_value=40),  # integer weight
            st.integers(min_value=0, max_value=160),   # decimal weight /8
        ),
        min_size=1,
        max_size=60,
    )
)
def test_group_cumsum_weight_types_match_window_model(spark, rows):
    """Property pin for the r14 ADVICE weight-type fix: for arbitrary
    skewed group/order/weight batches, distributed_group_cumsum must
    equal the sequential window spelling EXACTLY for integer weights
    (long path) and for decimal weights (native-type path, eighths so
    the scale exercises fractions) — including negative weights and
    duplicate order keys broken by the unique row id."""
    from decimal import Decimal

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from extract_permits_spark.operators.windows import (
        distributed_group_cumsum,
    )

    data = [
        (g, o, i, w, Decimal(dw) / 8)
        for i, (g, o, w, dw) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "g string, o long, k long, wi long, wd decimal(12,3)"
    )
    w = (
        W.partitionBy("g")
        .orderBy(F.col("o"), F.col("k"))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    want = {
        r["k"]: (r["ci"], r["cd"])
        for r in df.withColumn("ci", F.sum("wi").over(w))
        .withColumn("cd", F.sum("wd").over(w))
        .collect()
    }
    got_i = {
        r["k"]: r["cum"]
        for r in distributed_group_cumsum(
            df, ["g"], [F.col("o"), F.col("k")], "wi", "cum"
        ).collect()
    }
    got_d = {
        r["k"]: r["cum"]
        for r in distributed_group_cumsum(
            df, ["g"], [F.col("o"), F.col("k")], "wd", "cum"
        ).collect()
    }
    for k, (ci, cd) in want.items():
        assert got_i[k] == ci, (k, got_i[k], ci)
        assert got_d[k] == cd, (k, got_d[k], cd)
