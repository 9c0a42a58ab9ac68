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
