"""Validation / partition operators (SURVEY.md §2.9, E1-E4).

The reference's signature capability: split a frame into
(valid-for-upload, needs-review) via per-column validators, and surface
human-readable error messages. Both compile to Catalyst expressions from
the ColumnSpec registry (specs.py) — one codegen'd pass, two filtered
outputs. At scale this is a single scan with two sinks (or one write
partitioned by bucket), never two jobs.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from extract_permits_spark.specs import PERMIT_COLUMNS, ColumnSpec, compile_validation


def with_validation(
    df: DataFrame,
    specs: Sequence[ColumnSpec] = PERMIT_COLUMNS,
    extra_error: Column | None = None,
    error_col: str = "errors",
    flag_col: str = "has_error",
) -> DataFrame:
    """E1+E2: add ``has_error`` boolean + ``errors`` message columns.

    ``extra_error`` folds in non-registry predicates — e.g. PIN-universe
    membership (J6), which the reference checks inside partition_permits
    (chicago/permit_cleaning.py:427-452).
    """
    _, errors = compile_validation(specs)
    # stage the errors column first, then flag from it — each validator
    # evaluates once per row instead of twice (E4 holds by construction)
    out = df.withColumn(error_col, errors)
    has_error = F.col(error_col) != ""
    if extra_error is not None:
        has_error = has_error | F.coalesce(extra_error, F.lit(False))
    return out.withColumn(flag_col, has_error)


def partition_valid(
    df: DataFrame,
    specs: Sequence[ColumnSpec] = PERMIT_COLUMNS,
    extra_error: Column | None = None,
    cache: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """E1: two-way split → (upload_df, review_df).

    Reference: partition_permits chicago/permit_cleaning.py:427-452.
    Both outputs share one parent plan; ``cache=True`` persists the
    validated parent so consuming both halves scans the input once
    (the write-side alternative is one job partitioned by bucket,
    sinks/writers.split_write).
    """
    validated = with_validation(df, specs, extra_error)
    if cache:
        validated = validated.persist()
    upload = validated.where(~F.col("has_error")).drop("has_error", "errors")
    review = validated.where(F.col("has_error"))
    return upload, review


def legacy_flag_columns(
    df: DataFrame,
    pin_col: str = "pin",
    permit_col: str = "permit_number",
    amount_col: str = "amount",
    addr_col: str = "applicant_street_address",
    note_col: str = "work_description",
    name_col: str = "applicant",
    in_universe_col: str | None = "in_universe",
    dup_col: str | None = "is_duplicate",
) -> DataFrame:
    """E3: legacy path's 8 boolean flag columns + conjunction → valid_row.

    Reference: finalize_columns chicago/legacy_permits/helper.py:110-173
    (R twin helper.R:96-135). Flags are kept as real columns — the review
    output shows analysts *which* rule failed.
    """
    c = F.col
    flags = {
        "valid_pin": c(pin_col).rlike(r"^\d{14}$"),
        "valid_permit_number": F.length(c(permit_col)).isin(9, 10),
        "valid_address": F.coalesce(F.length(c(addr_col)) <= 40, F.lit(False)),
        "valid_note": F.coalesce(F.length(c(note_col)) <= 2000, F.lit(True)),
        "valid_name": F.coalesce(F.length(c(name_col)) <= 50, F.lit(False)),
        "valid_amount": (
            c(amount_col).cast("string").try_cast("double").isNotNull()
            & (c(amount_col).cast("string").try_cast("double") >= 1)
            & (c(amount_col).cast("string").try_cast("double") < 2**31)
        ),
    }
    if in_universe_col is not None:
        flags["valid_universe"] = F.coalesce(c(in_universe_col), F.lit(False))
    if dup_col is not None:
        flags["valid_not_duplicate"] = ~F.coalesce(c(dup_col), F.lit(False))
    out = df
    for name, expr in flags.items():
        out = out.withColumn(name, F.coalesce(expr, F.lit(False)))
    valid = F.lit(True)
    for name in flags:
        valid = valid & F.col(name)
    return out.withColumn("valid_row", valid)
