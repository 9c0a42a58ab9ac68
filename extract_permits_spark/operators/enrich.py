"""Enrichment operators (SURVEY.md §2.2 P9-P11, §2.4 J1).

Keyword tagging uses higher-order array functions (filter + contains) over a
literal keyword array — fully JVM-side, no UDF, no join: at 100 TB this is
a narrow map over the fact table.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column
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
    arr = F.array(*[F.lit(k) for k in keywords])
    return F.array_join(
        F.filter(arr, lambda k: lowered.contains(F.lower(k))), ", "
    )
