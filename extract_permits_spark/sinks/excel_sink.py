"""Driver-side Excel presentation sink (SURVEY.md §2.1 S8-S10).

The reference's signature output is a formatted review workbook
(save_xlsx_file, chicago/permit_cleaning.py:911-1135): per-column
widths/formats, frozen header, autofilter, TEXTJOIN error formulas,
hyperlink formulas, conditional formats, sheet protection, plus a
PIN-universe sheet with hyphenated PINs (:1127-1131).

Design split: everything *data* (error messages E2, links P10/P11,
hyphenated PINs) is computed engine-side as real columns; this sink only
renders. It is inherently driver-side (`toPandas()`), bounded by the
review-file cardinality (thousands of rows — reference batch cap is 250
rows/file and $limit 10M overall), and gated behind openpyxl/xlsxwriter
availability: absent in this container, so rendering raises cleanly while
the row-shaping logic stays testable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

try:  # pragma: no cover - not installed in this environment
    import openpyxl  # noqa: F401

    HAVE_OPENPYXL = True
except Exception:  # pragma: no cover
    HAVE_OPENPYXL = False


def hyphenated_pin(c: Column | str) -> Column:
    """14-digit PIN → '12-34-567-890-1234' (universe-sheet display;
    reference chicago/permit_cleaning.py:1127-1131)."""
    c = F.col(c) if isinstance(c, str) else c
    return F.concat_ws(
        "-",
        F.substring(c, 1, 2),
        F.substring(c, 3, 2),
        F.substring(c, 5, 3),
        F.substring(c, 8, 3),
        F.substring(c, 11, 4),
    )


def presentation_frame(df: DataFrame, specs) -> DataFrame:
    """Project engine columns to presentation headers in col_idx order —
    the data-side half of save_xlsx_file."""
    ordered = sorted(specs, key=lambda s: s.col_idx)
    return df.select(*[F.col(s.name).alias(s.header) for s in ordered])


def save_workbook(df: DataFrame, path: str, sheet_name: str = "permits") -> None:
    """Render a (small, already review-sized) DataFrame to xlsx on the
    driver. Requires openpyxl (not present in this container)."""
    if not HAVE_OPENPYXL:
        raise NotImplementedError(
            "xlsx rendering requires openpyxl; compute-side outputs "
            "(presentation_frame, hyphenated_pin, error columns) are "
            "available without it"
        )
    pdf = df.toPandas()  # pragma: no cover
    pdf.to_excel(path, sheet_name=sheet_name, index=False)  # pragma: no cover


def flagged_rows_from_frame(df: DataFrame, flag_col: str = "is_flagged") -> DataFrame:
    """S7/S10 engine half: fill-color flags arrive as a boolean column from
    the ingest adapter (format_reviewed_permits_for_upload.py:31-83); the
    engine filters on it."""
    return df.where(F.coalesce(F.col(flag_col), F.lit(False)))


def without_flagged_rows(df: DataFrame, flag_col: str = "is_flagged") -> DataFrame:
    """S10: reference deletes flagged rows bottom-up in the workbook copy
    (:86-120); engine-side it is an anti-filter."""
    return df.where(~F.coalesce(F.col(flag_col), F.lit(False)))
