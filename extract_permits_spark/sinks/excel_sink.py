"""Driver-side Excel presentation sink + reviewed-workbook ingest
(SURVEY.md §2.1 S6-S10).

The reference's signature output is a formatted review workbook
(save_xlsx_file, chicago/permit_cleaning.py:911-1135): per-column
widths/formats, frozen header, autofilter, hyperlink formulas, sheet
protection, plus a PIN-universe sheet with hyphenated PINs (:1127-1131).
Its signature *input* is the reviewed workbook where the reviewer flags
rows by coloring the PIN cell (format_reviewed_permits_for_upload.py:
31-83 flag colors, :123-204 value read).

Design split: everything *data* (error messages E2, links P10/P11,
hyphenated PINs) is computed engine-side as real columns; this module
renders and ingests via the pure-stdlib codec in ``xlsx_io`` (openpyxl
is not installed in this container — and is not needed: xlsx is
zip+XML). Render/ingest are inherently driver-side, bounded by the
review-file cardinality (250 rows/file batch cap, S9).
"""

from __future__ import annotations

from datetime import date, datetime

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from extract_permits_spark.sinks.xlsx_io import (
    CondFormat,
    DataValidation,
    Formula,
    SheetSpec,
    _col_letter,
    read_xlsx,
    to_serial,
    write_xlsx,
)

# Status traffic lights over the data range (reference
# chicago/permit_cleaning.py:1027-1053): formula -> bg color, priority in
# list order. {ERRORS_COL}/{READY_COL} are filled with column letters.
TRAFFIC_LIGHT_RULES = [
    # no errors, unchecked -> orange
    ('AND(${ERRORS_COL}2="",${READY_COL}2=FALSE)', "FFD5A8"),
    # has errors -> red
    ('${ERRORS_COL}2<>""', "FFB3B3"),
    # ready -> blue
    ('AND(${READY_COL}2=TRUE,${ERRORS_COL}2="")', "B8D4E8"),
]

# Ready-checkbox gate (reference :149-157): checking the box is blocked
# while the row still has errors.
READY_VALIDATION = {
    "validate": "custom",
    "value": '=${ERRORS_COL}2=""',
    "show_error": True,
    "error_type": "stop",
    "error_title": "Errors not resolved",
    "error_message": "This row still has errors. Fix them before marking ready.",
}

# xlsxwriter criteria dialect -> ECMA-376 dataValidation operator
_DV_OPERATORS = {
    "between": "between",
    "not between": "notBetween",
    "equal to": "equal",
    "not equal to": "notEqual",
    "greater than": "greaterThan",
    "less than": "lessThan",
    "greater than or equal to": "greaterThanOrEqual",
    "less than or equal to": "lessThanOrEqual",
}


def compile_data_validation(
    v: dict, ci: int, n_rows: int, errors_letter: str | None = None
) -> DataValidation:
    """xlsxwriter-dialect validation dict (ColumnSpec.validation /
    READY_VALIDATION) -> codec ``DataValidation`` over the column's data
    range — the engine half of the reference's emission loop
    (permit_cleaning.py:1055-1084, incl. the {COL}/{ERRORS_COL} letter
    substitution at :1070-1077)."""
    col_letter = _col_letter(ci)
    sqref = f"{col_letter}2:{col_letter}{n_rows + 1}"
    common = dict(
        allow_blank=v.get("ignore_blank", True),
        show_error=v.get("show_error", True),
        error_style=v.get("error_type", "stop"),
        error_title=v.get("error_title"),
        error_message=v.get("error_message"),
    )
    validate = v["validate"]
    if validate == "custom":
        formula = str(v["value"]).lstrip("=").format(
            COL=col_letter, ERRORS_COL=errors_letter or ""
        )
        return DataValidation(sqref, "custom", formula1=formula, **common)
    if validate == "text length":
        return DataValidation(
            sqref,
            "textLength",
            operator=_DV_OPERATORS[v["criteria"]],
            formula1=str(v["minimum"]),
            formula2=str(v["maximum"]) if "maximum" in v else None,
            **common,
        )
    if validate == "date":
        # Excel compares date serials, not ISO strings
        def serial(iso: str) -> str:
            return str(int(to_serial(datetime.strptime(iso, "%Y-%m-%d").date())))

        operator = _DV_OPERATORS[v["criteria"]]
        if operator in ("between", "notBetween"):
            # ECMA-376 requires formula2 for (not)between — dropping the
            # upper bound silently would unenforce it; fail loudly like
            # the unsupported-dialect path instead
            if "maximum" not in v:
                raise ValueError(
                    "date validation with criteria 'between' needs 'maximum'"
                )
            return DataValidation(
                sqref,
                "date",
                operator=operator,
                formula1=serial(str(v["value"] if "value" in v else v["minimum"])),
                formula2=serial(str(v["maximum"])),
                **common,
            )
        return DataValidation(
            sqref,
            "date",
            operator=operator,
            formula1=serial(str(v["value"])),
            **common,
        )
    raise ValueError(f"unsupported validation dialect: {validate!r}")

# Reviewer flag fills on the PIN cell
# (format_reviewed_permits_for_upload.py:31-37): yellow, orange, and one
# theme-encoded variant of the same orange that round-trips through Excel
# as (theme 7, tint 0.39998).
FLAG_FILL_COLORS = {
    "FFFFFF00",  # yellow (ARGB)
    "FFFFC000",  # orange (ARGB)
    ("theme", 7, 0.3999755851924192),
}


def fill_matches_flag(fill: object) -> bool:
    """True if a cell-fill descriptor from ``xlsx_io.read_xlsx`` is one of
    the reviewer flag colors (pin_cell_matches_flag,
    format_reviewed_permits_for_upload.py:39-83): ARGB match, RGB-without-
    alpha match, or theme+tint match with tint rounded to 6dp."""
    if fill is None:
        return False
    if isinstance(fill, str):
        val = fill.upper().lstrip("#")
        if val in FLAG_FILL_COLORS:
            return True
        return len(val) == 8 and val[2:] in {c for c in FLAG_FILL_COLORS if isinstance(c, str)}
    if isinstance(fill, tuple) and len(fill) == 3 and fill[0] == "theme":
        want = {
            (t[0], t[1], round(t[2], 6))
            for t in FLAG_FILL_COLORS
            if isinstance(t, tuple)
        }
        return ("theme", fill[1], round(float(fill[2]), 6)) in want
    return False


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


def save_workbook(
    df: DataFrame,
    path: str,
    specs=None,
    pin_universe: DataFrame | None = None,
    sheet_name: str = "Permits",
    freeze_cols: int = 3,
    freeze_rows: int = 1,
    errors_col: str | None = None,
    ready_col: str | None = None,
    checked: bool = False,
) -> None:
    """S8: render a (small, already review-sized) DataFrame to a formatted
    xlsx on the driver — bold frozen header (header ROW frozen too,
    matching the reference's freeze_panes(1, FREEZE_COLS)), per-spec
    column widths,
    autofilter, protected sheet, plus the 'Universe of Valid PINs' sheet
    with zero-padded + hyphenated PINs (save_xlsx_file,
    chicago/permit_cleaning.py:911-1135). String cells whose value starts
    with '=' (the engine-built HYPERLINK links, P10/P11) are written as
    formula cells, like the reference's write_formula branch (:992-1001).

    Review-workbook extras (S8 presentation surface): pass ``errors_col``
    (the E2 message column) to append 'Ready' + 'Errors' presentation
    columns and emit the reference's status traffic lights
    (TRAFFIC_LIGHT_RULES, ref :1027-1053) plus per-column data validations
    from ``ColumnSpec.validation`` and the Ready-checkbox gate
    (ref :149-157, :1055-1084). ``ready_col`` names an existing boolean
    column for the checkbox state; otherwise every row gets ``checked``
    (the reference's upload variant pre-checks all rows and then SKIPS the
    checkbox validation so Excel won't reset it on open, ref :1061-1065).
    """
    review_mode = errors_col is not None
    validation_specs: list[tuple[int, dict]] = []
    if specs is not None:
        ordered = sorted(specs, key=lambda s: s.col_idx)
        sel = [F.col(s.name).alias(s.header) for s in ordered]
        widths = [s.width for s in ordered]
        validation_specs = [
            (i, s.validation)
            for i, s in enumerate(ordered)
            if getattr(s, "validation", None)
        ]
    else:
        sel = [F.col(c) for c in df.columns if c not in (errors_col, ready_col)]
        widths = None
    if review_mode:
        # reference column layout puts Ready at col 1; engine-side the two
        # status rails ride at the end so spec col_idx stays contiguous
        sel.append(
            (
                F.coalesce(F.col(ready_col).cast("boolean"), F.lit(False))
                if ready_col
                else F.lit(bool(checked))
            ).alias("Ready")
        )
        sel.append(
            F.coalesce(F.col(errors_col).cast("string"), F.lit("")).alias("Errors")
        )
        if widths is not None:
            widths += [10, 40]
        df = df.select(*sel)
    elif specs is not None:
        df = df.select(*sel)
    header = list(df.columns)
    rows: list[list[object]] = []
    for r in df.toPandas().itertuples(index=False):
        row: list[object] = []
        for v in r:
            if v is None or (isinstance(v, float) and v != v):
                row.append(None)
            elif isinstance(v, str) and v.startswith("=") and "(" in v:
                row.append(Formula(v[1:]))
            elif isinstance(v, (datetime, date, bool, int, float, str)):
                row.append(v)
            else:
                row.append(str(v))
        rows.append(row)

    cond_formats: list[CondFormat] = []
    validations: list[DataValidation] = []
    if review_mode and rows:  # reference gates on n_data_rows > 0 (:1028)
        errors_letter = _col_letter(header.index("Errors"))
        ready_letter = _col_letter(header.index("Ready"))
        data_range = f"A2:{_col_letter(len(header) - 1)}{len(rows) + 1}"
        cond_formats = [
            CondFormat(
                data_range,
                formula.format(ERRORS_COL=errors_letter, READY_COL=ready_letter),
                color,
            )
            for formula, color in TRAFFIC_LIGHT_RULES
        ]
        for ci, v in validation_specs:
            # the PIN universe COUNTIF references the universe sheet; only
            # emit it when that sheet is being written
            if pin_universe is None and "Universe of Valid PINs" in str(
                v.get("value", "")
            ):
                continue
            validations.append(compile_data_validation(v, ci, len(rows), errors_letter))
        if not checked:
            # upload variant skips the checkbox gate (ref :1061-1065)
            validations.append(
                compile_data_validation(
                    READY_VALIDATION, header.index("Ready"), len(rows), errors_letter
                )
            )

    sheets = [
        SheetSpec(
            name=sheet_name,
            header=header,
            rows=rows,
            col_widths=widths,
            freeze_cols=min(freeze_cols, len(header)),
            freeze_rows=freeze_rows,
            autofilter=True,
            protect=True,
            cond_formats=cond_formats,
            validations=validations,
        )
    ]
    if pin_universe is not None:
        pin_rows = [
            [str(p).zfill(14), None]
            for (p,) in pin_universe.select(pin_universe.columns[0]).toPandas().itertuples(
                index=False
            )
        ]
        for row in pin_rows:
            p = row[0]
            row[1] = f"{p[0:2]}-{p[2:4]}-{p[4:7]}-{p[7:10]}-{p[10:14]}"
        sheets.append(
            SheetSpec(
                name="Universe of Valid PINs",
                header=["pin", "pin_hyphenated"],
                rows=pin_rows,
                col_widths=[16, 20],
                protect=True,
            )
        )
    write_xlsx(path, sheets)


def read_reviewed_workbook(
    spark: SparkSession,
    path: str,
    sheet_name: str | None = None,
    pin_header: str = "PIN* [PARID]",
) -> DataFrame:
    """S6+S7: ingest a reviewed workbook — every cell as a string column
    (the reference reads all columns for QC, format_reviewed_permits_for_
    upload.py:123-204) plus an ``is_flagged`` boolean derived from the PIN
    cell's fill color (:39-83). Dates render back as ISO strings so the
    frame is uniformly string-typed like the reference's upload frame."""
    sheet = read_xlsx(path, sheet_name)
    try:
        pin_idx = sheet.header.index(pin_header)
    except ValueError:
        pin_idx = None

    def fmt(v: object) -> str | None:
        if v is None:
            return None
        if isinstance(v, datetime):
            if v.time() == v.time().min:
                return v.date().isoformat()
            return v.isoformat(sep=" ")
        if isinstance(v, bool):
            return str(v)
        if isinstance(v, float) and v == int(v):
            return str(int(v))
        return str(v)

    records = []
    for row, fills in zip(sheet.rows, sheet.fills):
        rec = {h: fmt(v) for h, v in zip(sheet.header, row)}
        rec["is_flagged"] = pin_idx is not None and fill_matches_flag(fills.get(pin_idx))
        records.append(rec)

    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField(h, T.StringType()) for h in sheet.header]
        + [T.StructField("is_flagged", T.BooleanType())]
    )
    return spark.createDataFrame(records, schema)


def flagged_rows_from_frame(df: DataFrame, flag_col: str = "is_flagged") -> DataFrame:
    """S7/S10 engine half: keep reviewer-flagged rows (the upload set,
    format_reviewed_permits_for_upload.py:171-183)."""
    return df.where(F.coalesce(F.col(flag_col), F.lit(False)))


def without_flagged_rows(df: DataFrame, flag_col: str = "is_flagged") -> DataFrame:
    """S10: reference deletes flagged rows bottom-up in the workbook copy
    (:86-120); engine-side it is an anti-filter."""
    return df.where(~F.coalesce(F.col(flag_col), F.lit(False)))
