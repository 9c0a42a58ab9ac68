"""Window-shaped operators (SURVEY.md §2.6, W1-W4) and batching (O5).

The reference's pandas idioms (cumcount, slice(1), range-index line numbers,
duplicated-flag) are all window functions in disguise. Spark needs explicit
deterministic ordering keys where pandas relied on input order
(SURVEY §7.4.1).

Scale note: global row numbers (W3) serialize into one partition. That is
fine at review-file cardinality (≤ a few thousand rows, reference batch
size 250), but ``global_line_numbers`` also offers a distributed
``zipWithIndex``-style path for large frames: per-partition counts →
cumulative offsets (driver-side, #partitions values) → partition-local
row_number + offset. Same API, no single-partition shuffle.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _contains_map(dt) -> bool:
    if isinstance(dt, T.MapType):
        return True
    if isinstance(dt, T.ArrayType):
        return _contains_map(dt.elementType)
    if isinstance(dt, T.StructType):
        return any(_contains_map(f.dataType) for f in dt.fields)
    return False


def _pin_hash(df: DataFrame):
    """The ReuseExchange column-pruning pin expression shared by the
    distributed_* operators: ``xxhash64`` over EVERY input column, so
    the tiny counts branch references the whole row and column pruning
    cannot narrow its range exchange out of canonical equality with the
    output branch (see the per-operator comments).

    Spark's hash functions reject MapType anywhere in the input type
    (r14 ADVICE: a map-typed payload column made all three operators
    raise AnalysisException where the unpinned r13 code worked). The pin
    only needs to REFERENCE each column, not hash its raw bytes, so
    map-bearing columns ride through ``to_json`` — deterministic,
    hashable, and still a use of the column the pruner must honor. All
    other types pass straight to xxhash64, keeping the expression (and
    therefore every existing consumer's plan) unchanged for map-free
    frames."""
    exprs = [
        F.to_json(F.col(f.name)) if _contains_map(f.dataType) else F.col(f.name)
        for f in df.schema.fields
    ]
    return F.xxhash64(*exprs)


def position_in_group(
    df: DataFrame, group_cols: Sequence[str], order_cols: Sequence[str], out_col: str
) -> DataFrame:
    """W1: 1-based position within group under an explicit order.

    Reference: groupby('permit_').cumcount()+1,
    chicago/permit_cleaning.py:598-601.
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return df.withColumn(out_col, F.row_number().over(w))


def first_row_per_group(
    df: DataFrame, group_cols: Sequence[str], order_cols: Sequence[str]
) -> DataFrame:
    """W2: first row per group under an explicit order.

    Reference: group_by(PIN, PermitNo) %>% slice(1),
    chicago/legacy_permits/2021/format_legacy_2021.R:48-56 (R relies on
    input order; we demand explicit order columns).
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")
    )


def duplicate_pair_flag(
    df: DataFrame, key_cols: Sequence[str], out_col: str = "is_duplicate"
) -> DataFrame:
    """W4/A5: flag every member of a key-duplicated set (keep=False).

    Reference: df.duplicated(subset=[PIN, PermitNo], keep=False),
    chicago/legacy_permits/helper.py:150-153.
    """
    w = Window.partitionBy(*key_cols)
    return df.withColumn(out_col, F.count(F.lit(1)).over(w) > 1)


def distributed_rank(
    df: DataFrame,
    order_exprs: Sequence,
    out_col: str,
    zero_based: bool = False,
    total_col: str | None = None,
) -> DataFrame:
    """Global ``row_number()`` over an explicit TOTAL order without a
    single-partition window — the 100-TB spelling of
    ``Window.orderBy(...)``: range-repartition on the sort keys, sort
    within partitions, derive (partition id, partition-local 0-based
    index) from ``monotonically_increasing_id`` (pid in the high bits, a
    pipeline-order counter — here the sorted order, since the sort sits
    directly below — in the low 33), and add broadcast cumulative
    partition offsets. ONE wide shuffle total (the range exchange
    itself); the per-partition counts reduce map-side, so the offset
    frame is #partitions rows and its cumulative window is trivially
    bounded. Output is bit-identical to the single-partition window
    whenever ``order_exprs`` is a total order — break ties with a unique
    id (with ties, both spellings are nondeterministic anyway).

    ``order_exprs`` accepts Columns, including ``.desc()`` sort orders
    and computed keys (e.g. ``F.md5(...)``). ``total_col`` optionally
    attaches the global row count as a column — free here (a sum over
    the same tiny offsets frame), and saves callers a separate
    ``df.count()`` driver job (e.g. sample_negatives' modulus).

    Two assumptions, both guarded/documented:

    - ``monotonically_increasing_id``'s bit layout (pid << 33 | local
      counter) is documented as "current implementation"; if a range
      partition ever held ≥ 2^33 rows the counter would overflow into
      the pid bits and silently corrupt ranks. A guard on the tiny
      offsets frame (``assert_true`` folded into ``_dr_off`` so column
      pruning cannot drop it) fails the job instead — at 2^33 rows per
      partition the fix is a finer range partitioning, not a bigger
      counter.
    - the counts subplan and the output subplan must see the IDENTICAL
      physical partitioning. Both are built over the same ``ordered``
      lineage, so their range exchanges canonicalize equal and Spark's
      ReuseExchange rule makes them literally share one shuffle; above
      it, the within-partition sort is by a total order, so the derived
      (pid, local index) pairs are deterministic per branch even where
      the exchange is re-executed (e.g. after executor loss).
    """
    ordered = (
        df.repartitionByRange(*order_exprs)
        .sortWithinPartitions(*order_exprs)
        .withColumn("_dr_mid", F.monotonically_increasing_id())
        .withColumn("_dr_pid", F.shiftright("_dr_mid", 33).cast("int"))
        .withColumn(
            "_dr_lrn", F.col("_dr_mid").bitwiseAND(F.lit((1 << 33) - 1))
        )
    )
    # _dr_pin: same ReuseExchange column-pruning pin as
    # distributed_group_rank (see the comment there) — without it a
    # payload column the rank consumer keeps but the counts don't
    # (anything outside the sort keys) narrows the counts branch, the
    # exchanges stop canonicalizing equal, and the whole upstream
    # re-executes into a second shuffle.
    counts = ordered.groupBy("_dr_pid").agg(
        F.count(F.lit(1)).alias("_dr_cnt"),
        F.min(_pin_hash(df)).alias("_dr_pin"),
    )
    w_off = Window.orderBy("_dr_pid").rowsBetween(Window.unboundedPreceding, -1)
    # counter-overflow guard (see docstring): evaluates on #partitions
    # rows, contributes +0 to the offset when healthy, raises otherwise
    guard = F.coalesce(
        F.assert_true(
            (F.col("_dr_cnt") < F.lit(1 << 33)) | F.isnull(F.col("_dr_pin")),
            F.concat(
                F.lit("distributed_rank: a range partition holds "),
                F.col("_dr_cnt").cast("string"),
                F.lit(
                    " rows (>= 2^33): monotonically_increasing_id's local"
                    " counter would overflow into the pid bits —"
                    " repartition the sort keys finer"
                ),
            ),
        ).cast("long"),
        F.lit(0).cast("long"),
    )
    offsets = counts.withColumn(
        "_dr_off", F.coalesce(F.sum("_dr_cnt").over(w_off), F.lit(0)) + guard
    )
    keep = ["_dr_pid", "_dr_off"]
    if total_col is not None:
        w_all = Window.orderBy("_dr_pid").rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        offsets = offsets.withColumn(total_col, F.sum("_dr_cnt").over(w_all))
        keep.append(total_col)
    rank = F.col("_dr_off") + F.col("_dr_lrn") + F.lit(0 if zero_based else 1)
    return (
        ordered.join(F.broadcast(offsets.select(*keep)), "_dr_pid")
        .withColumn(out_col, rank.cast("long"))
        .drop("_dr_mid", "_dr_pid", "_dr_lrn", "_dr_off")
    )


def distributed_group_rank(
    df: DataFrame,
    group_cols: Sequence[str],
    order_exprs: Sequence,
    out_col: str,
    total_col: str | None = None,
) -> DataFrame:
    """row_number() OVER (PARTITION BY group ORDER BY ...) WITHOUT the
    per-group hot reducer — the grouped twin of ``distributed_rank``.

    A hash-partitioned rank window gives each group ONE reducer that
    sorts the whole group; with few, huge groups (8 crawl sources over a
    100-TB corpus) that is 8 tasks sorting ~12 TB each and no AQE remedy
    (windows cannot be skew-split). Here the frame takes one RANGE
    exchange on (group, order...) — every group spreads across many
    tasks — and the in-group rank is pure offset arithmetic over a TINY
    per-(partition, group) counts frame: within a range partition a
    group's rows are contiguous under the sort, so

        rank = [rows of g in earlier partitions]
             + (local index − g's first local index in this partition)
             + 1.

    The counts frame has at most (#partitions + #groups) rows (each
    partition holds a consecutive group range), so the whole derivation
    costs ONE corpus shuffle + one map-side-combined tiny aggregate —
    the same cost shape as distributed_rank, with the same
    exchange-reuse and 2^33 mid-layout contracts (guard inherited via
    the counts frame below). Bit-identical to the window spelling
    whenever (group, order) is a total order.

    ``total_col`` attaches the per-GROUP row count (free from the same
    counts frame) for relative cuts like "best 30% per source"."""
    gexprs = [F.col(c).asc() for c in group_cols]
    ordered = (
        df.repartitionByRange(*gexprs, *order_exprs)
        .sortWithinPartitions(*gexprs, *order_exprs)
        .withColumn("_dg_mid", F.monotonically_increasing_id())
        .withColumn("_dg_pid", F.shiftright("_dg_mid", 33).cast("int"))
        .withColumn(
            "_dg_lrn", F.col("_dg_mid").bitwiseAND(F.lit((1 << 33) - 1))
        )
    )
    # _dg_pin forces the counts branch to reference EVERY input column:
    # without it, column pruning narrows the counts side's range
    # exchange (it only needs pid/group/lrn), the two exchanges no
    # longer canonicalize equal, ReuseExchange fails, and the ENTIRE
    # upstream (at 100 TB: a corpus-wide aggregation) re-executes to
    # feed a second shuffle — measured on llm_pretrain_pipeline, whose
    # `tk` payload column is exactly what pruning dropped (r13 VERDICT
    # #3: the dedup SortAggregate ran twice, ~+1 s at sf0.1). The pin
    # rides the guard condition below so no optimizer rule can drop it;
    # its value is never used.
    counts = ordered.groupBy("_dg_pid", *group_cols).agg(
        F.count(F.lit(1)).alias("_dg_cnt"),
        F.min("_dg_lrn").alias("_dg_minl"),
        F.min(_pin_hash(df)).alias("_dg_pin"),
    )
    guard = F.coalesce(
        F.assert_true(
            (F.col("_dg_cnt") < F.lit(1 << 33)) | F.isnull(F.col("_dg_pin")),
            F.lit(
                "distributed_group_rank: a range partition holds >= 2^33"
                " rows — repartition the sort keys finer"
            ),
        ).cast("long"),
        F.lit(0).cast("long"),
    )
    w_off = (
        Window.partitionBy(*group_cols)
        .orderBy("_dg_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = counts.withColumn(
        "_dg_off", F.coalesce(F.sum("_dg_cnt").over(w_off), F.lit(0)) + guard
    )
    keep = ["_dg_pid", *group_cols, "_dg_minl", "_dg_off"]
    if total_col is not None:
        w_all = Window.partitionBy(*group_cols)
        offs = offs.withColumn(total_col, F.sum("_dg_cnt").over(w_all))
        keep.append(total_col)
    rank = (
        F.col("_dg_off") + (F.col("_dg_lrn") - F.col("_dg_minl")) + F.lit(1)
    )
    return (
        ordered.join(
            F.broadcast(offs.select(*keep)), ["_dg_pid", *group_cols]
        )
        .withColumn(out_col, rank.cast("long"))
        .drop("_dg_mid", "_dg_pid", "_dg_lrn", "_dg_minl", "_dg_off")
    )


def distributed_group_cumsum(
    df: DataFrame,
    group_cols: Sequence[str],
    order_exprs: Sequence,
    weight_col,
    out_col: str,
) -> DataFrame:
    """Inclusive running SUM over (PARTITION BY group ORDER BY ...)
    WITHOUT the per-group hot reducer — the prefix-sum sibling of
    ``distributed_group_rank`` and the designated follow-up it named
    (the domain-mix token budget was the one remaining per-source
    window in the flagship chain).

    A hash-partitioned cumulative window gives each group ONE reducer
    scanning the whole group in order; with few, huge groups (8 crawl
    sources over a 100-TB corpus) that is 8 sequential scans of ~12 TB
    each. Here the frame takes one RANGE exchange on (group, order...)
    — every group spreads across many tasks — and the cumulative sum
    splits into

        cum = [weight of g in earlier range partitions]   (tiny frame)
            + [running sum within this (partition, g) cell]

    The first term is a broadcast offsets frame (≤ #partitions +
    #groups rows, same counts machinery as distributed_group_rank).
    The second is a window over (pid, group) — that costs a SECOND
    corpus exchange, but on (pid, group) keys whose cells are BOUNDED
    BY CONSTRUCTION: a (pid, group) cell is a subset of one range
    partition, so no reducer ever sees more than one partition's rows
    no matter how skewed the groups are. Two balanced shuffles replace
    one shuffle + an unboundedly-skewed reducer — the same trade
    distributed_group_rank made, priced at fixture scale and accepted
    (r12e precedent). Bit-identical to the window spelling whenever
    (group, order) is a total order, and EXACT for integer and decimal
    weights: integral weights sum as longs, every other numeric type
    keeps its native type end-to-end (r14 ADVICE: the old unconditional
    long cast silently truncated fractional weights). Decimal sums are
    associative, so regrouping cannot drift them; float/double weights
    keep their type but regrouped addition may differ from the
    sequential window in the last ulps — use decimals for exact
    fractional budgets.

    ``weight_col`` accepts a Column or a name."""
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    # sum longs only when the weight is integral; otherwise the native
    # numeric type (decimal stays decimal — exact; double stays double)
    wdt = df.select(w.alias("_gc_w")).schema[0].dataType
    integral = isinstance(
        wdt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    )
    gexprs = [F.col(c).asc() for c in group_cols]
    # no sortWithinPartitions: unlike the rank ops, nothing here reads a
    # partition-local position — pid comes from the mid's high bits
    # (partition index, order-independent) and the local window re-sorts
    # after its own exchange anyway
    ordered = (
        df.repartitionByRange(*gexprs, *order_exprs)
        .withColumn("_gc_w", w.cast("long") if integral else w)
        .withColumn(
            "_gc_pid",
            F.shiftright(F.monotonically_increasing_id(), 33).cast("int"),
        )
    )
    # per-(partition, group) weight totals — map-side combined, tiny.
    # _gc_pin: the same ReuseExchange column-pruning pin as
    # distributed_group_rank (see there) so this branch and the window
    # branch share ONE range shuffle.
    counts = ordered.groupBy("_gc_pid", *group_cols).agg(
        F.sum("_gc_w").alias("_gc_sum"),
        F.count(F.lit(1)).alias("_gc_cnt"),
        F.min(_pin_hash(df)).alias("_gc_pin"),
    )
    w_off = (
        Window.partitionBy(*group_cols)
        .orderBy("_gc_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # counter-overflow guard, same contract as the rank siblings (r14
    # ADVICE: this op previously only referenced the pin): _gc_pid
    # comes from the mid's high bits, so a range partition holding
    # >= 2^33 rows would bleed the local counter into the pid bits and
    # silently corrupt the per-cell sums — fail loudly instead. The
    # isnull(_gc_pin) arm keeps the pin referenced (xxhash64 is
    # non-nullable: constant-false at runtime, opaque to the pruner).
    guard = F.coalesce(
        F.assert_true(
            (F.col("_gc_cnt") < F.lit(1 << 33)) | F.isnull(F.col("_gc_pin")),
            F.lit(
                "distributed_group_cumsum: a range partition holds >= 2^33"
                " rows — monotonically_increasing_id's local counter would"
                " overflow into the pid bits; repartition the sort keys"
                " finer"
            ),
        ).cast("long"),
        F.lit(0).cast("long"),
    )
    offs = counts.withColumn(
        "_gc_off", F.coalesce(F.sum("_gc_sum").over(w_off), F.lit(0)) + guard
    )
    # running sum within the (pid, group) cell: a second corpus
    # exchange on fine-grained, size-bounded keys (cell ⊆ one range
    # partition) — no hot reducer possible
    w_local = (
        Window.partitionBy("_gc_pid", *group_cols)
        .orderBy(*order_exprs)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        ordered.withColumn("_gc_local", F.sum("_gc_w").over(w_local))
        .join(
            F.broadcast(offs.select("_gc_pid", *group_cols, "_gc_off")),
            ["_gc_pid", *group_cols],
        )
        .withColumn(
            out_col,
            (F.col("_gc_off") + F.col("_gc_local")).cast("long")
            if integral
            else (F.col("_gc_off") + F.col("_gc_local")),
        )
        .drop("_gc_pid", "_gc_w", "_gc_local", "_gc_off")
    )


def global_line_numbers(
    df: DataFrame,
    order_cols: Sequence[str],
    out_col: str = "lline",
    distributed: bool = False,
) -> DataFrame:
    """W3: global sequential line number starting at 1.

    Reference: ``# [LLINE] = range(1, n+1)``,
    chicago/legacy_permits/helper.py:167,171.

    ``distributed=True`` switches to the scale path (``distributed_rank``):
    sort, then compute the line number as partition-offset + local index,
    avoiding the single-partition window. No wide shuffle beyond the range
    exchange behind the sort itself.
    """
    if not distributed:
        w = Window.orderBy(*order_cols)
        return df.withColumn(out_col, F.row_number().over(w))
    ranked = distributed_rank(df, list(order_cols), out_col)
    return ranked.withColumn(out_col, F.col(out_col).cast("int"))


def batch_ids(
    df: DataFrame,
    order_cols: Sequence[str],
    batch_size: int = 250,
    line_col: str = "lline",
    batch_col: str = "batch",
    distributed: bool = False,
) -> DataFrame:
    """O5/S9: assign upload-batch ids of ``batch_size`` rows and renumber
    lines within each batch (1-based).

    Reference: iloc[start:start+250] slicing with per-batch renumber,
    chicago/legacy_permits/format_reviewed_permits_for_upload.py:279-299.
    Downstream, ``df.write.partitionBy(batch_col)`` yields one file per
    batch — the distributed analog of the reference's per-file loop.

    ``distributed=True`` threads through to ``global_line_numbers``'s
    distributed_rank path — identical batch/line assignment (pinned by
    tests/test_operators.py parity test) with no single-partition
    window, for when the "review file" is itself corpus-sized.
    """
    numbered = global_line_numbers(
        df, order_cols, out_col="_gline", distributed=distributed
    )
    return (
        numbered.withColumn(
            batch_col, F.floor((F.col("_gline") - 1) / batch_size).cast("int")
        )
        .withColumn(
            line_col, (F.col("_gline") - F.col(batch_col) * batch_size).cast("int")
        )
        .drop("_gline")
    )
