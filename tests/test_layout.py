"""Z-order clustering and small-file compaction: the layout properties
they promise must be measurable in the written files' parquet stats."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from extract_permits_spark.sinks.layout import compact_parquet, dir_bytes, write_zordered
from extract_permits_spark.sources.readers import load_table

SF_DIR = "/root/testdata/sf0.001"


def _file_ranges(path: str, cols):
    """[(file, {col: (min, max)})] from parquet footers — no data read."""
    out = []
    for f in sorted(glob.glob(os.path.join(path, "part-*.parquet"))):
        md = pq.ParquetFile(f).metadata
        lo = {c: None for c in cols}
        hi = {c: None for c in cols}
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            for ci in range(row_group.num_columns):
                col = row_group.column(ci)
                name = col.path_in_schema
                if name in cols and col.statistics is not None:
                    s = col.statistics
                    lo[name] = s.min if lo[name] is None else min(lo[name], s.min)
                    hi[name] = s.max if hi[name] is None else max(hi[name], s.max)
        out.append((f, {c: (lo[c], hi[c]) for c in cols}))
    return out


def test_zorder_files_cover_compact_rectangles(spark, tmp_path):
    # cluster lineitem on (l_partkey, l_suppkey); with 4 z-ordered files
    # each must cover a SMALL rectangle of the 2-D key domain, so a
    # point/range filter on EITHER column can skip most files on stats
    # alone. A single-column sort cannot do this: its files span the
    # full domain of the second column.
    li = load_table(spark, SF_DIR, "lineitem").select("l_partkey", "l_suppkey")
    zpath = str(tmp_path / "zorder")
    write_zordered(li, zpath, ["l_partkey", "l_suppkey"], num_files=4)

    row = li.agg(
        F.min("l_partkey"), F.max("l_partkey"), F.min("l_suppkey"), F.max("l_suppkey")
    ).first()
    pk_span = row[1] - row[0] or 1
    sk_span = row[3] - row[2] or 1

    ranges = _file_ranges(zpath, ["l_partkey", "l_suppkey"])
    assert len(ranges) == 4
    areas = []
    for _f, r in ranges:
        pk_lo, pk_hi = r["l_partkey"]
        sk_lo, sk_hi = r["l_suppkey"]
        areas.append(((pk_hi - pk_lo) / pk_span) * ((sk_hi - sk_lo) / sk_span))
    # each file ~ a quadrant: area well under the full domain; the
    # average must beat the 1.0 a 1-D sort yields on the 2nd column
    assert max(areas) <= 0.60, areas
    assert sum(areas) / len(areas) <= 0.40, areas

    # and the data itself round-trips
    back = spark.read.parquet(zpath)
    assert back.count() == li.count()


def test_zorder_beats_single_column_sort_on_second_column(spark, tmp_path):
    li = load_table(spark, SF_DIR, "lineitem").select("l_partkey", "l_suppkey")
    zpath, spath = str(tmp_path / "z"), str(tmp_path / "s")
    write_zordered(li, zpath, ["l_partkey", "l_suppkey"], num_files=4)
    (
        li.repartitionByRange(4, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite")
        .parquet(spath)
    )
    row = li.agg(F.min("l_suppkey"), F.max("l_suppkey")).first()
    span = row[1] - row[0] or 1

    def avg_sk_cover(path):
        rs = _file_ranges(path, ["l_suppkey"])
        return sum((hi - lo) / span for _f, (lo, hi) in ((f, r["l_suppkey"]) for f, r in rs)) / len(rs)

    # the 1-D layout leaves every file spanning ~the whole supplier
    # domain; the z-order layout must cut that coverage roughly in half
    assert avg_sk_cover(spath) > 0.9
    assert avg_sk_cover(zpath) < 0.6


def test_zvalue_bits_capped_to_signed_bigint(spark):
    # 4 cols at the default bits=16 would put the top interleaved bit in
    # the bigint sign bit (negative keys sort first, breaking Z-curve
    # monotonicity); 5+ cols would shiftleft past 63 and wrap silently.
    # zvalue must auto-cap bits so len(cols) * bits <= 63 — every key
    # stays non-negative and the interleave is monotone.
    from extract_permits_spark.sinks.layout import zvalue

    li = load_table(spark, SF_DIR, "lineitem")
    cols = ["l_partkey", "l_suppkey", "l_quantity", "l_orderkey", "l_linenumber"]
    row = li.agg(
        *[f for c in cols for f in (F.min(c).alias(f"lo_{c}"), F.max(c).alias(f"hi_{c}"))]
    ).first()
    bounds = [(float(row[f"lo_{c}"]), float(row[f"hi_{c}"])) for c in cols]
    for n in (4, 5):
        z = zvalue([F.col(c) for c in cols[:n]], bounds[:n], bits=16)
        mn = li.select(F.min(z).alias("m")).first()["m"]
        assert mn >= 0, f"{n} cols: negative z-key {mn} (sign-bit overflow)"


def test_compaction_hits_target_file_count_and_preserves_rows(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents")
    frag = str(tmp_path / "fragmented")
    docs.repartition(64).write.parquet(frag)  # the small-file problem
    assert len(glob.glob(os.path.join(frag, "part-*.parquet"))) == 64

    dst = str(tmp_path / "compacted")
    target = max(1, dir_bytes(frag) // 4)  # aim for ~4 files
    n = compact_parquet(spark, frag, dst, target_file_bytes=target)
    files = glob.glob(os.path.join(dst, "part-*.parquet"))
    assert len(files) == n <= 6
    back = spark.read.parquet(dst)
    assert back.count() == docs.count()
    assert sorted(r[0] for r in back.select("doc_id").collect()) == sorted(
        r[0] for r in docs.select("doc_id").collect()
    )


def test_compaction_with_sort_restores_pruning_layout(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents")
    frag = str(tmp_path / "frag2")
    docs.repartition(32).write.parquet(frag)
    dst = str(tmp_path / "sorted")
    compact_parquet(
        spark, frag, dst, target_file_bytes=dir_bytes(frag) // 2, sort_cols=["doc_id"]
    )
    # files are range-disjoint on the sort key -> stats-based pruning works
    ranges = sorted(
        r["doc_id"] for _f, r in _file_ranges(dst, ["doc_id"])
    )
    for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, ranges


def test_dynamic_partition_overwrite_touches_only_written_partitions(spark, tmp_path):
    from extract_permits_spark.sinks.writers import overwrite_partitions

    docs = load_table(spark, SF_DIR, "documents")
    path = str(tmp_path / "by_source")
    overwrite_partitions(docs, path, ["source"])
    sources = [r[0] for r in docs.select("source").distinct().collect()]
    assert len(sources) >= 2
    target, keep = sources[0], sources[1]
    before = {
        p: os.path.getmtime(p)
        for p in glob.glob(os.path.join(path, f"source={keep}", "*.parquet"))
    }
    assert before

    # rewrite ONE partition with modified rows
    patch = (
        docs.where(F.col("source") == target)
        .withColumn("n_chars", F.col("n_chars") + 1000000)
    )
    overwrite_partitions(patch, path, ["source"])

    # untouched partition: same files, same mtimes
    after = {
        p: os.path.getmtime(p)
        for p in glob.glob(os.path.join(path, f"source={keep}", "*.parquet"))
    }
    assert after == before
    # rewritten partition carries the new values; total row count unchanged
    back = spark.read.parquet(path)
    assert back.count() == docs.count()
    assert (
        back.where(F.col("source") == target)
        .agg(F.min("n_chars"))
        .first()[0]
        >= 1000000
    )


# ---------------------------------------------------------------------------
# docs_zorder_layout — the ORACLED logical twin of write_zordered
# ---------------------------------------------------------------------------


def test_morton_bit_placement(spark):
    # interleave(a, b): a's bit i lands at position 2i+1, b's at 2i.
    # Hand-computed: a=0b1010, b=0b0101 -> alternating -> 0b10011001 = 153;
    # a=15,b=0 -> odd positions set = 0b10101010 = 170; a=0,b=15 -> 85.
    from extract_permits_spark.plans.analytics_corpus import _morton_col

    df = spark.createDataFrame(
        [(0b1010, 0b0101), (15, 0), (0, 15), (0, 0), (15, 15)], "a int, b int"
    )
    got = [
        r.z for r in df.select(
            _morton_col(F.col("a"), F.col("b")).alias("z")
        ).collect()
    ]
    assert got == [153, 170, 85, 0, 255]


def test_zorder_bounds_worst_case_across_predicate_shapes(spark):
    # The layout claim the entry's docstring makes, pinned: at sf0.1
    # (79 files) the worst-case files-scanned over the three predicate
    # shapes (source point / chars range / both) is all-files for EITHER
    # single-dimension sort, but bounded for the Z-order layout.
    from extract_permits_spark.operators.windows import distributed_rank
    from extract_permits_spark.plans.analytics_corpus import (
        _ZORDER_HI,
        _ZORDER_LO,
        _ZORDER_ROWS_PER_FILE,
        _ZORDER_SRC,
        docs_zorder_layout,
    )

    sf_dir = "/root/testdata/sf0.1"

    def scans(stats_rows):
        src_pt = sum(
            1 for r in stats_rows
            if r.min_source <= _ZORDER_SRC <= r.max_source
        )
        chars_rg = sum(
            1 for r in stats_rows
            if r.min_chars <= _ZORDER_HI and r.max_chars >= _ZORDER_LO
        )
        return src_pt, chars_rg

    def linear_layout(order_cols):
        d = load_table(spark, sf_dir, "documents").select(
            "doc_id", "source", "n_chars"
        )
        filed = distributed_rank(
            d, [*order_cols, F.col("doc_id")], "r", zero_based=True
        ).select(
            "source", "n_chars",
            F.expr(f"CAST(r DIV {_ZORDER_ROWS_PER_FILE} AS INT)").alias(
                "file_id"
            ),
        )
        return filed.groupBy("file_id").agg(
            F.min("source").alias("min_source"),
            F.max("source").alias("max_source"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        ).collect()

    z = docs_zorder_layout(spark, sf_dir).collect()
    n_files = len(z)
    assert n_files >= 32  # the comparison is meaningless with a few files

    z_src, z_chars = scans(z)
    c_src, c_chars = scans(linear_layout([F.col("n_chars")]))
    s_src, s_chars = scans(linear_layout([F.col("source")]))

    # each single-dim sort fails its off-dimension shape completely...
    assert c_src == n_files       # chars-sort: source predicate never prunes
    assert s_chars == n_files     # source-sort: chars predicate never prunes
    # ...so each linear layout's worst case is all files, while Z-order
    # bounds BOTH shapes well below that.
    assert max(z_src, z_chars) <= n_files // 2
    # ...and Z-order stays within a small constant of each specialist on
    # its HOME shape (measured at sf0.1, 79 files: source point — z 12 vs
    # source-sort 5; chars range — z 32 vs chars-sort 17; the combined
    # point+range predicate lands at 6). The 3x/2x bounds are loose on
    # purpose: the claim is "competitive on every shape, catastrophic on
    # none", not parity with the specialist.
    assert z_src <= 3 * s_src
    assert z_chars <= 2 * c_chars
