"""Query registry: one entry per SURVEY.md §2 operator class (+ LLM ops).

Each query has a Spark implementation (idiomatic DataFrame API, built-in
functions only unless noted) and, where SQL-expressible, a DuckDB oracle
returning identical column names/values. Conventions to keep the
order-insensitive value hash stable across engines:

- every computed column is explicitly aliased, identically on both sides;
- date/timestamp outputs are formatted to strings (engine-independent);
- double aggregations are computed in DECIMAL(18,2) (exact, associative —
  no float summation-order drift) and cast to DOUBLE at the end;
- ratios are a single double division of exact operands (deterministic);
- string collation is binary on both engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from extract_permits_spark.operators.joins import (
    anti_join_existing,
    semi_join_membership,
    suggested_values_join,
)
from extract_permits_spark.operators.reshape import explode_multi_value
from extract_permits_spark.operators.windows import (
    distributed_rank,
    duplicate_pair_flag,
    first_row_per_group,
)
from extract_permits_spark.operators.enrich import matched_keywords
from extract_permits_spark.sources.readers import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, sql: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            # a second @register with an existing name would silently
            # SHADOW the first (dict overwrite) — this bit in r9 when a
            # new decontamination entry collided with the r6 one. Fail
            # at import time instead.
            raise ValueError(f"duplicate registry entry: {name!r}")
        _QUERIES[name] = fn
        if sql is not None:
            _ORACLES[name] = sql
        return fn

    return deco


# The driver's correctness check covers the first 50 registry entries per
# round; _CHECK_FIRST controls that window and is rotated each round so
# every entry earns a driver row (see the r9 NOTE below the list).
_CHECK_FIRST = [
    # r11 window (6 changed + 3 stale + 41 oldest = 50): the 6 entries
    # whose implementation changed this round (the four global ranks
    # rewired onto distributed_rank — docs_shard_shuffle,
    # docs_shard_manifest, docs_quality_bins, sample_negatives — plus
    # both semantic-decon gates, now uncapped with the dim probe on the
    # eval side), then the 3 r6-cohort entries displaced from the r10
    # window (last witnessed CORRECTNESS_r06), then the first 41 of the
    # 46-entry r7 cohort in driver order. ~3.5-round cadence.
    # --- changed this round ---
    "docs_shard_shuffle",
    "docs_shard_manifest",
    "docs_quality_bins",
    "sample_negatives",
    "emb_cross_decontaminate",
    "stream_semantic_decon_ingest",
    # --- r6 cohort (last witnessed r6, displaced from the r10 window) ---
    "ev_retention",
    "emb_prototypicality",
    "dedup_winnowing",
    # --- r7 cohort (last witnessed r7, driver order, first 41 of 46) ---
    "docs_pii_redact",
    "ev_cube",
    "q6_forecast_revenue",
    "q10_returned_items",
    "w6_rank_family",
    "ev_transitions",
    "x5_scd2_intervals",
    "j9_fuzzy_symspell",
    "graph_pagerank",
    "stream_stream_join",
    "ev_time_weighted_avg",
    "x6_merge_upsert",
    "a9_mode",
    "j10_null_safe_join",
    "stream_cdc_apply",
    "ev_variant_agg",
    "vocab_bpe_train",
    "a10_regression",
    "sketch_cms_topk",
    "ev_attribution",
    "x7_date_spine",
    "a11_histogram",
    "sample_leakage_safe_split",
    "profile_documents",
    "ev_anomaly_zscore",
    "graph_triangles",
    "j7b_asof_forward",
    "q1_incremental_maintenance",
    "ev_dau_wau",
    "docs_dup_rate_by_source",
    "sample_weighted_per_source",
    "q4_priority_exists",
    "q7_nation_trade",
    "q8_market_share",
    "q9_profit_by_nation",
    "q14_promo_revenue",
    "q17_small_quantity",
    "q19_disjunctive",
    "q22_idle_customers",
    "q15_top_supplier",
    "q2_min_balance_supplier",
]

# r12 NOTE: continue the staleness rotation — next up are the 5 r7-cohort
# entries displaced from this window (jsonl_corpus_roundtrip, q13_custdist,
# q16_supplier_cnt, ev_gap_fill, ev_entropy), then the oldest r8 cohort
# (45 more to fill 50); as always, any entry whose implementation changed
# since its last driver row jumps the queue.



def _reordered(d: dict) -> dict:
    head = {k: d[k] for k in _CHECK_FIRST if k in d}
    return head | {k: v for k, v in d.items() if k not in head}


def queries() -> dict[str, QueryFn]:
    return _reordered(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return _reordered(_ORACLES)


def _dec(c, scale: int = 2):
    """Exact-sum helper: double → decimal(18,s) so SUM is associative."""
    c = F.col(c) if isinstance(c, str) else c
    return c.cast(f"decimal(18,{scale})")


# ===========================================================================
# Flagship aggregation (bench q1) — TPC-H Q1-shaped pricing summary.
# Exercises: grouped aggregation with partial (map-side) combine, exact
# decimal arithmetic, projection pruning. One shuffle on the group keys.
# ===========================================================================


@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    qty, price, disc, tax = (
        _dec("l_quantity"),
        _dec("l_extendedprice"),
        _dec("l_discount"),
        _dec("l_tax"),
    )
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * (F.lit(1) - disc)).cast("double").alias("sum_disc_price"),
            F.sum(price * (F.lit(1) - disc) * (F.lit(1) + tax))
            .cast("double")
            .alias("sum_charge"),
            (F.sum(qty).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(disc).cast("double") / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ===========================================================================
# S1 — scan with pushed-down range filter + pruned projection + sort.
# Reference: Socrata SoQL $where/$order/$limit
# (chicago/permit_cleaning.py:539-554). .explain shows PushedFilters on
# l_shipdate and a 4-column ReadSchema.
# ===========================================================================


@register(
    "s1_scan_filter_order",
    """
    SELECT l_orderkey, l_partkey, l_quantity,
           strftime(l_shipdate, '%Y-%m-%d') AS ship_date
    FROM lineitem
    WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
    """,
)
def s1_scan_filter_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.where(
        F.col("l_shipdate").between(
            F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"),
            F.lit("1996-12-31 00:00:00").cast("timestamp_ntz"),
        )
    ).select(
        "l_orderkey",
        "l_partkey",
        "l_quantity",
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_date"),
    )


# ===========================================================================
# S2/J4 — dimension scan: left equi-join + equality filter at source.
# Reference: vw_pin_universe LEFT JOIN vw_pin_address + triad filter
# (chicago/permit_cleaning.py:516-536). nation is broadcast.
# ===========================================================================


@register(
    "s2_dim_join_filter",
    """
    SELECT c_custkey, c_name, c_acctbal, n_name
    FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
    WHERE c_mktsegment = 'BUILDING'
    """,
)
def s2_dim_join_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "left")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey", "c_name", "c_acctbal", "n_name")
    )


# ===========================================================================
# S3/A1 — scalar aggregate with filter.
# Reference: SELECT MAX(taxyr) … WHERE cur='Y' AND deactivat IS NULL
# (chicago/permit_cleaning.py:494-507).
# ===========================================================================


@register(
    "s3_scalar_max",
    """
    SELECT strftime(MAX(o_orderdate), '%Y-%m-%d') AS max_orderdate,
           COUNT(*) AS n_finished
    FROM orders WHERE o_orderstatus = 'F'
    """,
)
def s3_scalar_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.where(F.col("o_orderstatus") == "F").agg(
        F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("max_orderdate"),
        F.count(F.lit(1)).alias("n_finished"),
    )


# ===========================================================================
# X1/X2 — pipe-list parse + ordered dedupe + NULL-preserving explode +
# positional tag. Reference: expand_multi_pin_permits
# (chicago/permit_cleaning.py:557-611). posexplode_outer keeps the NULL-list
# rows the reference saves/unions back; the oracle mirrors that dance with
# a UNION ALL branch.
# ===========================================================================


@register(
    "x1_explode_pipe_list",
    """
    WITH lists AS (
      SELECT l_orderkey,
             string_agg(DISTINCT lpad(CAST(l_partkey AS VARCHAR), 14, '0'), ' | '
                        ORDER BY lpad(CAST(l_partkey AS VARCHAR), 14, '0')) AS pin_list
      FROM lineitem GROUP BY l_orderkey
    ), joined AS (
      SELECT o.o_orderkey, l.pin_list
      FROM orders o LEFT JOIN lists l ON o.o_orderkey = l.l_orderkey
    )
    SELECT o_orderkey,
           unnest(string_split(pin_list, ' | ')) AS solo_pin,
           'pin' || CAST(unnest(range(1, len(string_split(pin_list, ' | ')) + 1)) AS VARCHAR) AS pin_type
    FROM joined WHERE pin_list IS NOT NULL
    UNION ALL
    SELECT o_orderkey, NULL AS solo_pin, NULL AS pin_type
    FROM joined WHERE pin_list IS NULL
    """,
)
def x1_explode_pipe_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    lists = li.groupBy("l_orderkey").agg(
        F.array_join(
            F.array_sort(F.collect_set(F.lpad(F.col("l_partkey").cast("string"), 14, "0"))),
            " | ",
        ).alias("pin_list")
    )
    joined = o.join(lists, o.o_orderkey == lists.l_orderkey, "left").select(
        "o_orderkey", "pin_list"
    )
    return explode_multi_value(joined, "pin_list", out_col="solo_pin").select(
        "o_orderkey", "solo_pin", "pin_type"
    )


# ===========================================================================
# P2-P12 — scalar cleaning bundle: address assembly, zero-pad, dictionary
# regex abbreviation, round, conditional link synthesis, constant column.
# Reference: chicago/permit_cleaning.py:615-698,782-806,1173-1175.
# ===========================================================================

_SEGMENT_ABBREV = [
    ("BUILDING", "BLDG"),
    ("AUTOMOBILE", "AUTO"),
    ("MACHINERY", "MACH"),
    ("HOUSEHOLD", "HSHLD"),
    ("FURNITURE", "FURN"),
]

_ABBREV_SQL = "c_mktsegment"
for _k, _v in _SEGMENT_ABBREV:
    _ABBREV_SQL = f"regexp_replace({_ABBREV_SQL}, '{_k}', '{_v}', 'g')"


@register(
    "p_clean_bundle",
    f"""
    SELECT c_custkey,
           lpad(CAST(c_custkey AS VARCHAR), 14, '0') AS pin,
           concat_ws(' ', CAST(c_custkey AS VARCHAR), COALESCE(NULL, ''), c_mktsegment) AS address,
           {_ABBREV_SQL} AS segment_abbrev,
           round(c_acctbal) AS bal_rounded,
           CASE WHEN c_acctbal < 0 THEN 'REVIEW' ELSE 'OK' END AS acct_flag,
           'CHICAGO, IL' AS city_state,
           CASE WHEN c_name IS NOT NULL AND c_name <> ''
                THEN printf('=HYPERLINK("https://example.com/%s", "%s")',
                            lpad(CAST(c_custkey AS VARCHAR), 14, '0'), c_name)
                ELSE '' END AS link
    FROM customer
    """,
)
def p_clean_bundle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from functools import reduce

    c = load_table(spark, sf_dir, "customer")
    seg = reduce(
        lambda acc, kv: F.regexp_replace(acc, kv[0], kv[1]),
        _SEGMENT_ABBREV,
        F.col("c_mktsegment"),
    )
    pin = F.lpad(F.col("c_custkey").cast("string"), 14, "0")
    return c.select(
        "c_custkey",
        pin.alias("pin"),
        F.concat_ws(
            " ",
            F.col("c_custkey").cast("string"),
            F.coalesce(F.lit(None).cast("string"), F.lit("")),
            F.col("c_mktsegment"),
        ).alias("address"),
        seg.alias("segment_abbrev"),
        F.round(F.col("c_acctbal")).alias("bal_rounded"),
        F.when(F.col("c_acctbal") < 0, "REVIEW").otherwise("OK").alias("acct_flag"),
        F.lit("CHICAGO, IL").alias("city_state"),
        F.when(
            F.col("c_name").isNotNull() & (F.col("c_name") != ""),
            F.format_string(
                '=HYPERLINK("https://example.com/%s", "%s")', pin, F.col("c_name")
            ),
        )
        .otherwise("")
        .alias("link"),
    )


# ===========================================================================
# P9 — keyword tagging via higher-order filter over a literal array.
# Reference: chicago/permit_cleaning.py:707-746,810-816.
# ===========================================================================

_DOC_KEYWORDS = ["window", "merge", "vector", "stream", "hash join", "spark"]

_KW_SQL = ", ".join(
    f"CASE WHEN contains(lower(COALESCE(text, '')), '{k}') THEN '{k}' END"
    for k in _DOC_KEYWORDS
)


@register(
    "p9_keyword_tag",
    f"""
    SELECT doc_id, concat_ws(', ', {_KW_SQL}) AS matched_keywords
    FROM documents
    """,
)
def p9_keyword_tag(spark: SparkSession, sf_dir: str) -> DataFrame:
    from extract_permits_spark.operators.enrich import tag_keywords

    d = load_table(spark, sf_dir, "documents")
    return tag_keywords(
        d.select("doc_id", "text"), "text", keywords=_DOC_KEYWORDS
    ).select("doc_id", "matched_keywords")


# ===========================================================================
# J1/A2 — pre-aggregated left join: per-key sorted unique value list
# collapsed to a comma string, joined broadcast onto facts.
# Reference: add_address_link_and_suggested_pins
# (chicago/permit_cleaning.py:750-780).
# ===========================================================================


@register(
    "j1_preagg_join",
    """
    SELECT n.n_nationkey, n.n_name,
           COALESCE(s.suppliers, '') AS suppliers
    FROM nation n
    LEFT JOIN (
      SELECT s_nationkey,
             string_agg(DISTINCT s_name, ', ' ORDER BY s_name) AS suppliers
      FROM supplier GROUP BY s_nationkey
    ) s ON n.n_nationkey = s.s_nationkey
    """,
)
def j1_preagg_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier")
    return suggested_values_join(
        n, s, fact_key="n_nationkey", dim_key="s_nationkey", dim_value="s_name",
        out_col="suppliers",
    ).select("n_nationkey", "n_name", "suppliers")


# ===========================================================================
# J2/EX1 — multi-key anti-join. Reference: deduplicate_permits
# (chicago/permit_cleaning.py:820-883); left_anti gives indicator-merge
# semantics natively.
# ===========================================================================


@register(
    "j2_anti_join",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def j2_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return anti_join_existing(
        c.select("c_custkey", "c_name"),
        o.select(F.col("o_custkey").alias("c_custkey")),
        ["c_custkey"],
    )


# ===========================================================================
# J6 — set-membership flag (semi-join as a boolean column).
# Reference: chicago/permit_cleaning.py:438,444-448.
# ===========================================================================


@register(
    "j6_semi_flag",
    """
    SELECT c.c_custkey, o.o_custkey IS NOT NULL AS has_order
    FROM customer c
    LEFT JOIN (SELECT DISTINCT o_custkey FROM orders) o
      ON c.c_custkey = o.o_custkey
    """,
)
def j6_semi_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return semi_join_membership(
        c.select("c_custkey"), o, left_key="c_custkey", right_key="o_custkey",
        flag_col="has_order",
    ).select("c_custkey", "has_order")


# ===========================================================================
# W2 — first row per group under explicit order.
# Reference: group_by %>% slice(1)
# (chicago/legacy_permits/2021/format_legacy_2021.R:48-56).
# ===========================================================================


@register(
    "w2_first_per_group",
    """
    SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
    FROM lineitem
    QUALIFY row_number() OVER (PARTITION BY l_orderkey
                               ORDER BY l_linenumber, l_partkey, l_quantity) = 1
    """,
)
def w2_first_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return first_row_per_group(
        li.select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity"),
        ["l_orderkey"],
        ["l_linenumber", "l_partkey", "l_quantity"],
    )


# ===========================================================================
# W4/A5 — duplicate-pair flag over a key window (keep=False semantics).
# Reference: chicago/legacy_permits/helper.py:150-153.
# ===========================================================================


@register(
    "w4_dup_flag",
    """
    SELECT l_orderkey, l_partkey, l_linenumber,
           COUNT(*) OVER (PARTITION BY l_orderkey, l_partkey) > 1 AS is_duplicate
    FROM lineitem
    """,
)
def w4_dup_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return duplicate_pair_flag(
        li.select("l_orderkey", "l_partkey", "l_linenumber"),
        ["l_orderkey", "l_partkey"],
    )


# ===========================================================================
# E1/E2 — registry-compiled validation: error messages via concat_ws
# (TEXTJOIN semantics — NULLs skipped) + two-way bucket.
# Reference: partition_permits (chicago/permit_cleaning.py:427-452) and
# _build_textjoin_errors_formula (:897-908).
# ===========================================================================


@register(
    "e1_validate_partition",
    """
    WITH checked AS (
      SELECT o_orderkey,
             concat_ws(', ',
               CASE WHEN o_totalprice IS NOT NULL
                         AND (o_totalprice < 1 OR o_totalprice > 2147483647)
                    THEN 'Amount out of bounds' END,
               CASE WHEN o_orderdate IS NULL THEN 'Missing issue date' END,
               CASE WHEN length(o_orderpriority) > 15
                    THEN 'Priority too long' END,
               CASE WHEN o_orderstatus NOT IN ('F', 'O', 'P')
                    THEN 'Unknown status' END
             ) AS errors
      FROM orders
    )
    SELECT o_orderkey, errors,
           CASE WHEN errors = '' THEN 'upload' ELSE 'review' END AS bucket
    FROM checked
    """,
)
def e1_validate_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = F.col
    errors = F.concat_ws(
        ", ",
        F.when(
            c("o_totalprice").isNotNull()
            & ((c("o_totalprice") < 1) | (c("o_totalprice") > 2147483647)),
            "Amount out of bounds",
        ),
        F.when(c("o_orderdate").isNull(), "Missing issue date"),
        F.when(F.length("o_orderpriority") > 15, "Priority too long"),
        F.when(~c("o_orderstatus").isin("F", "O", "P"), "Unknown status"),
    )
    return o.select(
        "o_orderkey",
        errors.alias("errors"),
        F.when(errors == "", "upload").otherwise("review").alias("bucket"),
    )


# ===========================================================================
# dedup_exact — exact deduplication via content hash (LLM-pipeline op).
# One shuffle on the hash; at 100 TB, hash first so the shuffle carries
# 32-byte keys + ids instead of document bodies.
# ===========================================================================


@register(
    "dedup_exact",
    """
    SELECT md5(text) AS text_hash, MIN(doc_id) AS keep_doc_id,
           COUNT(*) AS n_copies
    FROM documents GROUP BY md5(text)
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.md5(F.col("text").cast("binary")).alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


# ===========================================================================
# Batch 2 — remaining SURVEY §2 surface + LLM-pipeline operators.
# ===========================================================================

from extract_permits_spark.functions import text as textfn  # noqa: E402
from extract_permits_spark.functions import similarity as simfn  # noqa: E402
from extract_permits_spark.functions import multimodal as mmfn  # noqa: E402
from extract_permits_spark.operators.joins import crosswalk_override  # noqa: E402
from extract_permits_spark.operators.reshape import unpivot_wide_columns  # noqa: E402
from extract_permits_spark.operators.windows import batch_ids  # noqa: E402


# ---------------------------------------------------------------------------
# S4 — column-pruned range scan (dedup probe shape).
# Reference: chicago/permit_cleaning.py:821-836.
# ---------------------------------------------------------------------------


@register(
    "s4_range_scan",
    """
    SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           o_totalprice
    FROM orders
    WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-06-30'
    """,
)
def s4_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.where(
        F.col("o_orderdate").between(
            F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"),
            F.lit("1996-06-30 00:00:00").cast("timestamp_ntz"),
        )
    ).select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        "o_totalprice",
    )


# ---------------------------------------------------------------------------
# P3+date surface — ISO parse, display format, Excel-serial decode, year.
# Reference: chicago/permit_cleaning.py:639-641, format_legacy_2023.R:35-39.
# ---------------------------------------------------------------------------


@register(
    "p3_date_functions",
    """
    SELECT o_orderkey,
           strftime(o_orderdate, '%-m/%-d/%Y') AS display_date,
           CAST(year(o_orderdate) AS INTEGER) AS order_year,
           strftime(DATE '1899-12-30' + to_days(CAST(o_orderkey % 40000 AS INTEGER)),
                    '%Y-%m-%d') AS excel_serial_date
    FROM orders
    """,
)
def p3_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from extract_permits_spark.operators.clean import excel_serial_to_date

    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_format("o_orderdate", "M/d/yyyy").alias("display_date"),
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.date_format(
            excel_serial_to_date((F.col("o_orderkey") % 40000).cast("string")),
            "yyyy-MM-dd",
        ).alias("excel_serial_date"),
    )


# ---------------------------------------------------------------------------
# X3 — wide-to-long unpivot. Reference: expand_pins
# (chicago/legacy_permits/helper.R:40-62).
# ---------------------------------------------------------------------------


@register(
    "x3_unpivot",
    """
    SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value
    FROM part WHERE p_size IS NOT NULL
    UNION ALL
    SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS value
    FROM part WHERE p_retailprice IS NOT NULL
    """,
)
def x3_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    wide = p.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        F.col("p_retailprice").alias("p_retailprice"),
    )
    return unpivot_wide_columns(
        wide, ["p_partkey"], ["p_size", "p_retailprice"], "metric", "value"
    )


# ---------------------------------------------------------------------------
# J3 — crosswalk join + coalesce override.
# Reference: chicago/legacy_permits/2021/format_legacy_2021.R:44-47.
# nation plays the crosswalk: suppliers in nations 0-4 get remapped names.
# ---------------------------------------------------------------------------


@register(
    "j3_crosswalk_override",
    """
    SELECT s.s_suppkey,
           COALESCE(x.meta_name, s.s_name) AS s_name
    FROM supplier s
    LEFT JOIN (
      SELECT n_nationkey, 'NATION-' || n_name AS meta_name
      FROM nation WHERE n_nationkey < 5
    ) x ON s.s_nationkey = x.n_nationkey
    """,
)
def j3_crosswalk_override(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    crosswalk = n.where(F.col("n_nationkey") < 5).select(
        F.col("n_nationkey").alias("original_key"),
        F.concat(F.lit("NATION-"), F.col("n_name")).alias("meta_name"),
    )
    joined = s.join(
        F.broadcast(crosswalk), s.s_nationkey == crosswalk.original_key, "left"
    )
    return joined.select(
        "s_suppkey", F.coalesce("meta_name", "s_name").alias("s_name")
    )


# ---------------------------------------------------------------------------
# W3/O5 — global line numbers + 250-row upload batches.
# Reference: chicago/legacy_permits/helper.py:167,171 +
# format_reviewed_permits_for_upload.py:279-299.
# ---------------------------------------------------------------------------


@register(
    "w3_line_numbers_batches",
    """
    WITH numbered AS (
      SELECT c_custkey,
             row_number() OVER (ORDER BY c_name, c_custkey) AS gline
      FROM customer
    )
    SELECT c_custkey,
           CAST(floor((gline - 1) / 250) AS INTEGER) AS batch,
           CAST(gline - floor((gline - 1) / 250) * 250 AS INTEGER) AS lline
    FROM numbered
    """,
)
def w3_line_numbers_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return batch_ids(
        c.select("c_custkey", "c_name"), ["c_name", "c_custkey"], batch_size=250
    ).select("c_custkey", "batch", "lline")


# ---------------------------------------------------------------------------
# U2 — union + distinct. Reference: bind_rows + distinct
# (chicago/legacy_permits/helper.R:56-60, verify_legacy_uploads.R:87-93).
# ---------------------------------------------------------------------------


@register(
    "u2_union_distinct",
    """
    SELECT DISTINCT k, src FROM (
      SELECT o_custkey AS k, 'orders' AS src FROM orders
      UNION ALL
      SELECT c_custkey AS k, 'orders' AS src FROM customer WHERE c_acctbal > 0
    )
    """,
)
def u2_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    a = o.select(F.col("o_custkey").alias("k"), F.lit("orders").alias("src"))
    b = c.where(F.col("c_acctbal") > 0).select(
        F.col("c_custkey").alias("k"), F.lit("orders").alias("src")
    )
    return a.unionByName(b).dropDuplicates()


# ---------------------------------------------------------------------------
# E3 — legacy flag-column validation (flags kept as real columns).
# Reference: finalize_columns chicago/legacy_permits/helper.py:110-173.
# ---------------------------------------------------------------------------


@register(
    "e3_legacy_flags",
    """
    WITH shaped AS (
      SELECT lpad(CAST(o_custkey AS VARCHAR), 14, '0') AS pin,
             '1' || lpad(CAST(o_orderkey AS VARCHAR), 8, '0') AS permit_number,
             o_totalprice AS amount,
             CAST(o_custkey AS VARCHAR) || ' N ' || o_orderpriority AS addr,
             o_orderpriority AS name,
             'ORDER NOTE ' || CAST(o_orderkey AS VARCHAR) AS note
      FROM orders
    ), flagged AS (
      -- pandas astype(str) renders NaN as 'nan' (len 3): COALESCE(x, 'nan')
      SELECT pin, permit_number,
             length(COALESCE(CAST(pin AS VARCHAR), 'nan')) = 14 AS valid_pin,
             length(COALESCE(CAST(permit_number AS VARCHAR), 'nan')) IN (9, 10)
               AS valid_permit_number,
             length(COALESCE(CAST(addr AS VARCHAR), 'nan')) <= 40 AS valid_address,
             length(COALESCE(CAST(note AS VARCHAR), 'nan')) <= 2000 AS valid_note,
             length(COALESCE(CAST(name AS VARCHAR), 'nan')) <= 50 AS valid_name,
             TRY_CAST(CAST(amount AS VARCHAR) AS DOUBLE) IS NOT NULL
               AND TRY_CAST(CAST(amount AS VARCHAR) AS DOUBLE) < 2147483647
               AS valid_amount,
             NOT COALESCE(COUNT(*) OVER (PARTITION BY pin, permit_number) > 1,
                          FALSE) AS valid_not_duplicate
      FROM shaped
    )
    -- valid_amount intentionally absent: ref helper.py:155-164 omits it
    SELECT *,
           valid_pin AND valid_permit_number AND valid_address AND valid_note
           AND valid_name AND valid_not_duplicate AS valid_row
    FROM flagged
    """,
)
def e3_legacy_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    from extract_permits_spark.operators.validate import legacy_flag_columns
    from extract_permits_spark.operators.windows import duplicate_pair_flag

    o = load_table(spark, sf_dir, "orders")
    shaped = o.select(
        F.lpad(F.col("o_custkey").cast("string"), 14, "0").alias("pin"),
        F.concat(F.lit("1"), F.lpad(F.col("o_orderkey").cast("string"), 8, "0")).alias(
            "permit_number"
        ),
        F.col("o_totalprice").alias("amount"),
        F.concat(F.col("o_custkey").cast("string"), F.lit(" N "), "o_orderpriority").alias(
            "addr"
        ),
        F.col("o_orderpriority").alias("name"),
        F.concat(F.lit("ORDER NOTE "), F.col("o_orderkey").cast("string")).alias("note"),
    )
    flagged = duplicate_pair_flag(shaped, ["pin", "permit_number"], "is_duplicate")
    out = legacy_flag_columns(
        flagged,
        pin_col="pin",
        permit_col="permit_number",
        amount_col="amount",
        addr_col="addr",
        note_col="note",
        name_col="name",
        in_universe_col=None,
        dup_col="is_duplicate",
    )
    return out.select(
        "pin", "permit_number", "valid_pin", "valid_permit_number", "valid_address",
        "valid_note", "valid_name", "valid_amount", "valid_not_duplicate", "valid_row",
    )


# ---------------------------------------------------------------------------
# Text analysis (LLM-pipeline ops) — all narrow codegen'd scans.
# ---------------------------------------------------------------------------


@register(
    "text_tokens",
    """
    SELECT doc_id,
           CASE WHEN trim(COALESCE(text,'')) = '' THEN 0
                ELSE len(string_split_regex(trim(COALESCE(text,'')), '\\s+'))
           END AS n_tokens,
           length(COALESCE(text,'')) AS n_chars,
           CAST(ceil(length(COALESCE(text,'')) / 4.0) AS BIGINT) AS bpe_estimate
    FROM documents
    """,
)
def text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        # long: DuckDB len() is BIGINT — keep schemas identical across engines
        textfn.token_count("text").cast("long").alias("n_tokens"),
        textfn.char_count("text").cast("long").alias("n_chars"),
        textfn.bpe_token_estimate("text").alias("bpe_estimate"),
    )


@register(
    "text_quality",
    """
    WITH t AS (
      SELECT doc_id, COALESCE(text,'') AS txt,
             CASE WHEN trim(COALESCE(text,'')) = '' THEN []
                  ELSE string_split_regex(trim(lower(COALESCE(text,''))), '\\s+')
             END AS toks
      FROM documents
    )
    SELECT doc_id,
           CASE WHEN length(txt) = 0 THEN 0.0
                ELSE round(CAST(length(regexp_replace(txt, '[^A-Za-z]', '', 'g')) AS DOUBLE)
                           / length(txt), 6) END AS alpha_ratio,
           CASE WHEN len(toks) = 0 THEN 0.0
                ELSE round(CAST(len(list_filter(toks, x -> list_contains(
                       ['the','a','and','of','to','in','is','that','it','for'], x)))
                       AS DOUBLE) / len(toks), 6) END AS stopword_ratio,
           CASE WHEN len(toks) = 0 THEN 0.0
                ELSE round(CAST(list_sum(list_transform(toks, x -> length(x)))
                       AS DOUBLE) / len(toks), 6) END AS mean_word_len
    FROM t
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        textfn.alpha_ratio("text").alias("alpha_ratio"),
        textfn.stopword_ratio("text").alias("stopword_ratio"),
        textfn.mean_word_length("text").alias("mean_word_len"),
    )


@register(
    "text_fingerprint",
    """
    SELECT doc_id,
           md5(trim(regexp_replace(lower(COALESCE(text,'')), '[^a-z0-9]+', ' ', 'g')))
             AS fingerprint
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", textfn.fingerprint("text").alias("fingerprint"))


_LANG_CASES_SQL = """
    WITH t AS (
      SELECT doc_id,
             CASE WHEN trim(COALESCE(text,'')) = '' THEN []
                  ELSE string_split_regex(trim(lower(COALESCE(text,''))), '\\s+')
             END AS toks
      FROM documents
    ), scored AS (
      SELECT doc_id,
             len(list_filter(toks, x -> list_contains(['the','and','of','is','that'], x))) AS s_en,
             len(list_filter(toks, x -> list_contains(['der','die','und','ist','nicht'], x))) AS s_de,
             len(list_filter(toks, x -> list_contains(['le','la','et','est','les'], x))) AS s_fr,
             len(list_filter(toks, x -> list_contains(['el','la','que','es','los'], x))) AS s_es
      FROM t
    )
    SELECT doc_id,
           CASE WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
                WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
                WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
                WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
                ELSE 'es' END AS pred_lang
    FROM scored
"""


@register("text_language_id", _LANG_CASES_SQL)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", textfn.language_id("text").alias("pred_lang"))


# ---------------------------------------------------------------------------
# Events: tumbling windows, JSON extraction, sessionization.
# ---------------------------------------------------------------------------


@register(
    "ev_tumbling_agg",
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def ev_tumbling_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from extract_permits_spark.streaming.events import tumbling_counts

    e = load_table(spark, sf_dir, "events")
    return tumbling_counts(e)


@register(
    "ev_json_extract",
    """
    SELECT event_id, event_type,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
    FROM events
    """,
)
def ev_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )


@register(
    "ev_sessionize",
    """
    WITH gaps AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM gaps
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           COUNT(*) AS n_events,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def ev_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = e.withColumn("_lag", F.lag("ts").over(w)).withColumn(
        "new_session",
        F.when(
            F.col("_lag").isNull() | F.expr("ts - _lag > INTERVAL 30 MINUTES"),
            1,
        ).otherwise(0),
    )
    sess = gaps.withColumn(
        "session_id",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
    )


# ---------------------------------------------------------------------------
# Similarity search over embeddings.
# ---------------------------------------------------------------------------


@register(
    "ann_cosine_topk",
    """
    WITH q AS (
      SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0
    ), scored AS (
      SELECT vec_id,
             list_sum(list_transform(range(1, 65),
                      i -> CAST(e.embedding[i] AS DOUBLE) * q.qv[i]))
             / (sqrt(list_sum(list_transform(range(1, 65),
                      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))
                * sqrt(list_sum(list_transform(range(1, 65), i -> q.qv[i] * q.qv[i]))))
             AS sim
      FROM embeddings e, q
    )
    SELECT vec_id, round(sim, 6) AS cosine_sim
    FROM scored
    ORDER BY sim DESC, vec_id
    LIMIT 20
    """,
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = [
        float(x)
        for x in emb.where(F.col("vec_id") == 0).select("embedding").first()[0]
    ]
    return simfn.brute_force_topk(emb, qvec, k=20)


from extract_permits_spark.plans import ann_sql as _ann_sql  # noqa: E402


@register("ann_lsh_topk", _ann_sql.lsh_topk_sql())
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table hyperplane-LSH top-k. The oracle is a REAL twin: the
    generated SQL (plans/ann_sql.py) replays the full signature/probe/rank
    computation — deterministic planes embedded as 16-bit ints, multi-probe
    at Hamming ≤ 2 expressed as bit_count(xor(sig, qsig)) <= 2 — so a
    candidate-generation bug hash-mismatches, not just a ranking bug."""
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = [
        float(x)
        for x in emb.where(F.col("vec_id") == 0).select("embedding").first()[0]
    ]
    return simfn.lsh_bucketed_topk(emb, qvec, k=20)


def _ann_recall_frame(approx: DataFrame, exact: DataFrame, k: int) -> DataFrame:
    """recall@k = |approx ∩ exact| / k, computed declaratively."""
    hit = exact.select("vec_id").join(
        approx.select("vec_id"), "vec_id", "left_semi"
    )
    return hit.agg(
        F.lit(k).alias("k"),
        (F.count(F.lit(1)).cast("double") / F.lit(k)).alias("recall"),
    )


@register("ann_lsh_recall", _ann_sql.lsh_recall_sql())
def ann_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@20 of random-hyperplane LSH vs exact brute-force top-k —
    the checkable quality number for ann_lsh_topk (floor asserted in
    tests/test_recall.py). Oracled by a full SQL replay of both the
    approximate and exact top-k, so the recall VALUE must match, not just
    clear a floor."""
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = [
        float(x)
        for x in emb.where(F.col("vec_id") == 0).select("embedding").first()[0]
    ]
    return _ann_recall_frame(
        simfn.lsh_bucketed_topk(emb, qvec, k=20),
        simfn.brute_force_topk(emb, qvec, k=20),
        k=20,
    )


@register("ann_ivf_recall", _ann_sql.ivf_recall_sql(num_probes=6))
def ann_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@20 of IVF (k-means centroids, 6-of-16 probed clusters) vs
    exact top-k — the checkable quality number for ann_ivf_topk (floor
    asserted in tests/test_recall.py). Oracled by a full SQL replay of the
    Lloyd fit + probe + rank, so the recall VALUE must match."""
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = [
        float(x)
        for x in emb.where(F.col("vec_id") == 0).select("embedding").first()[0]
    ]
    index = simfn.ivf_index(
        emb, num_clusters=16, centroids=_ivf_centroids_cached(spark, emb, sf_dir)
    )
    return _ann_recall_frame(
        simfn.ivf_topk(emb, qvec, k=20, num_clusters=16, num_probes=6, index=index),
        simfn.brute_force_topk(emb, qvec, k=20),
        k=20,
    )


# ---------------------------------------------------------------------------
# Near-duplicate detection (approximate — rows-only checks by design;
# exact-dedup above is the oracle-checked member of the family).
# ---------------------------------------------------------------------------


@register(
    "dedup_minhash_lsh",
    """
    WITH sh AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(string_split_regex(trim(lower(COALESCE(text,''))), '\\s+')) - 2, 0) + 1),
               i -> array_to_string(list_slice(
                      string_split_regex(trim(lower(COALESCE(text,''))), '\\s+'), i, i + 2), ' ')
             )) AS shingles
      FROM documents
      WHERE len(string_split_regex(trim(lower(COALESCE(text,''))), '\\s+')) >= 3
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.shingles, b.shingles))), 6) AS jaccard
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
          / len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.4
    """,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """xxhash64 MinHash-LSH near-dup pairs (the production fast path).

    The oracle is the EXACT all-pairs shingle-Jaccard ≥ 0.4 set — an
    end-to-end recall check, stronger than a banding replay: precision is
    1.0 by construction (the verification step computes exact Jaccard), so
    the entry matches the oracle iff banded candidate generation missed
    nothing. On the deterministic fixtures every true pair has Jaccard ≥
    0.9 (planted near-dups), where the per-pair miss probability of 8
    bands × 4 rows is ≤ (1 - 0.9^4)^8 ≈ 2e-4, and the fixed seeds make the
    outcome reproducible, not flaky — verified equal at sf0.01/sf0.001. A
    banding regression (band slicing, bucket capping, signature bug) drops
    a pair and hash-mismatches. dedup_minhash_md5 separately replays the
    banding itself in SQL with a cross-engine hash family.
    """
    d = load_table(spark, sf_dir, "documents")
    return simfn.minhash_lsh_pairs(d, jaccard_threshold=0.4)


@register("emb_neardup_lsh", _ann_sql.lsh_neardup_pairs_sql())
def emb_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-duplicate detection at scale: the 25 most-similar
    pairs surfaced from shared hyperplane-LSH buckets (per-table Hamming
    ≤ 1 realized as a Hamming-ball bucket join — no all-pairs join), each
    verified with exact cosine. This is the SCALE path for what
    dedup_embedding_cosine's deliberately-bounded exact twin
    demonstrates; the oracle replays signatures + the pair condition
    pairwise (equivalent below the bucket cap) and re-ranks. Recall on
    true near-dups (cosine ≥ 0.95: miss ≈ 2e-6/pair) is pinned by a
    planted-duplicate test in tests/test_recall.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = simfn.lsh_neardup_pairs(emb)
    return pairs.orderBy(
        F.desc("cosine_sim"), F.col("id_a"), F.col("id_b")
    ).limit(25)


@register("emb_cross_decontaminate", _ann_sql.lsh_cross_decon_sql())
def emb_cross_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEMANTIC decontamination — the embedding-space twin of
    docs_decontaminate: every training vector (vec_id%10!=0) is checked
    against the eval set (vec_id%10==0) for near-duplicates at cosine ≥
    0.35, catching paraphrased eval leakage the exact n-gram gate cannot
    (the synthetic fixture has no planted cross-split near-dups, so the
    threshold sits where real cross-split similarity mass exists — the
    production knob would be ~0.8 on contrastive embeddings).
    Candidates come from a CROSS-dataset hyperplane-LSH bucket join — the
    small eval side explodes the Hamming-1 ball of its signatures and
    equi-joins the corpus's exact signatures (similarity.lsh_cross_hits),
    so the 100-TB corpus is never self-joined and never pairwise-scanned;
    each candidate pays one exact cosine fold. The oracle replays
    signatures + the pair condition pairwise and the same 6-dp-rounded
    cosine threshold, so a signature bug, a ball-explode bug, or a
    verification drift all hash-mismatch."""
    emb = load_table(spark, sf_dir, "embeddings")
    ev = emb.where(F.col("vec_id") % 10 == 0)
    tr = emb.where(F.col("vec_id") % 10 != 0)
    return simfn.lsh_cross_hits(ev, tr, min_cosine=0.35)


@register("dedup_simhash", _ann_sql.simhash_pairs_sql())
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded SimHash at the GUARANTEED radius (6 bands of 10 bits ⇒ recall
    1.0 for hamming ≤ 5 by pigeonhole), using the cross-engine md5-derived
    60-bit token hash so the oracle (plans/ann_sql.py) replays the WHOLE
    computation — token hashing, bit votes, banding, bucket join, xor
    verification — bit for bit. The xxhash64/64-bit variant stays the
    production fast path; its banding guarantee is pinned by
    tests/test_recall.py and the dedup_simhash_recall entry below."""
    d = load_table(spark, sf_dir, "documents")
    pairs = simfn.simhash_pairs(
        d,
        max_hamming=5,
        band_bits=10,
        n_bits=60,
        token_hash=simfn.md5_long60,
    )
    return pairs.select(
        "id_a", "id_b", F.col("hamming").cast("int").alias("hamming")
    )


@register(
    "dedup_simhash_recall",
    """
    SELECT 7 AS max_hamming, CAST(1.0 AS DOUBLE) AS recall
    """,
)
def dedup_simhash_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured recall of banded SimHash vs all-pairs bit_count(xor) ground
    truth (no driver-side action — two counts crossed declaratively). The
    banding guarantee makes this exactly 1.0 at the default radius, so the
    measurement is oracle-checkable as the constant 1.0; a recall collapse
    (e.g. a banding bug) would hash-mismatch."""
    d = load_table(spark, sf_dir, "documents")
    banded = simfn.simhash_pairs(d, max_hamming=7)
    exact = simfn.simhash_pairs_bruteforce(d, max_hamming=7)
    hit = exact.join(banded.select("id_a", "id_b"), ["id_a", "id_b"], "left_semi")
    n_exact = exact.agg(F.count(F.lit(1)).alias("_n_exact"))
    n_hit = hit.agg(F.count(F.lit(1)).alias("_n_hit"))
    return n_exact.crossJoin(n_hit).select(
        F.lit(7).alias("max_hamming"),
        F.coalesce(
            F.col("_n_hit").cast("double") / F.nullif(F.col("_n_exact"), F.lit(0)),
            F.lit(1.0),
        ).alias("recall"),
    )


@register(
    "dedup_ngram_jaccard",
    """
    WITH sh AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(string_split_regex(trim(lower(COALESCE(text,''))), '\\s+')) - 2, 0) + 1),
               i -> array_to_string(list_slice(
                      string_split_regex(trim(lower(COALESCE(text,''))), '\\s+'), i, i + 2), ' ')
             )) AS shingles
      FROM documents
      WHERE len(string_split_regex(trim(lower(COALESCE(text,''))), '\\s+')) >= 3
    )
    , ex AS (SELECT doc_id, len(shingles) AS sz, unnest(shingles) AS sh FROM sh)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(CAST(COUNT(*) AS DOUBLE) / (a.sz + b.sz - COUNT(*)), 6) AS jaccard
    FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id, a.sz, b.sz
    HAVING CAST(COUNT(*) AS DOUBLE) / (a.sz + b.sz - COUNT(*)) >= 0.2
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact pairwise n-gram Jaccard above a threshold — same result set
    as the oracle's full cross join, different cost shape.

    Count-based: shingles are distinct per doc (``word_shingles`` applies
    ``array_distinct``), so grouping the shared-shingle join by pair gives
    ``|A∩B|`` exactly, and ``J = shared / (|A| + |B| - shared)`` — no
    candidate ``distinct()``, no re-join of the shingle arrays, no
    per-pair array_intersect/array_union. Measured 27.9s → ~4s at sf0.1
    (the array re-join variant shuffled two ~150-element arrays per
    candidate and intersected them row by row)."""
    return _jaccard_pairs_cached(spark, sf_dir)


def _jaccard_pairs_uncached(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    sh = d.select(
        "doc_id", simfn.word_shingles("text", 3).alias("shingles")
    ).where(F.size("shingles") > 0)
    exploded = sh.select(
        "doc_id", F.size("shingles").alias("sz"), F.explode("shingles").alias("sh")
    )
    shared = (
        exploded.alias("a")
        .join(exploded.alias("b"), ["sh"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.sz").alias("_sza"),
            F.col("b.sz").alias("_szb"),
        )
        .agg(F.count(F.lit(1)).alias("_shared"))
    )
    jac = F.col("_shared") / (F.col("_sza") + F.col("_szb") - F.col("_shared"))
    return (
        shared.where(jac >= 0.2)
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# Multimodal: binary payload features via Arrow-batched mapInPandas.
# ---------------------------------------------------------------------------


@register(
    "mm_binary_features",
    """
    SELECT doc_id AS media_id,
           CAST(octet_length(encode(COALESCE(text,''))) AS BIGINT) AS n_bytes,
           lower(hex(encode(substring(COALESCE(text,''), 1, 8)))) AS head_hex
    FROM documents
    """,
)
def mm_binary_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    media = mmfn.documents_as_media(d)
    return mmfn.extract_features(media).select("media_id", "n_bytes", "head_hex")


# ---------------------------------------------------------------------------
# Bench join-aggregation queries (TPC-H Q3/Q5 shaped) — exercise join
# reordering, broadcast selection, and partial aggregation at sf0.1.
# ---------------------------------------------------------------------------


@register(
    "q3_shipping_priority",
    """
    SELECT l.l_orderkey,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS order_date
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
      AND l.l_shipdate > TIMESTAMP '1997-01-01'
    GROUP BY l.l_orderkey, o.o_orderdate
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    price, disc = _dec("l_extendedprice"), _dec("l_discount")
    return (
        c.where(F.col("c_mktsegment") == "BUILDING")
        .join(o, F.col("c_custkey") == F.col("o_custkey"))
        .where(F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        .join(
            li.where(F.col("l_shipdate") > F.lit("1997-01-01").cast("timestamp_ntz")),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(price * (F.lit(1) - disc)).cast("double").alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        )
    )


@register(
    "q5_nation_volume",
    """
    SELECT n.n_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND s.s_nationkey = c.c_nationkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
)
def q5_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    price, disc = _dec("l_extendedprice"), _dec("l_discount")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            s,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .where(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(F.sum(price * (F.lit(1) - disc)).cast("double").alias("revenue"))
    )


# ===========================================================================
# Batch 3 — streaming-as-query, embedding near-dup, P5, Socrata pull,
# and the flagship pipeline registered for the correctness record.
# ===========================================================================


@register(
    "p5_pin_normalize",
    """
    WITH variants AS (
      SELECT c_custkey,
             lpad(CAST(c_custkey AS VARCHAR), 9, '0') AS v9,
             lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS v10,
             lpad(CAST(c_custkey AS VARCHAR), 13, '0') AS v13,
             substring(lpad(CAST(c_custkey AS VARCHAR), 14, '0'), 1, 2) || '-' ||
               substring(lpad(CAST(c_custkey AS VARCHAR), 14, '0'), 3, 12) AS vhyph
      FROM customer
    )
    SELECT c_custkey,
           '0' || v9 || '0000' AS pin_from_9,
           v10 || '0000' AS pin_from_10,
           '0' || v13 AS pin_from_13,
           regexp_replace(vhyph, '[^0-9]', '', 'g') AS pin_from_hyph
    FROM variants
    """,
)
def p5_pin_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 legacy 4-case PIN normalization over synthesized surface forms
    (9/10/13-digit and hyphenated — FIXTURES.md §1 forms). The oracle
    states the *expected output* per case; the Spark side runs the real
    normalize_pin_legacy operator, so a regression in any case breaks the
    hash match. Reference: chicago/legacy_permits/helper.py:42-58."""
    from extract_permits_spark.operators.clean import normalize_pin_legacy

    c = load_table(spark, sf_dir, "customer")
    key = F.col("c_custkey").cast("string")
    pad14 = F.lpad(key, 14, "0")
    variants = c.select(
        "c_custkey",
        F.lpad(key, 9, "0").alias("v9"),
        F.lpad(key, 10, "0").alias("v10"),
        F.lpad(key, 13, "0").alias("v13"),
        F.concat(F.substring(pad14, 1, 2), F.lit("-"), F.substring(pad14, 3, 12)).alias(
            "vhyph"
        ),
    )
    return variants.select(
        "c_custkey",
        normalize_pin_legacy("v9").alias("pin_from_9"),
        normalize_pin_legacy("v10").alias("pin_from_10"),
        normalize_pin_legacy("v13").alias("pin_from_13"),
        normalize_pin_legacy("vhyph").alias("pin_from_hyph"),
    )


@register(
    "dedup_embedding_cosine",
    """
    WITH sub AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
      WHERE vec_id < 400
    ), norms AS (
      SELECT vec_id, e,
             sqrt(list_sum(list_transform(range(1, 65), i -> e[i] * e[i]))) AS nrm
      FROM sub
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_sum(list_transform(range(1, 65), i -> a.e[i] * b.e[i]))
                 / (a.nrm * b.nrm), 6) AS cosine_sim
    FROM norms a JOIN norms b ON a.vec_id < b.vec_id
    WHERE list_sum(list_transform(range(1, 65), i -> a.e[i] * b.e[i]))
          / (a.nrm * b.nrm) >= 0.35
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs above a threshold, on a bounded id
    range so the oracle's exact pairwise join stays tractable. The Spark
    side is the same all-pairs semantics expressed as a self-join with a
    codegen'd fold — the unbounded-scale variant is LSH-bucketed
    (functions.similarity.lsh_bucketed_topk / minhash family)."""
    from extract_permits_spark.functions.similarity import cosine

    emb = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 400)
    e = emb.select(
        F.col("vec_id"),
        F.col("embedding").cast("array<double>").alias("e"),
    )
    a = e.select(F.col("vec_id").alias("id_a"), F.col("e").alias("_ea"))
    b = e.select(F.col("vec_id").alias("id_b"), F.col("e").alias("_eb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    sim = cosine(F.col("_ea"), F.col("_eb"))
    return pairs.select(
        "id_a", "id_b", F.round(sim, 6).alias("cosine_sim"), sim.alias("_raw")
    ).where(F.col("_raw") >= 0.35).drop("_raw")


_EV_TUMBLING_SQL = _ORACLES["ev_tumbling_agg"]


@register("stream_tumbling_agg", _EV_TUMBLING_SQL)
def stream_tumbling_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME tumbling aggregation, but executed through Structured
    Streaming (file source → watermark → availableNow drain → memory
    sink), then returned as a batch frame. Checked against the identical
    SQL oracle as the batch path — streaming and batch must agree."""
    import os
    import shutil
    import tempfile

    from extract_permits_spark.streaming.events import run_available_now

    work = tempfile.mkdtemp(prefix="ev_stream_")
    src = os.path.join(work, "in")
    os.makedirs(src)
    shutil.copy(os.path.join(sf_dir, "events.parquet"), src)
    name = f"ev_stream_q_{abs(hash(sf_dir)) % 10**8}"
    q = run_available_now(spark, src, os.path.join(work, "ckpt"), table_name=name)
    q.awaitTermination(300)
    return spark.sql(f"SELECT * FROM {name}")


@register(
    "stream_stateful_totals",
    """
    SELECT user_id, COUNT(*) AS n_events,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             AS total_value_cents
    FROM events GROUP BY user_id
    """,
)
def stream_stateful_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (streaming/stateful.py): per-user running
    totals via applyInPandasWithState — explicit keyed state (count +
    exact integer cents, no float drift), Arrow-batched, update output
    mode, availableNow drain. Checked against the batch GROUP BY oracle:
    the explicit state machine must agree with the declarative
    aggregation. State is O(active users) and expirable by timeout in
    continuous mode."""
    import os
    import shutil
    import tempfile

    from extract_permits_spark.streaming.stateful import run_available_now

    work = tempfile.mkdtemp(prefix="ev_stream_stateful_")
    src = os.path.join(work, "in")
    os.makedirs(src)
    shutil.copy(os.path.join(sf_dir, "events.parquet"), src)
    name = f"ev_stream_stateful_{abs(hash(sf_dir)) % 10**8}"
    q = run_available_now(spark, src, os.path.join(work, "ckpt"), name)
    q.awaitTermination(300)
    return spark.sql(f"SELECT * FROM {name}")


@register(
    "a8_salted_agg",
    """
    SELECT event_type, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY event_type
    """,
)
def a8_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation (operators/skew.py:salted_agg) over a
    hot grouping key: phase 1 aggregates on (key, random salt) spreading
    a dominant key over 16 reducers, phase 2 merges partials on the true
    key. Results are identical to the direct groupBy (the oracle), which
    is the whole point — the salt changes the shuffle layout, never the
    answer. This is the manual fallback for skew AQE can't re-plan
    (hot keys in aggregations)."""
    from extract_permits_spark.operators.skew import salted_agg

    e = load_table(spark, sf_dir, "events")
    out = salted_agg(
        e.withColumn("value", _dec("value")),
        ["event_type"],
        {"n_events": ("event_id", "count"), "sum_value": ("value", "sum")},
    )
    return out.select(
        "event_type", "n_events", F.col("sum_value").cast("double").alias("sum_value")
    )


@register(
    "j11_salted_skew_join",
    """
    SELECT d.type_label,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events e
    JOIN (SELECT DISTINCT event_type, upper(event_type) AS type_label
          FROM events) d
      ON e.event_type = d.event_type
    GROUP BY d.type_label
    """,
)
def j11_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe equi-join (operators/skew.py:salted_join) on a HOT key:
    events carries only a handful of distinct event_types, so a plain
    shuffle join lands each type's entire mass on one reducer. The salted
    form salts the big side over 16 values and replicates the small dim
    once per salt, joining on (key, salt) — 16 reducers per hot key. The
    oracle is the plain join + aggregate: the salt must change the
    shuffle layout, never the answer. This is the manual fallback for
    the case AQE skew-split can't fix (a broadcast-ineligible dim with a
    dominant key); a8_salted_agg is its aggregation twin."""
    from extract_permits_spark.operators.skew import salted_join

    e = load_table(spark, sf_dir, "events")
    dim = (
        e.select("event_type")
        .distinct()
        .withColumn("type_label", F.upper("event_type"))
    )
    j = salted_join(
        e.select("event_type", _dec("value").alias("value")),
        dim,
        "event_type",
        num_salts=16,
        how="inner",
    )
    return j.groupBy("type_label").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").cast("double").alias("sum_value"),
    )


@register(
    "stream_dedup",
    """
    SELECT event_type, COUNT(DISTINCT event_id) AS n_events
    FROM events GROUP BY event_type
    """,
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once streaming counts over AT-LEAST-ONCE delivery: the
    stream directory contains the events file TWICE (every event arrives
    twice, the redelivery failure mode real pipelines face);
    dropDuplicates("event_id") inside the streaming query collapses
    redeliveries, so the result must equal the batch COUNT(DISTINCT
    event_id) per type — which is exactly the oracle."""
    import os
    import shutil
    import tempfile

    from extract_permits_spark.streaming.events import run_dedup_available_now

    work = tempfile.mkdtemp(prefix="ev_stream_dedup_")
    src = os.path.join(work, "in")
    os.makedirs(src)
    shutil.copy(os.path.join(sf_dir, "events.parquet"), os.path.join(src, "a.parquet"))
    shutil.copy(os.path.join(sf_dir, "events.parquet"), os.path.join(src, "b.parquet"))
    name = f"ev_stream_dedup_{abs(hash(sf_dir)) % 10**8}"
    q = run_dedup_available_now(
        spark, src, os.path.join(work, "ckpt"), table_name=name
    )
    q.awaitTermination(300)
    return spark.sql(f"SELECT * FROM {name}")


_SOCRATA_SQL = """
    SELECT CAST(o_orderkey AS VARCHAR) AS permit_,
           strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S.%f') AS issue_date,
           CAST(o_totalprice AS VARCHAR) AS reported_cost
    FROM orders
    WHERE strftime(o_orderdate, '%Y-%m-%d')
          BETWEEN '1995-01-01' AND '1996-12-31'
"""


def _orders_record(r: dict) -> dict:
    """Row → Socrata-style JSON record (module-level so the closure Spark
    ships to executors stays small and picklable)."""
    return {
        "permit_": str(r["o_orderkey"]),
        "issue_date": r["o_orderdate"].strftime("%Y-%m-%dT%H:%M:%S.%f"),
        "reported_cost": str(r["o_totalprice"]),
    }


@register("s1_socrata_pull", _SOCRATA_SQL)
def s1_socrata_pull(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 driven through the real Socrata source adapter: the date-range
    predicate is PUSHED into each partition's (faked) HTTP fetch — a
    partition-side record server backed by the orders parquet filters
    exactly like SoQL `$where between` — and the pull itself is distributed
    over date-window partitions. Nothing is collected on the driver: each
    executor partition serves its own window, the shape a 1000-executor
    pull has. Reference: download_permits chicago/permit_cleaning.py:539-554."""
    import os as _os

    from pyspark.sql import types as T

    from extract_permits_spark.sources.socrata import (
        fake_fetch_from_parquet,
        read_socrata,
    )

    fetch = fake_fetch_from_parquet(
        _os.path.join(sf_dir, "orders.parquet"),
        ["o_orderkey", "o_orderdate", "o_totalprice"],
        _orders_record,
        filter_col_map={"issue_date": "o_orderdate"},
    )
    schema = T.StructType(
        [
            T.StructField("permit_", T.StringType()),
            T.StructField("issue_date", T.StringType()),
            T.StructField("reported_cost", T.StringType()),
        ]
    )
    return read_socrata(
        spark,
        "orders-fixture",
        "issue_date",
        "1995-01-01",
        "1996-12-31",
        schema,
        fetch=fetch,
        num_partitions=8,
    )


# ===========================================================================
# Flagship end-to-end oracle: the ENTIRE §3.1 pipeline (adapt fixtures →
# explode → normalize → organize → abbreviate → round → suggested-PINs join
# → links → universe flag → validate → upload partition → keyword tag) as
# one DuckDB statement. The keyword/abbreviation fragments are generated
# from the same constants the Spark operators use, so the two sides cannot
# drift. Reference chain: chicago/permit_cleaning.py:1138-1230.
# ===========================================================================

from extract_permits_spark.operators.clean import APPLICANT_ABBREVIATIONS  # noqa: E402
from extract_permits_spark.operators.enrich import ASSESSABLE_KEYWORDS  # noqa: E402

_PIPE_KW_SQL = "concat_ws(', ', " + ", ".join(
    "CASE WHEN contains(lower(COALESCE(work_description, '')), "
    f"'{k.lower()}') THEN '{k}' END"
    for k in ASSESSABLE_KEYWORDS
) + ")"

_PIPE_ABBR_SQL = "o.o_orderstatus"
for _k, _v in APPLICANT_ABBREVIATIONS.items():
    _PIPE_ABBR_SQL = f"replace({_PIPE_ABBR_SQL}, '{_k}', '{_v}')"

_PIPE_PIN14 = (
    "lpad(CAST(l_partkey % (SELECT COUNT(*) FROM customer) AS VARCHAR), 14, '0')"
)

# Per-column error messages in spec order (specs.PERMIT_COLUMNS rules);
# each mirrors ColumnSpec.error_message's concat_ws-of-fired-rules shape.
_PIPE_AMT_V = "TRY_CAST(CAST(amount AS VARCHAR) AS DOUBLE)"
_PIPE_COL_MSGS = [
    """concat_ws(', ',
      CASE WHEN pin IS NULL OR trim(CAST(pin AS VARCHAR)) = ''
           THEN 'Missing PIN' END,
      CASE WHEN pin IS NOT NULL AND NOT regexp_full_match(pin, '[0-9]{14}')
           THEN 'PIN is not 14 digits' END)""",
    """concat_ws(', ',
      CASE WHEN permit_number IS NULL OR trim(CAST(permit_number AS VARCHAR)) = ''
           THEN 'Missing permit number' END,
      CASE WHEN permit_number IS NOT NULL AND length(permit_number) NOT IN (9, 10)
           THEN 'Permit number must be 9-10 characters' END)""",
    """concat_ws(', ',
      CASE WHEN issue_date IS NULL OR trim(CAST(issue_date AS VARCHAR)) = ''
           THEN 'Missing issue date' END,
      CASE WHEN issue_date IS NOT NULL
                AND try_strptime(issue_date, '%-m/%-d/%Y') IS NULL
           THEN 'Issue date is not a valid date' END)""",
    f"""concat_ws(', ',
      CASE WHEN amount IS NULL OR trim(CAST(amount AS VARCHAR)) = ''
           THEN 'Missing amount' END,
      CASE WHEN amount IS NOT NULL AND ({_PIPE_AMT_V} IS NULL
                OR {_PIPE_AMT_V} < 1 OR {_PIPE_AMT_V} > 2147483647)
           THEN 'Amount must be at least 1' END)""",
    """concat_ws(', ',
      CASE WHEN applicant_street_address IS NULL
                OR trim(CAST(applicant_street_address AS VARCHAR)) = ''
           THEN 'Missing address' END,
      CASE WHEN length(applicant_street_address) > 40
           THEN 'Address > 40 characters' END)""",
    """concat_ws(', ',
      CASE WHEN city_state IS NULL OR trim(CAST(city_state AS VARCHAR)) = ''
           THEN 'Missing city/state' END)""",
    """concat_ws(', ',
      CASE WHEN applicant IS NULL OR trim(CAST(applicant AS VARCHAR)) = ''
           THEN 'Missing applicant' END,
      CASE WHEN length(applicant) > 50
           THEN 'Applicant > 50 characters' END)""",
    """concat_ws(', ',
      CASE WHEN length(work_description) > 2000
           THEN 'Description > 2000 characters' END)""",
]
_PIPE_ERRORS_SQL = "concat_ws(', ', " + ", ".join(
    f"nullif({m}, '')" for m in _PIPE_COL_MSGS
) + ")"

_PIPE_BASE_SQL = f"""
    WITH lists AS (
      SELECT l_orderkey,
             string_agg(DISTINCT {_PIPE_PIN14}, ' | ' ORDER BY {_PIPE_PIN14})
               AS pin_list
      FROM lineitem GROUP BY l_orderkey
    ),
    raw AS (
      SELECT '1' || lpad(CAST(o.o_orderkey AS VARCHAR), 8, '0') AS permit_number,
             strftime(o.o_orderdate, '%-m/%-d/%Y') AS issue_date,
             CAST(round_even(TRY_CAST(CAST(o.o_totalprice AS VARCHAR) AS DOUBLE), 0)
                  AS BIGINT) AS amount,
             CAST(o.o_custkey AS VARCHAR) || ' N ' || o.o_orderpriority
               AS applicant_street_address,
             'CHICAGO, IL' AS city_state,
             {_PIPE_ABBR_SQL} AS applicant,
             'CONSTRUCT GARAGE AND REPAIR PORCH FOR ORDER '
               || CAST(o.o_orderkey AS VARCHAR) AS work_description,
             l.pin_list
      FROM orders o LEFT JOIN lists l ON o.o_orderkey = l.l_orderkey
    ),
    -- posexplode_outer twin: NULL-pin_list rows survive as pin='' with
    -- NULL pin_type (the reference's save/union-back dance, ref :585-601)
    exploded AS (
      SELECT * EXCLUDE (solo_pin, pos),
             COALESCE(CASE WHEN length(replace(solo_pin, '-', '')) = 10
                           THEN replace(solo_pin, '-', '') || '0000'
                           ELSE replace(solo_pin, '-', '') END, '') AS pin,
             'pin' || CAST(pos AS VARCHAR) AS pin_type
      FROM (
        SELECT r.* EXCLUDE (pin_list),
               unnest(string_split(r.pin_list, ' | ')) AS solo_pin,
               unnest(range(1, len(string_split(r.pin_list, ' | ')) + 1)) AS pos
        FROM raw r WHERE r.pin_list IS NOT NULL
      )
      UNION ALL
      SELECT r.* EXCLUDE (pin_list),
             '' AS pin, CAST(NULL AS VARCHAR) AS pin_type
      FROM raw r WHERE r.pin_list IS NULL
    ),
    universe AS (
      SELECT lpad(CAST(c_custkey AS VARCHAR), 14, '0') AS pin,
             CAST(c_custkey AS VARCHAR) || ' N ' || c_mktsegment
               AS prop_address_full
      FROM customer
    ),
    sugg AS (
      SELECT prop_address_full,
             string_agg(DISTINCT pin, ', ' ORDER BY pin) AS suggested_pins
      FROM universe GROUP BY prop_address_full
    ),
    enriched AS (
      SELECT e.*,
             COALESCE(s.suggested_pins, '') AS suggested_pins,
             e.applicant_street_address AS property_address,
             CASE WHEN e.applicant_street_address IS NOT NULL
                       AND e.applicant_street_address <> ''
                  THEN '=HYPERLINK("https://maps.cookcountyil.gov/cookviewer/?search='
                       || e.applicant_street_address
                       || ', Chicago, IL", "Click here to open in CookViewer")'
                  ELSE '' END AS cookviewer_link,
             CASE WHEN e.pin IS NULL OR e.pin = '' THEN 'NO PIN FOUND'
                  WHEN length(regexp_replace(e.pin, '\\D', '', 'g')) = 14
                  THEN '=HYPERLINK("https://www.cookcountyassessor.com/pin/'
                       || regexp_replace(e.pin, '\\D', '', 'g')
                       || '", "' || e.pin || '")'
                  ELSE e.pin END AS pin_link,
             up.pin IS NOT NULL AS in_universe
      FROM exploded e
      LEFT JOIN sugg s ON e.applicant_street_address = s.prop_address_full
      LEFT JOIN (SELECT DISTINCT pin FROM universe) up ON up.pin = e.pin
    ),
    validated AS (
      SELECT *,
             {_PIPE_ERRORS_SQL} AS errors,
             {_PIPE_KW_SQL} AS matched_keywords
      FROM enriched
    ),
    final AS (
      SELECT *, errors <> '' OR NOT COALESCE(in_universe, FALSE) AS has_error
      FROM validated
    )
"""

_PIPE_COMMON_COLS = """pin, permit_number, issue_date, amount,
           applicant_street_address, city_state, applicant, work_description,
           pin_type, suggested_pins, property_address, cookviewer_link,
           pin_link, in_universe"""

_PIPE_UPLOAD_SQL = f"""{_PIPE_BASE_SQL}
    SELECT {_PIPE_COMMON_COLS}, matched_keywords
    FROM final WHERE NOT has_error
"""

_PIPE_REVIEW_SQL = f"""{_PIPE_BASE_SQL}
    SELECT {_PIPE_COMMON_COLS}, errors, has_error, matched_keywords
    FROM final WHERE has_error
"""


@register("permit_pipeline_upload", _PIPE_UPLOAD_SQL)
def permit_pipeline_upload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship §3.1 pipeline's upload partition, oracle-checked
    end-to-end (hash match vs the one-statement DuckDB twin above); the
    per-operator queries above remain the checked decomposition."""
    from extract_permits_spark.plans.permits import permits_from_tpch, run_pipeline

    permits_raw, universe = permits_from_tpch(spark, sf_dir)
    upload, _review = run_pipeline(permits_raw, universe)
    return upload


@register("permit_pipeline_review", _PIPE_REVIEW_SQL)
def permit_pipeline_review(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The review (needs-human-look) partition of the same pipeline —
    errors message + has_error flag included, oracle-checked end-to-end."""
    from extract_permits_spark.plans.permits import permits_from_tpch, run_pipeline

    permits_raw, universe = permits_from_tpch(spark, sf_dir)
    _upload, review = run_pipeline(permits_raw, universe)
    return review


@register("ann_ivf_topk", _ann_sql.ivf_topk_sql(num_probes=6))
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN scale path: deterministic Lloyd k-means fit, assign-to-
    centroid once, probe the 6 nearest clusters per query. The oracle is a
    REAL twin: the generated SQL (plans/ann_sql.py) replays the identical
    fit (md5-ordered init, per-round half-up re-quantization), assignment,
    probe selection, and exact in-cluster ranking."""
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = [
        float(x)
        for x in emb.where(F.col("vec_id") == 0).select("embedding").first()[0]
    ]
    index = simfn.ivf_index(
        emb, num_clusters=16, centroids=_ivf_centroids_cached(spark, emb, sf_dir)
    )
    return simfn.ivf_topk(
        emb, qvec, k=20, num_clusters=16, num_probes=6, index=index
    )


# ===========================================================================
# MinHash-LSH with a cross-engine-deterministic hash family (md5) — the
# SAME algorithm as dedup_minhash_lsh but oracle-checkable end-to-end:
# banded candidate generation AND jaccard verification both hash-match
# DuckDB. (The xxhash64 variant stays the production fast path.)
# ===========================================================================

_MH_SEEDS = 8
_MH_BANDS = 4  # 2 hashes per band
_MH_SHINGLE_SQL = """
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(string_split_regex(trim(lower(COALESCE(text,''))), '\\s+')) - 2, 0) + 1),
               i -> array_to_string(list_slice(
                      string_split_regex(trim(lower(COALESCE(text,''))), '\\s+'), i, i + 2), ' ')
             )) AS shingles
      FROM documents
      WHERE len(string_split_regex(trim(lower(COALESCE(text,''))), '\\s+')) >= 3
"""

_MH_SIG_COLS = ", ".join(
    f"min(md5('{s}|' || sh)) AS h{s}" for s in range(_MH_SEEDS)
)
_MH_BAND_ROWS = " UNION ALL ".join(
    f"SELECT doc_id, {b} AS band_idx, md5(h{2*b} || h{2*b+1}) AS band_hash FROM sigs"
    for b in range(_MH_BANDS)
)


@register(
    "dedup_minhash_md5",
    f"""
    WITH toks AS ({_MH_SHINGLE_SQL}),
    sh AS (SELECT doc_id, unnest(shingles) AS sh FROM toks),
    sigs AS (SELECT doc_id, {_MH_SIG_COLS} FROM sh GROUP BY doc_id),
    bands AS ({_MH_BAND_ROWS}),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b USING (band_idx, band_hash)
      WHERE a.doc_id < b.doc_id
    )
    SELECT c.id_a, c.id_b,
           round(CAST(len(list_intersect(ta.shingles, tb.shingles)) AS DOUBLE)
                 / len(list_distinct(list_concat(ta.shingles, tb.shingles))), 6)
             AS jaccard
    FROM cand c
    JOIN toks ta ON c.id_a = ta.doc_id
    JOIN toks tb ON c.id_b = tb.doc_id
    WHERE CAST(len(list_intersect(ta.shingles, tb.shingles)) AS DOUBLE)
          / len(list_distinct(list_concat(ta.shingles, tb.shingles))) >= 0.2
    """,
)
def dedup_minhash_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return simfn.minhash_md5_pairs(
        d, num_hashes=_MH_SEEDS, bands=_MH_BANDS, jaccard_threshold=0.2
    )


@register(
    "docs_source_overlap_matrix",
    f"""
    WITH toks AS ({_MH_SHINGLE_SQL}),
    sh AS (SELECT doc_id, unnest(shingles) AS sh FROM toks),
    sigs AS (SELECT doc_id, {_MH_SIG_COLS} FROM sh GROUP BY doc_id),
    bands AS ({_MH_BAND_ROWS}),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b USING (band_idx, band_hash)
      WHERE a.doc_id < b.doc_id
    ),
    pairs AS (
      SELECT c.id_a, c.id_b
      FROM cand c
      JOIN toks ta ON c.id_a = ta.doc_id
      JOIN toks tb ON c.id_b = tb.doc_id
      WHERE CAST(len(list_intersect(ta.shingles, tb.shingles)) AS DOUBLE)
            / len(list_distinct(list_concat(ta.shingles, tb.shingles))) >= 0.2
    )
    SELECT least(da.source, db.source) AS source_a,
           greatest(da.source, db.source) AS source_b,
           COUNT(*) AS n_pairs
    FROM pairs p
    JOIN documents da ON p.id_a = da.doc_id
    JOIN documents db ON p.id_b = db.doc_id
    GROUP BY 1, 2
    """,
)
def docs_source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source x source near-dup OVERLAP MATRIX — the curation diagnostic
    behind 'which sources copy from which': every verified MinHash
    near-dup pair (the md5 cross-engine family, same banding as
    dedup_minhash_md5) is labeled with its two documents' sources
    (order-normalized least/greatest) and counted per source pair. The
    diagonal is within-source duplication (what docs_dup_rate_by_source
    measures for exact dups); off-diagonal mass is cross-source
    contamination — e.g. a crawl slice that rehosts a curated corpus.
    Scale shape inherits the banded pair generation (no all-pairs); the
    per-pair source lookup is two joins against the (id, source)
    projection, and the matrix itself is |sources|^2-bounded."""
    d = load_table(spark, sf_dir, "documents")
    pairs = simfn.minhash_md5_pairs(
        d, num_hashes=_MH_SEEDS, bands=_MH_BANDS, jaccard_threshold=0.2
    )
    src = d.select("doc_id", "source")
    return (
        pairs.join(
            src.select(
                F.col("doc_id").alias("id_a"), F.col("source").alias("_sa")
            ),
            "id_a",
        )
        .join(
            src.select(
                F.col("doc_id").alias("id_b"), F.col("source").alias("_sb")
            ),
            "id_b",
        )
        .select(
            F.least("_sa", "_sb").alias("source_a"),
            F.greatest("_sa", "_sb").alias("source_b"),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


_STREAM_NEARDUP_SQL = f"""
    WITH static_docs AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 4 <> 0
    ),
    new_docs AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 4 = 0
    ),
    toks_s AS ({_MH_SHINGLE_SQL.replace("FROM documents", "FROM static_docs")}),
    sh_s AS (SELECT doc_id, unnest(shingles) AS sh FROM toks_s),
    sigs_s AS (SELECT doc_id, {_MH_SIG_COLS} FROM sh_s GROUP BY doc_id),
    bands_s AS ({_MH_BAND_ROWS.replace("FROM sigs", "FROM sigs_s")}),
    toks_n AS ({_MH_SHINGLE_SQL.replace("FROM documents", "FROM new_docs")}),
    sh_n AS (SELECT doc_id, unnest(shingles) AS sh FROM toks_n),
    sigs_n AS (SELECT doc_id, {_MH_SIG_COLS} FROM sh_n GROUP BY doc_id),
    bands_n AS ({_MH_BAND_ROWS.replace("FROM sigs", "FROM sigs_n")}),
    hits AS (
      SELECT DISTINCT n.doc_id
      FROM bands_n n JOIN bands_s s USING (band_idx, band_hash)
    )
    SELECT d.doc_id, (h.doc_id IS NOT NULL) AS is_neardup
    FROM new_docs d LEFT JOIN hits h USING (doc_id)
"""


@register("stream_neardup_ingest", _STREAM_NEARDUP_SQL)
def stream_neardup_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static near-dup on ingest: new documents (doc_id%4==0)
    arrive through a file stream in multiple micro-batches
    (maxFilesPerTrigger=1) and each is flagged iff it shares ≥1 MinHash
    band bucket with the STATIC corpus (doc_id%4!=0), whose band index
    is built once with the exact hashes the batch dedup uses
    (streaming/neardup_ingest.py, similarity.minhash_md5_bands). The
    oracle replays both sides' banding in one batch query — proving the
    incremental, per-micro-batch decision equals what a full-corpus
    batch run would conclude, the invariant that makes ingest-time
    scoring trustworthy."""
    import os
    import shutil
    import tempfile

    from extract_permits_spark.streaming.neardup_ingest import (
        run_neardup_ingest_available_now,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    static_docs = d.where(F.col("doc_id") % 4 != 0)
    new_docs = d.where(F.col("doc_id") % 4 == 0)

    work = tempfile.mkdtemp(prefix="stream_neardup_")
    src = os.path.join(work, "in")
    os.makedirs(src)
    # two files -> two micro-batches under maxFilesPerTrigger=1
    new_docs.where((F.col("doc_id") / 4).cast("long") % 2 == 0).coalesce(
        1
    ).write.parquet(os.path.join(src, "f0"))
    new_docs.where((F.col("doc_id") / 4).cast("long") % 2 == 1).coalesce(
        1
    ).write.parquet(os.path.join(src, "f1"))
    for sub in ("f0", "f1"):
        for fn in os.listdir(os.path.join(src, sub)):
            if fn.endswith(".parquet"):
                shutil.move(
                    os.path.join(src, sub, fn),
                    os.path.join(src, f"{sub}.parquet"),
                )
        shutil.rmtree(os.path.join(src, sub), ignore_errors=True)

    out = os.path.join(work, "out")
    q, static_bands = run_neardup_ingest_available_now(
        spark, src, static_docs, os.path.join(work, "ckpt"), out_path=out
    )
    q.awaitTermination(300)
    static_bands.unpersist()
    # project off the idempotency partition key — the oracle is the batch
    # scoring contract, which has no notion of micro-batches
    return spark.read.parquet(out).select("doc_id", "is_neardup")


# ===========================================================================
# J7 — as-of join (custom operator; union + last-ignorenulls window merge).
# Oracle: DuckDB's native ASOF JOIN. Right side pre-deduped to one row per
# (key, time) with a deterministic winner so tie behavior matches.
# ===========================================================================


@register(
    "j7_asof_join",
    """
    WITH r AS (
      SELECT o_custkey, o_orderdate, max(o_orderkey) AS matched_orderkey
      FROM orders GROUP BY o_custkey, o_orderdate
    )
    SELECT e.event_id, e.user_id,
           strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS event_ts,
           r.matched_orderkey,
           strftime(r.o_orderdate, '%Y-%m-%d') AS matched_date
    FROM events e
    ASOF LEFT JOIN r ON e.user_id = r.o_custkey AND e.ts >= r.o_orderdate
    """,
)
def j7_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from extract_permits_spark.operators.asof import asof_join

    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = load_table(spark, sf_dir, "orders")
    r = o.groupBy("o_custkey", "o_orderdate").agg(
        F.max("o_orderkey").alias("matched_orderkey")
    )
    joined = asof_join(
        e,
        r,
        left_on="user_id",
        right_on="o_custkey",
        left_time="ts",
        right_time="o_orderdate",
        payload_cols=["matched_orderkey", "o_orderdate"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("event_ts"),
        "matched_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("matched_date"),
    )


# ===========================================================================
# A6 — multi-granularity time rollup (hypertable-style continuous-aggregate
# shape): one pass produces hour, day, and grand-total rows via ROLLUP,
# with grouping_id distinguishing levels. Map-side partial aggregation
# handles all levels in the same shuffle.
# ===========================================================================


@register(
    "ev_rollup",
    """
    SELECT COALESCE(strftime(date_trunc('day', ts), '%Y-%m-%d'), 'ALL') AS day,
           COALESCE(strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S'), 'ALL') AS hour,
           GROUPING(date_trunc('day', ts)) * 2 + GROUPING(date_trunc('hour', ts)) AS gid,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY ROLLUP (date_trunc('day', ts), date_trunc('hour', ts))
    """,
)
def ev_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        F.date_trunc("day", "ts").alias("_day"),
        F.date_trunc("hour", "ts").alias("_hour"),
        "value",
    )
    return (
        e.rollup("_day", "_hour")
        .agg(
            F.grouping("_day").cast("int").alias("_gd"),
            F.grouping("_hour").cast("int").alias("_gh"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.coalesce(F.date_format("_day", "yyyy-MM-dd"), F.lit("ALL")).alias("day"),
            F.coalesce(
                F.date_format("_hour", "yyyy-MM-dd HH:mm:ss"), F.lit("ALL")
            ).alias("hour"),
            (F.col("_gd") * 2 + F.col("_gh")).cast("long").alias("gid"),
            "n_events",
            "sum_value",
        )
    )


@register(
    "ev_grouping_sets",
    """
    SELECT COALESCE(event_type, 'ALL') AS event_type,
           COALESCE(CAST(user_id % 10 AS VARCHAR), 'ALL') AS user_bucket,
           GROUPING(event_type) * 2 + GROUPING(user_id % 10) AS gid,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY GROUPING SETS ((event_type), (user_id % 10), ())
    """,
)
def ev_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS — the third of the multi-granularity trio
    (ev_rollup, ev_cube): explicitly chosen grouping combinations
    ((type), (user bucket), ()) rather than every prefix or every
    subset. Spark plans all sets in ONE pass via Expand (each input row
    fans out once per set, partial aggregation map-side) — at 100 TB
    that is one shuffle for the whole report instead of one job per
    granularity. gid disambiguates the NULL-vs-'ALL' encoding exactly
    as the rollup/cube entries do."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type", (F.col("user_id") % 10).alias("_ub"), "value"
    )
    grouped = e.groupingSets(
        [["event_type"], ["_ub"], []], "event_type", "_ub"
    ).agg(
        F.grouping("event_type").cast("int").alias("_gt"),
        F.grouping("_ub").cast("int").alias("_gu"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
    )
    return grouped.select(
        F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
        F.coalesce(F.col("_ub").cast("string"), F.lit("ALL")).alias("user_bucket"),
        (F.col("_gt") * 2 + F.col("_gu")).cast("long").alias("gid"),
        "n_events",
        "sum_value",
    )


# ===========================================================================
# J8 — banded range join: |supplier.acctbal − customer.acctbal| ≤ 50
# without a nested-loop plan. Oracle: DuckDB inequality join (fine at this
# scale; the band trick is the 100 TB path).
# ===========================================================================


@register(
    "j8_range_join",
    """
    SELECT s.s_suppkey, c.c_custkey,
           round(abs(s.s_acctbal - c.c_acctbal), 6) AS bal_gap
    FROM supplier s JOIN customer c
      ON abs(s.s_acctbal - c.c_acctbal) <= 50.0
    """,
)
def j8_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from extract_permits_spark.operators.rangejoin import banded_range_join

    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_acctbal")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    out = banded_range_join(s, c, "s_acctbal", "c_acctbal", width=50.0)
    return out.select(
        "s_suppkey",
        "c_custkey",
        F.round(F.abs(F.col("s_acctbal") - F.col("c_acctbal")), 6).alias("bal_gap"),
    )


# ===========================================================================
# Training-data sampling: deterministic hash splits + stratified quotas.
# Hash-based (not rand()) so assignment is reproducible across runs,
# engines, and repartitioning — the property training pipelines need.
# ===========================================================================


@register(
    "sample_hash_split",
    """
    WITH h AS (
      SELECT doc_id,
             CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER)
               % 100 AS bucket
      FROM documents
    )
    SELECT doc_id,
           CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'valid'
                ELSE 'test' END AS split
    FROM h
    """,
)
def sample_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 4), 16, 10)
        .cast("int")
        % 100
    )
    return d.select(
        "doc_id",
        F.when(bucket < 80, "train")
        .when(bucket < 90, "valid")
        .otherwise("test")
        .alias("split"),
    )


@register(
    "sample_negatives",
    """
    WITH ranked AS (
      SELECT vec_id,
             row_number() OVER (ORDER BY vec_id) - 1 AS idx,
             COUNT(*) OVER () AS n
      FROM embeddings
    ),
    draws AS (
      SELECT a.vec_id, d.draw_idx,
             ('0x' || substr(md5(CAST(a.vec_id AS VARCHAR) || ':'
                                 || CAST(d.draw_idx AS VARCHAR)), 1, 15))::BIGINT
               % a.n AS neg_idx
      FROM ranked a, (SELECT unnest(range(4)) AS draw_idx) d
    )
    SELECT d.vec_id, CAST(d.draw_idx AS INT) AS draw_idx,
           r.vec_id AS neg_id,
           d.vec_id = r.vec_id AS is_self
    FROM draws d JOIN ranked r ON r.idx = d.neg_idx
    """,
)
def sample_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic NEGATIVE SAMPLING for contrastive training: every
    anchor draws k=4 pseudo-random corpus rows via the cross-engine md5
    hash of (anchor_id, draw_idx) mod corpus size, mapped back to ids
    through a rank table — reproducible across engines, epochs and
    retries (no RNG state to checkpoint), uniform over the corpus, and
    the vectors themselves never move: the only join ships (idx, id)
    pairs. Self-draws are flagged, not silently redrawn — the trainer
    decides (redraw shifts every later draw; masking is the stable
    contract). The global rank is the distributed-offset spelling
    (operators/windows.py:distributed_rank — no single-partition
    window), and the modulus n rides along as its free total-count
    column instead of a separate driver-side count() job; the rank map
    joins on idx so the vectors themselves never move. A near-dup
    exclusion (false negatives) composes by anti-joining the dedup pair
    sets."""
    emb = load_table(spark, sf_dir, "embeddings")
    ranked = distributed_rank(
        emb.select("vec_id"), [F.col("vec_id")], "idx",
        zero_based=True, total_col="_n",
    )
    draws = ranked.select(
        "vec_id",
        F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("draw_idx"),
        "_n",
    ).select(
        "vec_id",
        "draw_idx",
        F.pmod(
            simfn.md5_long60(
                F.concat(
                    F.col("vec_id").cast("string"),
                    F.lit(":"),
                    F.col("draw_idx").cast("string"),
                )
            ),
            F.col("_n"),
        ).alias("_neg_idx"),
    )
    return draws.join(
        ranked.select(
            F.col("idx").alias("_neg_idx"), F.col("vec_id").alias("neg_id")
        ),
        "_neg_idx",
    ).select(
        "vec_id",
        F.col("draw_idx").cast("int").alias("draw_idx"),
        "neg_id",
        (F.col("vec_id") == F.col("neg_id")).alias("is_self"),
    )


@register(
    "sample_stratified",
    """
    SELECT source, doc_id FROM documents
    QUALIFY row_number() OVER (
      PARTITION BY source ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
    ) <= 5
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample: N docs per source, chosen by hash
    order (stable across runs/partitionings, unlike rand())."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string").cast("binary")), F.col("doc_id")
    )
    return (
        d.select("source", "doc_id")
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= 5)
        .drop("_rn")
    )


# ===========================================================================
# A7 — exact grouped quantiles + distinct counts. Exact (sort-based)
# percentile so the oracle matches bit-for-bit; the approximate cousins
# (percentile_approx / approx_count_distinct / datasketches) are the
# at-scale swap-in where exactness isn't required.
# ===========================================================================


@register(
    "a7_quantiles",
    """
    SELECT event_type,
           round(quantile_cont(value, 0.5), 6) AS p50,
           round(quantile_cont(value, 0.95), 6) AS p95,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY event_type
    """,
)
def a7_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("value", F.lit(0.95)), 6).alias("p95"),
        F.countDistinct("user_id").alias("n_users"),
    )


# ===========================================================================
# Corpus-preparation composites: cleaning/masking, keep-first exact dedup,
# and the end-to-end pretraining filter (the LLM-data analog of the permit
# pipeline — clean → gate → dedupe in one DAG, fully oracle-checked).
# ===========================================================================


@register(
    "text_clean_mask",
    """
    SELECT doc_id,
           trim(regexp_replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(COALESCE(text,''), 'https?://\\S+', '', 'g'),
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b', '<PHONE>', 'g'),
             '\\s+', ' ', 'g')) AS clean_text
    FROM documents
    """,
)
def text_clean_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id", textfn.clean_for_pretraining("text").alias("clean_text")
    )


@register(
    "sketch_approx_quantiles",
    """
    SELECT event_type,
           round(quantile_cont(value, 0.5), 6) AS exact_p50,
           round(quantile_cont(value, 0.95), 6) AS exact_p95,
           true AS p50_rank_ok,
           true AS p95_rank_ok
    FROM events
    GROUP BY event_type
    """,
)
def sketch_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile SKETCH audited by its own rank guarantee:
    ``percentile_approx`` (Greenwald-Khanna, accuracy 10000 ⇒ rank error
    ≤ n/10000) per group, then a second declarative pass computes the
    ACTUAL rank of each sketch output — the fraction of values ≤ it must
    sit within ±1% of the target quantile. The oracle pins the exact
    quantiles plus the two gates as constants, so a sketch regression
    (merge bug, accuracy misconfig) flips a gate and hash-mismatches.
    The sketch is the scale shape: mergeable partials, one pass, bounded
    memory — exact percentile needs a full sort per group."""
    e = load_table(spark, sf_dir, "events")
    appr = e.groupBy("event_type").agg(
        F.percentile_approx("value", F.lit(0.5), F.lit(10000)).alias("_a50"),
        F.percentile_approx("value", F.lit(0.95), F.lit(10000)).alias("_a95"),
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("exact_p50"),
        F.round(F.percentile("value", F.lit(0.95)), 6).alias("exact_p95"),
    )
    joined = e.select("event_type", "value").join(
        F.broadcast(appr), "event_type"
    )
    return (
        joined.groupBy("event_type")
        .agg(
            F.avg((F.col("value") <= F.col("_a50")).cast("double")).alias("_r50"),
            F.avg((F.col("value") <= F.col("_a95")).cast("double")).alias("_r95"),
            F.first("exact_p50").alias("exact_p50"),
            F.first("exact_p95").alias("exact_p95"),
        )
        .select(
            "event_type",
            "exact_p50",
            "exact_p95",
            (F.abs(F.col("_r50") - 0.5) <= F.lit(0.01)).alias("p50_rank_ok"),
            (F.abs(F.col("_r95") - 0.95) <= F.lit(0.01)).alias("p95_rank_ok"),
        )
    )


@register(
    "sketch_hll_region_distinct",
    """
    SELECT n_regionkey AS region_key,
           CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS exact_distinct,
           true AS within_5pct
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_regionkey
    """,
)
def sketch_hll_region_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches — the re-aggregatable shape that
    matters at 100 TB: per-nation HLL sketches (partial aggregation,
    map-side combinable) are UNIONED to region grain without touching raw
    rows again, exactly how a warehouse rolls daily sketches into monthly
    distincts. The oracle pins the exact distinct per region plus a
    5%-error gate on the sketch estimate: Apache DataSketches HLL is
    deterministic for fixed input, so a regression (wrong merge, wrong
    lgConfigK) flips within_5pct and hash-mismatches."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    per_nation = c.groupBy("c_nationkey").agg(
        F.hll_sketch_agg("c_custkey").alias("_sk"),
        F.countDistinct("c_custkey").alias("_exact_nat"),
    )
    j = per_nation.join(F.broadcast(n), per_nation.c_nationkey == n.n_nationkey)
    per_region = j.groupBy("n_regionkey").agg(
        F.hll_sketch_estimate(F.hll_union_agg("_sk")).alias("_est"),
        # customers belong to exactly one nation, so the exact regional
        # distinct is the sum of per-nation distincts — no re-scan
        F.sum("_exact_nat").alias("_exact"),
    )
    return per_region.select(
        F.col("n_regionkey").alias("region_key"),
        F.col("_exact").cast("bigint").alias("exact_distinct"),
        (
            F.abs(F.col("_est") - F.col("_exact"))
            / F.col("_exact")
            <= F.lit(0.05)
        ).alias("within_5pct"),
    )


@register(
    "docs_chunk",
    """
    WITH t AS (
      SELECT doc_id,
             string_split_regex(trim(lower(COALESCE(text,''))), '\\s+') AS toks
      FROM documents
      WHERE trim(lower(COALESCE(text,''))) <> ''
    ),
    s AS (
      SELECT doc_id, toks,
             unnest(range(1, greatest(len(toks) - 16, 1) + 1, 48)) AS start
      FROM t
    )
    SELECT doc_id,
           CAST((start - 1) // 48 AS INT) AS chunk_idx,
           array_to_string(list_slice(toks, start, start + 63), ' ') AS chunk_text,
           CAST(least(64, len(toks) - start + 1) AS INT) AS n_tokens
    FROM s
    """,
)
def docs_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-bounded overlapping chunking (64-token chunks, 16-token
    overlap ⇒ a new chunk every 48 tokens) — the context-window prep step
    between dedup and packing (functions/text.py:chunk_documents). Narrow:
    tokenize once, posexplode the arithmetic start sequence, slice+join
    per chunk; the oracle replays it with range()+list_slice."""
    d = load_table(spark, sf_dir, "documents")
    return textfn.chunk_documents(d, chunk_tokens=64, overlap=16)


@register(
    "dedup_exact_keep_first",
    """
    SELECT doc_id, lang, source FROM documents
    QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
    """,
)
def dedup_exact_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup operator corpora actually run: drop exact duplicates,
    keeping the lowest-id copy. One shuffle on the 16-byte hash."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy(F.md5(F.col("text").cast("binary"))).orderBy("doc_id")
    return (
        d.select("doc_id", "lang", "source", "text")
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("doc_id", "lang", "source")
    )


@register(
    "docs_pretrain_filter",
    """
    WITH cleaned AS (
      SELECT doc_id, lang, source,
             trim(regexp_replace(
               regexp_replace(COALESCE(text,''), 'https?://\\S+', '', 'g'),
               '\\s+', ' ', 'g')) AS t
      FROM documents
    ), gated AS (
      SELECT doc_id, lang, source, t,
             len(string_split_regex(t, '\\s+')) AS n_toks
      FROM cleaned
      WHERE length(t) >= 20 AND length(t) <= 50000
        AND len(string_split_regex(t, '\\s+')) >= 5
    )
    SELECT doc_id, lang, source, CAST(n_toks AS BIGINT) AS n_toks
    FROM gated
    QUALIFY row_number() OVER (PARTITION BY md5(t) ORDER BY doc_id) = 1
    """,
)
def docs_pretrain_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end pretraining corpus filter as one lazy DAG: URL-strip +
    whitespace-canonicalize → length/token gates → exact dedup keep-first.
    The LLM-data sibling of the permit pipeline; one narrow pass + one
    hash shuffle."""
    d = load_table(spark, sf_dir, "documents")
    t = textfn.collapse_whitespace(textfn.strip_urls("text"))
    cleaned = d.select("doc_id", "lang", "source", t.alias("t"))
    gated = cleaned.withColumn("n_toks", F.size(F.split("t", r"\s+"))).where(
        (F.length("t") >= 20)
        & (F.length("t") <= 50000)
        & (F.col("n_toks") >= 5)
    )
    w = Window.partitionBy(F.md5(F.col("t").cast("binary"))).orderBy("doc_id")
    return (
        gated.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("doc_id", "lang", "source", F.col("n_toks").cast("long").alias("n_toks"))
    )


# ===========================================================================
# X4 — long-to-wide pivot (conditional aggregation — the portable form of
# .pivot(); identical map-side-combine shape).
# ===========================================================================


@register(
    "x4_pivot",
    """
    SELECT user_id,
           COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
           COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS n_view,
           COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
           COUNT(CASE WHEN event_type NOT IN ('click','view','purchase') THEN 1 END) AS n_other
    FROM events GROUP BY user_id
    """,
)
def x4_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")

    def n(pred, name):
        return F.count(F.when(pred, 1)).alias(name)

    t = F.col("event_type")
    return e.groupBy("user_id").agg(
        n(t == "click", "n_click"),
        n(t == "view", "n_view"),
        n(t == "purchase", "n_purchase"),
        n(~t.isin("click", "view", "purchase"), "n_other"),
    )


# ===========================================================================
# W5 — rolling-frame window aggregate (7-row trailing sum per key).
# ===========================================================================


@register(
    "w5_rolling",
    """
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rolling_sum
    FROM events
    """,
)
def w5_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-6, 0)
    return e.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double").alias(
            "rolling_sum"
        ),
    )


# ===========================================================================
# U3 — INTERSECT (set-op completeness; the reference uses only union/anti).
# ===========================================================================


@register(
    "u3_intersect",
    """
    SELECT o_custkey AS k FROM orders
    INTERSECT
    SELECT c_custkey AS k FROM customer WHERE c_acctbal > 0
    """,
)
def u3_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    c = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 0)
        .select(F.col("c_custkey").alias("k"))
    )
    return o.intersect(c)


# ===========================================================================
# S6/S7/S8 — Excel round trip: formatted render -> reviewed-workbook ingest
# -> flag partition, oracle-checked. The reviewer's fill-color flags are
# simulated with a deterministic cross-engine rule (md5 hex prefix), so the
# whole xlsx surface (pure-stdlib codec, sinks/xlsx_io.py) sits on the
# correctness gate rather than pytest alone.
# Reference: save_xlsx_file chicago/permit_cleaning.py:911-1135 (write),
# format_reviewed_permits_for_upload.py:31-204 (read + flag colors).
# ===========================================================================

_XLSX_SQL = """
SELECT doc_id, source, is_flagged
FROM (
  SELECT doc_id, source,
         substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0','1','2')
           AS is_flagged
  FROM documents ORDER BY doc_id LIMIT 200
)
"""


@register("xlsx_review_roundtrip", _XLSX_SQL)
def xlsx_review_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Render a review workbook (S8), color the PIN-analog cell of
    "reviewer-selected" rows with the reference's yellow flag fill (S7),
    re-ingest values + fills (S6), and emit the flag partition. The file is
    driver-side by contract — review workbooks are 250-row-batched (S9) —
    so the bounded ``limit(200).toPandas()`` is the operator's semantics,
    not a scale shortcut; everything before/after the file hop is
    distributed."""
    import os
    import tempfile

    from extract_permits_spark.sinks.excel_sink import read_reviewed_workbook
    from extract_permits_spark.sinks.xlsx_io import (
        CondFormat,
        DataValidation,
        SheetSpec,
        read_xlsx,
        write_xlsx,
    )

    d = load_table(spark, sf_dir, "documents")
    review = (
        d.orderBy("doc_id")
        .limit(200)
        .select(
            "doc_id",
            "source",
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
            .isin("0", "1", "2")
            .alias("flag"),
        )
        .toPandas()
    )
    rows = [[int(r.doc_id), str(r.source)] for r in review.itertuples(index=False)]
    fills = {
        (i, 0): "FFFFFF00"  # reviewer's yellow on the id cell
        for i, r in enumerate(review.itertuples(index=False))
        if r.flag
    }
    path = os.path.join(tempfile.mkdtemp(prefix="xlsx_rt_"), "review.xlsx")
    # S8 presentation extras ride the same gate: a traffic-light cfRule and
    # a data-validation block (reference permit_cleaning.py:1027-1084) are
    # written and must survive the round trip bit-for-bit.
    cf = CondFormat(f"A2:B{len(rows) + 1}", '$B2<>""', "FFB3B3")
    dv = DataValidation(
        f"A2:A{len(rows) + 1}",
        "custom",
        formula1='$B2=""',
        error_title="Errors not resolved",
        error_message="This row still has errors.",
    )
    write_xlsx(
        path,
        [
            SheetSpec(
                name="Permits",
                header=["doc_id", "source"],
                rows=rows,
                fills=fills,
                cond_formats=[cf],
                validations=[dv],
            )
        ],
    )
    raw = read_xlsx(path, "Permits")
    if raw.cond_formats != [
        {"sqref": cf.sqref, "formula": cf.formula, "bg_color": "FF" + cf.bg_color}
    ] or [v["formula1"] for v in raw.validations] != [dv.formula1]:
        raise AssertionError("S8 conditional-format/validation round trip failed")
    ingested = read_reviewed_workbook(spark, path, "Permits", pin_header="doc_id")
    return ingested.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "source",
        "is_flagged",
    )


# ---------------------------------------------------------------------------
# Duplicate-cluster resolution: near-dup pairs -> connected components ->
# one canonical survivor per cluster (operators/graph.py). The pair list
# is the oracle-checked n-gram Jaccard detector; the closure is iterative
# min-label propagation (O(cluster diameter) shuffle rounds), checked
# against a DuckDB recursive CTE computing the same min-reachable-id.
# ---------------------------------------------------------------------------

_JACCARD_PAIRS_SQL = """
    WITH RECURSIVE sh AS MATERIALIZED (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(string_split_regex(trim(lower(COALESCE(text,''))), '\\s+')) - 2, 0) + 1),
               i -> array_to_string(list_slice(
                      string_split_regex(trim(lower(COALESCE(text,''))), '\\s+'), i, i + 2), ' ')
             )) AS shingles
      FROM documents
      WHERE len(string_split_regex(trim(lower(COALESCE(text,''))), '\\s+')) >= 3
    ),
    ex AS (SELECT doc_id, len(shingles) AS sz, unnest(shingles) AS sh FROM sh),
    -- MATERIALIZED: without it the recursive reach CTE re-evaluates the
    -- pair join every iteration. Count-based shared-shingle form (shingles
    -- are distinct per doc, so COUNT(*) per pair == |A.intersect.B|): same
    -- result set as the all-pairs list_intersect cross join, ~13x faster.
    pairs AS MATERIALIZED (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id, a.sz, b.sz
      HAVING CAST(COUNT(*) AS DOUBLE) / (a.sz + b.sz - COUNT(*)) >= 0.2
    ),
    sym AS MATERIALIZED (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION
      SELECT id_b AS u, id_a AS v FROM pairs
    )
"""


# Collapsed edge set for the component-closure consumers (mirror of
# _collapsed_edges): exact twins collapse to their min-doc_id
# representative before the quadratic shared-shingle pair join; twins
# re-attach as star edges. Ends at `sym` — same interface the closure
# CTEs consume — and yields IDENTICAL components to the full pair graph
# (twins share all shingles, so every collapsed edge was present or
# path-implied). The full pair list (_JACCARD_PAIRS_SQL) remains the
# oracle for entries whose OUTPUT is the pair graph itself
# (dedup_ngram_jaccard, graph_triangles, graph_pagerank).
_COMPONENT_EDGES_SQL = """
    WITH RECURSIVE mem AS MATERIALIZED (
      SELECT doc_id,
             MIN(doc_id) OVER (PARTITION BY md5(COALESCE(text,''))) AS rep,
             COALESCE(text,'') AS t
      FROM documents
      WHERE len(string_split_regex(trim(lower(COALESCE(text,''))), '\\s+')) >= 3
    ),
    sh AS MATERIALIZED (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(string_split_regex(trim(lower(t)), '\\s+')) - 2, 0) + 1),
               i -> array_to_string(list_slice(
                      string_split_regex(trim(lower(t)), '\\s+'), i, i + 2), ' ')
             )) AS shingles
      FROM mem WHERE doc_id = rep
    ),
    ex AS (SELECT doc_id, len(shingles) AS sz, unnest(shingles) AS sh FROM sh),
    pairs AS MATERIALIZED (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id, a.sz, b.sz
      HAVING CAST(COUNT(*) AS DOUBLE) / (a.sz + b.sz - COUNT(*)) >= 0.2
    ),
    edges AS MATERIALIZED (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION ALL
      SELECT rep AS u, doc_id AS v FROM mem WHERE doc_id <> rep
    ),
    sym AS MATERIALIZED (
      SELECT u, v FROM edges
      UNION
      SELECT v AS u, u AS v FROM edges
    )
"""


@register(
    "dedup_cluster_components",
    _COMPONENT_EDGES_SQL
    + """
    , reach(id, comp) AS (
        SELECT u, u FROM (SELECT DISTINCT u FROM sym)
      UNION
        SELECT s.v, r.comp FROM reach r JOIN sym s ON s.u = r.id
    )
    SELECT id, MIN(comp) AS component FROM reach GROUP BY id
    """,
)
def dedup_cluster_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive closure of the n-gram Jaccard near-dup pairs: every doc
    that appears in a pair, labeled with the minimum doc_id reachable
    through the pair graph (the cluster key). Spark side is iterative
    min-label propagation over DataFrames (operators/graph.py:44); the
    oracle is a DuckDB recursive CTE over the same pair SQL."""
    return _components_cached(spark, sf_dir).select("id", "component")


@register(
    "dedup_cluster_canonical",
    _COMPONENT_EDGES_SQL
    + """
    , reach(id, comp) AS (
        SELECT u, u FROM (SELECT DISTINCT u FROM sym)
      UNION
        SELECT s.v, r.comp FROM reach r JOIN sym s ON s.u = r.id
    ),
    comp AS (SELECT id, MIN(comp) AS component FROM reach GROUP BY id)
    SELECT component, canonical_id, cluster_size FROM (
      SELECT c.component,
             FIRST_VALUE(c.id) OVER (
               PARTITION BY c.component
               ORDER BY length(COALESCE(d.text, '')) DESC, c.id ASC
             ) AS canonical_id,
             CAST(COUNT(*) OVER (PARTITION BY c.component) AS BIGINT) AS cluster_size,
             ROW_NUMBER() OVER (PARTITION BY c.component ORDER BY c.id) AS rn
      FROM comp c JOIN documents d ON d.doc_id = c.id
    ) WHERE rn = 1
    """,
)
def dedup_cluster_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per duplicate cluster: the surviving document (longest text, ties
    to lowest doc_id) and the cluster size — the actual dedup DECISION a
    pretraining pipeline applies after pair detection."""
    from extract_permits_spark.operators.graph import canonical_per_cluster

    d = load_table(spark, sf_dir, "documents")
    docs_q = d.select("doc_id", F.length(F.coalesce("text", F.lit(""))).alias("_quality"))
    comps = _components_cached(spark, sf_dir)
    return canonical_per_cluster(comps, docs_q, id_col="doc_id", quality_col="_quality")


# Deterministic driver-coordinated computations (the CC label fixpoint and
# the IVF Lloyd fit) run actions while BUILDING their result, so a caller
# that constructs the same query twice — the correctness harness does, once
# for values and once for the schema — pays the whole loop twice. Both are
# pure functions of (session, fixture dir); memoize per process. The cached
# components frame is localCheckpoint'ed (safe to reuse); the cached
# centroids are plain floats.
_COMPONENTS_CACHE: dict[tuple[int, str], DataFrame] = {}
_JACCARD_PAIRS_CACHE: dict[tuple[int, str], DataFrame] = {}
_IVF_CENTROID_CACHE: dict[tuple[int, str], list[list[float]]] = {}


def _jaccard_pairs_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared shingle scan (r5-VERDICT ask #3): the n-gram pair list feeds
    three registry entries (the pair detector itself plus both cluster
    resolutions). Materialize it once per (session, fixture) and reuse —
    at scale this is the standard pattern of persisting the candidate
    pair list before closure rather than re-deriving it per consumer."""
    key = (id(spark), sf_dir)
    if key not in _JACCARD_PAIRS_CACHE:
        _JACCARD_PAIRS_CACHE[key] = _jaccard_pairs_uncached(
            spark, sf_dir
        ).localCheckpoint(eager=True)
    return _JACCARD_PAIRS_CACHE[key]


def _collapsed_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup graph edges with exact-duplicate collapse — the
    dup-heavy-crawl scale path (CCNet/Dolma-style: exact dedup BEFORE
    near-dup detection).

    The shared-shingle pair join is quadratic in the per-shingle posting
    length, so a corpus where each page has k exact copies pays k² on
    every bucket. Collapsing identical texts first (min doc_id per
    md5(text) = the representative) runs the pair join on DISTINCT texts
    only and re-attaches twins as star edges rep→twin — linear in twin
    count. Connected components over (rep pairs ∪ twin stars) equal
    components over the full pair graph exactly: exact twins share ALL
    shingles (Jaccard 1.0 ≥ 0.2), so within a twin group every pair edge
    existed, and any twin↔other edge is implied via its rep's path.
    Twin stars are restricted to shingle-ELIGIBLE docs (≥ 1 shingle),
    matching the old graph's node set — identical-text docs too short to
    shingle were never nodes and must not become one.

    Measured at the 10×-amplified sf0.1 bench shape (50k docs, 9 exact
    twins each): curation composite 72 s → see BENCH; at 1× the extra
    md5 window costs ~0.1 s."""
    d = load_table(spark, sf_dir, "documents")
    eligible = d.select("doc_id", "text").where(
        F.size(simfn.word_shingles("text", 3)) > 0
    )
    wt = Window.partitionBy("_h")
    mem = eligible.withColumn(
        "_h", F.md5(F.coalesce(F.col("text"), F.lit("")))
    ).select("doc_id", "text", F.min("doc_id").over(wt).alias("_rep"))
    reps = mem.where(F.col("doc_id") == F.col("_rep")).select("doc_id", "text")
    sh = reps.select(
        "doc_id", simfn.word_shingles("text", 3).alias("shingles")
    )
    exploded = sh.select(
        "doc_id", F.size("shingles").alias("sz"), F.explode("shingles").alias("sh")
    )
    shared = (
        exploded.alias("a")
        .join(exploded.alias("b"), ["sh"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.sz").alias("_sza"),
            F.col("b.sz").alias("_szb"),
        )
        .agg(F.count(F.lit(1)).alias("_shared"))
    )
    jac = F.col("_shared") / (F.col("_sza") + F.col("_szb") - F.col("_shared"))
    rep_pairs = shared.where(jac >= 0.2).select("id_a", "id_b")
    twin_stars = mem.where(F.col("doc_id") != F.col("_rep")).select(
        F.col("_rep").alias("id_a"), F.col("doc_id").alias("id_b")
    )
    return rep_pairs.unionByName(twin_stars)


def _components_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    from extract_permits_spark.operators.graph import connected_components

    key = (id(spark), sf_dir)
    if key not in _COMPONENTS_CACHE:
        _COMPONENTS_CACHE[key] = connected_components(
            _collapsed_edges(spark, sf_dir)
        )
    return _COMPONENTS_CACHE[key]


def _ivf_centroids_cached(
    spark: SparkSession, emb: DataFrame, sf_dir: str
) -> list[list[float]]:
    key = (id(spark), sf_dir)
    if key not in _IVF_CENTROID_CACHE:
        _IVF_CENTROID_CACHE[key] = simfn.kmeans_fit(
            emb, "vec_id", "embedding", k=16, rounds=3
        )
    return _IVF_CENTROID_CACHE[key]


# ---------------------------------------------------------------------------
# Corpus assembly (functions/corpus.py): sequence packing and deterministic
# mixture interleaving — the steps between dedup and training-shard write.
# ---------------------------------------------------------------------------


@register(
    "pack_sequences",
    """
    WITH RECURSIVE toks AS (
      SELECT doc_id % 8 AS shard, doc_id,
             CASE WHEN trim(COALESCE(text,'')) = '' THEN 0
                  ELSE len(string_split_regex(trim(COALESCE(text,'')), '\\s+'))
             END AS weight,
             ROW_NUMBER() OVER (PARTITION BY doc_id % 8 ORDER BY doc_id) AS rn
      FROM documents
    ),
    pack(shard, rn, doc_id, weight, bin, used) AS (
        SELECT shard, rn, doc_id, weight, 0, weight FROM toks WHERE rn = 1
      UNION ALL
        SELECT t.shard, t.rn, t.doc_id, t.weight,
               CASE WHEN p.used + t.weight > 64 THEN p.bin + 1 ELSE p.bin END,
               CASE WHEN p.used + t.weight > 64 THEN t.weight ELSE p.used + t.weight END
        FROM pack p JOIN toks t ON t.shard = p.shard AND t.rn = p.rn + 1
    )
    SELECT shard, doc_id, CAST(weight AS BIGINT) AS weight, CAST(bin AS BIGINT) AS bin
    FROM pack
    """,
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-fit sequence packing of documents into 64-token bins, 8
    independent shards (functions/corpus.py:next_fit_pack — stateful
    applyInPandas per shard). The oracle replays the identical walk as a
    DuckDB recursive CTE advancing one row per shard per step."""
    from extract_permits_spark.functions.corpus import next_fit_pack

    d = load_table(spark, sf_dir, "documents")
    docs = d.select(
        "doc_id",
        (F.col("doc_id") % 8).alias("shard"),
        textfn.token_count("text").cast("long").alias("n_tokens"),
    )
    return next_fit_pack(
        docs, id_col="doc_id", weight_col="n_tokens", shard_col="shard", budget=64
    )


@register(
    "sample_interleave",
    """
    SELECT doc_id, source, mix_rank FROM (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS mix_rank
      FROM documents
      WHERE source IN ('src0', 'src1', 'src2')
    )
    WHERE mix_rank <= CASE source
                        WHEN 'src0' THEN 12 WHEN 'src1' THEN 6 ELSE 3 END
    """,
)
def sample_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mixture sample: 12/6/3 documents from src0/src1/src2
    selected by md5(doc_id) — reproducible across engines and runs
    (functions/corpus.py:interleave_sources)."""
    from extract_permits_spark.functions.corpus import interleave_sources

    d = load_table(spark, sf_dir, "documents")
    out = interleave_sources(
        d, id_col="doc_id", source_col="source",
        quotas={"src0": 12, "src1": 6, "src2": 3},
    )
    return out.select("doc_id", "source", F.col("mix_rank").cast("long").alias("mix_rank"))


@register(
    "emb_quantize",
    """
    WITH q AS (
      SELECT vec_id,
             list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS maxabs
      FROM embeddings
    ),
    qq AS (
      SELECT e.vec_id,
             CASE WHEN q.maxabs = 0
                  THEN list_transform(e.embedding, x -> 0)
                  ELSE list_transform(e.embedding,
                       x -> CAST(floor(CAST(x AS DOUBLE) / (q.maxabs / 127.0) + 0.5) AS INT))
             END AS qvec,
             q.maxabs
      FROM embeddings e JOIN q USING (vec_id)
    )
    SELECT vec_id,
           floor((maxabs / 127.0) * 1000000000.0 + 0.5) / 1000000000.0 AS scale,
           CAST(list_min(qvec) AS INT) AS q_min,
           CAST(list_max(qvec) AS INT) AS q_max,
           CAST(list_sum(qvec) AS BIGINT) AS q_sum
    FROM qq
    """,
)
def emb_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding column
    (functions/similarity.py:int8_quantize) — summarized per vector as
    (scale, min, max, sum of quantized values) so the cross-engine value
    hash covers every element without comparing array renderings. The
    scale is rounded with the floor(x*1e9 + 0.5)/1e9 half-up spelling on
    BOTH engines — Spark round() is HALF_UP while DuckDB's double round is
    not, so a tie at the 9th decimal would otherwise flake."""
    emb = load_table(spark, sf_dir, "embeddings")
    q, scale = simfn.int8_quantize(F.col("embedding"))
    scale9 = F.floor(scale * F.lit(1e9) + F.lit(0.5)) / F.lit(1e9)
    return emb.select(
        "vec_id",
        scale9.alias("scale"),
        F.array_min(q).alias("q_min"),
        F.array_max(q).alias("q_max"),
        F.aggregate(q, F.lit(0).cast("long"), lambda acc, v: acc + v).alias("q_sum"),
    )


# ===========================================================================
# r6 additions: repetition quality filters, sub-document dedup, benchmark
# decontamination, corpus vocabulary/mixture stats, hopping + session
# windows (batch and streaming engines over the same oracle).
# ===========================================================================


@register(
    "text_repetition",
    r"""
    WITH t AS (
      SELECT doc_id,
             CASE WHEN trim(COALESCE(text,'')) = '' THEN []
                  ELSE string_split_regex(trim(lower(COALESCE(text,''))), '\s+')
             END AS toks
      FROM documents
    ), g AS (
      SELECT doc_id, toks,
             CASE WHEN len(toks) < 2 THEN CAST([] AS VARCHAR[])
                  ELSE list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])
             END AS big,
             CASE WHEN len(toks) < 3 THEN CAST([] AS VARCHAR[])
                  ELSE list_transform(range(1, len(toks)-1), i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
             END AS tri
      FROM t
    )
    SELECT doc_id,
           CASE WHEN len(toks) = 0 THEN 0.0
                ELSE round(CAST(len(toks) - len(list_distinct(toks)) AS DOUBLE) / len(toks), 6)
           END AS dup_token_frac,
           CASE WHEN len(big) = 0 THEN 0.0
                ELSE round(CAST(list_max(list_transform(list_distinct(big),
                       x -> len(list_filter(big, b -> b = x)))) AS DOUBLE) / len(big), 6)
           END AS top_bigram_frac,
           CASE WHEN len(tri) = 0 THEN 0.0
                ELSE round(CAST(list_max(list_transform(list_distinct(tri),
                       x -> len(list_filter(tri, b -> b = x)))) AS DOUBLE) / len(tri), 6)
           END AS top_trigram_frac
    FROM g
    """,
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters (duplicate-token fraction, top
    bigram/trigram share). Narrow per-document array expressions — no
    shuffle, linear over the corpus; per-doc cost bounded by doc length.
    The line-level variant (functions/text.py:dup_line_fraction) is
    pytest-covered — the fixture corpus is single-line."""
    d = load_table(spark, sf_dir, "documents")
    return textfn.repetition_metrics(d, "doc_id", "text")


@register(
    "docs_segment_dedup",
    r"""
    WITH t AS (
      SELECT doc_id,
             CASE WHEN trim(COALESCE(text,'')) = '' THEN []
                  ELSE string_split_regex(trim(lower(COALESCE(text,''))), '\s+')
             END AS toks
      FROM documents
    ), seg AS (
      SELECT doc_id,
             CAST((i - 1) // 8 AS INT) AS seg_idx,
             array_to_string(toks[i:i+7], ' ') AS seg
      FROM t, unnest(range(1, len(toks) + 1, 8)) AS u(i)
      WHERE len(toks) > 0
    ), ranked AS (
      SELECT doc_id, seg_idx, seg,
             row_number() OVER (PARTITION BY seg ORDER BY doc_id, seg_idx) AS rn
      FROM seg
    )
    SELECT doc_id,
           COUNT(*) AS n_segs,
           CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           COALESCE(string_agg(CASE WHEN rn = 1 THEN seg END, ' ' ORDER BY seg_idx), '')
             AS clean_text
    FROM ranked
    GROUP BY doc_id
    """,
)
def docs_segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document exact dedup at 8-token-segment grain (the RefinedWeb
    paragraph-dedup pass, segment-shaped because the fixture corpus has no
    newlines): corpus-global keep-first on segment text, then in-order
    reassembly per document. functions/corpus.py:segment_dedup."""
    from extract_permits_spark.functions.corpus import segment_dedup

    d = load_table(spark, sf_dir, "documents")
    return segment_dedup(d, "doc_id", "text", seg_tokens=8)


@register(
    "docs_decontaminate",
    r"""
    WITH t AS (
      SELECT doc_id,
             CASE WHEN trim(COALESCE(text,'')) = '' THEN []
                  ELSE string_split_regex(trim(lower(COALESCE(text,''))), '\s+')
             END AS toks
      FROM documents
    ), sh AS (
      SELECT doc_id, array_to_string(toks[i:i+4], ' ') AS g
      FROM t, unnest(range(1, len(toks) - 3, 1)) AS u(i)
      WHERE len(toks) >= 5
    ), ev AS (
      SELECT DISTINCT g FROM sh WHERE doc_id % 10 = 0
    ), hits AS (
      SELECT s.doc_id, COUNT(*) AS n_hits
      FROM sh s JOIN ev USING (g)
      WHERE s.doc_id % 10 <> 0
      GROUP BY s.doc_id
    )
    SELECT d.doc_id,
           COALESCE(h.n_hits, 0) AS n_hits,
           COALESCE(h.n_hits, 0) > 0 AS is_contaminated
    FROM documents d LEFT JOIN hits h USING (doc_id)
    WHERE d.doc_id % 10 <> 0
    """,
)
def docs_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing any word
    5-gram with the (held-out) eval slice ``doc_id % 10 == 0``. The eval
    n-gram set is broadcast — a map-side hash probe over the training
    n-grams, no shuffle of the big side
    (functions/corpus.py:decontaminate)."""
    from extract_permits_spark.functions.corpus import decontaminate

    d = load_table(spark, sf_dir, "documents")
    ev = d.where(F.col("doc_id") % 10 == 0)
    train = d.where(F.col("doc_id") % 10 != 0)
    return decontaminate(train, ev, "doc_id", "text", n=5)


@register("stream_decontaminate_ingest", _ORACLES["docs_decontaminate"])
def stream_decontaminate_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static decontamination gate: training documents
    (doc_id%10!=0) arrive through a file stream in multiple micro-batches
    (maxFilesPerTrigger=1) and each is flagged against the STATIC eval
    5-gram index (doc_id%10==0), built once with the exact tokenize/
    n-gram contract of the batch decontamination
    (streaming/decontaminate_ingest.py ↔ functions/corpus.py:
    decontaminate). The oracle is docs_decontaminate's batch SQL
    verbatim — proving the incremental per-micro-batch decision equals
    the full-corpus batch conclusion, the invariant that lets a crawl
    pipeline gate contamination at ingest time instead of re-scanning
    the corpus before every training run."""
    import os
    import shutil
    import tempfile

    from extract_permits_spark.streaming.decontaminate_ingest import (
        run_decontaminate_ingest_available_now,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    eval_docs = d.where(F.col("doc_id") % 10 == 0)
    train = d.where(F.col("doc_id") % 10 != 0)

    work = tempfile.mkdtemp(prefix="stream_decon_")
    src = os.path.join(work, "in")
    os.makedirs(src)
    # two files -> two micro-batches under maxFilesPerTrigger=1
    for half, fname in ((0, "f0"), (1, "f1")):
        train.where((F.col("doc_id") % 2) == half).coalesce(1).write.parquet(
            os.path.join(src, fname)
        )
    for sub in ("f0", "f1"):
        for fn in os.listdir(os.path.join(src, sub)):
            if fn.endswith(".parquet"):
                shutil.move(
                    os.path.join(src, sub, fn),
                    os.path.join(src, f"{sub}.parquet"),
                )
        shutil.rmtree(os.path.join(src, sub), ignore_errors=True)

    out = os.path.join(work, "out")
    q, eval_grams = run_decontaminate_ingest_available_now(
        spark, src, eval_docs, os.path.join(work, "ckpt"), out_path=out
    )
    q.awaitTermination(300)
    eval_grams.unpersist()
    # project off the idempotency partition key — the oracle is the batch
    # decontamination contract, which has no notion of micro-batches
    return spark.read.parquet(out).select(
        "doc_id", "n_hits", "is_contaminated"
    )


@register("stream_semantic_decon_ingest", _ann_sql.lsh_cross_decon_sql())
def stream_semantic_decon_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static SEMANTIC decontamination gate
    (streaming/semantic_decon_ingest.py): training vectors (vec_id%10!=0)
    arrive through a file stream in multiple micro-batches
    (maxFilesPerTrigger=1) and each batch is probed against the STATIC
    eval suite (vec_id%10==0) with the exact batch operator
    (similarity.lsh_cross_hits — per-vector decisions are independent
    and, with the gate UNCAPPED — no corpus-bucket-size filter whose
    binding point would depend on how much corpus a frame happens to
    hold — depend on nothing but the static probe side, so stream ≡
    batch unconditionally, at any scale). The oracle is
    emb_cross_decontaminate's pairwise replay verbatim — proving the
    ingest-time incremental decision equals the full-corpus batch
    conclusion, the same invariant the n-gram gate
    (stream_decontaminate_ingest) pins for exact-match leakage. Writes
    are batch_id-scoped dynamic-partition overwrites (idempotent under
    foreachBatch replay)."""
    import os
    import shutil
    import tempfile

    from extract_permits_spark.streaming.semantic_decon_ingest import (
        run_semantic_decon_ingest_available_now,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    ev = emb.where(F.col("vec_id") % 10 == 0)
    tr = emb.where(F.col("vec_id") % 10 != 0)

    work = tempfile.mkdtemp(prefix="stream_semdecon_")
    src = os.path.join(work, "in")
    os.makedirs(src)
    # two files -> two micro-batches under maxFilesPerTrigger=1
    for half, fname in ((0, "f0"), (1, "f1")):
        tr.where((F.col("vec_id") % 2) == half).coalesce(1).write.parquet(
            os.path.join(src, fname)
        )
    for sub in ("f0", "f1"):
        for fn in os.listdir(os.path.join(src, sub)):
            if fn.endswith(".parquet"):
                shutil.move(
                    os.path.join(src, sub, fn),
                    os.path.join(src, f"{sub}.parquet"),
                )
        shutil.rmtree(os.path.join(src, sub), ignore_errors=True)

    out = os.path.join(work, "out")
    q = run_semantic_decon_ingest_available_now(
        spark, src, ev, os.path.join(work, "ckpt"), out, min_cosine=0.35
    )
    q.awaitTermination(300)
    return spark.read.parquet(out).select(
        "vec_id", "n_hits", "is_contaminated"
    )


@register(
    "sketch_topk_tokens",
    r"""
    WITH toks AS (
      SELECT unnest(string_split_regex(trim(lower(COALESCE(text,''))), '\s+')) AS token
      FROM documents
      WHERE trim(COALESCE(text,'')) <> ''
    )
    SELECT token, COUNT(*) AS n
    FROM toks GROUP BY token
    ORDER BY n DESC, token
    LIMIT 20
    """,
)
def sketch_topk_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus frequent-items: top-20 tokens by count, ties broken by token
    text so the result set is deterministic. Partial-aggregates map-side
    (mergeable across executors); the final top-k is a single reduce of
    per-partition heads — the exact-count analog of a frequent-items
    sketch, and the vocabulary-stats pass a tokenizer build runs."""
    from extract_permits_spark.functions.similarity import tokens

    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "token")
        .limit(20)
    )


@register(
    "sample_mixture_weights",
    """
    WITH c AS (
      SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
    )
    SELECT source, n_docs,
           round(pow(n_docs, 0.5) / SUM(pow(n_docs, 0.5)) OVER (), 6) AS weight
    FROM c
    """,
)
def sample_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixture weights (w ∝ n^0.5, normalized):
    the sampling-temperature computation for multi-source corpus assembly
    (functions/corpus.py:mixture_weights). One aggregation; the window
    normalizer runs over source-count rows, whose cardinality is the
    number of sources, not documents."""
    from extract_permits_spark.functions.corpus import mixture_weights

    d = load_table(spark, sf_dir, "documents")
    return mixture_weights(d, "source", alpha=0.5)


@register(
    "ev_hopping_agg",
    """
    WITH w AS (
      SELECT time_bucket(INTERVAL '30 minutes', ts) AS ws, event_type, value FROM events
      UNION ALL
      SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL 30 MINUTE, event_type, value
      FROM events
    )
    SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM w GROUP BY ws, event_type
    """,
)
def ev_hopping_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) windows: 1-hour windows every 30 minutes — each
    event lands in exactly two windows. Spark's window() expands to the
    overlap set before the partial aggregation, so the shuffle carries
    pre-combined per-(window,type) rows, not events. The DuckDB twin
    spells the two aligned window starts with time_bucket + UNION ALL."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


_EV_SESSION_SQL = """
    WITH gaps AS (
      SELECT user_id, ts, value, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS sid
      FROM gaps
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM sessions
    GROUP BY user_id, sid
"""


@register("ev_session_window", _EV_SESSION_SQL)
def ev_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session windows (session_window(), 30-minute gap) in batch
    mode — the engine-managed form of ev_sessionize's gaps-and-islands.
    Spark merges sessions whose windows overlap OR touch: a gap of exactly
    30 minutes still merges (closed-interval merge), so the oracle's
    island break is strictly >, matching ev_sessionize. streaming/events.py:session_counts
    is shared with the streaming twin stream_session_agg."""
    from extract_permits_spark.streaming.events import session_counts

    e = load_table(spark, sf_dir, "events")
    return session_counts(e.withColumn("ts", F.col("ts").cast("timestamp")))


@register("stream_session_agg", _EV_SESSION_SQL)
def stream_session_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME session aggregation through the streaming engine
    (file source -> watermark -> session_window merge state -> availableNow
    drain): streaming and batch must agree with the gaps-and-islands
    oracle. Session state is merged per micro-batch and bounded by the
    watermark at steady state."""
    import os
    import shutil
    import tempfile

    from extract_permits_spark.streaming.events import run_sessions_available_now

    work = tempfile.mkdtemp(prefix="ev_stream_sessions_")
    src = os.path.join(work, "in")
    os.makedirs(src)
    shutil.copy(os.path.join(sf_dir, "events.parquet"), src)
    name = f"ev_stream_sessions_{abs(hash(sf_dir)) % 10**8}"
    q = run_sessions_available_now(spark, src, os.path.join(work, "ckpt"), table_name=name)
    q.awaitTermination(300)
    return spark.sql(f"SELECT * FROM {name}")


# ===========================================================================
# URL-level dedup — the first pass of every crawl pipeline (CCNet,
# RefinedWeb, Dolma): canonicalize the URL, keep the best document per
# canonical key. The fixture corpus has no URL column, so the entry
# synthesizes three deterministic URL *variants* per document (https+www
# +utm tracking / HTTP+trailing-slash+ref+fragment / bare+utm_campaign)
# from doc_id — documents agreeing on (source, doc_id%23, doc_id%7)
# collide after canonicalization, exercising scheme/www/fragment/tracking
# stripping, trailing-slash removal, and query-parameter sorting at once.
# ===========================================================================

_URL_DEDUP_SQL = r"""
    WITH u AS (
      SELECT doc_id, n_chars,
        CASE doc_id % 3 WHEN 0 THEN 'https://www.' WHEN 1 THEN 'HTTP://' ELSE 'https://' END
        || source || '.Example.com/Docs/' || CAST(doc_id % 23 AS VARCHAR)
        || CASE doc_id % 3
             WHEN 0 THEN '?z=9&utm_source=feed&id=' || CAST(doc_id % 7 AS VARCHAR)
             WHEN 1 THEN '/?z=9&id=' || CAST(doc_id % 7 AS VARCHAR) || '&ref=tw#frag'
             ELSE '?id=' || CAST(doc_id % 7 AS VARCHAR) || '&z=9&utm_campaign=x'
           END AS url
      FROM documents
    ), c AS (
      SELECT doc_id, n_chars,
             regexp_replace(regexp_replace(url, '^https?://', '', 'i'), '#.*$', '') AS u1
      FROM u
    ), parts AS (
      SELECT doc_id, n_chars,
        regexp_replace(lower(regexp_extract(u1, '^([^/?]+)', 1)), '^www\.', '') AS host,
        regexp_replace(regexp_extract(regexp_replace(u1, '^[^/?]+', ''), '^([^?]*)', 1), '/+$', '') AS path,
        CASE WHEN instr(regexp_replace(u1, '^[^/?]+', ''), '?') > 0
             THEN regexp_replace(regexp_replace(u1, '^[^/?]+', ''), '^[^?]*\?', '')
             ELSE '' END AS q
      FROM c
    ), keyed AS (
      SELECT doc_id, n_chars,
        host || path || CASE WHEN qq = '' THEN '' ELSE '?' || qq END AS canonical_url
      FROM (
        SELECT doc_id, n_chars, host, path,
          array_to_string(list_sort(list_filter(string_split(q, '&'),
            p -> p <> '' AND NOT regexp_matches(p,
              '^(utm_[a-z]+|ref|fbclid|gclid|msclkid|mc_cid|mc_eid)=', 'i'))), '&') AS qq
        FROM parts
      )
    )
    SELECT doc_id, canonical_url,
           COUNT(*) OVER (PARTITION BY canonical_url) AS n_dups,
           row_number() OVER (PARTITION BY canonical_url
                              ORDER BY n_chars DESC, doc_id) = 1 AS is_canonical
    FROM keyed
"""


@register("docs_url_dedup", _URL_DEDUP_SQL)
def docs_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + keep-best-per-canonical-URL
    (functions/web.py). Pure expressions end to end: the canonical key is
    one codegen'd regexp chain, the dedup one hash shuffle on a short
    near-uniform string key — the cheapest dedup pass available at crawl
    scale, run before any content hashing."""
    from extract_permits_spark.functions.web import url_dedup

    d = load_table(spark, sf_dir, "documents")
    variant = F.col("doc_id") % 3
    idq = (F.col("doc_id") % 7).cast("string")
    url = F.concat(
        F.when(variant == 0, F.lit("https://www."))
        .when(variant == 1, F.lit("HTTP://"))
        .otherwise(F.lit("https://")),
        F.col("source"),
        F.lit(".Example.com/Docs/"),
        (F.col("doc_id") % 23).cast("string"),
        F.when(variant == 0, F.concat(F.lit("?z=9&utm_source=feed&id="), idq))
        .when(variant == 1, F.concat(F.lit("/?z=9&id="), idq, F.lit("&ref=tw#frag")))
        .otherwise(F.concat(F.lit("?id="), idq, F.lit("&z=9&utm_campaign=x"))),
    )
    deduped = url_dedup(
        d.withColumn("url", url), "doc_id", "url", quality_col="n_chars"
    )
    return deduped.select("doc_id", "canonical_url", "n_dups", "is_canonical")


# ===========================================================================
# DSIR-style importance weighting (Xie et al. 2023): hashed-unigram
# log-likelihood ratio of target vs raw bag-of-words models. The target
# slice reuses the decontamination convention (doc_id % 10 == 0 plays the
# target domain); raw = the rest. Model state is a bounded 1024-row
# bucket table (broadcast), so the scoring pass is map-side regardless of
# corpus size.
# ===========================================================================

_DSIR_SQL = r"""
    WITH toks AS (
      SELECT doc_id, doc_id % 10 = 0 AS is_target,
             unnest(string_split_regex(trim(lower(COALESCE(text,''))), '\s+')) AS tok
      FROM documents
      WHERE trim(COALESCE(text,'')) <> ''
    ), b AS (
      SELECT doc_id, is_target,
             CAST(('0x' || substring(md5(tok), 1, 15)) AS BIGINT) % 1024 AS bucket
      FROM toks
    ), stats AS (
      SELECT bucket,
             SUM(CASE WHEN NOT is_target THEN 1 ELSE 0 END) AS rc,
             SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS tc
      FROM b GROUP BY bucket
    ), tot AS (
      SELECT SUM(rc) AS r_total, SUM(tc) AS t_total FROM stats
    ), ratio AS (
      SELECT bucket,
             ln((tc + 1.0) / (t_total + 1024.0)) - ln((rc + 1.0) / (r_total + 1024.0)) AS lr
      FROM stats, tot
    )
    SELECT b.doc_id,
           COUNT(*) AS n_tokens,
           SUM(ratio.lr) AS importance_weight
    FROM b JOIN ratio USING (bucket)
    WHERE NOT b.is_target
    GROUP BY b.doc_id
"""


@register("docs_dsir_weights", _DSIR_SQL)
def docs_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance-resampling weights for data selection
    (functions/corpus.py:importance_weights). The bucket LM table is
    bounded (1024 rows) and broadcast; only compact (bucket, count) pairs
    shuffle. Cross-engine md5 bucket hash, oracle replays the full model
    fit + scoring."""
    from extract_permits_spark.functions.corpus import importance_weights

    d = load_table(spark, sf_dir, "documents")
    target = d.where(F.col("doc_id") % 10 == 0)
    raw = d.where(F.col("doc_id") % 10 != 0)
    return importance_weights(raw, target, "doc_id", "text")


# ===========================================================================
# Product quantization (Jégou et al. 2011) — the compression layer that
# makes 100-TB embedding stores searchable: 64-dim float32 → 8 codes
# (32× smaller). Deterministic per-subspace Lloyd fit; both entries are
# REAL twins (plans/ann_sql.py replays fit + encode + ADC end to end).
# ===========================================================================

_PQ_BOOK_CACHE: dict = {}


def _pq_book_cached(spark: SparkSession, emb: DataFrame, sf_dir: str):
    from extract_permits_spark.functions.pq import pq_fit

    key = (id(spark), sf_dir)
    if key not in _PQ_BOOK_CACHE:
        _PQ_BOOK_CACHE[key] = pq_fit(emb, m=8, k=16, rounds=1)
    return _PQ_BOOK_CACHE[key]


@register("emb_pq_codes", _ann_sql.pq_codes_sql())
def emb_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ fit + encode: per-subspace codes and per-coordinate squared
    reconstruction error. Encoding is a zero-shuffle narrow map (literal
    codebook in codegen); driver state is the bounded m×k×(d/m)
    codebook."""
    from extract_permits_spark.functions.pq import pq_encode

    emb = load_table(spark, sf_dir, "embeddings")
    book = _pq_book_cached(spark, emb, sf_dir)
    return pq_encode(emb, book).drop("_code_arr")


@register("emb_pq_adc_topk", _ann_sql.pq_adc_sql())
def emb_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADC search over PQ codes: the query stays raw, the corpus is only
    touched through its 8-byte codes — per-subspace literal distance
    table indexed by code, left-associated sum (the oracle mirrors the
    fold order via list_sum(list(... ORDER BY sub)))."""
    from extract_permits_spark.functions.pq import pq_adc_topk
    from extract_permits_spark.functions.similarity import _py_round_half_up

    emb = load_table(spark, sf_dir, "embeddings")
    book = _pq_book_cached(spark, emb, sf_dir)
    raw = [
        float(x)
        for x in emb.where(F.col("vec_id") == 0).select("embedding").first()[0]
    ]
    norm = sum(x * x for x in raw) ** 0.5
    qvec = [_py_round_half_up(x / norm, 9) for x in raw]
    return pq_adc_topk(emb, book, qvec, topk=20)


@register("emb_ivfpq_topk", _ann_sql.ivfpq_topk_sql(num_probes=6))
def emb_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC — the composed production ANN path (FAISS IndexIVFPQ;
    Jégou et al. 2011 §V): the IVF coarse quantizer prunes to the 6
    nearest clusters, PQ codes + a per-query asymmetric distance table
    rank only their members. Reuses the cached k-means centroids
    (ann_ivf_* family) and the cached PQ codebook (emb_pq_* family) —
    index once, query many. One narrow map computes BOTH the cluster
    assignment and the 8-byte code per vector; the probe filter lands
    before anything wide; the only exchange is the final top-k. The
    oracle replays coarse fit, probe selection, PQ fit/encode, and ADC
    ranking end-to-end (plans/ann_sql.py:ivfpq_topk_sql)."""
    from extract_permits_spark.functions.pq import ivfpq_adc_topk

    emb = load_table(spark, sf_dir, "embeddings")
    book = _pq_book_cached(spark, emb, sf_dir)
    centroids = _ivf_centroids_cached(spark, emb, sf_dir)
    raw = [
        float(x)
        for x in emb.where(F.col("vec_id") == 0).select("embedding").first()[0]
    ]
    return ivfpq_adc_topk(
        emb, book, centroids, raw, num_probes=6, topk=20
    )


@register(
    "emb_ivfpq_batch_topk", _ann_sql.ivfpq_batch_topk_sql(num_probes=6)
)
def emb_ivfpq_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched IVFADC — the production serving shape composed end-to-end:
    a 5-query batch's probe sets + asymmetric distance tables broadcast
    as a tiny frame (bounded driver state: num_probes rows × m×k doubles
    per query), ONE kernel scan of the corpus equi-joins it on
    cluster_id (the join IS the probe pruning — a corpus row fans out
    only to queries probing its cluster), and the per-query top-20 is a
    rank-limit window Spark runs as WindowGroupLimit (pre-exchange
    heaps, same shape as ann_batch_topk). The oracle replays both fits
    once for the whole batch plus per-query probes/tables/ranking
    (plans/ann_sql.py:ivfpq_batch_topk_sql)."""
    from extract_permits_spark.functions.pq import ivfpq_batch_topk_from_table

    emb = load_table(spark, sf_dir, "embeddings")
    book = _pq_book_cached(spark, emb, sf_dir)
    centroids = _ivf_centroids_cached(spark, emb, sf_dir)
    return ivfpq_batch_topk_from_table(
        emb, book, centroids, n_queries=5, num_probes=6, topk=20
    )


@register("emb_ivfpq_indexed_topk", _ann_sql.ivfpq_topk_sql(num_probes=6))
def emb_ivfpq_indexed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted-index IVFADC serving path as a correctness row:
    write_ivfpq_index builds the codes-only cluster-partitioned index,
    ivfpq_topk_from_index queries it reading ONLY the probed partition
    directories (PartitionFilters; no embedding column in the serving
    plan — test_plan_quality pins both). Rankings are bitwise-equal to
    the in-memory path by construction (same kernel, same distance
    tables, same fold order), so the oracle is the same full IVFADC
    replay emb_ivfpq_topk proves. The 20-row result is materialized to
    a table because the index lives in a temp dir."""
    import os
    import shutil
    import tempfile

    from extract_permits_spark.functions.pq import (
        ivfpq_topk_from_index,
        write_ivfpq_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    book = _pq_book_cached(spark, emb, sf_dir)
    centroids = _ivf_centroids_cached(spark, emb, sf_dir)
    raw = [
        float(x)
        for x in emb.where(F.col("vec_id") == 0).select("embedding").first()[0]
    ]
    work = tempfile.mkdtemp(prefix="ivfpq_serve_")
    idx = os.path.join(work, "index")
    write_ivfpq_index(emb, book, centroids, idx)
    tag = abs(hash(sf_dir)) % 10**8
    table = f"ivfpq_served_{tag}"
    (
        ivfpq_topk_from_index(
            spark, idx, book, centroids, raw, num_probes=6, topk=20
        )
        .select(
            "vec_id",
            F.col("cluster_id").cast("int").alias("cluster_id"),
            "codes",
            "adc_dist",
        )
        .write.mode("overwrite")
        .saveAsTable(table)
    )
    shutil.rmtree(work, ignore_errors=True)
    return spark.sql(
        f"SELECT vec_id, cluster_id, codes, adc_dist FROM {table}"
    )


@register("stream_ann_index_ingest", _ann_sql.ivfpq_codes_sql())
def stream_ann_index_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ANN-index maintenance (streaming/ann_index_ingest.py):
    the embeddings table is written out as parquet shards, then drained
    through Structured Streaming (file source, maxFilesPerTrigger=1 →
    multiple micro-batches); each batch is coarse-assigned + PQ-encoded
    with the FROZEN quantizers (the production contract — re-fitting
    invalidates every written code) and appended to the cluster-
    partitioned index. The entry returns the final index CONTENT
    (vec_id, cluster_id, codes); the oracle computes the same
    assignment+codes in one batch replay, so a dropped batch, a double-
    applied batch, or any encode drift between the streaming and batch
    paths hash-mismatches."""
    import os
    import shutil
    import tempfile

    from extract_permits_spark.streaming.ann_index_ingest import (
        run_index_ingest_available_now,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    book = _pq_book_cached(spark, emb, sf_dir)
    centroids = _ivf_centroids_cached(spark, emb, sf_dir)
    work = tempfile.mkdtemp(prefix="ann_index_stream_")
    src = os.path.join(work, "in")
    emb.repartition(4).write.parquet(src)
    idx = os.path.join(work, "index")
    q = run_index_ingest_available_now(
        spark, src, book, centroids, idx, os.path.join(work, "ckpt")
    )
    q.awaitTermination(300)
    tag = abs(hash(sf_dir)) % 10**8
    table = f"ann_index_ingested_{tag}"
    (
        spark.read.parquet(idx)
        .select(
            "vec_id",
            F.col("cluster_id").cast("int").alias("cluster_id"),
            F.array_join(
                F.transform("code_arr", lambda c: c.cast("string")), "-"
            ).alias("codes"),
        )
        .write.mode("overwrite")
        .saveAsTable(table)
    )
    shutil.rmtree(work, ignore_errors=True)
    return spark.sql(f"SELECT vec_id, cluster_id, codes FROM {table}")


@register("emb_ivfpq_recall", _ann_sql.ivfpq_recall_sql(num_probes=6))
def emb_ivfpq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@20 of IVFADC vs exact cosine top-k — the checkable quality
    number for emb_ivfpq_topk, completing the family symmetry (every
    approximate ANN path here ships a measured, fully-oracled recall:
    lsh/ivf/matryoshka/ivfpq). IVFADC is approximate twice over — probe
    pruning can miss a cluster AND the 8-byte codes are lossy — so its
    recall is the compounding of the two trades FAISS IndexIVFPQ makes;
    the oracle replays both fits, probe selection, encode, ADC ranking,
    and the exact top-k, so the recall VALUE must hash-match, not just
    clear a floor (floor asserted in tests/test_recall.py)."""
    from extract_permits_spark.functions.pq import ivfpq_adc_topk

    emb = load_table(spark, sf_dir, "embeddings")
    book = _pq_book_cached(spark, emb, sf_dir)
    centroids = _ivf_centroids_cached(spark, emb, sf_dir)
    raw = [
        float(x)
        for x in emb.where(F.col("vec_id") == 0).select("embedding").first()[0]
    ]
    return _ann_recall_frame(
        ivfpq_adc_topk(emb, book, centroids, raw, num_probes=6, topk=20),
        simfn.brute_force_topk(emb, raw, k=20),
        k=20,
    )


# ===========================================================================
# Training-run data layout: deterministic global shuffle + fixed shard
# assignment, and quality-score curriculum binning. Both are pure
# relational plans — the "shuffle" is an md5 sort key (reproducible
# across runs and engines), sharding is modulo on the rank.
# ===========================================================================


@register(
    "docs_shard_shuffle",
    r"""
    WITH ranked AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1
               AS shuffle_rank
      FROM documents
    )
    SELECT doc_id,
           shuffle_rank,
           CAST(shuffle_rank % 8 AS INT) AS shard_id,
           CAST(shuffle_rank // 8 AS BIGINT) AS pos_in_shard
    FROM ranked
    """,
)
def docs_shard_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle + round-robin shard assignment for a
    training run: order by md5(id) (reproducible, engine-independent,
    uncorrelated with any data attribute), then stripe ranks across 8
    shards. Round-robin on the *shuffled* rank gives every shard an
    unbiased sample AND equal size (±1) by construction.

    The global rank is the distributed-offset spelling
    (operators/windows.py:distributed_rank — range exchange + local
    index + broadcast partition offsets), NOT a single-partition
    row_number window: identical output under this total order (md5 key,
    doc_id tiebreak), one wide shuffle, no one-reducer funnel at 100 TB.
    The md5 sort keys are near-uniform so the range partitioning behind
    the sort is skew-free."""
    d = load_table(spark, sf_dir, "documents")
    key = F.md5(F.col("doc_id").cast("string").cast("binary"))
    return distributed_rank(
        d.select("doc_id"), [key, F.col("doc_id")], "shuffle_rank", zero_based=True
    ).select(
        "doc_id",
        "shuffle_rank",
        F.pmod("shuffle_rank", F.lit(8)).cast("int").alias("shard_id"),
        (F.col("shuffle_rank") / 8).cast("bigint").alias("pos_in_shard"),
    )


@register(
    "docs_shard_manifest",
    r"""
    WITH ranked AS (
      SELECT doc_id, text,
             row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1
               AS shuffle_rank
      FROM documents
    )
    SELECT CAST(shuffle_rank % 8 AS INT) AS shard_id,
           COUNT(*) AS n_docs,
           CAST(SUM(len(COALESCE(text,''))) AS BIGINT) AS n_chars,
           bit_xor(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || COALESCE(text,'')), 1, 15))::BIGINT)
             AS content_hash
    FROM ranked
    GROUP BY 1
    """,
)
def docs_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard MANIFEST for a training run — the reproducibility rail that
    ships with the shards: per shard, the row count, the total char
    count, and an order-insensitive content hash (bit_xor of the
    cross-engine md5_long60 over 'doc_id:text'). A re-generated shard
    set, a resumed write, or a data revision is verified by comparing
    manifests instead of re-reading the corpus; any dropped, duplicated
    or mutated document flips its shard's hash. XOR is the right fold:
    commutative (shard-internal order-free — the groupBy needs no sort),
    overflow-free at any count, and computable identically by any engine
    with an md5. (Caveat by construction: a document duplicated an EVEN
    number of times inside one shard cancels out of the hash — n_docs
    catches that case.) Shard assignment is docs_shard_shuffle's
    md5-ranked round-robin, recomputed here so the manifest is
    self-contained; the global rank is the distributed-offset spelling
    (operators/windows.py:distributed_rank — no single-partition window)
    and the 8-group aggregate is map-side partial everywhere."""
    d = load_table(spark, sf_dir, "documents")
    key = F.md5(F.col("doc_id").cast("string").cast("binary"))
    h = simfn.md5_long60(
        F.concat(
            F.col("doc_id").cast("string"),
            F.lit(":"),
            F.coalesce(F.col("text"), F.lit("")),
        )
    )
    base = d.select(
        F.col("doc_id"),
        F.length(F.coalesce(F.col("text"), F.lit(""))).alias("_len"),
        h.alias("_h"),
    )
    return (
        distributed_rank(
            base, [key, F.col("doc_id")], "_rank", zero_based=True
        )
        .groupBy(F.pmod("_rank", F.lit(8)).cast("int").alias("shard_id"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_len").cast("long").alias("n_chars"),
            F.expr("bit_xor(_h)").alias("content_hash"),
        )
    )


@register(
    "docs_quality_bins",
    r"""
    WITH q AS (
      SELECT doc_id,
             CASE WHEN len(trim(COALESCE(text,''))) = 0 THEN 0.0
                  ELSE round(
                    CAST(len(list_filter(string_split_regex(trim(lower(COALESCE(text,''))), '\s+'),
                         t -> t IN ('the','a','of','and','to','in','is','it','that','for'))) AS DOUBLE)
                    / len(string_split_regex(trim(lower(COALESCE(text,''))), '\s+')), 6)
             END AS stopword_ratio,
             n_chars
      FROM documents
    )
    SELECT doc_id, stopword_ratio,
           ntile(4) OVER (ORDER BY stopword_ratio DESC, doc_id) AS quality_bin
    FROM q
    """,
)
def docs_quality_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum binning: quartile buckets over a quality signal
    (stopword ratio — natural-language-likeness), highest-quality bin
    first. The ntile runs on the distributed-offset rank
    (operators/windows.py:distributed_rank), not a single-partition
    window: with rn the 1-based global rank, n the row count, q = n div 4
    and r = n mod 4, SQL ntile(4) assigns the first r buckets q+1 rows
    and the rest q — i.e. bucket = ceil(rn/(q+1)) while rn ≤ r·(q+1),
    else r + ceil((rn − r·(q+1))/q). Pure map-side arithmetic once the
    rank and the (free) total column exist; bit-identical to ntile under
    this total order (ratio desc, doc_id tiebreak). The sort-free
    100-TB variant is ``docs_quality_bins_approx`` below: exact
    histogram-derived cutpoints + a map-side CASE — same quartile
    cutpoints, ties share a bin instead of splitting on doc_id."""
    d = load_table(spark, sf_dir, "documents")
    from extract_permits_spark.functions.similarity import tokens

    stop = F.array(*[F.lit(s) for s in
                     ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"]])
    tk = tokens(F.col("text"))
    ratio = F.when(F.size(tk) == 0, F.lit(0.0)).otherwise(
        F.round(
            F.size(F.filter(tk, lambda t: F.array_contains(stop, t)))
            / F.size(tk),
            6,
        )
    )
    ranked = distributed_rank(
        d.select("doc_id", ratio.alias("stopword_ratio")),
        [F.col("stopword_ratio").desc(), F.col("doc_id")],
        "_rn",
        total_col="_n",
    )
    q = F.floor(F.col("_n") / 4).cast("long")
    r = (F.col("_n") % 4).cast("long")
    boundary = r * (q + 1)
    ceil_div = lambda a, b: ((a + b - F.lit(1)) / b).cast("long")  # noqa: E731
    tile = F.when(F.col("_rn") <= boundary, ceil_div(F.col("_rn"), q + 1)).otherwise(
        r + ceil_div(F.col("_rn") - boundary, F.greatest(q, F.lit(1)))
    )
    return ranked.select(
        "doc_id", "stopword_ratio", tile.cast("long").alias("quality_bin")
    )


@register(
    "docs_quality_bins_approx",
    r"""
    WITH q AS (
      SELECT doc_id,
             CASE WHEN len(trim(COALESCE(text,''))) = 0 THEN 0.0
                  ELSE round(
                    CAST(len(list_filter(string_split_regex(trim(lower(COALESCE(text,''))), '\s+'),
                         t -> t IN ('the','a','of','and','to','in','is','it','that','for'))) AS DOUBLE)
                    / len(string_split_regex(trim(lower(COALESCE(text,''))), '\s+')), 6)
             END AS stopword_ratio
      FROM documents
    ),
    hist AS (
      SELECT stopword_ratio AS v, COUNT(*) AS c FROM q GROUP BY stopword_ratio
    ),
    cum AS (
      SELECT v,
             SUM(c) OVER (ORDER BY v DESC
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cd,
             SUM(c) OVER () AS n
      FROM hist
    ),
    cuts AS (
      SELECT MAX(CASE WHEN cd >= (1*n + 3) // 4 THEN v END) AS d1,
             MAX(CASE WHEN cd >= (2*n + 3) // 4 THEN v END) AS d2,
             MAX(CASE WHEN cd >= (3*n + 3) // 4 THEN v END) AS d3
      FROM cum
    )
    SELECT doc_id, stopword_ratio,
           CAST(1 + CAST(stopword_ratio < d1 AS INT)
                  + CAST(stopword_ratio < d2 AS INT)
                  + CAST(stopword_ratio < d3 AS INT) AS BIGINT) AS quality_bin
    FROM q, cuts
    """,
)
def docs_quality_bins_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum binning WITHOUT the global row sort — the 100-TB
    spelling of ``docs_quality_bins``. Instead of ranking every row
    (distributed_rank = one corpus-wide range shuffle), the quartile
    cutpoints come from a VALUE HISTOGRAM: groupBy(ratio) with map-side
    partial aggregation collapses the corpus to its distinct 6-dp ratio
    values (≤ 10^6 + 1 rows whatever the corpus size), two windows over
    that bounded frame derive descending cumulative counts and the
    total, and cutpoint d_k = max{v : #rows ≥ v  ≥  ceil(k·n/4)} — the
    exact discrete k/4-quantile. Bin assignment is then a map-side CASE
    behind a 1-ROW broadcast cross join of the cutpoint frame — the
    q11/rag_bm25-class sanctioned scalar-broadcast spelling (a single
    build row makes the NLJ a broadcast variable, not a pairwise scan).

    Contract difference vs the exact entry, by design: cutpoints are
    bit-exact quantiles (no sketch, no tolerance — the DuckDB oracle
    replays the identical integer logic and hashes must match), but
    ties SHARE a bin (threshold semantics) where ntile splits them on
    the doc_id tiebreak to equalize bin sizes. At corpus scale the
    quality signal is what matters and equal-size binning of ties is
    an artifact; callers that need exact quartile counts use
    ``docs_quality_bins``. floor-on-double is exact for k·n+3 < 2^53,
    i.e. corpora under ~3·10^15 docs."""
    d = load_table(spark, sf_dir, "documents")
    from extract_permits_spark.functions.similarity import tokens

    stop = F.array(*[F.lit(s) for s in
                     ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"]])
    tk = tokens(F.col("text"))
    ratio = F.when(F.size(tk) == 0, F.lit(0.0)).otherwise(
        F.round(
            F.size(F.filter(tk, lambda t: F.array_contains(stop, t)))
            / F.size(tk),
            6,
        )
    )
    scored = d.select("doc_id", ratio.alias("stopword_ratio"))
    hist = scored.groupBy(F.col("stopword_ratio").alias("v")).agg(
        F.count(F.lit(1)).alias("c")
    )
    # both windows run over the HISTOGRAM (bounded above the Aggregate on
    # the plan spine — see tests/test_plan_quality.py), never over rows
    w_desc = Window.orderBy(F.col("v").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.select(
        "v",
        F.sum("c").over(w_desc).alias("cd"),
        F.sum("c").over(Window.partitionBy()).alias("n"),
    )
    thr = lambda k: F.floor((F.lit(k) * F.col("n") + F.lit(3)) / 4)  # noqa: E731
    cuts = cum.agg(
        *[
            F.max(F.when(F.col("cd") >= thr(k), F.col("v"))).alias(f"d{k}")
            for k in (1, 2, 3)
        ]
    )
    bin_ = (
        F.lit(1)
        + (F.col("stopword_ratio") < F.col("d1")).cast("int")
        + (F.col("stopword_ratio") < F.col("d2")).cast("int")
        + (F.col("stopword_ratio") < F.col("d3")).cast("int")
    )
    return scored.crossJoin(F.broadcast(cuts)).select(
        "doc_id", "stopword_ratio", bin_.cast("long").alias("quality_bin")
    )


# ===========================================================================
# SemDeDup (Abbas et al. 2023, arXiv:2303.09540) — semantic dedup by
# clustering first: k-means over the embeddings, pairwise cosine only
# WITHIN a cluster, greedy keep-lowest-id above the threshold. The oracle
# replays the full Lloyd fit (shared CTEs with the IVF twin), so the
# driver hash-checks the clustering itself, not just the final flags.
# ===========================================================================


# ===========================================================================
# Per-host crawl cap (docs_host_cap) — the Gopher/RefinedWeb-style
# frequency cap: no single host may contribute more than N documents,
# keeping the best N by quality. The fixture has no URL column, so the
# host is synthesized deterministically (source × doc_id%7 → 140 hosts).
# Filtering on the rank (not flagging) lets Catalyst insert
# WindowGroupLimit: each map task pre-prunes to its local top-N per host
# BEFORE the shuffle, so the exchange carries ≤ N·hosts·tasks rows —
# the mega-host skew killer at crawl scale (plan-asserted).
# ===========================================================================

_HOST_CAP_SQL = r"""
    SELECT doc_id, host, host_rank FROM (
      SELECT doc_id, host,
             row_number() OVER (PARTITION BY host
                                ORDER BY n_chars DESC, doc_id) AS host_rank
      FROM (
        SELECT doc_id, n_chars,
               source || '-' || CAST(doc_id % 7 AS VARCHAR) || '.example.com'
                 AS host
        FROM documents
      )
    ) WHERE host_rank <= 3
"""


@register("docs_host_cap", _HOST_CAP_SQL)
def docs_host_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep the best 3 documents per host (quality = n_chars, determinism
    tiebreak doc_id). The rank filter plans as WindowGroupLimit — a
    map-side partial top-N per host before the exchange — so a host with
    10^8 pages ships at most 3 rows per input task instead of all of
    them. This is the shape that survives adversarial host skew."""
    d = load_table(spark, sf_dir, "documents")
    host = F.concat(
        F.col("source"), F.lit("-"), (F.col("doc_id") % 7).cast("string"),
        F.lit(".example.com"),
    )
    w = Window.partitionBy("host").orderBy(F.col("n_chars").desc(), "doc_id")
    return (
        d.select("doc_id", "n_chars", host.alias("host"))
        .withColumn("host_rank", F.row_number().over(w).cast("long"))
        .where(F.col("host_rank") <= 3)
        .select("doc_id", "host", "host_rank")
    )


# ===========================================================================
# Incremental (cross-snapshot) dedup with a Bloom prefilter — the
# continuous-crawl refresh: the fixture corpus plays the base snapshot; the
# incoming snapshot is synthesized deterministically from it (doc_id%3==0 →
# re-crawled exact copy, %3==1 → updated page, %3==2 → dropped). Only
# Bloom candidates enter the exact key join; false positives (bloom says
# maybe, exact says new) are part of the checked output.
# ===========================================================================

_INC_DEDUP_SQL = r"""
    WITH base AS (SELECT md5(COALESCE(text,'')) AS key FROM documents),
    inc AS (
      SELECT d0 + 100000 AS doc_id, md5(t) AS key FROM (
        SELECT doc_id AS d0,
               CASE WHEN doc_id % 3 = 0 THEN COALESCE(text,'')
                    ELSE COALESCE(text,'') || ' updated edition' END AS t
        FROM documents WHERE doc_id % 3 < 2)
    ),
    h AS (SELECT 0 AS i UNION ALL SELECT 1),
    bpos AS (
      SELECT DISTINCT
        CAST(('0x' || substring(md5(CAST(i AS VARCHAR) || key), 1, 15)) AS BIGINT)
          % 4096 AS pos
      FROM base CROSS JOIN h
    ),
    ipos AS (
      SELECT doc_id, key,
        CAST(('0x' || substring(md5(CAST(i AS VARCHAR) || key), 1, 15)) AS BIGINT)
          % 4096 AS pos
      FROM inc CROSS JOIN h
    ),
    cand AS (
      SELECT doc_id, key,
             bool_and(pos IN (SELECT pos FROM bpos)) AS bloom_candidate
      FROM ipos GROUP BY doc_id, key
    )
    SELECT doc_id, bloom_candidate,
           bloom_candidate AND key IN (SELECT key FROM base) AS is_dup
    FROM cand
"""


@register("docs_incremental_dedup", _INC_DEDUP_SQL)
def docs_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-snapshot dedup (functions/corpus.py:incremental_dedup): the
    Bloom bitmask is built once from the base side (bounded driver state,
    m/8 bytes), probed map-side as pure codegen (element_at + getbit on
    literal words — no join, no shuffle), and only candidates pay the
    exact key join. The hand-rolled twin of AQE's runtime bloom-filter
    injection, made oracle-replayable via the md5 position hash."""
    from extract_permits_spark.functions.corpus import incremental_dedup

    d = load_table(spark, sf_dir, "documents")
    txt = F.coalesce(F.col("text"), F.lit(""))
    base = d.select(F.md5(txt.cast("binary")).alias("key"))
    inc = d.where(F.col("doc_id") % 3 < 2).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.md5(
            F.when(F.col("doc_id") % 3 == 0, txt)
            .otherwise(F.concat(txt, F.lit(" updated edition")))
            .cast("binary")
        ).alias("key"),
    )
    return incremental_dedup(base, inc)


# ===========================================================================
# BPE vocabulary induction, the distributed step: adjacent-symbol pair
# counts over the word-frequency table (Sennrich et al. 2016). One merge
# round = argmax of this output; the expensive part at corpus scale is
# exactly these two map-side-combined shuffles (word freq, pair freq) —
# the iterative merge loop then runs on the bounded vocab table.
# ===========================================================================

_BPE_PAIRS_SQL = r"""
    WITH words AS (
      SELECT unnest(string_split_regex(trim(lower(COALESCE(text,''))), '\s+'))
               AS word
      FROM documents
      WHERE trim(COALESCE(text,'')) <> ''
    ), wf AS (
      SELECT word, COUNT(*) AS freq FROM words WHERE word <> '' GROUP BY word
    ), pairs AS (
      SELECT unnest(list_transform(range(1, length(word)),
                    i -> substring(word, CAST(i AS INT), 2))) AS pair,
             freq
      FROM wf WHERE length(word) >= 2
    )
    SELECT pair, CAST(SUM(freq) AS BIGINT) AS n
    FROM pairs GROUP BY pair
    ORDER BY n DESC, pair
    LIMIT 20
"""


@register("vocab_bpe_pairs", _BPE_PAIRS_SQL)
def vocab_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE pair statistics: corpus → word-frequency table
    (first shuffle, map-side combine collapses the corpus to its
    vocabulary) → adjacent char-pair counts weighted by word frequency
    (second shuffle over the *vocab*, not the corpus). The top pair is
    the next BPE merge; at 100 TB the vocab table is ~10^6 rows, so
    every merge round after this costs vocabulary-scale, not
    corpus-scale."""
    from extract_permits_spark.functions.similarity import tokens

    d = load_table(spark, sf_dir, "documents")
    words = d.select(F.explode(tokens(F.col("text"))).alias("word")).where(
        F.col("word") != ""
    )
    wf = words.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
    pairs = wf.where(F.length("word") >= 2).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("word") - 1),
                lambda i: F.col("word").substr(i, F.lit(2)),
            )
        ).alias("pair"),
        "freq",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("freq").alias("n"))
        .orderBy(F.col("n").desc(), "pair")
        .limit(20)
    )


# ===========================================================================
# Winnowing fingerprints (Schleimer et al. 2003 — MOSS): fixed-density
# substring fingerprints robust to insert/delete shift. Any shared word
# substring of ≥ w+k-1 = 7 words yields ≥ 1 shared fingerprint.
# ===========================================================================

_WINNOW_SQL = r"""
    WITH t AS (
      SELECT doc_id,
             string_split_regex(trim(lower(COALESCE(text,''))), '\s+') AS toks
      FROM documents
    ), g AS (
      SELECT doc_id,
        CASE WHEN len(toks) >= 4 THEN
          list_transform(range(1, len(toks) - 4 + 2),
            i -> CAST(('0x' || substring(md5(
                   array_to_string(list_slice(toks, i, i + 3), ' ')), 1, 15))
                 AS BIGINT))
        ELSE CAST([] AS BIGINT[]) END AS h
      FROM t
    ), fp AS (
      SELECT doc_id,
        list_distinct(
          CASE WHEN len(h) >= 4 THEN
                 list_transform(range(1, len(h) - 4 + 2),
                                j -> list_min(list_slice(h, j, j + 3)))
               WHEN len(h) > 0 THEN [list_min(h)]
               ELSE CAST([] AS BIGINT[]) END) AS fps
      FROM g
    ), ex AS (SELECT doc_id, unnest(fps) AS fingerprint FROM fp)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
    FROM ex a JOIN ex b ON a.fingerprint = b.fingerprint
                       AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING COUNT(*) >= 2
    ORDER BY n_shared DESC, id_a, id_b
    LIMIT 25
"""


@register("dedup_winnowing", _WINNOW_SQL)
def dedup_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing substring-overlap candidates
    (functions/similarity.py:winnow_pairs): positional k-gram hashes →
    sliding-window minima → inverted-index self-join. Detects *partial*
    overlap (a lifted paragraph) that whole-document MinHash dilutes
    away; fingerprint density is a fixed ~2/(w+1) sample of the corpus,
    so the index is ~25x smaller than the full shingle set."""
    d = load_table(spark, sf_dir, "documents")
    return simfn.winnow_pairs(d, k=4, w=4, min_shared=2, topn=25)


@register("emb_prototypicality", _ann_sql.prototypicality_sql())
def emb_prototypicality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SSL-prototypes half of D4 (arXiv:2308.12284): rank every
    vector by cosine to its own cluster centroid, flag the top 10 % most
    prototypical per cluster — the most-redundant region of each semantic
    neighbourhood. With dedup_semantic this completes the D4 recipe.
    Centroid lookup is element_at into the literal matrix (zero-shuffle
    codegen); the only exchange is the per-cluster rank window."""
    emb = load_table(spark, sf_dir, "embeddings")
    return simfn.prototypicality_flags(
        emb, num_clusters=16, centroids=_ivf_centroids_cached(spark, emb, sf_dir)
    )


@register("dedup_semantic", _ann_sql.semdedup_sql())
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-then-compare semantic dedup over the embeddings table.
    Reuses the deterministic IVF centroids (bounded driver state,
    broadcast as literals); the intra-cluster pair generation is an
    equi-join on cluster_id — a hash shuffle on the cluster key, never an
    all-pairs product. The paper sizes k ∝ n/⟨cluster⟩, which keeps the
    per-cluster pairwise work constant as the corpus grows."""
    emb = load_table(spark, sf_dir, "embeddings")
    return simfn.semdedup_flags(
        emb, num_clusters=16, centroids=_ivf_centroids_cached(spark, emb, sf_dir)
    )


# ===========================================================================
# Batch r6b — event-sequence analytics (funnel, retention, cube), two more
# TPC-H shapes (Q6, Q10), TF-IDF term scoring, PII redaction, and the
# remaining rank-family window functions. Each is the engine-native form
# of an operation the reference's consumers run downstream of extraction
# (ordered-sequence checks, cohort counts, ranked review lists).
# ===========================================================================


@register(
    "ev_funnel",
    """
    WITH s1 AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ), s2 AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'view' AND e.ts > s1.t1 GROUP BY e.user_id
    ), s3 AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'click' AND e.ts > s2.t2 GROUP BY e.user_id
    ), s4 AS (
      SELECT e.user_id, min(e.ts) AS t4
      FROM events e JOIN s3 ON e.user_id = s3.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s3.t3 GROUP BY e.user_id
    )
    SELECT * FROM (
      SELECT 1 AS stage_num, 'signup' AS stage, count(*) AS n_users FROM s1
      UNION ALL SELECT 2, 'view', count(*) FROM s2
      UNION ALL SELECT 3, 'click', count(*) FROM s3
      UNION ALL SELECT 4, 'purchase', count(*) FROM s4
    )
    """,
)
def ev_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel conversion: signup → view → click → purchase, each
    stage's event strictly after the user's previous-stage timestamp.

    Expressed as a chain of (filter → per-user min-ts aggregate → equi-join
    on user_id): every join/agg shuffles on the SAME key, so after the
    first exchange the stages are co-partitioned and AQE keeps reusing the
    layout; the surviving-user set shrinks monotonically, so each later
    join's build side is smaller (AQE flips them to broadcast at runtime).
    No window over the full event log and no per-user event collection —
    state per stage is one timestamp per surviving user, which is what a
    1000-executor funnel over 100 TB of events needs.
    """
    from functools import reduce

    e = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")

    stages = ["signup", "view", "click", "purchase"]
    survivors: list[DataFrame] = []
    prev = None
    for i, stage in enumerate(stages):
        cur = e.where(F.col("event_type") == stage)
        if prev is not None:
            cur = cur.join(prev, "user_id").where(F.col("ts") > F.col("_prev_ts"))
        cur = cur.groupBy("user_id").agg(F.min("ts").alias("_prev_ts"))
        survivors.append(
            cur.groupBy().agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit(i + 1).alias("stage_num"),
                F.lit(stage).alias("stage"),
                "n_users",
            )
        )
        prev = cur
    return reduce(DataFrame.unionByName, survivors)


@register(
    "ev_retention",
    """
    WITH first_seen AS (
      SELECT user_id, CAST(min(ts) AS DATE) AS cohort FROM events GROUP BY user_id
    ), activity AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS active_day FROM events
    )
    SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort_day,
           CAST(date_diff('day', f.cohort, a.active_day) AS BIGINT) AS day_offset,
           count(*) AS n_users
    FROM first_seen f JOIN activity a ON f.user_id = a.user_id
    GROUP BY 1, 2
    """,
)
def ev_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-seen day, counted
    on each later day they return. Two aggregates and one join, all keyed
    on user_id (co-partitioned, single logical shuffle under AQE); the
    output is O(active-days²) regardless of event volume, so the result
    stays tiny even when the input is 100 TB. The distinct-day projection
    happens BEFORE the join — the join carries (user, day) pairs, never raw
    events."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("active_day")
    )
    first_seen = e.groupBy("user_id").agg(F.min("active_day").alias("cohort"))
    activity = e.distinct()
    return (
        activity.join(first_seen, "user_id")
        .groupBy(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff("active_day", "cohort").cast("long").alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@register(
    "ev_cube",
    """
    SELECT coalesce(event_type, 'ALL') AS event_type,
           coalesce(strftime(CAST(ts AS DATE), '%Y-%m-%d'), 'ALL') AS day,
           CAST(GROUPING(event_type) * 2 + GROUPING(CAST(ts AS DATE)) AS BIGINT) AS gid,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY CUBE (event_type, CAST(ts AS DATE))
    """,
)
def ev_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregation (all four grouping sets of type × day) with
    GROUPING() disambiguation — complements ev_rollup's hierarchy. Spark
    expands the sets map-side and shuffles once; sums stay in
    decimal(18,2) so every grand-total is exact and engine-independent."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type", F.col("ts").cast("date").alias("_day"), "value"
    )
    return (
        e.cube("event_type", "_day")
        .agg(
            F.grouping("event_type").cast("int").alias("_gt"),
            F.grouping("_day").cast("int").alias("_gd"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_dec("value")).cast("double").alias("sum_value"),
        )
        .select(
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            F.coalesce(F.date_format("_day", "yyyy-MM-dd"), F.lit("ALL")).alias("day"),
            (F.col("_gt") * 2 + F.col("_gd")).cast("long").alias("gid"),
            "n_events",
            "sum_value",
        )
    )


@register(
    "q6_forecast_revenue",
    """
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 forecasting-revenue shape: pure filter + scalar aggregate.
    All three predicates push down to the parquet scan (min/max row-group
    skipping on l_shipdate makes this a partial-file read when the table
    is date-sorted/partitioned — the 100 TB case); the aggregate is a
    map-side partial + 1-row exchange."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .groupBy()
        .agg(
            F.sum(_dec("l_extendedprice") * _dec("l_discount"))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q10_returned_items",
    """
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-04-01'
      AND l.l_returnflag = 'R'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 returned-item reporting: who returned the most revenue in
    a quarter. Orders is filtered to one quarter BEFORE the lineitem join
    (the selective side drives), nation broadcasts, and the final top-20
    is a TakeOrderedAndProject — no global sort materializes. Revenue sums
    in decimal so the DESC order (and therefore the LIMIT cut) is
    identical across engines; ties break on c_custkey."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    n = load_table(spark, sf_dir, "nation")
    price, disc = _dec("l_extendedprice"), _dec("l_discount")
    return (
        o.where(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
        )
        .join(li.where(F.col("l_returnflag") == "R"),
              F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(price * (F.lit(1) - disc)).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "text_tfidf",
    """
    WITH tok AS (
      SELECT doc_id, t.term
      FROM documents, unnest(string_split(text, ' ')) AS t(term)
      WHERE length(t.term) > 0
    ), tf AS (
      SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term
    ), df AS (
      SELECT term, count(*) AS df FROM tf GROUP BY term
    ), n AS (
      SELECT count(*) AS n_docs FROM documents
    ), scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, df.df,
             round(tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0)), 6) AS tfidf
      FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
    )
    SELECT doc_id, term, tf, df, tfidf
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY doc_id ORDER BY tfidf DESC, term
      ) AS rn
      FROM scored
    )
    WHERE rn <= 3
    """,
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document — the classic keyword extractor.

    Plan shape: explode → (doc,term) count → term document-frequency →
    broadcast the DF table back (vocabulary ≪ corpus, so the join is a
    broadcast, never a sort-merge over the token stream) → per-doc top-3
    via row_number. The corpus count rides the sanctioned 1-row
    scalar-broadcast cross join (q11/rag_bm25 class) — IN the plan, not
    a separate driver count() job, so the function is fully lazy and
    one job cheaper (r11 VERDICT #8; hash unchanged, the ln() argument
    is the same exact small-int ratio). Score is rounded to 6dp before
    ranking, so the order — and therefore the top-3 cut — is
    engine-independent (ties break on the term string, binary collation
    both sides)."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).where(F.length("term") > 0)
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("_n_docs"))
    scored = (
        tf.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf")
                * F.log(
                    (F.col("_n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))
                ),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("doc_id", "term", "tf", "df", "tfidf")
    )


# PII patterns shared by the Spark path and the DuckDB oracle. Both engines
# treat these identically (no lookaround, no backreferences — the RE2-safe
# subset). Order matters: emails first so their digits aren't half-eaten by
# the phone pattern.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "[IP]"),
    ("phone", r"\+?\d[\d() .-]{7,}\d", "[PHONE]"),
]


def redact_pii(df: DataFrame, col: str) -> DataFrame:
    """Scrub emails / IPv4s / phone-shaped digit runs from ``col``,
    appending ``n_pii`` (total redaction count). Pure regexp expressions —
    codegen'd, no UDF, order-preserving; at 100 TB this is a narrow map
    stage with zero shuffle."""
    out = df
    counts = []
    cleaned = F.col(col)
    for name, pat, token in PII_PATTERNS:
        counts.append(F.regexp_count(cleaned, F.lit(pat)).cast("long"))
        cleaned = F.regexp_replace(cleaned, pat, token)
    total = counts[0]
    for c in counts[1:]:
        total = total + c
    return out.withColumn("n_pii", total).withColumn(col, cleaned)


@register(
    "docs_pii_redact",
    """
    WITH seeded AS (
      SELECT doc_id,
             CASE WHEN doc_id % 10 = 0 THEN
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.com or 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                    || '.' || CAST(doc_id % 100 AS VARCHAR)
                    || ' or call 312-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
             ELSE text END AS text
      FROM documents
    ), staged AS (
      SELECT doc_id, text,
             CAST(len(regexp_extract_all(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) AS c1,
             regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '[EMAIL]', 'g')
               AS t1
      FROM seeded
    ), staged2 AS (
      SELECT doc_id, c1,
             CAST(len(regexp_extract_all(t1,
               '\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b')) AS BIGINT) AS c2,
             regexp_replace(t1, '\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b', '[IP]', 'g') AS t2
      FROM staged
    )
    SELECT doc_id,
           c1 + c2 + CAST(len(regexp_extract_all(t2,
             '\\+?\\d[\\d() .-]{7,}\\d')) AS BIGINT) AS n_pii,
           regexp_replace(t2, '\\+?\\d[\\d() .-]{7,}\\d', '[PHONE]', 'g') AS text
    FROM staged2
    """,
)
def docs_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction over the corpus (Dolma-style regex taggers: email,
    IPv4, phone). The fixture corpus is PII-free, so every 10th doc gets
    deterministic synthetic PII appended (identically on both engines)
    before redaction — the oracle row therefore checks the positive path
    (3 redactions per seeded doc) AND the false-positive path (0
    everywhere else). Unit-level positives are additionally pinned in
    tests/test_text_multimodal.py."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    planted = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit("."),
        (F.col("doc_id") % 100).cast("string"),
        F.lit(" or call 312-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    seeded = d.withColumn(
        "text", F.when(F.col("doc_id") % 10 == 0, planted).otherwise(F.col("text"))
    )
    return redact_pii(seeded, "text").select("doc_id", "n_pii", "text")


@register(
    "w6_rank_family",
    """
    SELECT c_custkey, c_mktsegment,
           round(percent_rank() OVER w, 6) AS pr,
           round(cume_dist() OVER w, 6) AS cd,
           CAST(ntile(10) OVER w AS BIGINT) AS decile
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
)
def w6_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining rank-family window functions (percent_rank,
    cume_dist, ntile) over a unique ordering — one shuffle on the
    partition key, sort within. percent_rank is an exact small-int
    rational so the 6dp rounding is engine-independent."""
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
        F.ntile(10).over(w).cast("long").alias("decile"),
    )


# ===========================================================================
# Batch r6c — sequence/transition analytics, SCD2 intervals, SymSpell
# fuzzy join (exact recall at distance 1), and fixed-point PageRank over
# the near-dup graph. PageRank and SymSpell use integer-only arithmetic so
# the DuckDB replay is bit-exact (no float summation-order drift).
# ===========================================================================


@register(
    "ev_transitions",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS next_type
      FROM events
    )
    SELECT event_type AS from_type, next_type AS to_type, count(*) AS n
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY 1, 2
    """,
)
def ev_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts per user stream (lead() over a
    unique (ts, event_id) ordering, then a 25-cell aggregate). One shuffle
    on user_id for the window, one map-side-combined shuffle for the tiny
    transition matrix — the standard sessionless sequence-mining shape."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.withColumn("next_type", F.lead("event_type").over(w))
        .where(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "x5_scd2_intervals",
    """
    SELECT user_id, event_id, event_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
           coalesce(strftime(lead(ts) OVER (
                      PARTITION BY user_id ORDER BY ts, event_id
                    ), '%Y-%m-%d %H:%M:%S.%f'),
                    '9999-12-31 00:00:00.000000') AS valid_to
    FROM events
    """,
)
def x5_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 validity intervals from an event log: each row's
    valid_to is the next change's timestamp (open intervals get the
    sentinel high date). The warehouse-standard lead() formulation — one
    shuffle on the business key; at 100 TB this runs per key partition
    with no driver state and writes straight to the dimension table."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return e.select(
        "user_id",
        "event_id",
        "event_type",
        F.date_format("ts", fmt).alias("valid_from"),
        F.coalesce(
            F.date_format(F.lead("ts").over(w), fmt),
            F.lit("9999-12-31 00:00:00.000000"),
        ).alias("valid_to"),
    )


def symspell_keys(col) -> "F.Column":
    """SymSpell distance-1 blocking keys: the string itself plus every
    single-character deletion. Two strings within Levenshtein distance 1
    ALWAYS share at least one key (substitution at i → both i-deletions
    equal; insert/delete → the shorter string is itself a deletion of the
    longer), so the blocked join has recall 1.0 by construction — no
    all-pairs product, index size Σ|s| keys."""
    c = F.col(col) if isinstance(col, str) else col
    dels = F.transform(
        F.sequence(F.lit(1), F.length(c)),
        lambda i: F.concat(c.substr(F.lit(1), i - 1), c.substr(i + 1, F.length(c))),
    )
    return F.array_distinct(F.concat(F.array(c), dels))


@register(
    "j9_fuzzy_symspell",
    """
    WITH names AS (SELECT DISTINCT p_name FROM part),
    keyed AS (
      SELECT p_name, unnest(list_distinct(
               [p_name] || list_transform(
                 range(1, length(p_name) + 1),
                 i -> substr(p_name, 1, i - 1) || substr(p_name, i + 1)
               ))) AS k
      FROM names
    ),
    cand AS (
      SELECT DISTINCT a.p_name AS name_a, b.p_name AS name_b
      FROM keyed a JOIN keyed b ON a.k = b.k AND a.p_name < b.p_name
    )
    SELECT name_a, name_b,
           CAST(levenshtein(name_a, name_b) AS BIGINT) AS dist
    FROM cand WHERE levenshtein(name_a, name_b) <= 1
    """,
)
def j9_fuzzy_symspell(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy self-join on part names at Levenshtein distance ≤ 1 via
    SymSpell deletion-neighborhood blocking (public algorithm: Garbe's
    symmetric delete). The reference fuzzy-matches permit addresses by
    normalization only (chicago/permit_cleaning.py:618-667); this is the
    engine-native generalization: generate ≤ |s|+1 deletion keys per
    string (narrow explode), equi-join on the key, verify with exact
    levenshtein on the candidates. Recall 1.0 at distance 1 by
    construction; never an all-pairs product, so it scales as Σ|s|, not
    n²."""
    p = load_table(spark, sf_dir, "part").select("p_name").distinct()
    keyed = p.select("p_name", F.explode(symspell_keys("p_name")).alias("k"))
    cand = (
        keyed.alias("a")
        .join(keyed.alias("b"), ["k"])
        .where(F.col("a.p_name") < F.col("b.p_name"))
        .select(
            F.col("a.p_name").alias("name_a"), F.col("b.p_name").alias("name_b")
        )
        .distinct()
    )
    return cand.where(F.levenshtein("name_a", "name_b") <= 1).select(
        "name_a",
        "name_b",
        F.levenshtein("name_a", "name_b").cast("long").alias("dist"),
    )


# --- fixed-point PageRank over the n-gram near-dup graph -------------------

_PR_SCALE = 1_000_000_000_000  # 1e12: BIGINT-safe through 85x multiplies
_PR_ITERS = 5

_PR_EDGES_SQL = """
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(string_split_regex(trim(lower(COALESCE(text,''))), '\\s+')) - 2, 0) + 1),
               i -> array_to_string(list_slice(
                      string_split_regex(trim(lower(COALESCE(text,''))), '\\s+'), i, i + 2), ' ')
             )) AS shingles
      FROM documents
      WHERE len(string_split_regex(trim(lower(COALESCE(text,''))), '\\s+')) >= 3
    ),
    ex AS (SELECT doc_id, len(shingles) AS sz, unnest(shingles) AS sh FROM sh),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id, a.sz, b.sz
      HAVING CAST(COUNT(*) AS DOUBLE) / (a.sz + b.sz - COUNT(*)) >= 0.2
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL
      SELECT id_b AS src, id_a AS dst FROM pairs
    ),
    deg AS (SELECT src AS node, count(*) AS deg FROM edges GROUP BY src),
    nn AS (SELECT count(*) AS n FROM deg)
"""


def _pagerank_oracle_sql() -> str:
    """Unrolled fixed-point PageRank oracle: the Spark loop replayed as
    chained CTEs. Integer-only arithmetic (// floor division) makes every
    iteration bit-exact across engines."""
    s = _PR_SCALE
    cte = [f"WITH {_PR_EDGES_SQL},"]
    cte.append(
        f"r0 AS (SELECT d.node, ({s} // nn.n) AS rank FROM deg d CROSS JOIN nn)"
    )
    for i in range(1, _PR_ITERS + 1):
        cte.append(
            f""",
    s{i} AS (
      SELECT e.dst AS node, sum(r.rank // dg.deg) AS s
      FROM edges e
      JOIN r{i - 1} r ON e.src = r.node
      JOIN deg dg ON e.src = dg.node
      GROUP BY e.dst
    ),
    r{i} AS (
      SELECT d.node,
             ((15 * ({s} // nn.n)) // 100)
             + ((85 * coalesce(s{i}.s, 0)) // 100) AS rank
      FROM deg d CROSS JOIN nn
      LEFT JOIN s{i} ON d.node = s{i}.node
    )"""
        )
    cte.append(
        f"\nSELECT node AS doc_id, CAST(rank AS BIGINT) AS rank_fp FROM r{_PR_ITERS}"
    )
    return "".join(cte)


@register("graph_pagerank", _pagerank_oracle_sql())
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (damping 0.85, 5 iterations) over the undirected near-dup
    graph from the shared n-gram pair list — ranks the most-connected
    duplicate hubs, the docs whose removal dissolves the most pairs.

    Fixed-point integer arithmetic throughout (rank scaled by 1e12, floor
    division): BIGINT sums are associative, so the result is bit-exact
    and engine-independent — the honest way to oracle an iterative float
    algorithm. Per iteration: one equi-join rank→edges on src and one
    map-side-combined sum on dst; the edge list reuses the memoized pair
    scan (localCheckpoint'ed), so lineage stays flat across iterations.
    At 100 TB this is the standard Pregel-as-joins shape, co-partitioned
    on the node key."""
    pairs = _jaccard_pairs_cached(spark, sf_dir).select("id_a", "id_b")
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).unionAll(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    ).localCheckpoint(eager=True)
    # node count is a bounded O(1) driver scalar; folding it into literal
    # integers keeps every iteration's plan join-shaped (a 1-row
    # crossJoin would plan as BroadcastNestedLoopJoin). Exact Python int
    # arithmetic — identical to the oracle's // on the SQL scalar.
    n = deg.count()
    init_rank = _PR_SCALE // n
    base = 15 * init_rank // 100
    ranks = deg.select("node", F.lit(init_rank).alias("rank"))
    for _ in range(_PR_ITERS):
        contrib = ranks.join(deg, "node").select(
            "node", F.expr("rank div deg").alias("contrib")
        )
        in_sum = (
            edges.join(contrib, edges.src == contrib.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("contrib").alias("s"))
        )
        ranks = (
            deg.select("node")
            .join(in_sum, "node", "left")
            .select(
                "node",
                (F.lit(base) + F.expr("85 * coalesce(s, 0) div 100")).alias("rank"),
            )
        )
    return ranks.select(F.col("node").alias("doc_id"), F.col("rank").alias("rank_fp"))


@register(
    "stream_stream_join",
    """
    SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id
    FROM events p JOIN events c ON p.user_id = c.user_id
    WHERE p.event_type = 'purchase' AND c.event_type = 'click'
      AND c.ts >= p.ts - INTERVAL 30 MINUTE AND c.ts < p.ts
    """,
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (click-before-purchase attribution
    pairs) executed through Structured Streaming — two watermarked file
    streams, event-time-bounded inner join, availableNow drain — checked
    against the batch range-join SQL oracle. The time bound in the join
    predicate is what makes 100 TB viable: it lets the engine evict
    buffered state as the watermarks advance instead of holding both
    streams forever."""
    import os
    import shutil
    import tempfile

    from extract_permits_spark.streaming.events import run_interval_join_available_now

    work = tempfile.mkdtemp(prefix="ev_stream_ssj_")
    src = os.path.join(work, "in")
    os.makedirs(src)
    shutil.copy(os.path.join(sf_dir, "events.parquet"), src)
    name = f"ev_stream_ssj_{abs(hash(sf_dir)) % 10**8}"
    # a stream-stream join holds TWO keyed state stores per shuffle
    # partition; at local-test scale 32 partitions is pure state-store
    # setup overhead (23s → ~8s at 8). Production sizing follows state
    # volume, not this constant.
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = run_interval_join_available_now(
            spark, src, os.path.join(work, "ckpt"), table_name=name
        )
        q.awaitTermination(300)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.sql(f"SELECT * FROM {name}")


@register(
    "basket_brand_pairs",
    """
    WITH items AS (
      SELECT DISTINCT l.l_orderkey, p.p_brand
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    )
    SELECT a.p_brand AS brand_a, b.p_brand AS brand_b, count(*) AS n_orders
    FROM items a JOIN items b
      ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
    GROUP BY 1, 2
    HAVING count(*) >= 50
    """,
)
def basket_brand_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: brand pairs bought in the same order
    (support ≥ 50 orders). The self-join is keyed on the basket id, and a
    basket holds ≤ 13 items (TPC-H order shape), so the fan-out is a
    bounded quadratic per basket — the classic a-priori candidate
    generation that stays linear in order count at 100 TB. Distinct
    (order, brand) first, so multi-quantity lines don't inflate support;
    the brand dimension joins broadcast."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    # one shuffle on the basket key (collect_set folds the distinct into
    # the same exchange), then the pair fan-out is a NARROW sorted-array
    # combination explode — vs the distinct + self-join shape, which paid
    # three wide shuffles of the item stream (measured 1.65s → 1.33s at
    # sf0.1; at 100 TB the saved exchanges dominate)
    items = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("p_brand")).alias("bs"))
    )
    pairs = items.select(
        F.explode(
            F.expr(
                "flatten(transform(bs, (x, i) -> "
                "transform(slice(bs, i + 2, size(bs) - i - 1), "
                "y -> struct(x AS brand_a, y AS brand_b))))"
            )
        ).alias("pr")
    )
    return (
        pairs.groupBy(
            F.col("pr.brand_a").alias("brand_a"),
            F.col("pr.brand_b").alias("brand_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .where(F.col("n_orders") >= 50)
    )


@register(
    "ev_time_weighted_avg",
    """
    WITH seg AS (
      SELECT user_id,
             CAST(round(value * 100) AS BIGINT) AS cents,
             epoch_ms(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
               - epoch_ms(ts) AS dur_ms
      FROM events
    )
    SELECT user_id,
           round(CAST(sum(cents * dur_ms) AS DOUBLE)
                 / CAST(sum(dur_ms) AS DOUBLE) / 100.0, 6) AS tw_avg,
           CAST(sum(dur_ms) AS BIGINT) AS total_ms
    FROM seg WHERE dur_ms IS NOT NULL
    GROUP BY user_id
    """,
)
def ev_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of an irregularly-sampled signal per user —
    each reading holds until the next one (right-open step function), the
    metric sensors/prices need where plain AVG over-weights bursts.
    Exact integer core: value in cents × duration in ms, both BIGINT, so
    the sums are associative and the single final division is the only
    float op (deterministic across engines and partitionings). One window
    shuffle + one agg, both on user_id."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ltz = F.col("ts").cast("timestamp")
    seg = e.select(
        "user_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        (
            F.unix_millis(F.lead(ltz).over(w)) - F.unix_millis(ltz)
        ).alias("dur_ms"),
    ).where(F.col("dur_ms").isNotNull())
    return seg.groupBy("user_id").agg(
        F.round(
            F.sum(F.col("cents") * F.col("dur_ms")).cast("double")
            / F.sum("dur_ms").cast("double")
            / F.lit(100.0),
            6,
        ).alias("tw_avg"),
        F.sum("dur_ms").cast("long").alias("total_ms"),
    )


# ===========================================================================
# Batch r6d — warehouse maintenance ops: MERGE-style upsert apply (the
# batch form of CDC apply / Delta MERGE INTO), deterministic grouped
# mode, and null-safe join semantics.
# ===========================================================================


@register(
    "x6_merge_upsert",
    """
    WITH updates AS (
      SELECT o_custkey AS key, 'U' AS op, 2 AS prio,
             sum(CAST(o_totalprice AS DECIMAL(18,2))) AS delta,
             NULL AS new_name, CAST(NULL AS DOUBLE) AS new_balance
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1996-07-01'
      GROUP BY o_custkey
    ), deletes AS (
      SELECT c_custkey AS key, 'D' AS op, 3 AS prio,
             NULL AS delta, NULL AS new_name, CAST(NULL AS DOUBLE) AS new_balance
      FROM customer WHERE c_custkey % 17 = 0
    ), inserts AS (
      SELECT c_custkey + 1000000 AS key, 'I' AS op, 1 AS prio,
             NULL AS delta,
             'Customer#new' || CAST(c_custkey AS VARCHAR) AS new_name,
             CAST(CAST(round(c_acctbal * 100) AS BIGINT) AS DOUBLE) / 100.0
               AS new_balance
      FROM customer WHERE c_custkey % 13 = 0
    ), changes AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (
          PARTITION BY key ORDER BY prio DESC
        ) AS rn
        FROM (SELECT * FROM updates UNION ALL
              SELECT * FROM deletes UNION ALL
              SELECT * FROM inserts)
      ) WHERE rn = 1
    )
    SELECT coalesce(b.c_custkey, c.key) AS key,
           coalesce(b.c_name, c.new_name) AS name,
           CAST(CASE
             WHEN c.op = 'U'
               THEN round(CAST(b.c_acctbal AS DECIMAL(18,2)) + c.delta, 2)
             WHEN c.op = 'I' THEN c.new_balance
             ELSE CAST(b.c_acctbal AS DECIMAL(18,2))
           END AS DOUBLE) AS balance,
           CASE WHEN c.op = 'U' THEN 'updated'
                WHEN c.op = 'I' THEN 'inserted'
                ELSE 'kept' END AS action
    FROM customer b FULL OUTER JOIN changes c ON b.c_custkey = c.key
    WHERE (c.op IS NULL AND b.c_custkey IS NOT NULL)        -- kept
       OR (c.op = 'U' AND b.c_custkey IS NOT NULL)          -- updated
       OR (c.op = 'I' AND b.c_custkey IS NULL)              -- inserted
    """,
)
def x6_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics as one batch plan — the CDC-apply shape
    (WHEN MATCHED UPDATE / WHEN MATCHED [cond] DELETE / WHEN NOT MATCHED
    INSERT) without a table format: change set deduped by key with
    delete-over-update precedence, one full-outer equi-join against the
    base, per-row action classification. At 100 TB both sides hash on the
    merge key (one co-partitioned shuffle each); with a bucketed base
    table the exchange disappears entirely — this is exactly what Delta/
    Iceberg MERGE compiles to under Spark."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    updates = (
        o.where(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp_ntz"))
        )
        .groupBy(F.col("o_custkey").alias("key"))
        .agg(F.sum(_dec("o_totalprice")).alias("delta"))
        .select(
            "key",
            F.lit("U").alias("op"),
            F.lit(2).alias("prio"),
            "delta",
            F.lit(None).cast("string").alias("new_name"),
            F.lit(None).cast("double").alias("new_balance"),
        )
    )
    deletes = c.where(F.col("c_custkey") % 17 == 0).select(
        F.col("c_custkey").alias("key"),
        F.lit("D").alias("op"),
        F.lit(3).alias("prio"),
        F.lit(None).cast("decimal(38,2)").alias("delta"),
        F.lit(None).cast("string").alias("new_name"),
        F.lit(None).cast("double").alias("new_balance"),
    )
    inserts = c.where(F.col("c_custkey") % 13 == 0).select(
        (F.col("c_custkey") + 1000000).alias("key"),
        F.lit("I").alias("op"),
        F.lit(1).alias("prio"),
        F.lit(None).cast("decimal(38,2)").alias("delta"),
        F.concat(F.lit("Customer#new"), F.col("c_custkey").cast("string")).alias(
            "new_name"
        ),
        # exact integer-cents carry: a decimal division here lands on
        # half-cent boundaries where Spark (HALF_UP) and DuckDB (double
        # path) round apart — 3/1527 rows differed at sf0.01
        (F.round(F.col("c_acctbal") * 100).cast("long").cast("double") / 100.0).alias(
            "new_balance"
        ),
    )
    w = Window.partitionBy("key").orderBy(F.col("prio").desc())
    changes = (
        updates.unionByName(deletes)
        .unionByName(inserts)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    merged = c.join(changes, c.c_custkey == changes.key, "full_outer")
    # explicit keep-disjunction: three-valued logic makes the NOT(... AND
    # ...) spelling silently drop no-change rows (op IS NULL propagates)
    keep = (
        (F.col("op").isNull() & F.col("c_custkey").isNotNull())  # kept
        | ((F.col("op") == "U") & F.col("c_custkey").isNotNull())  # updated
        | ((F.col("op") == "I") & F.col("c_custkey").isNull())  # inserted
    )
    return (
        merged.where(keep)
        .select(
            F.coalesce(F.col("c_custkey"), F.col("key")).alias("key"),
            F.coalesce(F.col("c_name"), F.col("new_name")).alias("name"),
            F.when(F.col("op") == "U", F.round(_dec("c_acctbal") + F.col("delta"), 2))
            .when(F.col("op") == "I", F.col("new_balance"))
            .otherwise(_dec("c_acctbal"))
            .cast("double")
            .alias("balance"),
            F.when(F.col("op") == "U", F.lit("updated"))
            .when(F.col("op") == "I", F.lit("inserted"))
            .otherwise(F.lit("kept"))
            .alias("action"),
        )
    )


@register(
    "a9_mode",
    """
    SELECT user_id, event_type AS mode_type, n
    FROM (
      SELECT user_id, event_type, count(*) AS n,
             row_number() OVER (
               PARTITION BY user_id ORDER BY count(*) DESC, event_type
             ) AS rn
      FROM events GROUP BY user_id, event_type
    ) WHERE rn = 1
    """,
)
def a9_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic grouped MODE: most frequent event type per user,
    ties broken lexicographically (Spark's native mode() leaves ties
    unspecified — unusable for cross-engine checks). Count then a top-1
    window over the tiny per-user type table; both shuffles key on
    user_id."""
    e = load_table(spark, sf_dir, "events")
    counts = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("user_id").orderBy(F.col("n").desc(), F.col("event_type"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("mode_type"), "n")
    )


@register(
    "j10_null_safe_join",
    """
    WITH d AS (
      SELECT doc_id, nullif(lang, 'en') AS lang_grp FROM documents
    ), grp AS (
      SELECT lang_grp, count(*) AS grp_n FROM d GROUP BY lang_grp
    )
    SELECT d.doc_id, coalesce(d.lang_grp, '<null>') AS lang_grp, g.grp_n
    FROM d JOIN grp g ON d.lang_grp IS NOT DISTINCT FROM g.lang_grp
    """,
)
def j10_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (<=> / IS NOT DISTINCT FROM): NULL keys match
    each other instead of silently dropping — the semantics dimension
    joins over nullable business keys need. Spark plans <=> as a hash
    join key (EqualNullSafe is still an equi-join), so there is no
    nested-loop penalty for the null-safe form."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.nullif("lang", F.lit("en")).alias("lang_grp")
    )
    grp = d.groupBy("lang_grp").agg(F.count(F.lit(1)).alias("grp_n"))
    return (
        d.alias("a")
        .join(grp.alias("g"), F.col("a.lang_grp").eqNullSafe(F.col("g.lang_grp")))
        .select(
            "doc_id",
            F.coalesce(F.col("a.lang_grp"), F.lit("<null>")).alias("lang_grp"),
            "grp_n",
        )
    )


@register(
    "stream_cdc_apply",
    """
    SELECT user_id, event_id, round(value, 2) AS value, event_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC
      ) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def stream_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming upsert materialization (streaming/cdc_apply.py): drain
    the backlog through foreachBatch latest-wins merges with atomic
    snapshot swaps, then read the live table. Must equal the batch
    latest-per-key query — which is exactly the oracle. Exactly-once via
    checkpoint + idempotent merge (pinned by
    tests/test_stateful_streaming.py across restart and redelivery)."""
    import os
    import shutil
    import tempfile

    from extract_permits_spark.streaming.cdc_apply import run_cdc_apply_available_now

    work = tempfile.mkdtemp(prefix="ev_cdc_apply_")
    src = os.path.join(work, "in")
    os.makedirs(src)
    shutil.copy(os.path.join(sf_dir, "events.parquet"), src)
    out = os.path.join(work, "out")
    q = run_cdc_apply_available_now(spark, src, os.path.join(work, "ckpt"), out)
    q.awaitTermination(300)
    live = spark.read.parquet(os.path.join(out, "live"))
    return live.select(
        "user_id",
        "event_id",
        F.round("value", 2).alias("value"),
        "event_type",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
    )


@register(
    "ev_variant_agg",
    """
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS sum_k,
           CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS min_k,
           CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS max_k
    FROM events
    WHERE json_extract_string(props, '$.k') IS NOT NULL
    GROUP BY event_type
    """,
)
def ev_variant_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured analytics over the VARIANT type (Spark 4): parse
    the JSON payload ONCE into a variant column, then typed
    `variant_get` paths feed a normal aggregate. Versus per-path
    `get_json_object` (ev_json_extract), the parse cost is paid once per
    row regardless of how many paths are read — the open-table-format
    answer to schemaless event payloads at 100 TB. Extraction stays
    JVM-side (no UDF); integer sums are exact."""
    e = load_table(spark, sf_dir, "events")
    k = F.try_variant_get(F.try_parse_json("props"), "$.k", "long")
    return (
        e.select("event_type", k.alias("k"))
        .where(F.col("k").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").cast("long").alias("sum_k"),
            F.min("k").cast("long").alias("min_k"),
            F.max("k").cast("long").alias("max_k"),
        )
    )


# ===========================================================================
# Batch r6e — iterative BPE vocabulary induction (full trainer). The
# existing vocab_bpe_pairs computes ONE round of pair statistics; this is
# the whole training loop: N rounds of (pair stats over the vocab →
# argmax merge → apply merge), exactly the distributed form of Sennrich
# et al. 2016. Symbols are framed as '<sym>' so the flat-string merge
# replace can only ever align to whole-symbol boundaries and adjacent
# matches never share characters — replace semantics are then identical
# across engines by construction.
# ===========================================================================

_BPE_ROUNDS = 8


def _bpe_train_oracle_sql(rounds: int = _BPE_ROUNDS) -> str:
    """DuckDB replay of the full BPE training loop, one CTE pair per
    round (pair stats + merged representation)."""
    parts = [
        """WITH wf AS (
      SELECT word, count(*) AS freq FROM (
        SELECT unnest(string_split_regex(trim(lower(COALESCE(text,''))), '\\s+')) AS word
        FROM documents
      ) WHERE word <> '' GROUP BY word
    ),
    w0 AS MATERIALIZED (
      SELECT array_to_string(
               list_transform(range(1, length(word) + 1),
                              i -> '<' || substr(word, i, 1) || '>'), '') AS repr,
             freq
      FROM wf
    )"""
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f""",
    p{r} AS MATERIALIZED (
      SELECT p, CAST(sum(freq) AS BIGINT) AS cnt FROM (
        SELECT freq, unnest(list_transform(
                 range(1, len(string_split(trim(repr, '<>'), '><'))),
                 j -> '<' || string_split(trim(repr, '<>'), '><')[j]
                      || '><' || string_split(trim(repr, '<>'), '><')[j + 1] || '>'
               )) AS p
        FROM w{r - 1}
        WHERE len(string_split(trim(repr, '<>'), '><')) >= 2
      ) GROUP BY p ORDER BY cnt DESC, p LIMIT 1
    ),
    w{r} AS MATERIALIZED (
      SELECT replace(repr, (SELECT p FROM p{r}),
                     (SELECT '<' || replace(replace(p, '<', ''), '>', '') || '>'
                      FROM p{r})) AS repr,
             freq
      FROM w{r - 1}
    )"""
        )
    selects = [
        f"""SELECT {r} AS round,
           (SELECT string_split(trim(p, '<>'), '><')[1] FROM p{r}) AS pair_a,
           (SELECT string_split(trim(p, '<>'), '><')[2] FROM p{r}) AS pair_b,
           (SELECT replace(replace(p, '<', ''), '>', '') FROM p{r}) AS merged,
           (SELECT cnt FROM p{r}) AS cnt"""
        for r in range(1, rounds + 1)
    ]
    parts.append("\n" + "\nUNION ALL\n".join(selects))
    return "".join(parts)


@register("vocab_bpe_train", _bpe_train_oracle_sql())
def vocab_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full distributed BPE training loop (Sennrich et al. 2016): N
    rounds of pair-statistics-over-the-vocabulary → argmax merge → apply
    merge. The corpus collapses to its word-frequency table in ONE
    corpus-scale shuffle; every round after that costs vocabulary-scale
    (at 100 TB: ~10^6 vocab rows per round, trivially distributed), and
    per-round driver state is exactly one (pair, count) row — the argmax,
    a bounded `.first()` probe. Framed '<sym>' symbols make the merge a
    whole-symbol-aligned literal replace with no cross-match character
    sharing, so the oracle's replace() provably applies the identical
    merges."""
    from extract_permits_spark.functions.similarity import tokens

    d = load_table(spark, sf_dir, "documents")
    words = d.select(F.explode(tokens(F.col("text"))).alias("word")).where(
        F.col("word") != ""
    )
    wf = words.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
    cur = wf.select(
        F.concat_ws(
            "",
            F.transform(
                F.sequence(F.lit(1), F.length("word")),
                lambda i: F.concat(
                    F.lit("<"), F.col("word").substr(i, F.lit(1)), F.lit(">")
                ),
            ),
        ).alias("repr"),
        "freq",
    ).localCheckpoint(eager=True)

    syms = F.split(F.expr("trim(BOTH '<>' FROM repr)"), "><")
    n = F.size(syms)
    pair_strs = F.when(
        n >= 2,
        F.transform(
            F.arrays_zip(
                F.slice(syms, 1, n - 1).alias("a"), F.slice(syms, 2, n - 1).alias("b")
            ),
            lambda s: F.concat(
                F.lit("<"), s["a"], F.lit("><"), s["b"], F.lit(">")
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))

    rows = []
    for r in range(1, _BPE_ROUNDS + 1):
        top = (
            cur.select(F.explode(pair_strs).alias("p"), "freq")
            .groupBy("p")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("p"))
            .first()
        )
        if top is None:  # vocabulary exhausted (not reachable on fixtures)
            break
        pat, cnt = top["p"], int(top["cnt"])
        inner = pat.replace("<", "").replace(">", "")
        a, b = pat[1:-1].split("><")
        rows.append((r, a, b, inner, cnt))
        cur = cur.withColumn(
            "repr", F.replace(F.col("repr"), F.lit(pat), F.lit(f"<{inner}>"))
        ).localCheckpoint(eager=True)

    schema = "round INT, pair_a STRING, pair_b STRING, merged STRING, cnt BIGINT"
    return spark.createDataFrame(rows, schema)


@register(
    "a10_regression",
    """
    WITH s AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sy,
             CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sx,
             CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)
                      * CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sxx,
             CAST(sum(CAST(round(value * 100) AS BIGINT)
                      * CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS syy,
             CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)
                      * CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sxy
      FROM events
      WHERE json_extract_string(props, '$.k') IS NOT NULL AND value IS NOT NULL
      GROUP BY event_type
    )
    SELECT event_type, n,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE) / 100.0, 6) AS slope,
           round((CAST(sy AS DOUBLE) / 100.0
                  - (CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE) / 100.0)
                    * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 6) AS intercept,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                        * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS corr
    FROM s
    """,
)
def a10_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped OLS + Pearson correlation (value vs the JSON k field) from
    EXACT integer moment sums — n, Σx, Σy, Σx², Σy², Σxy all in BIGINT
    cents/units, so the partial aggregation is associative and the only
    float ops are the final closed-form divisions (deterministic across
    engines and partitionings — the built-in regr_slope/corr accumulate
    doubles and are not). The mergeable-moments shape is also exactly
    what a 1000-executor partial agg wants."""
    e = load_table(spark, sf_dir, "events")
    x = F.get_json_object("props", "$.k").cast("long")
    y = F.round(F.col("value") * 100).cast("long")
    s = (
        e.where(x.isNotNull() & F.col("value").isNotNull())
        .select("event_type", x.alias("x"), y.alias("y"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("y").alias("sy"),
            F.sum("x").alias("sx"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("y") * F.col("y")).alias("syy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
        )
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    slope = num / den / F.lit(100.0)
    return s.select(
        "event_type",
        "n",
        F.round(slope, 6).alias("slope"),
        F.round(
            (
                F.col("sy").cast("double") / F.lit(100.0)
                - slope * F.col("sx").cast("double")
            )
            / F.col("n").cast("double"),
            6,
        ).alias("intercept"),
        F.round(
            num
            / F.sqrt(
                den * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
            ),
            6,
        ).alias("corr"),
    )


@register(
    "sketch_cms_topk",
    r"""
    WITH toks AS (
      SELECT unnest(string_split_regex(trim(lower(COALESCE(text,''))), '\s+')) AS token
      FROM documents
      WHERE trim(COALESCE(text,'')) <> ''
    ),
    cms AS (
      SELECT d, b, count(*) AS c FROM (
        SELECT u.d,
               CAST(('0x' || substring(md5(CAST(u.d AS VARCHAR) || ':' || token), 1, 6))
                    AS INTEGER) % 512 AS b
        FROM toks, (SELECT unnest([0, 1, 2, 3]) AS d) u
      ) GROUP BY d, b
    ),
    exact_top AS (
      SELECT token, count(*) AS exact_n
      FROM toks GROUP BY token ORDER BY exact_n DESC, token LIMIT 20
    )
    SELECT t.token, t.exact_n,
           min(c.c) AS est_n,
           min(c.c) >= t.exact_n AS bound_holds
    FROM exact_top t
    JOIN (SELECT unnest([0, 1, 2, 3]) AS d) u ON true
    JOIN cms c
      ON c.d = u.d
     AND c.b = CAST(('0x' || substring(md5(CAST(u.d AS VARCHAR) || ':' || t.token), 1, 6))
                    AS INTEGER) % 512
    GROUP BY t.token, t.exact_n
    """,
)
def sketch_cms_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch over the token stream (d=4 md5 rows × w=512
    buckets) queried for the exact top-20 tokens, with the sketch's
    one-sided contract — estimate ≥ true count, always — verified as a
    column the oracle hash-checks. The sketch table is 2048 counters
    regardless of corpus size and builds with ONE map-side-combined
    shuffle (each token emits d bucket increments); merging shards is
    counter addition, the mergeable-partial shape warehouse rollups
    need. Complements HLL (distinct) and GK (quantiles) in the sketch
    family; md5 bucketing keeps the DuckDB replay bit-exact."""
    from extract_permits_spark.functions.similarity import tokens as _tokens

    d = load_table(spark, sf_dir, "documents")
    toks = d.where(F.trim(F.coalesce("text", F.lit(""))) != "").select(
        F.explode(_tokens(F.col("text"))).alias("token")
    )

    def bucket(dd, tok_col):
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(F.lit(str(dd)), F.lit(":"), tok_col).cast("binary")
                    ),
                    1,
                    6,
                ),
                16,
                10,
            ).cast("int")
            % 512
        )

    rows = [
        toks.select(F.lit(dd).alias("d"), bucket(dd, F.col("token")).alias("b"))
        for dd in range(4)
    ]
    from functools import reduce

    cms = (
        reduce(DataFrame.unionByName, rows)
        .groupBy("d", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    exact_top = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), F.col("token"))
        .limit(20)
    )
    probes = reduce(
        DataFrame.unionByName,
        [
            exact_top.select(
                "token", "exact_n", F.lit(dd).alias("d"),
                bucket(dd, F.col("token")).alias("b"),
            )
            for dd in range(4)
        ],
    )
    return (
        probes.join(F.broadcast(cms), ["d", "b"])
        .groupBy("token", "exact_n")
        .agg(
            F.min("c").alias("est_n"),
            (F.min("c") >= F.first("exact_n")).alias("bound_holds"),
        )
    )


@register(
    "ev_attribution",
    """
    SELECT purchase_id, user_id, click_id AS last_click_id
    FROM (
      SELECT p.event_id AS purchase_id, p.user_id, c.event_id AS click_id,
             row_number() OVER (
               PARTITION BY p.event_id ORDER BY c.ts DESC, c.event_id DESC
             ) AS rn
      FROM events p JOIN events c ON p.user_id = c.user_id
      WHERE p.event_type = 'purchase' AND c.event_type = 'click'
        AND c.ts >= p.ts - INTERVAL 30 MINUTE AND c.ts < p.ts
    ) WHERE rn = 1
    """,
)
def ev_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: for every purchase, the single most recent
    click inside the 30-minute lookback — the candidate interval join
    (same shape stream_stream_join runs through the streaming engine)
    reduced by a deterministic max-by struct per purchase. Both the join
    and the reduction key on the same columns, so the pick is one
    aggregation over the already-joined pairs — no second window
    shuffle."""
    e = load_table(spark, sf_dir, "events")
    p = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("p_ts")
    )
    c = e.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    pairs = p.join(
        c,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("interval 30 minutes"))
        & (F.col("c_ts") < F.col("p_ts")),
    )
    return (
        pairs.groupBy("purchase_id", "user_id")
        .agg(F.max(F.struct("c_ts", "click_id")).alias("_m"))
        .select("purchase_id", "user_id", F.col("_m.click_id").alias("last_click_id"))
    )


@register(
    "x7_date_spine",
    """
    WITH RECURSIVE spine(d) AS (
      SELECT (SELECT min(CAST(ts AS DATE)) FROM events)
      UNION ALL
      SELECT d + INTERVAL 1 DAY FROM spine
      WHERE d < (SELECT max(CAST(ts AS DATE)) FROM events)
    ), act AS (
      SELECT CAST(ts AS DATE) AS dd, count(*) AS n FROM events GROUP BY 1
    )
    SELECT strftime(s.d, '%Y-%m-%d') AS day,
           coalesce(a.n, 0) AS n_events,
           a.dd IS NULL AS is_gap
    FROM spine s LEFT JOIN act a ON s.d = a.dd
    """,
)
def x7_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-free calendar spine via WITH RECURSIVE (new engine surface in
    Spark 4) — the canonical warehouse recursive CTE: generate every day
    between the fact table's min and max, left-join daily activity, flag
    silent days. The spine bounds are bounded driver scalars (two-value
    .first()); the recursion itself is O(days), never data-sized.
    Complements the iterative-DataFrame loops (graph.py, vocab_bpe_train)
    with the declarative recursion form for small bounded expansions."""
    e = load_table(spark, sf_dir, "events")
    bounds = e.select(
        F.min(F.col("ts").cast("date")).alias("lo"),
        F.max(F.col("ts").cast("date")).alias("hi"),
    ).first()
    lo, hi = bounds["lo"], bounds["hi"]
    e.select(F.col("ts").cast("date").alias("dd")).groupBy("dd").agg(
        F.count(F.lit(1)).alias("n")
    ).createOrReplaceTempView("_spine_act")
    return spark.sql(
        f"""
        WITH RECURSIVE spine(d) AS (
          SELECT DATE'{lo}'
          UNION ALL
          SELECT date_add(d, 1) FROM spine WHERE d < DATE'{hi}'
        )
        SELECT date_format(s.d, 'yyyy-MM-dd') AS day,
               coalesce(a.n, 0) AS n_events,
               a.dd IS NULL AS is_gap
        FROM spine s LEFT JOIN _spine_act a ON s.d = a.dd
        """
    )


@register(
    "a11_histogram",
    """
    WITH b AS (
      SELECT CAST(least(greatest(floor((c_acctbal + 1000.0) / 1000.0) + 1, 0), 12)
                  AS BIGINT) AS bucket
      FROM customer
    )
    SELECT bucket,
           CAST(round(-1000.0 + (bucket - 1) * 1000.0, 2) AS DOUBLE) AS lo,
           CAST(round(-1000.0 + bucket * 1000.0, 2) AS DOUBLE) AS hi,
           count(*) AS n
    FROM b GROUP BY bucket
    """,
)
def a11_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-width histogram via width_bucket over fixed bounds (the
    TPC-H acctbal domain [-1000, 10000], 11 buckets): a single map-side-
    combined aggregate — the mergeable shape dashboards bin with at any
    scale. Fixed literal bounds (not data-derived min/max) keep bucket
    edges stable across snapshots, which is what makes day-over-day
    histograms comparable."""
    c = load_table(spark, sf_dir, "customer")
    bucket = F.width_bucket("c_acctbal", F.lit(-1000.0), F.lit(10000.0), F.lit(11))
    return (
        c.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bucket",
            F.round(F.lit(-1000.0) + (F.col("bucket") - 1) * 1000.0, 2).alias("lo"),
            F.round(F.lit(-1000.0) + F.col("bucket") * 1000.0, 2).alias("hi"),
            "n",
        )
    )


@register(
    "sample_leakage_safe_split",
    _COMPONENT_EDGES_SQL
    + """
    , reach(id, comp) AS (
        SELECT u, u FROM (SELECT DISTINCT u FROM sym)
      UNION
        SELECT s.v, r.comp FROM reach r JOIN sym s ON s.u = r.id
    ),
    comp AS (SELECT id, MIN(comp) AS component FROM reach GROUP BY id),
    keyed AS (
      SELECT d.doc_id,
             coalesce(c.component, d.doc_id) AS split_key
      FROM documents d LEFT JOIN comp c ON d.doc_id = c.id
    )
    SELECT doc_id, split_key,
           CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'valid'
                ELSE 'test' END AS split
    FROM (
      SELECT doc_id, split_key,
             CAST(('0x' || substring(md5(CAST(split_key AS VARCHAR)), 1, 4))
                  AS INTEGER) % 100 AS bucket
      FROM keyed
    )
    """,
)
def sample_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/valid/test split: hash the near-dup CLUSTER
    root, not the doc id, so every member of a duplicate cluster lands in
    the same split — the split hygiene that stops eval contamination by
    near-copies (hash-split by doc id silently scatters a cluster across
    train AND test). Isolated docs fall back to their own id; the cluster
    labels reuse the memoized component computation, and the split is the
    same deterministic md5 bucketing as sample_hash_split."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    comp = _components_cached(spark, sf_dir).select(
        F.col("id").alias("doc_id"), "component"
    )
    keyed = d.join(comp, "doc_id", "left").select(
        "doc_id", F.coalesce("component", "doc_id").alias("split_key")
    )
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("split_key").cast("string").cast("binary")), 1, 4),
            16,
            10,
        ).cast("int")
        % 100
    )
    return keyed.select(
        "doc_id",
        "split_key",
        F.when(bucket < 80, "train")
        .when(bucket < 90, "valid")
        .otherwise("test")
        .alias("split"),
    )


@register(
    "profile_documents",
    """
    SELECT
      count(*) AS n_rows,
      CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS text_nulls,
      count(DISTINCT lang) AS lang_distinct,
      count(DISTINCT source) AS source_distinct,
      CAST(min(n_chars) AS BIGINT) AS chars_min,
      CAST(max(n_chars) AS BIGINT) AS chars_max,
      CAST(sum(CAST(n_chars AS BIGINT)) AS BIGINT) AS chars_total,
      CAST(sum(CAST(length(COALESCE(text,'')) AS BIGINT)) AS BIGINT) AS text_len_total
    FROM documents
    """,
)
def profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass column profile of the corpus (null counts, distincts,
    bounds, exact totals) — the deterministic, oracle-checkable cousin of
    df.summary(). All counters are exact BIGINTs, so partial aggregation
    is associative; a profiling pass at 100 TB is one scan with map-side
    combine (plus two distinct sub-aggregates on tiny-cardinality
    columns)."""
    d = load_table(spark, sf_dir, "documents")
    return d.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("text").isNull(), 1).otherwise(0)).cast("long").alias(
            "text_nulls"
        ),
        F.count_distinct("lang").alias("lang_distinct"),
        F.count_distinct("source").alias("source_distinct"),
        F.min("n_chars").cast("long").alias("chars_min"),
        F.max("n_chars").cast("long").alias("chars_max"),
        F.sum(F.col("n_chars").cast("long")).cast("long").alias("chars_total"),
        F.sum(F.length(F.coalesce("text", F.lit(""))).cast("long"))
        .cast("long")
        .alias("text_len_total"),
    )


@register(
    "ev_anomaly_zscore",
    """
    WITH s AS (
      SELECT event_type,
             count(*) AS n,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sy,
             CAST(sum(CAST(round(value * 100) AS BIGINT)
                      * CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS syy
      FROM events WHERE value IS NOT NULL GROUP BY event_type
    )
    SELECT e.event_id, e.event_type,
           round((CAST(round(e.value * 100) AS BIGINT) * s.n - s.sy)
                 / sqrt(CAST(s.n * s.syy - s.sy * s.sy AS DOUBLE)), 6) AS z
    FROM events e JOIN s ON e.event_type = s.event_type
    WHERE e.value IS NOT NULL
      AND abs((CAST(round(e.value * 100) AS BIGINT) * s.n - s.sy)
              / sqrt(CAST(s.n * s.syy - s.sy * s.sy AS DOUBLE))) > 2.5
    """,
)
def ev_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score outlier flagging from exact integer moments —
    the algebraic identity z = (x·n − Σx) / sqrt(n·Σx² − (Σx)²)
    evaluated with BIGINT numerators, so the only float ops are the final
    division (deterministic; a naive avg/stddev_pop accumulates doubles
    partition-order-dependently). Two passes: tiny per-type moment table,
    broadcast back over the stream — the standard anomaly-flagging shape
    at any scale."""
    e = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    y = F.round(F.col("value") * 100).cast("long")
    s = e.select("event_type", y.alias("y")).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("sy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    j = e.join(F.broadcast(s), "event_type")
    num = (y * F.col("n") - F.col("sy")).cast("double")
    den = F.sqrt(
        (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    )
    z = num / den
    return j.where(F.abs(z) > 2.5).select(
        "event_id", "event_type", F.round(z, 6).alias("z")
    )


@register(
    "graph_triangles",
    _JACCARD_PAIRS_SQL
    + """
    SELECT CAST(count(*) AS BIGINT) AS n_triangles
    FROM pairs e1
    JOIN pairs e2 ON e1.id_b = e2.id_a
    JOIN pairs e3 ON e3.id_a = e1.id_a AND e3.id_b = e2.id_b
    """,
)
def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count over the near-dup graph — the density signal that
    separates tight duplicate cliques from chains. Oriented-edge form
    (id_a < id_b everywhere, so each triangle counts exactly once): two
    equi-joins on node keys, never an all-pairs product; the classic
    distributed triangle algorithm (order by degree at real scale to
    bound the wedge fan-out)."""
    pairs = _jaccard_pairs_cached(spark, sf_dir).select("id_a", "id_b")
    e1 = pairs.alias("e1")
    e2 = pairs.alias("e2")
    e3 = pairs.alias("e3")
    wedges = e1.join(e2, F.col("e1.id_b") == F.col("e2.id_a"))
    tri = wedges.join(
        e3,
        (F.col("e3.id_a") == F.col("e1.id_a")) & (F.col("e3.id_b") == F.col("e2.id_b")),
    )
    return tri.agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))


@register(
    "j7b_asof_forward",
    """
    SELECT p.event_id AS purchase_id, p.user_id,
           (SELECT e.event_id FROM events e
            WHERE e.user_id = p.user_id AND e.event_type = 'error'
              AND e.ts >= p.ts AND e.ts <= p.ts + INTERVAL 1 HOUR
            ORDER BY e.ts, e.event_id LIMIT 1) AS next_error_id
    FROM events p WHERE p.event_type = 'purchase'
    """,
)
def j7b_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join with tolerance (pandas merge_asof
    direction='forward'): each purchase enriched with the NEXT error
    event on the same user within one hour, or NULL. Same single-shuffle
    union+window plan as the backward join — only the scan order flips;
    the tolerance nulls matches outside the window after the fill, so no
    extra join appears. Oracle is the correlated-subquery formulation."""
    from extract_permits_spark.operators.asof import asof_join

    e = load_table(spark, sf_dir, "events")
    left = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    right = e.where(F.col("event_type") == "error").select(
        "user_id", "ts", F.col("event_id").alias("next_error_id")
    )
    out = asof_join(
        left,
        right,
        left_on="user_id",
        right_on="user_id",
        left_time="ts",
        right_time="ts",
        payload_cols=["next_error_id"],
        direction="forward",
        tolerance_seconds=3600,
    )
    return out.select("purchase_id", "user_id", "next_error_id")


@register(
    "q1_incremental_maintenance",
    # oracle: the DIRECT full-table aggregate — the incremental path must
    # be indistinguishable from recomputing
    _ORACLES["q1_pricing_summary"],
)
def q1_incremental_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance of the Q1 pricing summary: the fact
    stream splits into a base snapshot and an append delta (orderkey % 10),
    each side folds to ALGEBRAIC partials (decimal sums + counts — no
    averages), and the view refresh is a sum-of-partials merge with
    averages derived at the end. Because every sum is exact decimal, the
    merged view is BIT-IDENTICAL to a full recompute — the oracle IS the
    direct aggregate. At 100 TB this turns a daily full-table scan into
    an aggregate over yesterday's partials + today's delta."""
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz")
    )
    qty, price, disc, tax = (
        _dec("l_quantity"),
        _dec("l_extendedprice"),
        _dec("l_discount"),
        _dec("l_tax"),
    )

    def partials(df: DataFrame) -> DataFrame:
        return df.groupBy("l_returnflag", "l_linestatus").agg(
            F.sum(qty).alias("p_qty"),
            F.sum(price).alias("p_price"),
            F.sum(price * (F.lit(1) - disc)).alias("p_disc_price"),
            F.sum(price * (F.lit(1) - disc) * (F.lit(1) + tax)).alias("p_charge"),
            F.sum(disc).alias("p_disc"),
            F.count(F.lit(1)).alias("p_n"),
        )

    base = partials(li.where(F.col("l_orderkey") % 10 != 0))
    delta = partials(li.where(F.col("l_orderkey") % 10 == 0))
    merged = (
        base.unionByName(delta)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("p_qty").alias("m_qty"),
            F.sum("p_price").alias("m_price"),
            F.sum("p_disc_price").alias("m_disc_price"),
            F.sum("p_charge").alias("m_charge"),
            F.sum("p_disc").alias("m_disc"),
            F.sum("p_n").alias("m_n"),
        )
    )
    return merged.select(
        "l_returnflag",
        "l_linestatus",
        F.col("m_qty").cast("double").alias("sum_qty"),
        F.col("m_price").cast("double").alias("sum_base_price"),
        F.col("m_disc_price").cast("double").alias("sum_disc_price"),
        F.col("m_charge").cast("double").alias("sum_charge"),
        (F.col("m_qty").cast("double") / F.col("m_n")).alias("avg_qty"),
        (F.col("m_disc").cast("double") / F.col("m_n")).alias("avg_disc"),
        F.col("m_n").alias("count_order"),
    )


@register(
    "ev_dau_wau",
    """
    WITH du AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    dau AS (SELECT day, count(*) AS dau FROM du GROUP BY day),
    expanded AS (
      SELECT DISTINCT du.day + CAST(u.off AS INTEGER) * INTERVAL 1 DAY AS wday, du.user_id
      FROM du, (SELECT unnest(range(0, 7)) AS off) u
    ),
    wau AS (
      SELECT CAST(wday AS DATE) AS day, count(*) AS wau FROM expanded GROUP BY 1
    )
    SELECT strftime(d.day, '%Y-%m-%d') AS day, d.dau, w.wau
    FROM dau d JOIN wau w ON d.day = w.day
    """,
)
def ev_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily + trailing-7-day active users. WAU cannot be summed from
    daily distincts (users repeat), so each (user, day) pair is expanded
    to the 7 window-days it contributes to — a bounded 7× narrow fan-out
    — then counted distinct per window day. All shuffles key on
    (day[, user]); the expansion happens AFTER the first distinct, so
    the fan-out applies to unique pairs, not raw events (at 100 TB the
    raw stream is 1000× the pair count). Only window days with same-day
    activity are reported (join, not left join), keeping the output a
    clean day series."""
    e = load_table(spark, sf_dir, "events")
    du = e.select(
        F.col("ts").cast("date").alias("day"), "user_id"
    ).distinct()
    dau = du.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    expanded = (
        du.select(
            F.explode(F.sequence(F.lit(0), F.lit(6))).alias("off"), "day", "user_id"
        )
        .select(F.date_add("day", F.col("off")).alias("day"), "user_id")
        .distinct()
    )
    wau = expanded.groupBy("day").agg(F.count(F.lit(1)).alias("wau"))
    return (
        dau.join(wau, "day")
        .select(F.date_format("day", "yyyy-MM-dd").alias("day"), "dau", "wau")
    )


@register(
    "docs_dup_rate_by_source",
    """
    WITH h AS (
      SELECT source, md5(COALESCE(text, '')) AS th FROM documents
    ),
    g AS (
      SELECT source, th, count(*) AS n FROM h GROUP BY source, th
    )
    SELECT source,
           CAST(sum(n) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT) AS n_dup_docs,
           round(CAST(sum(CASE WHEN n > 1 THEN n ELSE 0 END) AS DOUBLE)
                 / sum(n), 6) AS dup_rate
    FROM g GROUP BY source
    """,
)
def docs_dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate rate per source — the per-feed health metric that
    decides which crawls need dedup attention first. Hash the text once,
    count per (source, hash), fold to per-source totals: two shuffles,
    both map-side combined, second one over the tiny hash-group table.
    dup_rate counts ALL members of a duplicated hash group (a group of
    3 contributes 3), matching 'fraction of docs that have a twin'."""
    d = load_table(spark, sf_dir, "documents")
    g = (
        d.select("source", F.md5(F.coalesce("text", F.lit(""))).alias("th"))
        .groupBy("source", "th")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return g.groupBy("source").agg(
        F.sum("n").cast("long").alias("n_docs"),
        F.sum(F.when(F.col("n") > 1, F.col("n")).otherwise(0))
        .cast("long")
        .alias("n_dup_docs"),
        F.round(
            F.sum(F.when(F.col("n") > 1, F.col("n")).otherwise(0)).cast("double")
            / F.sum("n"),
            6,
        ).alias("dup_rate"),
    )


@register(
    "sample_weighted_per_source",
    """
    WITH keyed AS (
      SELECT doc_id, source, n_chars,
             round(ln(
               (CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                     AS BIGINT) + 1.0) / 4294967297.0
             ) / n_chars, 9) AS es_key
      FROM documents
      WHERE n_chars > 0
    )
    SELECT doc_id, source, n_chars, es_key
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY source ORDER BY es_key DESC, doc_id
      ) AS rn
      FROM keyed
    ) WHERE rn <= 3
    """,
)
def sample_weighted_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement, k=3 per source, weight =
    n_chars — the Efraimidis–Spirakis exponential-key scheme (key =
    ln(u)/w, keep the k largest), with u derived from md5(doc_id) so the
    'randomness' is deterministic, reproducible across runs, engines,
    and partitionings. This is how a quality-weighted subsample is drawn
    from 100 TB in ONE pass with no coordination: per-row key, per-group
    top-k window (or a partial top-k under WindowGroupLimit) — never a
    sequential reservoir. The 9dp rounding before ranking makes the
    cross-engine order exact; ties break on doc_id."""
    d = load_table(spark, sf_dir, "documents").where(F.col("n_chars") > 0)
    u = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 8),
            16,
            10,
        ).cast("long")
        + F.lit(1.0)
    ) / F.lit(4294967297.0)
    keyed = d.select(
        "doc_id",
        "source",
        "n_chars",
        F.round(F.log(u) / F.col("n_chars"), 9).alias("es_key"),
    )
    w = Window.partitionBy("source").orderBy(F.col("es_key").desc(), F.col("doc_id"))
    return (
        keyed.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("doc_id", "source", "n_chars", "es_key")
    )


_CURATION_SQL = _COMPONENT_EDGES_SQL + """
    , reach(id, comp) AS (
        SELECT u, u FROM (SELECT DISTINCT u FROM sym)
      UNION
        SELECT s.v, r.comp FROM reach r JOIN sym s ON s.u = r.id
    ),
    comp AS MATERIALIZED (SELECT id, MIN(comp) AS component FROM reach GROUP BY id),
    canon AS MATERIALIZED (
      SELECT component, canonical_id FROM (
        SELECT c.component,
               FIRST_VALUE(c.id) OVER (
                 PARTITION BY c.component
                 ORDER BY length(COALESCE(d.text, '')) DESC, c.id
               ) AS canonical_id,
               ROW_NUMBER() OVER (PARTITION BY c.component ORDER BY c.id) AS rn
        FROM comp c JOIN documents d ON d.doc_id = c.id
      ) WHERE rn = 1
    ),
    cleaned AS (
      SELECT doc_id, lang, source,
             trim(regexp_replace(
               regexp_replace(COALESCE(text,''), 'https?://\\S+', '', 'g'),
               '\\s+', ' ', 'g')) AS t
      FROM documents
    ),
    gated AS (
      SELECT doc_id, lang, source, t,
             len(string_split_regex(t, '\\s+')) AS n_toks
      FROM cleaned
      WHERE length(t) >= 20 AND length(t) <= 50000
        AND len(string_split_regex(t, '\\s+')) >= 5
    ),
    filt AS (
      SELECT doc_id, source, CAST(n_toks AS BIGINT) AS n_toks
      FROM gated
      QUALIFY row_number() OVER (PARTITION BY md5(t) ORDER BY doc_id) = 1
    ),
    kept AS (
      SELECT f.doc_id, f.source, f.n_toks,
             coalesce(c.component, f.doc_id) AS split_key
      FROM filt f
      LEFT JOIN comp c ON f.doc_id = c.id
      LEFT JOIN canon k ON c.component = k.component
      WHERE c.id IS NULL OR k.canonical_id = f.doc_id
    )
    SELECT doc_id, source, n_toks,
           CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'valid'
                ELSE 'test' END AS split
    FROM (
      SELECT *, CAST(('0x' || substring(md5(CAST(split_key AS VARCHAR)), 1, 4))
                     AS INTEGER) % 100 AS bucket
      FROM kept
    )
"""


@register("llm_corpus_curation", _CURATION_SQL)
def llm_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed corpus-curation flagship — what a user actually runs
    before training: quality filter (URL-strip, length/token gates, exact
    dedup keep-first) → near-dup removal (keep only each n-gram cluster's
    canonical survivor: longest text, ties to lowest id) → leakage-safe
    train/valid/test split (hash of the cluster root, so surviving docs
    and any future cluster re-expansion stay split-stable). Every stage
    reuses the independently-oracled machinery (docs_pretrain_filter,
    the memoized closure, sample_leakage_safe_split), and the whole
    chain is replayed end-to-end in DuckDB — composition is where silent
    semantic drift hides, so the composition itself is hash-checked."""
    d = load_table(spark, sf_dir, "documents")
    filt = docs_pretrain_filter(spark, sf_dir).select("doc_id", "source", "n_toks")
    comp = _components_cached(spark, sf_dir).select("id", "component")
    wc = Window.partitionBy("component").orderBy(
        F.length(F.coalesce("text", F.lit(""))).desc(), F.col("id")
    )
    wrn = Window.partitionBy("component").orderBy("id")
    canon = (
        comp.join(d, comp.id == d.doc_id)
        .select(
            "component",
            F.first_value("id").over(wc).alias("canonical_id"),
            F.row_number().over(wrn).alias("_rn"),
        )
        .where(F.col("_rn") == 1)
        .select("component", "canonical_id")
    )
    kept = (
        filt.join(comp, filt.doc_id == comp.id, "left")
        .join(canon, "component", "left")
        .where(F.col("id").isNull() | (F.col("canonical_id") == F.col("doc_id")))
        .select(
            "doc_id",
            "source",
            "n_toks",
            F.coalesce("component", "doc_id").alias("split_key"),
        )
    )
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("split_key").cast("string").cast("binary")), 1, 4),
            16,
            10,
        ).cast("int")
        % 100
    )
    return kept.select(
        "doc_id",
        "source",
        "n_toks",
        F.when(bucket < 80, "train")
        .when(bucket < 90, "valid")
        .otherwise("test")
        .alias("split"),
    )


_TOKPACK_SQL = """
    WITH RECURSIVE cleaned AS (
      SELECT doc_id,
             trim(regexp_replace(
               regexp_replace(COALESCE(text,''), 'https?://\\S+', '', 'g'),
               '\\s+', ' ', 'g')) AS t
      FROM documents
    ), gated AS (
      SELECT doc_id, t, len(string_split_regex(t, '\\s+')) AS n_toks
      FROM cleaned
      WHERE length(t) >= 20 AND length(t) <= 50000
        AND len(string_split_regex(t, '\\s+')) >= 5
    ), filt AS (
      SELECT doc_id, t FROM gated
      QUALIFY row_number() OVER (PARTITION BY md5(t) ORDER BY doc_id) = 1
    ), toked AS (
      SELECT doc_id, string_split_regex(trim(lower(t)), '\\s+') AS toks
      FROM filt
    ), chunks AS (
      SELECT doc_id,
             CAST((start - 1) // 64 AS INT) AS chunk_idx,
             CAST(least(64, len(toks) - start + 1) AS BIGINT) AS weight
      FROM (
        SELECT doc_id, toks,
               unnest(range(1, greatest(len(toks), 1) + 1, 64)) AS start
        FROM toked
      )
    ), seq AS MATERIALIZED (
      SELECT doc_id % 8 AS shard, doc_id, chunk_idx, weight,
             ROW_NUMBER() OVER (
               PARTITION BY doc_id % 8 ORDER BY doc_id, chunk_idx
             ) AS rn
      FROM chunks
    ), pack(shard, rn, doc_id, chunk_idx, weight, bin, used) AS (
        SELECT shard, rn, doc_id, chunk_idx, weight, 0, weight
        FROM seq WHERE rn = 1
      UNION ALL
        SELECT s.shard, s.rn, s.doc_id, s.chunk_idx, s.weight,
               CASE WHEN p.used + s.weight > 256 THEN p.bin + 1 ELSE p.bin END,
               CASE WHEN p.used + s.weight > 256 THEN s.weight
                    ELSE p.used + s.weight END
        FROM pack p JOIN seq s ON s.shard = p.shard AND s.rn = p.rn + 1
    )
    SELECT shard, doc_id, chunk_idx, weight, CAST(bin AS BIGINT) AS bin
    FROM pack
"""


@register("llm_tokenize_pack", _TOKPACK_SQL)
def llm_tokenize_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed shard-assembly flagship — the stage a trainer consumes
    AFTER curation: quality filter (URL-strip, length/token gates, exact
    dedup keep-first, same contract as docs_pretrain_filter) →
    non-overlapping 64-token chunking (the context-window grain) →
    next-fit packing of chunks into 256-token bins per shard. Output is
    one row per chunk: (shard, doc_id, chunk_idx, weight, bin) — the
    physical training-shard layout.

    Scale shape: cleaning + chunking are narrow (tokenize once,
    posexplode arithmetic starts; chunk_text is never materialized —
    column pruning removes the slice/join); the only shuffles are the
    dedup hash and the per-shard repartition for the stateful pack walk
    (Arrow-batched applyInPandas, sequential only WITHIN a shard — at
    100 TB the shard count scales with the cluster, 8 here for oracle
    tractability). The walk orders on seq_id = doc_id*1024 + chunk_idx
    (== (doc_id, chunk_idx): the 50k-char gate bounds chunks/doc at 391
    < 1024). The DuckDB oracle replays the identical walk one row per
    shard per step as a recursive CTE, hash-checking the composition
    end-to-end like llm_corpus_curation."""
    from extract_permits_spark.functions.corpus import next_fit_pack

    d = load_table(spark, sf_dir, "documents")
    t = textfn.collapse_whitespace(textfn.strip_urls("text"))
    cleaned = d.select("doc_id", t.alias("t"))
    gated = cleaned.withColumn("n_toks", F.size(F.split("t", r"\s+"))).where(
        (F.length("t") >= 20)
        & (F.length("t") <= 50000)
        & (F.col("n_toks") >= 5)
    )
    w = Window.partitionBy(F.md5(F.col("t").cast("binary"))).orderBy("doc_id")
    filt = (
        gated.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("doc_id", "t")
    )
    chunks = textfn.chunk_documents(
        filt, id_col="doc_id", text_col="t", chunk_tokens=64, overlap=0
    )
    seq = chunks.select(
        (F.col("doc_id") % 8).alias("shard"),
        (F.col("doc_id") * 1024 + F.col("chunk_idx")).alias("seq_id"),
        F.col("n_tokens").cast("long").alias("w"),
    )
    packed = next_fit_pack(
        seq, id_col="seq_id", weight_col="w", shard_col="shard", budget=256
    )
    return packed.select(
        "shard",
        F.floor(F.col("seq_id") / 1024).cast("long").alias("doc_id"),
        (F.col("seq_id") % 1024).cast("int").alias("chunk_idx"),
        "weight",
        "bin",
    )


@register(
    "llm_pack_stats",
    f"""
    SELECT shard,
           CAST(max(bin) + 1 AS BIGINT) AS n_bins,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(weight) AS BIGINT) AS sum_tokens,
           CAST(sum(weight) AS DOUBLE) / ((max(bin) + 1) * 256) AS fill_rate
    FROM ({_TOKPACK_SQL})
    GROUP BY shard
    ORDER BY shard
    """,
)
def llm_pack_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing-efficiency audit over the shard-assembly flagship: per
    shard, how many 256-token bins the next-fit walk opened, how many
    chunks they hold, and the fill rate (token utilization — the number
    a trainer watches, since every unfilled slot is padding compute).
    Bins are numbered densely from 0 per shard, so n_bins is max(bin)+1 —
    an exact max aggregate, no countDistinct Expand. All-integer until
    the single final division; the oracle replays the entire pack walk
    (the recursive CTE) and aggregates identically."""
    packed = llm_tokenize_pack(spark, sf_dir)
    fill = F.sum("weight").cast("double") / (
        (F.max("bin") + F.lit(1)) * F.lit(256)
    )
    return (
        packed.groupBy("shard")
        .agg(
            (F.max("bin") + 1).cast("long").alias("n_bins"),
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.sum("weight").cast("long").alias("sum_tokens"),
            fill.alias("fill_rate"),
        )
        .orderBy("shard")
    )


def _quality_sigmoid(text) -> "F.Column":
    """The fixed-weight quality logistic shared by docs_quality_score,
    docs_quality_prune, and llm_pretrain_pipeline — ONE definition so the
    three entries cannot drift (r9 review finding; each entry's oracle
    restates the same closed form). Returns the raw sigmoid; callers
    apply the 6dp round."""
    len_chars = F.length(text).cast("double")
    n_words = F.size(F.split(F.trim(F.lower(text)), r"\s+")).cast("double")
    n_punct = (
        F.length(text)
        - F.length(
            F.replace(
                F.replace(F.replace(text, F.lit("."), F.lit("")), F.lit(","), F.lit("")),
                F.lit("!"),
                F.lit(""),
            )
        )
    ).cast("double")
    logit = (
        F.lit(-2.0)
        + F.lit(0.004) * len_chars
        + F.lit(0.02) * n_words
        - F.lit(0.1) * n_punct
    )
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))


_PRETRAIN_SQL = """
    WITH RECURSIVE cleaned AS (
      SELECT doc_id, source,
             trim(regexp_replace(
               regexp_replace(COALESCE(text,''), 'https?://\\S+', '', 'g'),
               '\\s+', ' ', 'g')) AS t
      FROM documents
    ), gated AS (
      SELECT doc_id, source, t
      FROM cleaned
      WHERE length(t) >= 20 AND length(t) <= 50000
        AND len(string_split_regex(t, '\\s+')) >= 5
    ), toks AS MATERIALIZED (
      SELECT doc_id, source, t,
             string_split_regex(trim(lower(t)), '\\s+') AS tk
      FROM gated
    ), grams AS MATERIALIZED (
      SELECT doc_id,
             unnest(list_transform(
               range(1, greatest(len(tk) - 4, 0) + 1),
               i -> array_to_string(list_slice(tk, i, i + 4), ' ')
             )) AS g
      FROM toks
    ), ev AS (
      SELECT DISTINCT g FROM grams WHERE doc_id % 10 = 0
    ), contaminated AS (
      SELECT DISTINCT gr.doc_id
      FROM grams gr JOIN ev USING (g)
      WHERE gr.doc_id % 10 <> 0
    ), train AS (
      SELECT doc_id, source, t, tk FROM toks
      WHERE doc_id % 10 <> 0
        AND doc_id NOT IN (SELECT doc_id FROM contaminated)
    ), deduped AS MATERIALIZED (
      SELECT doc_id, source, t, tk FROM train
      QUALIFY row_number() OVER (PARTITION BY md5(t) ORDER BY doc_id) = 1
    ), q AS (
      SELECT doc_id, source, tk,
             round(1.0 / (1.0 + exp(-(
               -2.0 + 0.004 * CAST(length(t) AS DOUBLE)
                    + 0.02 * CAST(len(string_split_regex(trim(lower(t)), '\\s+'))
                                  AS DOUBLE)
                    - 0.1 * CAST(length(t)
                          - length(replace(replace(replace(t,
                                    '.', ''), ',', ''), '!', '')) AS DOUBLE)
             ))), 6) AS quality
      FROM deduped
    ), pruned AS (
      SELECT doc_id, source, tk FROM (
        SELECT doc_id, source, tk,
               ROW_NUMBER() OVER (
                 PARTITION BY source ORDER BY quality DESC, doc_id
               ) AS rn,
               COUNT(*) OVER (PARTITION BY source) AS n
        FROM q
      ) WHERE rn <= CAST(ceil(0.3 * n) AS BIGINT)
    ), mixed AS (
      SELECT doc_id, tk FROM (
        SELECT doc_id, tk,
               SUM(len(tk)) OVER (
                 PARTITION BY source
                 ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum
        FROM pruned
      ) WHERE cum <= 600
    ), chunks AS (
      SELECT doc_id,
             CAST((start - 1) // 64 AS INT) AS chunk_idx,
             CAST(least(64, len(tk) - start + 1) AS BIGINT) AS weight
      FROM (
        SELECT doc_id, tk,
               unnest(range(1, greatest(len(tk), 1) + 1, 64)) AS start
        FROM mixed
      )
    ), seq AS MATERIALIZED (
      SELECT doc_id % 8 AS shard, doc_id, chunk_idx, weight,
             ROW_NUMBER() OVER (
               PARTITION BY doc_id % 8 ORDER BY doc_id, chunk_idx
             ) AS rn
      FROM chunks
    ), pack(shard, rn, doc_id, chunk_idx, weight, bin, used) AS (
        SELECT shard, rn, doc_id, chunk_idx, weight, 0, weight
        FROM seq WHERE rn = 1
      UNION ALL
        SELECT s.shard, s.rn, s.doc_id, s.chunk_idx, s.weight,
               CASE WHEN p.used + s.weight > 256 THEN p.bin + 1 ELSE p.bin END,
               CASE WHEN p.used + s.weight > 256 THEN s.weight
                    ELSE p.used + s.weight END
        FROM pack p JOIN seq s ON s.shard = p.shard AND s.rn = p.rn + 1
    )
    SELECT shard, doc_id, chunk_idx, weight, CAST(bin AS BIGINT) AS bin
    FROM pack
"""


@register("llm_pretrain_pipeline", _PRETRAIN_SQL)
def llm_pretrain_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full pretraining-data pipeline, composed end to end — what a
    training-data team actually ships, chaining the registry's oracled
    stages in their production order:

      clean (URL-strip, whitespace collapse) -> gates (20..50k chars,
      >=5 tokens) -> benchmark decontamination (drop any training doc
      sharing a 5-gram with the held-out eval slice doc_id%10==0, which
      is itself excluded) -> exact dedup keep-first (md5 of cleaned
      text) -> quality prune (top 30% per source by the logistic
      score) -> domain mix (600-token budget per source, md5-shuffled
      prefix) -> 64-token chunking -> next-fit packing into 256-token
      bins per shard (doc_id%8). Output = the physical shard layout
      (shard, doc_id, chunk_idx, weight, bin), llm_tokenize_pack's
      contract with the curated-and-mixed corpus upstream.

    Scale shape: every stage before packing is narrow maps + at most one
    shuffle each (grams explode + broadcast eval probe; md5 dedup
    window; source windows; source mix window), the pack walk is
    sequential only within a shard, and nothing is ever corpus-pairwise.
    The oracle replays the ENTIRE chain as one chained CTE including the
    recursive pack walk — the hash match pins every stage boundary, so
    a user can swap any stage knowing exactly what contract it must
    keep."""
    from extract_permits_spark.functions.corpus import next_fit_pack
    from extract_permits_spark.functions.similarity import tokens
    from extract_permits_spark.functions.text import _word_ngrams

    d = load_table(spark, sf_dir, "documents")
    t = textfn.collapse_whitespace(textfn.strip_urls("text"))
    cleaned = d.select("doc_id", "source", t.alias("t"))
    gated = cleaned.where(
        (F.length("t") >= 20)
        & (F.length("t") <= 50000)
        & (F.size(F.split("t", r"\s+")) >= 5)
    )
    toked = gated.select("doc_id", "source", "t", tokens(F.col("t")).alias("tk"))

    grams = toked.select("doc_id", F.explode(_word_ngrams(F.col("tk"), 5)).alias("g"))
    ev = grams.where(F.col("doc_id") % 10 == 0).select("g").distinct()
    contaminated = (
        grams.where(F.col("doc_id") % 10 != 0)
        .join(F.broadcast(ev), "g")
        .select("doc_id")
        .distinct()
    )
    train = toked.where(F.col("doc_id") % 10 != 0).join(
        contaminated, "doc_id", "left_anti"
    )

    wdup = Window.partitionBy(F.md5(F.col("t").cast("binary"))).orderBy("doc_id")
    deduped = (
        train.withColumn("_rn", F.row_number().over(wdup))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )

    quality = F.round(_quality_sigmoid(F.col("t")), 6)
    scored = deduped.select("doc_id", "source", "tk", quality.alias("quality"))
    wq = Window.partitionBy("source").orderBy(F.col("quality").desc(), "doc_id")
    wn = Window.partitionBy("source")
    pruned = (
        scored.withColumn("rn", F.row_number().over(wq))
        .withColumn("n", F.count(F.lit(1)).over(wn))
        .where(F.col("rn") <= F.ceil(F.lit(0.3) * F.col("n")).cast("long"))
        .select("doc_id", "source", "tk")
    )

    wmix = (
        Window.partitionBy("source")
        .orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    mixed = (
        pruned.withColumn("cum", F.sum(F.size("tk")).over(wmix))
        .where(F.col("cum") <= 600)
        .select("doc_id", "tk")
    )

    starts = F.sequence(F.lit(1), F.greatest(F.size("tk"), F.lit(1)), F.lit(64))
    chunks = mixed.select(
        "doc_id", "tk", F.posexplode(starts).alias("chunk_idx", "_start")
    ).select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.least(F.lit(64), F.size("tk") - F.col("_start") + 1)
        .cast("long")
        .alias("w"),
    )
    seq = chunks.select(
        (F.col("doc_id") % 8).alias("shard"),
        (F.col("doc_id") * 1024 + F.col("chunk_idx")).alias("seq_id"),
        "w",
    )
    packed = next_fit_pack(
        seq, id_col="seq_id", weight_col="w", shard_col="shard", budget=256
    )
    return packed.select(
        "shard",
        F.floor(F.col("seq_id") / 1024).cast("long").alias("doc_id"),
        (F.col("seq_id") % 1024).cast("int").alias("chunk_idx"),
        "weight",
        "bin",
    )


_HASH_EMBED_SQL_BODY = """
    w AS (
      SELECT doc_id,
             unnest(string_split_regex(trim(lower(COALESCE(text,''))), '\\s+')) AS word
      FROM documents
    ),
    t AS (SELECT doc_id, md5(word) AS h FROM w WHERE word <> ''),
    v AS (
      SELECT doc_id,
             CAST(CAST(('0x' || substring(h, 1, 4)) AS INTEGER) % 64 AS INT) AS dim,
             CAST(sum(CASE WHEN CAST(('0x' || substring(h, 5, 1)) AS INTEGER) % 2 = 0
                           THEN 1 ELSE -1 END) AS BIGINT) AS val
      FROM t GROUP BY doc_id, dim
    )
"""

_RAG_QUERY_TEXT = "spark table join fast query vector"


@register("text_hash_embed", "WITH " + _HASH_EMBED_SQL_BODY + "SELECT doc_id, dim, val FROM v")
def text_hash_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashing vectorizer over the corpus (functions/text.py:
    hashed_tf) — signed hashing-trick term frequencies in long format
    (doc_id, dim, val), exact integers, md5-derived buckets/signs so
    the 'embedding' is bit-reproducible across engines with no
    vocabulary pass and no model. The bridge between the text family
    and the embedding/ANN family: any text corpus becomes a vector
    corpus in one explode + one (id, dim) groupBy."""
    d = load_table(spark, sf_dir, "documents")
    return textfn.hashed_tf(d, id_col="doc_id", text_col="text", dims=64)


@register(
    "rag_hash_retrieval",
    "WITH " + _HASH_EMBED_SQL_BODY + f"""
    , q AS (
      SELECT CAST(CAST(('0x' || substring(md5(word), 1, 4)) AS INTEGER) % 64 AS INT) AS dim,
             CAST(sum(CASE WHEN CAST(('0x' || substring(md5(word), 5, 1)) AS INTEGER) % 2 = 0
                           THEN 1 ELSE -1 END) AS BIGINT) AS qval
      FROM (SELECT unnest(string_split_regex('{_RAG_QUERY_TEXT}', '\\s+')) AS word)
      GROUP BY dim
    ),
    scored AS (
      SELECT v.doc_id,
             CAST(sum(v.val * COALESCE(q.qval, 0)) AS BIGINT) AS dot,
             CAST(sum(v.val * v.val) AS BIGINT) AS n2
      FROM v LEFT JOIN q USING (dim)
      GROUP BY v.doc_id
    ),
    qn AS (SELECT CAST(sum(qval * qval) AS BIGINT) AS q2 FROM q)
    SELECT doc_id,
           floor(CAST(dot AS DOUBLE) / sqrt(CAST(n2 AS DOUBLE) * CAST(q2 AS DOUBLE))
                 * 1000000.0 + 0.5) / 1000000.0 AS cos_sim
    FROM scored CROSS JOIN qn
    ORDER BY cos_sim DESC, doc_id
    LIMIT 20
    """,
)
def rag_hash_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-free text retrieval end-to-end: hash-embed the corpus
    (text_hash_embed), hash-embed the query string the same way
    (computed driver-side with hashlib — a ≤64-row literal, broadcast),
    cosine top-20 with doc_id tiebreak. The dot product and the corpus
    norm fold in ONE groupBy over one corpus scan: the broadcast query
    vector LEFT-joins onto the sparse dims (missing dims contribute 0
    to dot but still count toward the norm), so the whole query is one
    shuffle + an ordered limit. The only float is the final cosine,
    rounded with the half-up floor spelling on BOTH engines. At 100 TB
    this is the serving-side retrieval shape: one corpus pass,
    broadcast query, map-side partial aggregation."""
    import hashlib
    from collections import defaultdict

    d = load_table(spark, sf_dir, "documents")
    v = textfn.hashed_tf(d, id_col="doc_id", text_col="text", dims=64)

    qv: dict[int, int] = defaultdict(int)
    for word in _RAG_QUERY_TEXT.strip().lower().split():
        h = hashlib.md5(word.encode()).hexdigest()
        qv[int(h[:4], 16) % 64] += 1 if int(h[4], 16) % 2 == 0 else -1
    q2 = sum(x * x for x in qv.values())
    qdf = spark.createDataFrame(
        [(int(k), int(x)) for k, x in sorted(qv.items()) if x != 0],
        "dim int, qval long",
    )
    folded = (
        v.join(F.broadcast(qdf), "dim", "left")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("val") * F.coalesce(F.col("qval"), F.lit(0)))
            .cast("long")
            .alias("dot"),
            F.sum(F.col("val") * F.col("val")).cast("long").alias("n2"),
        )
    )
    cos = (
        F.col("dot").cast("double")
        / F.sqrt(F.col("n2").cast("double") * F.lit(float(q2)))
    )
    cos6 = F.floor(cos * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)
    return (
        folded.select("doc_id", cos6.alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), "doc_id")
        .limit(20)
    )


@register(
    "rag_bm25_topk",
    f"""
    WITH w AS (
      SELECT doc_id,
             unnest(string_split_regex(trim(lower(COALESCE(text,''))), '\\s+')) AS word
      FROM documents
    ),
    tok AS (SELECT doc_id, word FROM w WHERE word <> ''),
    lens AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tok GROUP BY doc_id
    ),
    stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS tot
      FROM lens
    ),
    q AS (
      SELECT DISTINCT word
      FROM (SELECT unnest(string_split_regex('{_RAG_QUERY_TEXT}', '\\s+')) AS word)
    ),
    tf AS (
      SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf
      FROM tok WHERE word IN (SELECT word FROM q)
      GROUP BY doc_id, word
    ),
    df AS (SELECT word, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY word),
    scored AS (
      SELECT tf.doc_id,
             sum(
               ln((CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5) + 1.0)
               * (tf * 2.2)
               / (tf + 1.2 * (0.25 + 0.75 * (dl * n_docs / CAST(tot AS DOUBLE))))
             ) AS s
      FROM tf JOIN df USING (word) JOIN lens USING (doc_id) CROSS JOIN stats
      GROUP BY tf.doc_id
    )
    SELECT doc_id, floor(s * 1000000.0 + 0.5) / 1000000.0 AS bm25
    FROM scored
    ORDER BY bm25 DESC, doc_id
    LIMIT 20
    """,
)
def rag_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 lexical retrieval (Robertson/Spärck Jones, k1=1.2, b=0.75)
    for the same fixed query as rag_hash_retrieval — the classic scorer
    a lexical/semantic hybrid serves alongside the embedding path.

    Every statistic is an exact integer until the final fold: tf and df
    are computed on the query-filtered token stream (the filter reaches
    the explode, so corpus-scale work is the doc-length aggregate the
    scorer needs anyway), N/avg_len ride a 1-row broadcast, df a ≤6-row
    broadcast. The per-document score sums ≤6 idf-weighted terms and is
    rounded once with the half-up floor spelling; dl/avgdl is expressed
    as dl*N/total — one double division of exact integer operands. At
    100 TB: two token-stream aggregates (doc_id; doc_id,word-filtered)
    + one doc_id join, top-k as an ordered limit."""
    from extract_permits_spark.functions.similarity import tokens

    qwords = sorted(set(_RAG_QUERY_TEXT.strip().lower().split()))
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("word")
    ).where(F.col("word") != "")
    lens = tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("dl")
    )
    stats = lens.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("tot"),
    )
    tf = (
        tok.where(F.col("word").isin(qwords))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    df = tf.groupBy("word").agg(F.count(F.lit(1)).cast("long").alias("df"))
    idf = F.log(
        (F.col("n_docs").cast("double") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    norm_len = F.col("dl") * F.col("n_docs") / F.col("tot").cast("double")
    term = (
        idf
        * (F.col("tf") * F.lit(2.2))
        / (F.col("tf") + F.lit(1.2) * (F.lit(0.25) + F.lit(0.75) * norm_len))
    )
    scored = (
        tf.join(F.broadcast(df), "word")
        .join(lens, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.sum(term).alias("s"))
    )
    bm25 = F.floor(F.col("s") * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)
    return (
        scored.select("doc_id", bm25.alias("bm25"))
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(20)
    )


_RRF_SQL = f"""
    WITH bm AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS rnk
      FROM ({_ORACLES["rag_bm25_topk"]})
    ),
    hv AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY cos_sim DESC, doc_id) AS rnk
      FROM ({_ORACLES["rag_hash_retrieval"]})
    ),
    u AS (
      SELECT doc_id, rnk FROM bm UNION ALL SELECT doc_id, rnk FROM hv
    )
    SELECT doc_id, sum(1.0 / (60 + rnk)) AS rrf
    FROM u GROUP BY doc_id
    ORDER BY rrf DESC, doc_id
    LIMIT 10
"""


@register("rag_rrf_fusion", _RRF_SQL)
def rag_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: reciprocal-rank fusion (Cormack et al., k=60)
    of the lexical (rag_bm25_topk) and vector (rag_hash_retrieval)
    candidate lists for the same query — the standard production
    combiner when neither scorer dominates. rrf = Σ 1/(60+rank) over
    the lists a document appears in; 1/(60+r) is an exact-int rational
    and at most two such doubles sum per doc, so the score is
    bit-identical across engines with no rounding.

    The two global row_number windows run over the 20-row CANDIDATE
    lists (bounded by each scorer's LIMIT), not the corpus — a
    single-partition sort of ≤20 rows is a driver-scale epilogue, while
    all corpus-scale work stays inside the two scorers' one-pass plans.
    The oracle embeds both scorers' full SQL and fuses identically —
    the composition, including both rankers' tiebreaks, is what's
    hash-checked."""
    bm = rag_bm25_topk(spark, sf_dir)
    hv = rag_hash_retrieval(spark, sf_dir)
    wb = Window.orderBy(F.col("bm25").desc(), "doc_id")
    wh = Window.orderBy(F.col("cos_sim").desc(), "doc_id")
    u = bm.select(
        "doc_id", F.row_number().over(wb).alias("rnk")
    ).unionByName(
        hv.select("doc_id", F.row_number().over(wh).alias("rnk"))
    )
    return (
        u.groupBy("doc_id")
        .agg(F.sum(F.lit(1.0) / (F.lit(60) + F.col("rnk"))).alias("rrf"))
        .orderBy(F.col("rrf").desc(), "doc_id")
        .limit(10)
    )


_HYBRID_RECALL_SQL = f"""
    WITH fused AS (
      SELECT doc_id FROM ({_RRF_SQL})
    ),
    truth AS (
      SELECT doc_id FROM ({_ORACLES["rag_hash_retrieval"]})
      ORDER BY cos_sim DESC, doc_id LIMIT 10
    )
    SELECT CAST(count(*) AS BIGINT) AS n_overlap,
           CAST(count(*) AS DOUBLE) / 10 AS recall_at_10
    FROM fused JOIN truth USING (doc_id)
"""


@register("rag_hybrid_recall", _HYBRID_RECALL_SQL)
def rag_hybrid_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-stack eval: recall@10 of the RRF-fused hybrid list
    against the pure-vector ranking (hash-embed cosine top-10) as ground
    truth — the offline number a serving team watches when tuning the
    lexical/vector blend (how far fusion moves the list from the
    embedding baseline). Both rankings are fully deterministic
    (bit-identical scores + doc_id tiebreaks), so recall is exact and
    hash-checkable: an integer overlap count and one final division.
    All corpus-scale work is inside the scorers; the eval epilogue is a
    10x10 semi-join."""
    fused = rag_rrf_fusion(spark, sf_dir).select("doc_id")
    truth = (
        rag_hash_retrieval(spark, sf_dir)
        .orderBy(F.col("cos_sim").desc(), "doc_id")
        .limit(10)
        .select("doc_id")
    )
    return fused.join(truth, "doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_overlap"),
        (F.count(F.lit(1)).cast("double") / F.lit(10)).alias("recall_at_10"),
    )


_CTX_ASSEMBLY_SQL = f"""
    WITH r AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id) AS rnk
      FROM ({_RRF_SQL})
    ),
    cand AS (
      SELECT r.rnk, r.doc_id, COALESCE(d.text, '') AS text
      FROM r JOIN documents d USING (doc_id)
    ),
    sh AS (
      SELECT rnk, doc_id,
             CASE WHEN len(string_split_regex(trim(lower(text)), '\\s+')) >= 3
                  THEN list_distinct(list_transform(
                    range(1, len(string_split_regex(trim(lower(text)), '\\s+')) - 2 + 1),
                    i -> array_to_string(list_slice(
                           string_split_regex(trim(lower(text)), '\\s+'), i, i + 2), ' ')))
                  ELSE [] END AS shingles
      FROM cand
    ),
    dropped AS (
      SELECT DISTINCT b.doc_id
      FROM sh a JOIN sh b ON a.rnk < b.rnk
      WHERE len(a.shingles) + len(b.shingles)
              - len(list_intersect(a.shingles, b.shingles)) > 0
        AND 2 * len(list_intersect(a.shingles, b.shingles))
              >= len(a.shingles) + len(b.shingles)
                 - len(list_intersect(a.shingles, b.shingles))
    ),
    keep AS (
      SELECT rnk, doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks
      FROM cand
      WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
        AND trim(lower(text)) <> ''
    ),
    chunks AS (
      SELECT rnk, doc_id,
             CAST((start - 1) // 64 AS INT) AS chunk_idx,
             CAST(least(64, len(toks) - start + 1) AS BIGINT) AS n_tokens
      FROM (
        SELECT rnk, doc_id, toks,
               unnest(range(1, greatest(len(toks), 1) + 1, 64)) AS start
        FROM keep
      )
    ),
    walked AS (
      SELECT rnk, doc_id, chunk_idx, n_tokens,
             CAST(SUM(n_tokens) OVER (
               ORDER BY rnk, chunk_idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS cum_tokens
      FROM chunks
    )
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY rnk, chunk_idx) AS INT) AS position,
           doc_id, chunk_idx, n_tokens, cum_tokens
    FROM walked WHERE cum_tokens <= 512
    ORDER BY position
"""


@register("rag_context_assembly", _CTX_ASSEMBLY_SQL)
def rag_context_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The RAG-serving composed flagship (the retrieval analog of
    llm_tokenize_pack): hybrid candidate generation (rag_rrf_fusion =
    BM25 + hash-embedding cosine fused by RRF) → fetch the candidates'
    text → near-dup prune WITHIN the shortlist (drop any candidate whose
    3-gram Jaccard vs a higher-ranked candidate is ≥ 0.5 — redundant
    context wastes the prompt budget) → 64-token chunking (same contract
    as chunk_documents) → greedy in-rank-order packing into a 512-token
    context window. Output: one row per selected chunk with its position
    and running token total — exactly what a serving layer concatenates.

    Scale shape: all corpus-scale work happens inside the two scorers'
    one-pass plans (see rag_bm25_topk / rag_hash_retrieval); the text
    fetch is one broadcast semi-join against the 10-row candidate list;
    everything after (pairwise Jaccard, chunk explode, prefix-sum walk)
    is bounded by the candidate list, so the single-partition windows in
    the epilogue are candidate-scale, never corpus-scale. The Jaccard
    threshold is restated in exact integers (2*|∩| >= |∪|) and every
    output column is an exact integer — no float leaves the plan.

    Reference scope note: composition beyond the reference surface (its
    pipeline ends at workbook delivery); built from the registry's own
    oracled primitives, replayed as one chained-CTE DuckDB statement."""
    from extract_permits_spark.functions.similarity import word_shingles

    rrf = rag_rrf_fusion(spark, sf_dir)
    wr = Window.orderBy(F.col("rrf").desc(), "doc_id")
    ranked = rrf.select("doc_id", F.row_number().over(wr).alias("rnk"))

    d = load_table(spark, sf_dir, "documents")
    # The .limit(10) is a no-op by construction (ranked is the fused
    # top-10 and doc_id is the documents primary key, so the lookup join
    # returns ≤ 10 rows) — it exists to carry the shortlist bound INTO
    # the plan: the epilogue's partition-less windows are provably
    # candidate-scale because a GlobalLimit sits on their input spine,
    # which the plan-quality detector (and AQE's stats) can see, where a
    # "unique-key lookup join of a bounded frame" cannot be statically
    # proven bounded.
    cand = (
        d.join(F.broadcast(ranked), "doc_id")
        .limit(10)
        .select("rnk", "doc_id", F.coalesce("text", F.lit("")).alias("text"))
    )

    sh = cand.select("rnk", "doc_id", word_shingles(F.col("text")).alias("sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union_sz = F.size(F.col("a.sh")) + F.size(F.col("b.sh")) - inter
    # candidate-list pairwise join: ≤45 pairs over a ≤10-row broadcast —
    # bounded by the scorers' LIMITs, never corpus-quadratic
    dropped = (
        a.join(F.broadcast(b), F.col("a.rnk") < F.col("b.rnk"))
        .where((union_sz > F.lit(0)) & (F.lit(2) * inter >= union_sz))
        .select(F.col("b.doc_id").alias("doc_id"))
        .distinct()
    )
    keep = cand.join(F.broadcast(dropped), "doc_id", "left_anti")

    chunks = textfn.chunk_documents(
        keep, id_col="doc_id", text_col="text", chunk_tokens=64, overlap=0
    )
    walked = (
        chunks.join(F.broadcast(ranked), "doc_id")
        .select(
            "rnk",
            "doc_id",
            "chunk_idx",
            F.col("n_tokens").cast("long").alias("n_tokens"),
        )
        .withColumn(
            "cum_tokens",
            F.sum("n_tokens")
            .over(
                Window.orderBy("rnk", "chunk_idx").rowsBetween(
                    Window.unboundedPreceding, 0
                )
            )
            .cast("long"),
        )
    )
    return walked.where(F.col("cum_tokens") <= 512).select(
        F.row_number()
        .over(Window.orderBy("rnk", "chunk_idx"))
        .cast("int")
        .alias("position"),
        "doc_id",
        "chunk_idx",
        "n_tokens",
        "cum_tokens",
    )


@register(
    "docs_snapshot_diff",
    """
    WITH v1 AS (
      SELECT doc_id, md5(COALESCE(text, '')) AS h
      FROM documents WHERE doc_id % 5 <> 0
    ),
    v2 AS (
      SELECT doc_id,
             md5(CASE WHEN doc_id % 3 = 0
                      THEN COALESCE(text, '') || ' [rev2]'
                      ELSE COALESCE(text, '') END) AS h
      FROM documents WHERE doc_id % 7 <> 0
    )
    SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id,
           CASE WHEN v1.doc_id IS NULL THEN 'added'
                WHEN v2.doc_id IS NULL THEN 'removed'
                WHEN v1.h <> v2.h THEN 'changed'
                ELSE 'unchanged' END AS status
    FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
    """,
)
def docs_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-snapshot delta: classify every document across two corpus
    snapshots as added / removed / changed / unchanged by content hash
    — the daily-ingest primitive that decides what re-enters the dedup
    and embedding pipelines. The two snapshots are derived
    deterministically from the fixture (v1 drops doc_id%5==0, v2 drops
    %7==0 and revises %3==0) so both engines diff identical inputs.

    Scale shape: one md5 per row per side (narrow, codegen'd), one
    full-outer hash join on the id — at 100 TB both snapshots shuffle
    once on doc_id (or zero times if both are bucketed/partitioned by
    id, the layout a daily differ would keep); content comparison rides
    the join as a 16-byte residual, never a text compare."""
    d = load_table(spark, sf_dir, "documents")
    txt = F.coalesce(F.col("text"), F.lit(""))
    v1 = d.where(F.col("doc_id") % 5 != 0).select(
        F.col("doc_id").alias("id1"), F.md5(txt.cast("binary")).alias("h1")
    )
    txt2 = F.when(F.col("doc_id") % 3 == 0, F.concat(txt, F.lit(" [rev2]"))).otherwise(
        txt
    )
    v2 = d.where(F.col("doc_id") % 7 != 0).select(
        F.col("doc_id").alias("id2"), F.md5(txt2.cast("binary")).alias("h2")
    )
    joined = v1.join(v2, v1.id1 == v2.id2, "full_outer")
    return joined.select(
        F.coalesce("id1", "id2").alias("doc_id"),
        F.when(F.col("id1").isNull(), "added")
        .when(F.col("id2").isNull(), "removed")
        .when(F.col("h1") != F.col("h2"), "changed")
        .otherwise("unchanged")
        .alias("status"),
    )


# Classic decision-support surface (adapted TPC-H Q4/Q7/Q8/Q9/Q14/Q17/
# Q18/Q19/Q21/Q22) registers itself on import; lives in its own module
# to keep this one navigable.
from extract_permits_spark.plans import tpch_extra as _tpch_extra  # noqa: E402,F401


@register(
    "ev_gap_fill",
    """
    WITH daily AS (
      SELECT user_id, date_trunc('day', ts) AS day,
             SUM(CAST(round(value * 100) AS BIGINT)) AS cents
      FROM events WHERE event_type = 'purchase'
      GROUP BY 1, 2
    ),
    bounds AS (SELECT user_id, MIN(day) AS mn, MAX(day) AS mx FROM daily GROUP BY 1),
    spine AS (
      SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS day
      FROM bounds
    ),
    j AS (
      SELECT s.user_id, s.day, d.cents
      FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
    ),
    f AS (
      SELECT user_id, day, cents,
        last_value(cents IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY day
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pc,
        last_value(CASE WHEN cents IS NOT NULL THEN day END IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY day
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
        first_value(cents IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY day
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nc,
        first_value(CASE WHEN cents IS NOT NULL THEN day END IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY day
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
      FROM j
    )
    SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
           round((CASE WHEN cents IS NOT NULL THEN CAST(cents AS DOUBLE)
                  ELSE CAST(pc AS DOUBLE)
                       + CAST(nc - pc AS DOUBLE)
                         * (CAST(date_diff('day', pd, day) AS DOUBLE)
                            / CAST(date_diff('day', pd, nd) AS DOUBLE))
                  END) / 100.0, 6) AS daily_value,
           cents IS NULL AS interpolated
    FROM f
    """,
)
def ev_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill with linear interpolation, per user over a
    daily spine (the feature-engineering step before any model sees an
    irregular signal). Spine = sequence(min_day, max_day) per user —
    bounded fan-out, exploded narrow, never a global calendar cross
    join. Prev/next anchors come from last/first IGNORE NULLS windows
    over the same user-day shuffle (one exchange total for both
    directions + the join).

    Exact integer core: daily totals in BIGINT cents; the interpolation
    `pc + (nc - pc) * (Δprev / Δspan)` is evaluated in the identical
    operation order on both engines (int-to-double conversions are
    exact, IEEE ops are deterministic), then rounded to 6dp once."""
    e = load_table(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    cents = F.round(F.col("value") * 100).cast("bigint")
    daily = e.groupBy(
        "user_id", F.date_trunc("DAY", "ts").alias("day")
    ).agg(F.sum(cents).alias("cents"))
    spine = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("mn"), F.max("day").alias("mx"))
        .select(
            "user_id",
            F.explode(F.sequence("mn", "mx", F.expr("interval 1 day"))).alias("day"),
        )
    )
    j = spine.join(daily, ["user_id", "day"], "left")
    wp = Window.partitionBy("user_id").orderBy("day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wn = Window.partitionBy("user_id").orderBy("day").rowsBetween(
        0, Window.unboundedFollowing
    )
    marked_day = F.when(F.col("cents").isNotNull(), F.col("day"))
    pc = F.last("cents", ignorenulls=True).over(wp)
    pd_ = F.last(marked_day, ignorenulls=True).over(wp)
    nc = F.first("cents", ignorenulls=True).over(wn)
    nd = F.first(marked_day, ignorenulls=True).over(wn)
    frac = F.datediff(F.col("day"), pd_).cast("double") / F.datediff(
        nd, pd_
    ).cast("double")
    filled = F.when(
        F.col("cents").isNotNull(), F.col("cents").cast("double")
    ).otherwise(pc.cast("double") + (nc - pc).cast("double") * frac)
    return j.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.round(filled / F.lit(100.0), 6).alias("daily_value"),
        F.col("cents").isNull().alias("interpolated"),
    )


@register(
    "ev_entropy",
    """
    WITH tc AS (
      SELECT user_id, event_type, COUNT(*) AS c
      FROM events GROUP BY 1, 2
    )
    SELECT user_id,
           round(-(SUM(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))))
                   / SUM(c) + ln(SUM(c)), 6) AS type_entropy,
           CAST(SUM(c) AS BIGINT) AS n_events
    FROM tc GROUP BY user_id
    """,
)
def ev_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each user's event-type distribution — the
    behavioral-diversity metric corpus curation uses to separate bots
    (entropy ~0, one action repeated) from organic sessions. Algebraic
    identity H = ln N − (Σ c·ln c)/N keeps it a single mergeable
    aggregate over exact integer counts: two shuffles total (type
    counts, then per-user fold), no per-row probability column. The only
    floats are ln() of exact ints folded over ≤5 terms, rounded to 6dp —
    cross-engine-stable."""
    e = load_table(spark, sf_dir, "events")
    tc = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("c"))
    cd = F.col("c").cast("double")
    return tc.groupBy("user_id").agg(
        F.round(
            -(F.sum(cd * F.log(cd)) / F.sum("c")) + F.log(F.sum("c")), 6
        ).alias("type_entropy"),
        F.sum("c").cast("bigint").alias("n_events"),
    )


@register(
    "a12_winsorize",
    """
    WITH q AS (
      SELECT c_mktsegment AS seg,
             quantile_cont(c_acctbal, 0.05) AS p05,
             quantile_cont(c_acctbal, 0.95) AS p95
      FROM customer GROUP BY 1
    )
    SELECT seg,
           round(p05, 6) AS p05,
           round(p95, 6) AS p95,
           CAST(COUNT(*) FILTER (WHERE c_acctbal < p05 OR c_acctbal > p95)
                AS BIGINT) AS n_clipped,
           CAST(SUM(CAST(
                 CAST(round(100 * CASE WHEN c_acctbal < p05 THEN p05
                                       WHEN c_acctbal > p95 THEN p95
                                       ELSE c_acctbal END) AS BIGINT)
                 AS DECIMAL(18,0))) AS DOUBLE) / 100.0 AS winsorized_total
    FROM customer JOIN q ON c_mktsegment = seg
    GROUP BY seg, p05, p95
    """,
)
def a12_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group winsorization (clip to [p05, p95]) — the outlier
    treatment quality-score pipelines apply before averaging. Exact
    linear-interpolation percentiles (Spark `percentile` ≡ DuckDB
    `quantile_cont`) computed per segment in one aggregate, broadcast
    back over the stream (5-row join side), clip as a CASE expression.
    The clipped total is summed in BIGINT cents (clip bounds rounded to
    cents first) so the aggregate stays associative and exact."""
    c = load_table(spark, sf_dir, "customer")
    q = F.broadcast(
        c.groupBy(F.col("c_mktsegment").alias("seg")).agg(
            F.percentile("c_acctbal", F.lit(0.05)).alias("p05"),
            F.percentile("c_acctbal", F.lit(0.95)).alias("p95"),
        )
    )
    bal = F.col("c_acctbal")
    clipped = (
        F.when(bal < F.col("p05"), F.col("p05"))
        .when(bal > F.col("p95"), F.col("p95"))
        .otherwise(bal)
    )
    cents = F.round(F.lit(100) * clipped).cast("bigint").cast("decimal(18,0)")
    return (
        c.join(q, c.c_mktsegment == F.col("seg"))
        .groupBy("seg", "p05", "p95")
        .agg(
            F.sum(((bal < F.col("p05")) | (bal > F.col("p95"))).cast("bigint"))
            .cast("bigint")
            .alias("n_clipped"),
            (F.sum(cents).cast("double") / F.lit(100.0)).alias("winsorized_total"),
        )
        .select(
            "seg",
            F.round("p05", 6).alias("p05"),
            F.round("p95", 6).alias("p95"),
            "n_clipped",
            "winsorized_total",
        )
    )


@register(
    "u4_except_all",
    """
    SELECT o_custkey FROM orders WHERE o_orderstatus IN ('O', 'P')
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def u4_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics EXCEPT ALL (multiplicity-aware difference — the set
    EXCEPT that u3/j2 cover would collapse duplicates). Spark plans
    exceptAll as a count-tagged union + generate (one shuffle), never a
    per-row correlated probe."""
    o = load_table(spark, sf_dir, "orders")
    left = o.where(F.col("o_orderstatus").isin("O", "P")).select("o_custkey")
    right = o.where(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return left.exceptAll(right)


def _bpe_encode_oracle_sql(rounds: int = _BPE_ROUNDS) -> str:
    """DuckDB replay of BPE ENCODING as sequential merge application:
    the same per-round CTE chain as the trainer's oracle, with `word`
    carried through so the final representation maps each vocabulary
    word to its token sequence. Hash-matching this against the Spark
    side's rank-priority encoder (functions/bpe.py) is an empirical
    proof of the two formulations' equivalence on the corpus."""
    parts = [
        """WITH wf AS (
      SELECT word, count(*) AS freq FROM (
        SELECT unnest(string_split_regex(trim(lower(COALESCE(text,''))), '\\s+')) AS word
        FROM documents
      ) WHERE word <> '' GROUP BY word
    ),
    w0 AS MATERIALIZED (
      SELECT word,
             array_to_string(
               list_transform(range(1, length(word) + 1),
                              i -> '<' || substr(word, i, 1) || '>'), '') AS repr,
             freq
      FROM wf
    )"""
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f""",
    p{r} AS MATERIALIZED (
      SELECT p, CAST(sum(freq) AS BIGINT) AS cnt FROM (
        SELECT freq, unnest(list_transform(
                 range(1, len(string_split(trim(repr, '<>'), '><'))),
                 j -> '<' || string_split(trim(repr, '<>'), '><')[j]
                      || '><' || string_split(trim(repr, '<>'), '><')[j + 1] || '>'
               )) AS p
        FROM w{r - 1}
        WHERE len(string_split(trim(repr, '<>'), '><')) >= 2
      ) GROUP BY p ORDER BY cnt DESC, p LIMIT 1
    ),
    w{r} AS MATERIALIZED (
      SELECT word,
             replace(repr, (SELECT p FROM p{r}),
                     (SELECT '<' || replace(replace(p, '<', ''), '>', '') || '>'
                      FROM p{r})) AS repr,
             freq
      FROM w{r - 1}
    )"""
        )
    parts.append(
        f"""
    SELECT word,
           CAST(len(string_split(trim(repr, '<>'), '><')) AS BIGINT) AS n_syms,
           array_to_string(string_split(trim(repr, '<>'), '><'), '|') AS token_str
    FROM w{rounds}"""
    )
    return "".join(parts)


@register("vocab_bpe_encode", _bpe_encode_oracle_sql())
def vocab_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer APPLICATION over the corpus vocabulary: train the
    8-round merge table (reusing vocab_bpe_train's distributed loop),
    then encode every distinct word with the rank-priority encoder
    (functions/bpe.py, Arrow-batched mapInPandas). The oracle replays
    encoding as SEQUENTIAL merge application — the hash match proves
    the two classic BPE formulations equivalent on this corpus, token
    string by token string.

    Scale shape: encoding runs on the VOCABULARY (distinct words), not
    the word stream — the deployment pattern that makes a 50k-merge
    tokenizer affordable at 100 TB (vocab-scale Python, corpus-scale
    work stays a join). The 8-row merge table on the driver is bounded
    state, same class as the k-means centroids."""
    from extract_permits_spark.functions.bpe import encode_words
    from extract_permits_spark.functions.similarity import tokens

    merges_pdf = (
        vocab_bpe_train(spark, sf_dir)
        .orderBy("round")
        .select("pair_a", "pair_b")
        .toPandas()  # 8 rows — bounded driver state by construction
    )
    merges = list(zip(merges_pdf["pair_a"], merges_pdf["pair_b"]))
    d = load_table(spark, sf_dir, "documents")
    vocab = (
        d.select(F.explode(tokens(F.col("text"))).alias("word"))
        .where(F.col("word") != "")
        .distinct()
    )
    enc = encode_words(vocab, merges)
    return enc.select(
        "word",
        F.size("tokens").cast("bigint").alias("n_syms"),
        F.concat_ws("|", "tokens").alias("token_str"),
    )


@register(
    "docs_unigram_xent",
    """
    WITH words AS (
      SELECT doc_id,
             unnest(string_split_regex(trim(lower(COALESCE(text,''))), '\\s+')) AS word
      FROM documents
    ),
    w AS (SELECT doc_id, word FROM words WHERE word <> ''),
    uni AS (
      SELECT word, CAST(count(*) AS BIGINT) AS c FROM w GROUP BY word
    ),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM uni)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_words,
           round(-sum(ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)))
                 / count(*), 6) AS xent
    FROM w JOIN uni USING (word) CROSS JOIN tot
    GROUP BY doc_id
    """,
)
def docs_unigram_xent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document unigram cross-entropy against the corpus's own
    unigram model — the perplexity-filter shape (CCNet/Gopher style):
    documents whose words are corpus-atypical score high and get culled.
    Exact integer counts feed the model; ln() of exact ratios is the
    only float, folded per document and rounded once. The unigram model
    is corpus-scale aggregated ONCE and joined back (broadcast at real
    vocab sizes ~10^6); never a per-document vocabulary pass."""
    from extract_permits_spark.functions.similarity import tokens

    d = load_table(spark, sf_dir, "documents")
    w = d.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("word")
    ).where(F.col("word") != "")
    uni = w.groupBy("word").agg(F.count(F.lit(1)).alias("c"))
    tot = uni.agg(F.sum("c").cast("bigint").alias("n"))
    p = F.col("c").cast("double") / F.col("n").cast("double")
    return (
        w.join(F.broadcast(uni), "word")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.round(-F.sum(F.log(p)) / F.count(F.lit(1)), 6).alias("xent"),
        )
    )


@register(
    "docs_quality_score",
    """
    WITH feats AS (
      SELECT doc_id,
             CAST(length(COALESCE(text, '')) AS DOUBLE) AS len_chars,
             CAST(len(string_split_regex(trim(lower(COALESCE(text,''))), '\\s+'))
                  AS DOUBLE) AS n_words,
             CAST(length(COALESCE(text,''))
                  - length(replace(replace(replace(COALESCE(text,''),
                            '.', ''), ',', ''), '!', '')) AS DOUBLE) AS n_punct
      FROM documents
    )
    SELECT doc_id,
           round(1.0 / (1.0 + exp(-(
             -2.0 + 0.004 * len_chars + 0.02 * n_words - 0.1 * n_punct
           ))), 6) AS quality,
           CASE WHEN 1.0 / (1.0 + exp(-(
             -2.0 + 0.004 * len_chars + 0.02 * n_words - 0.1 * n_punct
           ))) >= 0.5 THEN 'keep' ELSE 'cull' END AS verdict
    FROM feats
    """,
)
def docs_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model inference as columnar math: a logistic quality classifier
    with FIXED published weights (the fasttext-filter deployment shape —
    weights are artifacts, not data) over engineered text features.
    Entirely whole-stage-codegen expressions: at 100 TB this is a narrow
    map over the scan, no shuffle, no Python. The same closed form runs
    on both engines; one 6dp round after the sigmoid."""
    d = load_table(spark, sf_dir, "documents")
    score = _quality_sigmoid(F.coalesce(F.col("text"), F.lit("")))
    return d.select(
        "doc_id",
        F.round(score, 6).alias("quality"),
        F.when(score >= 0.5, "keep").otherwise("cull").alias("verdict"),
    )


@register(
    "docs_quality_prune",
    """
    WITH feats AS (
      SELECT doc_id, source,
             CAST(length(COALESCE(text, '')) AS DOUBLE) AS len_chars,
             CAST(len(string_split_regex(trim(lower(COALESCE(text,''))), '\\s+'))
                  AS DOUBLE) AS n_words,
             CAST(length(COALESCE(text,''))
                  - length(replace(replace(replace(COALESCE(text,''),
                            '.', ''), ',', ''), '!', '')) AS DOUBLE) AS n_punct
      FROM documents
    ),
    q AS (
      SELECT doc_id, source,
             round(1.0 / (1.0 + exp(-(
               -2.0 + 0.004 * len_chars + 0.02 * n_words - 0.1 * n_punct
             ))), 6) AS quality
      FROM feats
    )
    SELECT doc_id, source, quality FROM (
      SELECT doc_id, source, quality,
             ROW_NUMBER() OVER (
               PARTITION BY source ORDER BY quality DESC, doc_id
             ) AS rn,
             COUNT(*) OVER (PARTITION BY source) AS n
      FROM q
    )
    WHERE rn <= CAST(ceil(0.3 * n) AS BIGINT)
    """,
)
def docs_quality_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality pruning, the FineWeb/DCLM selection step: keep the top
    30% of documents PER SOURCE by the fixed-weight logistic quality
    score (docs_quality_score's classifier — per-source quotas stop a
    high-quality-on-average source from crowding out the others). The
    6dp-rounded score with a doc_id tiebreak makes the cut deterministic
    across engines and partitionings. One narrow scoring map, ONE
    shuffle on source, and both windows (rank + group count) share that
    single exchange; the 30%-of-group limit is row-count-dependent, so
    WindowGroupLimit does NOT apply (it needs a constant k) — a fixed
    per-source quota variant would get the map-side partial top-k, the
    documented trade for a relative cut."""
    d = load_table(spark, sf_dir, "documents")
    quality = F.round(
        _quality_sigmoid(F.coalesce(F.col("text"), F.lit(""))), 6
    )
    scored = d.select("doc_id", "source", quality.alias("quality"))
    w = Window.partitionBy("source").orderBy(
        F.col("quality").desc(), F.col("doc_id")
    )
    wn = Window.partitionBy("source")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(wn))
        .where(F.col("rn") <= F.ceil(F.lit(0.3) * F.col("n")).cast("long"))
        .select("doc_id", "source", "quality")
    )


@register(
    "docs_domain_mix",
    """
    WITH toks AS (
      SELECT doc_id, source,
             CASE WHEN trim(lower(COALESCE(text,''))) = '' THEN 0
                  ELSE len(string_split_regex(trim(lower(COALESCE(text,''))), '\\s+'))
             END AS n_toks,
             md5(CAST(doc_id AS VARCHAR)) AS pri
      FROM documents
    ),
    walked AS (
      SELECT doc_id, source, CAST(n_toks AS BIGINT) AS n_toks,
             CAST(SUM(n_toks) OVER (
               PARTITION BY source ORDER BY pri, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS cum_toks
      FROM toks
    )
    SELECT source, doc_id, n_toks, cum_toks
    FROM walked WHERE cum_toks <= 600
    ORDER BY source, cum_toks
    """,
)
def docs_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixing sampler (the Pile/DoReMi-style per-source token
    budget): draw a uniformly-shuffled sample from EVERY source until
    that source's token budget (600 here — ~45% of a fixture source, so the cut is exercised) is filled — equal token
    budgets rebalance a corpus whose sources differ wildly in size.
    The shuffle order is md5(doc_id) (deterministic, engine-neutral,
    uncorrelated with content), and the take is the prefix whose
    running token total stays within budget.

    Shape: one narrow token-count map, ONE shuffle on source, one
    running-sum window, one filter. Per-source state is a single
    cumulative counter — no driver-side sampling loop, no second pass.
    At 100 TB: the window is per-source-partition sequential, so skewed
    giant sources bound the tail; the standard scale-out is budget
    sharding (split each source's budget over k salted sub-partitions),
    which this plan admits without restructuring."""
    d = load_table(spark, sf_dir, "documents")
    t = F.trim(F.lower(F.coalesce(F.col("text"), F.lit(""))))
    n_toks = (
        F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))
    ).cast("long")
    pri = F.md5(F.col("doc_id").cast("string"))
    w = (
        Window.partitionBy("source")
        .orderBy(pri, "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    walked = d.select(
        "source", "doc_id", n_toks.alias("n_toks")
    ).withColumn("cum_toks", F.sum("n_toks").over(w).cast("long"))
    return walked.where(F.col("cum_toks") <= 600).select(
        "source", "doc_id", "n_toks", "cum_toks"
    ).orderBy("source", "cum_toks")


@register(
    "ann_batch_topk",
    """
    WITH q AS (
      SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id < 5
    ),
    scored AS (
      SELECT q.query_id, e.vec_id,
             round(
               list_sum(list_transform(range(1, 65),
                        i -> CAST(e.embedding[i] AS DOUBLE) * q.qv[i]))
               / (sqrt(list_sum(list_transform(range(1, 65),
                        i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))
                  * sqrt(list_sum(list_transform(range(1, 65), i -> q.qv[i] * q.qv[i])))),
               6) AS cosine_sim
      FROM embeddings e CROSS JOIN q
    ),
    ranked AS (
      SELECT query_id, vec_id, cosine_sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cosine_sim DESC, vec_id) AS rn
      FROM scored
    )
    SELECT query_id, vec_id, cosine_sim FROM ranked WHERE rn <= 20
    """,
)
def ann_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched exact retrieval: top-20 per query for a BATCH of query
    vectors in one corpus pass — the serving shape (RAG retrieval runs
    thousands of queries per batch, never one scan per query). The
    query set broadcasts (bounded fan-out = corpus x n_queries rows,
    all narrow); the per-query top-k is a rank-limit window, which
    Spark executes as WindowGroupLimit — per-partition top-k heaps
    BEFORE the exchange, so the shuffle carries ~n_queries x k rows,
    not the scored corpus. Ordering on the ROUNDED similarity + id on
    both engines keeps tie-breaks hash-stable."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = F.broadcast(
        emb.where(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
        )
    )
    scored = emb.crossJoin(q).select(
        "query_id",
        "vec_id",
        F.round(simfn.cosine(F.col("embedding"), F.col("qv")), 6).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 20)
        .select("query_id", "vec_id", "cosine_sim")
    )


@register(
    "x8_schema_evolution_union",
    """
    SELECT o_orderkey, o_totalprice, CAST(NULL AS VARCHAR) AS o_orderpriority,
           'v1' AS shard_ver
    FROM orders WHERE o_orderstatus = 'F'
    UNION ALL
    SELECT o_orderkey, CAST(NULL AS DOUBLE) AS o_totalprice, o_orderpriority,
           'v2' AS shard_ver
    FROM orders WHERE o_orderstatus = 'O'
    """,
)
def x8_schema_evolution_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution harmonization: shards written at different
    pipeline versions carry different column sets; the union fills the
    missing columns with NULL instead of failing or silently dropping
    data (`unionByName(allowMissingColumns=True)` — the ingestion shape
    for a corpus whose schema grew over time). Narrow on both branches;
    at 100 TB this is scan-cost only."""
    o = load_table(spark, sf_dir, "orders")
    v1 = (
        o.where(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_totalprice")
        .withColumn("shard_ver", F.lit("v1"))
    )
    v2 = (
        o.where(F.col("o_orderstatus") == "O")
        .select("o_orderkey", F.col("o_orderpriority").cast("string"))
        .withColumn("shard_ver", F.lit("v2"))
    )
    return v1.unionByName(v2, allowMissingColumns=True).select(
        "o_orderkey", "o_totalprice", "o_orderpriority", "shard_ver"
    )


@register(
    "mm_image_stats",
    """
    WITH imgs AS (
        SELECT doc_id AS media_id,
               8 + (doc_id % 5) * 4 AS width,
               8 + (doc_id % 7) * 2 AS height,
               CAST(CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 4 END AS BIGINT) AS channels
        FROM documents
    ),
    sums AS (
        SELECT i.media_id, i.width, i.height, i.channels, c.c,
               SUM((i.media_id + 7 * x.x + 13 * y.y + 101 * c.c) % 256) AS s
        FROM imgs i,
             generate_series(0, 23) AS x(x),
             generate_series(0, 19) AS y(y),
             (VALUES (0), (1), (2)) AS c(c)
        WHERE x.x < i.width AND y.y < i.height
        GROUP BY i.media_id, i.width, i.height, i.channels, c.c
    )
    SELECT media_id, width, height, channels,
           width * height AS n_pixels,
           CAST(MAX(CASE WHEN c = 0 THEN s END) AS DOUBLE) / (width * height) AS r_mean,
           CAST(MAX(CASE WHEN c = 1 THEN s END) AS DOUBLE) / (width * height) AS g_mean,
           CAST(MAX(CASE WHEN c = 2 THEN s END) AS DOUBLE) / (width * height) AS b_mean
    FROM sums
    GROUP BY media_id, width, height, channels
    """,
)
def mm_image_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Executable image decode: one real PNG per document (deterministic
    pixels, stdlib encoder cycling all five scanline filters), decoded
    back with the pure-stdlib PNG codec (zlib inflate + unfilter,
    functions/png_codec.py) inside Arrow-batched mapInPandas, emitting
    per-image width/height/channels and exact-sum channel means.

    The oracle never sees a PNG byte: it recomputes the expected channel
    sums in closed form from the shared pixel formula, so a hash match
    proves the whole encode -> filter -> deflate -> inflate -> unfilter
    chain is bit-faithful. Both mapInPandas stages are narrow (no
    shuffle); at 100 TB this is the scrape-ingest decode shape — scan +
    per-item Python, Arrow-batched, metadata pruned out of the worker.
    Ref: the reference has no multimodal surface (SURVEY §2.11); this is
    north-star capability."""
    d = load_table(spark, sf_dir, "documents")
    media = mmfn.synthetic_png_media(d)
    return mmfn.image_stats(media)


@register(
    "mm_decode_quarantine",
    """
    SELECT doc_id AS media_id,
           doc_id % 13 <> 0 AS ok,
           CASE WHEN doc_id % 13 = 0 THEN 'truncated' END AS err_kind
    FROM documents
    """,
)
def mm_decode_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corrupt-blob rail, end-to-end: every 13th payload is
    deterministically truncated (last 5 bytes dropped — clips the IEND
    chunk, which the codec's chunk-walk reports as a truncation
    ValueError), then the whole corpus flows through the per-item
    try/except quarantine decode (functions/multimodal.py:
    decode_quarantine). The oracle is closed-form — it knows exactly
    which rows were corrupted and what bucket the codec must assign —
    so a hash match proves the rail neither drops, misclassifies, nor
    lets a bad payload near the job's fate. At 100 TB this is the
    difference between a scrape-decode job that finishes with a
    quarantine table and one that dies at task 1,999,731."""
    d = load_table(spark, sf_dir, "documents")
    media = mmfn.synthetic_png_media(d).select("media_id", "payload")
    corrupted = media.select(
        "media_id",
        F.when(
            F.col("media_id") % 13 == 0,
            F.expr("substring(payload, 1, length(payload) - 5)"),
        )
        .otherwise(F.col("payload"))
        .alias("payload"),
    )
    return mmfn.decode_quarantine(corrupted)


@register(
    "mm_audio_stats",
    """
    WITH auds AS (
        SELECT doc_id AS media_id,
               8000 + (doc_id % 3) * 4000 AS sample_rate,
               CAST(1 + (doc_id % 2) AS BIGINT) AS channels,
               256 + (doc_id % 7) * 64 AS n_frames
        FROM documents
    ),
    samp AS (
        SELECT a.media_id, a.sample_rate, a.channels, a.n_frames,
               ((a.media_id * 17 + i.i * 31) % 65536) - 32768 AS s
        FROM auds a, generate_series(0, 1279) AS i(i)
        WHERE i.i < a.n_frames * a.channels
    )
    SELECT media_id, sample_rate, channels, n_frames,
           CAST(n_frames * 1000 AS DOUBLE) / sample_rate AS duration_ms,
           CAST(SUM(s) AS DOUBLE) / (n_frames * channels) AS mean_amp,
           CAST(MAX(ABS(s)) AS BIGINT) AS peak_amp
    FROM samp
    GROUP BY media_id, sample_rate, channels, n_frames
    """,
)
def mm_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Executable audio decode, sibling of mm_image_stats: one real PCM
    WAV per document (deterministic samples, stdlib RIFF encoder),
    decoded back with the pure-stdlib codec (functions/wav_codec.py)
    inside Arrow-batched mapInPandas, emitting stream shape +
    duration/mean/peak amplitude. The oracle recomputes expected sums
    in closed form from the shared sample formula — a hash match proves
    the RIFF chunk-walk + PCM unpack bit-faithful. Both stages narrow,
    no shuffle. Ref: reference has no audio surface; north-star
    capability (SURVEY §2.11)."""
    d = load_table(spark, sf_dir, "documents")
    return mmfn.audio_stats(mmfn.synthetic_wav_media(d))


# ---------------------------------------------------------------------------
# Matryoshka (MRL) truncated-dimension ANN: coarse search in a prefix of
# the embedding space, exact rerank of the shortlist only. The serving
# pattern for matryoshka-trained embeddings — corpus-scale work touches
# 16 of 64 dims (4x less compute+bandwidth per scanned row), full-dim
# cosine runs on the 100-row shortlist alone.
# ---------------------------------------------------------------------------

_MRL_Q16 = """
    WITH q AS (
      SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0
    ), coarse AS (
      SELECT vec_id,
             round(
               list_sum(list_transform(range(1, 17),
                        i -> CAST(e.embedding[i] AS DOUBLE) * q.qv[i]))
               / (sqrt(list_sum(list_transform(range(1, 17),
                        i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))
                  * sqrt(list_sum(list_transform(range(1, 17), i -> q.qv[i] * q.qv[i])))),
               6) AS sim16
      FROM embeddings e, q
    )
"""


@register(
    "ann_matryoshka_topk",
    _MRL_Q16
    + """
    SELECT vec_id, sim16 AS cosine_sim
    FROM coarse
    ORDER BY sim16 DESC, vec_id
    LIMIT 20
    """,
)
def ann_matryoshka_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coarse top-k in the 16-dim PREFIX of the 64-dim embedding space
    (Kusupati et al., "Matryoshka Representation Learning", NeurIPS'22 —
    public). One narrow scan over sliced vectors + TakeOrderedAndProject;
    per-row cost is 1/4 of full-dim, no shuffle. The quality cost is
    measured by ann_matryoshka_recall; the funnel that recovers it is
    ann_matryoshka_rerank."""
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = [
        float(x)
        for x in emb.where(F.col("vec_id") == 0).select("embedding").first()[0]
    ][:16]
    trunc = emb.select("vec_id", F.slice("embedding", 1, 16).alias("embedding"))
    return simfn.brute_force_topk(trunc, qvec, k=20)


@register(
    "ann_matryoshka_rerank",
    _MRL_Q16
    + """
    , shortlist AS (
      SELECT vec_id FROM coarse ORDER BY sim16 DESC, vec_id LIMIT 100
    )
    SELECT e.vec_id,
           round(
             list_sum(list_transform(range(1, 65),
                      i -> CAST(e.embedding[i] AS DOUBLE) * q.qv[i]))
             / (sqrt(list_sum(list_transform(range(1, 65),
                      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))
                * sqrt(list_sum(list_transform(range(1, 65), i -> q.qv[i] * q.qv[i])))),
             6) AS cosine_sim
    FROM embeddings e
    JOIN shortlist s ON e.vec_id = s.vec_id, q
    ORDER BY cosine_sim DESC, e.vec_id
    LIMIT 20
    """,
)
def ann_matryoshka_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MRL serving funnel: 16-dim coarse scan -> 100-row shortlist ->
    full-dim exact rerank -> top-20. Corpus-scale work is the truncated
    scan only; the full 64-dim cosine runs on 100 rows via a broadcast
    semi-join back to the corpus. At 100 TB this is the difference
    between streaming 16 and 64 floats per scanned row — the shortlist
    rerank cost is constant.

    Honesty note: the fixture embeddings are RANDOM, the adversarial
    case for truncation (prefix dims carry only 16/64 of the signal;
    recall ~0.2, see ann_matryoshka_recall + test_recall.py). Trained
    MRL embeddings concentrate information in the prefix and sit near
    recall 1.0 — the entries verify the MACHINERY and measure honestly
    on the fixture."""
    emb = load_table(spark, sf_dir, "embeddings")
    qfull = [
        float(x)
        for x in emb.where(F.col("vec_id") == 0).select("embedding").first()[0]
    ]
    trunc = emb.select("vec_id", F.slice("embedding", 1, 16).alias("embedding"))
    shortlist = simfn.brute_force_topk(trunc, qfull[:16], k=100).select("vec_id")
    qcol = F.array(*[F.lit(float(x)) for x in qfull])
    return (
        emb.join(F.broadcast(shortlist), "vec_id")
        .select(
            "vec_id",
            F.round(simfn.cosine(F.col("embedding"), qcol), 6).alias("cosine_sim"),
        )
        .orderBy(F.desc("cosine_sim"), F.col("vec_id"))
        .limit(20)
    )


@register(
    "ann_matryoshka_recall",
    _MRL_Q16
    + """
    , coarse20 AS (
      SELECT vec_id FROM coarse ORDER BY sim16 DESC, vec_id LIMIT 20
    ),
    exact20 AS (
      SELECT vec_id FROM (
        SELECT vec_id,
               round(
                 list_sum(list_transform(range(1, 65),
                          i -> CAST(e.embedding[i] AS DOUBLE) * q.qv[i]))
                 / (sqrt(list_sum(list_transform(range(1, 65),
                          i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))
                    * sqrt(list_sum(list_transform(range(1, 65), i -> q.qv[i] * q.qv[i])))),
                 6) AS sim
        FROM embeddings e, q
        ORDER BY sim DESC, vec_id
        LIMIT 20
      )
    )
    SELECT CAST(20 AS INT) AS k,
           CAST(COUNT(*) AS DOUBLE) / 20 AS recall
    FROM exact20 x JOIN coarse20 c ON x.vec_id = c.vec_id
    """,
)
def ann_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@20 of the 16-dim coarse top-20 vs the exact 64-dim top-20 —
    the measured quality cost of 4x-truncation WITHOUT the rerank funnel
    (the rerank entry recovers exact@20 whenever the true top-20 sits
    inside the coarse top-100). Oracled as a full SQL replay of both
    rankings, so the recall VALUE must match."""
    emb = load_table(spark, sf_dir, "embeddings")
    qfull = [
        float(x)
        for x in emb.where(F.col("vec_id") == 0).select("embedding").first()[0]
    ]
    trunc = emb.select("vec_id", F.slice("embedding", 1, 16).alias("embedding"))
    return _ann_recall_frame(
        simfn.brute_force_topk(trunc, qfull[:16], k=20),
        simfn.brute_force_topk(emb, qfull, k=20),
        k=20,
    )


@register(
    "mm_frame_sample",
    """
    SELECT doc_id AS media_id,
           CAST(unnest(range(0,
                greatest(octet_length(encode(COALESCE(text,''))) - 1, 0) + 1,
                1024)) AS BIGINT) AS frame_offset
    FROM documents
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-frame-sampling plan shape over the binary media column:
    explode a stride of byte offsets per payload (stand-in for container
    pts indices — no video codec in this container, and the PLAN is what
    matters: narrow metadata-only explode, payload bytes untouched, so a
    100 TB scan reads the meta column and never the binary pages).
    Oracle is pure sequence arithmetic over the same lengths."""
    d = load_table(spark, sf_dir, "documents")
    media = mmfn.documents_as_media(d)
    return mmfn.frame_sample_plan(media, 1024)


@register(
    "docs_span_dup_rate",
    """
    WITH t AS (
      SELECT doc_id,
             string_split_regex(trim(lower(COALESCE(text,''))), '\\s+') AS toks
      FROM documents
      WHERE trim(lower(COALESCE(text,''))) <> ''
    ),
    w AS (
      SELECT doc_id, toks,
             CASE WHEN len(toks) >= 16 THEN (len(toks) - 16) // 8 + 1
                  ELSE 0 END AS nwin
      FROM t
    ),
    occ0 AS (
      -- per-row indices via the LIST form of generate_series (accepts
      -- column bounds; the table-function form is constants-only) — no
      -- fixed cap, any document length replays exactly
      SELECT doc_id, toks, unnest(generate_series(0, nwin - 1)) AS win_idx
      FROM w
    ),
    occ AS (
      SELECT doc_id, win_idx,
             md5(array_to_string(list_slice(toks, win_idx*8 + 1, win_idx*8 + 16), ' ')) AS whash
      FROM occ0
    ),
    own AS (
      SELECT whash, MIN(doc_id) AS owner, COUNT(DISTINCT doc_id) AS ndocs
      FROM occ GROUP BY whash
    )
    SELECT o.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_windows,
           CAST(SUM(CASE WHEN m.ndocs > 1 AND o.doc_id <> m.owner
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_windows,
           CAST(SUM(CASE WHEN m.ndocs > 1 AND o.doc_id <> m.owner
                         THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS dup_rate
    FROM occ o JOIN own m ON o.whash = m.whash
    GROUP BY o.doc_id
    """,
)
def docs_span_dup_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document SPAN-level duplication rate — the window-granular
    form of exact-substring dedup (Lee et al., "Deduplicating Training
    Data Makes Language Models Better", ACL'22 — public; their
    suffix-array substring match becomes 16-token windows at stride 8,
    the standard approximation when a distributed suffix array is not
    worth its build). Per doc: how many of its token windows also appear
    in an EARLIER doc (min-doc_id ownership, so exactly one copy of any
    span is never flagged).

    Shape: narrow window-hash explode (one md5 per window, codegen'd) →
    one groupBy on the 16-byte hash (inverted index, same class as
    winnowing) → one groupBy back per doc. No pairwise comparison
    anywhere; corpus-scale cost is ~n_tokens/8 hashed rows. The measure
    feeds span-level masking/removal downstream (the rate is the audit
    number a 100 TB curation run reports per source)."""
    toks = simfn.tokens("text")
    base = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", toks.alias("toks"))
        .where(F.size("toks") > 0)
    )
    n = F.size("toks")
    nwin = F.when(n >= 16, F.floor((n - F.lit(16)) / F.lit(8)).cast("int") + 1).otherwise(
        F.lit(0)
    )
    wins = F.when(
        nwin > 0,
        F.transform(
            F.sequence(F.lit(0), nwin - 1),
            lambda i: F.md5(F.concat_ws(" ", F.slice(F.col("toks"), i * 8 + 1, 16))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    occ = base.select("doc_id", F.posexplode(wins).alias("win_idx", "whash"))
    own = occ.groupBy("whash").agg(
        F.min("doc_id").alias("owner"),
        F.countDistinct("doc_id").alias("ndocs"),
    )
    dup = (F.col("ndocs") > 1) & (F.col("doc_id") != F.col("owner"))
    return (
        occ.join(own, "whash")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum(dup.cast("long")).alias("n_dup_windows"),
            (
                F.sum(dup.cast("long")).cast("double") / F.count(F.lit(1))
            ).alias("dup_rate"),
        )
    )


@register(
    "ann_matryoshka_mrr",
    """
    WITH q AS (
      SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id < 5
    ),
    coarse AS (
      SELECT q.query_id, e.vec_id,
             ROW_NUMBER() OVER (
               PARTITION BY q.query_id
               ORDER BY round(
                 list_sum(list_transform(range(1, 17),
                          i -> CAST(e.embedding[i] AS DOUBLE) * q.qv[i]))
                 / (sqrt(list_sum(list_transform(range(1, 17),
                          i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))
                    * sqrt(list_sum(list_transform(range(1, 17), i -> q.qv[i] * q.qv[i])))),
                 6) DESC, e.vec_id
             ) AS coarse_rank
      FROM embeddings e, q
      WHERE e.vec_id <> q.query_id
    ),
    target AS (
      SELECT query_id, vec_id AS target_id FROM (
        SELECT q.query_id, e.vec_id,
               ROW_NUMBER() OVER (
                 PARTITION BY q.query_id
                 ORDER BY round(
                   list_sum(list_transform(range(1, 65),
                            i -> CAST(e.embedding[i] AS DOUBLE) * q.qv[i]))
                   / (sqrt(list_sum(list_transform(range(1, 65),
                            i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))
                      * sqrt(list_sum(list_transform(range(1, 65), i -> q.qv[i] * q.qv[i])))),
                   6) DESC, e.vec_id
               ) AS rnk
        FROM embeddings e, q
        WHERE e.vec_id <> q.query_id
      ) WHERE rnk = 1
    )
    SELECT t.query_id, t.target_id,
           CAST(c.coarse_rank AS BIGINT) AS coarse_rank,
           1.0 / c.coarse_rank AS rr
    FROM target t
    JOIN coarse c ON c.query_id = t.query_id AND c.vec_id = t.target_id
    """,
)
def ann_matryoshka_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-eval metric for the truncated-dim ranking: per query in
    a 5-query batch, where does the TRUE (full-dim) nearest neighbor
    land in the 16-dim coarse ranking? rr = 1/rank; the batch mean is
    MRR — the standard serving-quality number alongside recall@k.
    Self-matches excluded on both sides. One corpus pass per ranking ×
    a broadcast query batch; per-query ranks are WindowGroupLimit-class
    windows over the batch partition (same shape as ann_batch_topk)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = F.broadcast(
        emb.where(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
        )
    )
    pool = emb.crossJoin(q).where(F.col("vec_id") != F.col("query_id"))
    sim16 = F.round(
        simfn.cosine(F.slice("embedding", 1, 16), F.slice("qv", 1, 16)), 6
    )
    sim64 = F.round(simfn.cosine(F.col("embedding"), F.col("qv")), 6)
    wc = Window.partitionBy("query_id").orderBy(sim16.desc(), F.col("vec_id"))
    we = Window.partitionBy("query_id").orderBy(sim64.desc(), F.col("vec_id"))
    ranked = pool.select(
        "query_id",
        "vec_id",
        F.row_number().over(wc).alias("coarse_rank"),
        F.row_number().over(we).alias("exact_rank"),
    )
    target = ranked.where(F.col("exact_rank") == 1).select(
        F.col("query_id").alias("t_query_id"), F.col("vec_id").alias("target_id")
    )
    return (
        ranked.join(
            target,
            (F.col("query_id") == F.col("t_query_id"))
            & (F.col("vec_id") == F.col("target_id")),
        )
        .select(
            "query_id",
            "target_id",
            F.col("coarse_rank").cast("long").alias("coarse_rank"),
            (F.lit(1.0) / F.col("coarse_rank")).alias("rr"),
        )
    )


@register(
    "docs_span_mask",
    """
    WITH t AS (
      SELECT doc_id,
             string_split_regex(trim(lower(COALESCE(text,''))), '\\s+') AS toks
      FROM documents
      WHERE trim(lower(COALESCE(text,''))) <> ''
    ),
    w AS (
      SELECT doc_id, toks,
             CASE WHEN len(toks) >= 16 THEN (len(toks) - 16) // 8 + 1
                  ELSE 0 END AS nwin
      FROM t
    ),
    occ0 AS (
      -- per-row indices via the LIST form of generate_series (accepts
      -- column bounds; the table-function form is constants-only) — no
      -- fixed cap, any document length replays exactly
      SELECT doc_id, toks, unnest(generate_series(0, nwin - 1)) AS win_idx
      FROM w
    ),
    occ AS (
      SELECT doc_id, win_idx,
             md5(array_to_string(list_slice(toks, win_idx*8 + 1, win_idx*8 + 16), ' ')) AS whash
      FROM occ0
    ),
    own AS (
      SELECT whash, MIN(doc_id) AS owner, COUNT(DISTINCT doc_id) AS ndocs
      FROM occ GROUP BY whash
    ),
    dupw AS (
      SELECT o.doc_id, o.win_idx
      FROM occ o JOIN own m ON o.whash = m.whash
      WHERE m.ndocs > 1 AND o.doc_id <> m.owner
    ),
    pos0 AS (
      SELECT doc_id, toks, unnest(generate_series(0, len(toks) - 1)) AS pos
      FROM w
    ),
    kept AS (
      SELECT p.doc_id, p.pos, p.toks[p.pos + 1] AS tok
      FROM pos0 p
      WHERE NOT EXISTS (
          SELECT 1 FROM dupw d
          WHERE d.doc_id = p.doc_id
            AND p.pos >= d.win_idx * 8 AND p.pos < d.win_idx * 8 + 16
        )
    )
    SELECT doc_id,
           COALESCE(string_agg(tok, ' ' ORDER BY pos), '') AS masked_text,
           -- COUNT(tok), not COUNT(*): a fully-masked doc survives the
           -- LEFT JOIN as one all-NULL row and must count 0 kept tokens
           CAST(COUNT(tok) AS BIGINT) AS n_kept_tokens
    FROM t LEFT JOIN kept USING (doc_id)
    GROUP BY doc_id
    """,
)
def docs_span_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The span-dedup ACTION (docs_span_dup_rate is the audit): remove
    every token covered by a cross-doc duplicated window (16-token
    windows, stride 8, min-doc_id ownership — the span's first
    appearance survives untouched) and reassemble the doc's remaining
    tokens in order.

    Shape: the window inverted index from the rate entry, then one
    flatten of dup windows to covered-position ranges, an anti-join of
    token positions against covered ranges (range predicate pushed into
    a single join condition — positions explode is ~n_tokens rows, the
    same scale as tokenization), and one ordered string_agg per doc.
    Everything hash-partitions on doc_id after the ownership groupBy;
    no pairwise work. Lee et al. ACL'22 is the public reference for
    dropping repeated spans rather than whole near-dup docs."""
    toks = simfn.tokens("text")
    base = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", toks.alias("toks"))
        .where(F.size("toks") > 0)
    )
    n = F.size("toks")
    nwin = F.when(n >= 16, F.floor((n - F.lit(16)) / F.lit(8)).cast("int") + 1).otherwise(
        F.lit(0)
    )
    wins = F.when(
        nwin > 0,
        F.transform(
            F.sequence(F.lit(0), nwin - 1),
            lambda i: F.md5(F.concat_ws(" ", F.slice(F.col("toks"), i * 8 + 1, 16))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    occ = base.select("doc_id", F.posexplode(wins).alias("win_idx", "whash"))
    own = occ.groupBy("whash").agg(
        F.min("doc_id").alias("owner"),
        F.countDistinct("doc_id").alias("ndocs"),
    )
    dupw = (
        occ.join(own, "whash")
        .where((F.col("ndocs") > 1) & (F.col("doc_id") != F.col("owner")))
        .select("doc_id", "win_idx")
    )
    # covered positions, deduped (windows overlap at stride < width)
    covered = dupw.select(
        "doc_id",
        F.explode(
            F.sequence(F.col("win_idx") * 8, F.col("win_idx") * 8 + 15)
        ).alias("pos"),
    ).distinct()
    positions = base.select(
        "doc_id", F.posexplode("toks").alias("pos", "tok")
    )
    kept = positions.join(covered, ["doc_id", "pos"], "left_anti")
    agg = kept.groupBy("doc_id").agg(
        F.concat_ws(" ", F.array_sort(F.collect_list(F.struct("pos", "tok")))["tok"]).alias(
            "masked_text"
        ),
        F.count(F.lit(1)).alias("n_kept_tokens"),
    )
    return (
        base.select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("masked_text", F.lit("")).alias("masked_text"),
            F.coalesce("n_kept_tokens", F.lit(0)).alias("n_kept_tokens"),
        )
    )


@register(
    "docs_corpus_report",
    _COMPONENT_EDGES_SQL
    + """
    , reach(id, comp) AS (
        SELECT u, u FROM (SELECT DISTINCT u FROM sym)
      UNION
        SELECT s.v, r.comp FROM reach r JOIN sym s ON s.u = r.id
    ),
    comp AS (SELECT id, MIN(comp) AS component FROM reach GROUP BY id),
    cstats AS (
      SELECT CAST(COUNT(DISTINCT component) AS BIGINT) AS nc,
             CAST(COUNT(*) AS BIGINT) AS nm
      FROM comp
    ),
    st AS (
      SELECT doc_id,
             string_split_regex(trim(lower(COALESCE(text,''))), '\\s+') AS toks
      FROM documents
      WHERE trim(lower(COALESCE(text,''))) <> ''
    ),
    sw AS (
      SELECT doc_id, toks,
             CASE WHEN len(toks) >= 16 THEN (len(toks) - 16) // 8 + 1
                  ELSE 0 END AS nwin
      FROM st
    ),
    soc0 AS (
      SELECT doc_id, toks, unnest(generate_series(0, nwin - 1)) AS win_idx
      FROM sw
    ),
    soc AS (
      SELECT doc_id,
             md5(array_to_string(list_slice(toks, win_idx*8 + 1, win_idx*8 + 16), ' ')) AS whash
      FROM soc0
    ),
    sown AS (
      SELECT whash, MIN(doc_id) AS owner, COUNT(DISTINCT doc_id) AS ndocs
      FROM soc GROUP BY whash
    ),
    sstats AS (
      SELECT CAST(COALESCE(SUM(CASE WHEN m.ndocs > 1 AND o.doc_id <> m.owner
                                    THEN 1 ELSE 0 END), 0) AS BIGINT) AS ndw
      FROM soc o JOIN sown m ON o.whash = m.whash
    ),
    tok AS (SELECT unnest(toks) AS t FROM st),
    tstats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS tt,
             CAST(COUNT(DISTINCT t) AS BIGINT) AS dt
      FROM tok
    ),
    dstats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS nd,
             CAST(COUNT(*) - COUNT(DISTINCT md5(COALESCE(text,''))) AS BIGINT) AS ned
      FROM documents
    )
    SELECT nd AS n_docs,
           ned AS n_exact_dup_docs,
           nc AS n_neardup_clusters,
           nm AS n_docs_in_clusters,
           ndw AS n_span_dup_windows,
           tt AS total_tokens,
           dt AS distinct_tokens
    FROM dstats, cstats, sstats, tstats
    """,
)
def docs_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one-row corpus report card a curation run prints before
    training: doc count, exact-dup docs, near-dup clusters + membership,
    cross-doc duplicated span windows, total and distinct tokens. Every
    number composes independently-oracled machinery (exact-collapse
    components, span window index, tokenization) and the COMPOSITION is
    hash-checked — one DuckDB replay recomputes all seven.

    Shape: five 1-row aggregates cross-joined (each a broadcast scalar —
    bounded state by construction). The expensive members (components,
    span index, distinct tokens) are each single-shuffle plans; nothing
    here is worse than its standalone entry."""
    d = load_table(spark, sf_dir, "documents")
    dstats = d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (
            F.count(F.lit(1))
            - F.countDistinct(F.md5(F.coalesce(F.col("text"), F.lit(""))))
        ).alias("n_exact_dup_docs"),
    )
    comp = _components_cached(spark, sf_dir)
    cstats = comp.agg(
        F.countDistinct("component").alias("n_neardup_clusters"),
        F.count(F.lit(1)).alias("n_docs_in_clusters"),
    )
    toks = simfn.tokens("text")
    base = d.select("doc_id", toks.alias("toks")).where(F.size("toks") > 0)
    n = F.size("toks")
    nwin = F.when(n >= 16, F.floor((n - F.lit(16)) / F.lit(8)).cast("int") + 1).otherwise(
        F.lit(0)
    )
    wins = F.when(
        nwin > 0,
        F.transform(
            F.sequence(F.lit(0), nwin - 1),
            lambda i: F.md5(F.concat_ws(" ", F.slice(F.col("toks"), i * 8 + 1, 16))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    occ = base.select("doc_id", F.explode(wins).alias("whash"))
    own = occ.groupBy("whash").agg(
        F.min("doc_id").alias("owner"), F.countDistinct("doc_id").alias("ndocs")
    )
    sstats = (
        occ.join(own, "whash")
        .agg(
            F.coalesce(
                F.sum(
                    ((F.col("ndocs") > 1) & (F.col("doc_id") != F.col("owner"))).cast(
                        "long"
                    )
                ),
                F.lit(0),
            ).alias("n_span_dup_windows")
        )
    )
    tok = base.select(F.explode("toks").alias("t"))
    tstats = tok.agg(
        F.count(F.lit(1)).alias("total_tokens"),
        F.countDistinct("t").alias("distinct_tokens"),
    )
    # four 1-row frames x broadcast cross join = bounded driver state
    return (
        dstats.crossJoin(F.broadcast(cstats))
        .crossJoin(F.broadcast(sstats))
        .crossJoin(F.broadcast(tstats))
        .select(
            "n_docs",
            "n_exact_dup_docs",
            "n_neardup_clusters",
            "n_docs_in_clusters",
            "n_span_dup_windows",
            "total_tokens",
            "distinct_tokens",
        )
    )


@register(
    "stream_corpus_ingest",
    """
    SELECT doc_id, text, lang, source, n_chars FROM documents
    """,
)
def stream_corpus_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming JSONL corpus ingest (streaming/corpus_ingest.py): the
    documents table is written out as JSONL shards PLUS a poison shard
    of garbage/`null` lines, then drained through Structured Streaming
    (file source -> schema-explicit from_json -> clean/quarantine split
    -> availableNow). The entry returns the CLEAN rail; the oracle is
    the batch documents table itself, so any quarantine leak (a corrupt
    line surviving as an all-null row, or a clean row misrouted)
    hash-mismatches. The poison shard's 3 lines are asserted into the
    quarantine table in tests/test_streaming.py."""
    import os
    import shutil
    import tempfile

    from pyspark.sql import types as T

    from extract_permits_spark.sinks.corpus_io import write_jsonl_corpus
    from extract_permits_spark.streaming.corpus_ingest import (
        run_ingest_available_now,
    )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    work = tempfile.mkdtemp(prefix="corpus_stream_")
    src = os.path.join(work, "in")
    write_jsonl_corpus(d.repartition(4), src, compression=None)
    with open(os.path.join(src, "poison.json"), "w") as f:
        f.write("this is not json\nnull\n{\"doc_id\": \"not a long\"\n")
    tag = abs(hash(sf_dir)) % 10**8
    clean_t, bad_t = f"corpus_clean_{tag}", f"corpus_bad_{tag}"
    qc, qb = run_ingest_available_now(
        spark, src, os.path.join(work, "ckpt"), schema, clean_t, bad_t
    )
    qc.awaitTermination(300)
    qb.awaitTermination(300)
    shutil.rmtree(work, ignore_errors=True)
    return spark.sql(
        f"SELECT doc_id, text, lang, source, n_chars FROM {clean_t}"
    )
