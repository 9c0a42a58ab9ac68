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
        _QUERIES[name] = fn
        if sql is not None:
            _ORACLES[name] = sql
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)


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
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id", matched_keywords("text", _DOC_KEYWORDS).alias("matched_keywords")
    )


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
