"""SQL front-end parity: the registry's oracle SQL is written in
portable ANSI, so a migrating SQL user can run the same text on Spark
SQL directly — for each dialect-portable entry, `spark.sql(oracle_sql)`
must produce exactly the rows the DataFrame-API implementation does.

(The few DuckDB-only spellings — strftime, list_transform replays,
quantile_cont — are excluded; they exist to mirror engine-specific
operators, not query semantics.)"""

from __future__ import annotations

import math

from extract_permits_spark.plans import analytics
from extract_permits_spark.sources.readers import load_table

SF_DIR = "/root/testdata/sf0.001"

PORTABLE = [
    "q1_pricing_summary",
    "q4_priority_exists",
    "q7_nation_trade",
    "q8_market_share",
    "q9_profit_by_nation",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q17_small_quantity",
    "q19_disjunctive",
    "q21_waiting_supplier",
    "q22_idle_customers",
    "q2_min_balance_supplier",
    "u4_except_all",
    "s2_dim_join_filter",
]


def _norm(rows, cols):
    out = []
    for r in rows:
        vals = []
        for c in sorted(cols):
            v = r[c]
            if isinstance(v, float):
                vals.append("nan" if math.isnan(v) else f"{v:.6f}")
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


def test_oracle_sql_runs_verbatim_on_spark_sql(spark):
    for t in ["region", "nation", "customer", "supplier", "part", "orders", "lineitem"]:
        load_table(spark, SF_DIR, t).createOrReplaceTempView(t)
    qs = analytics.queries()
    oracles = analytics.oracle_sql()
    for name in PORTABLE:
        api_df = qs[name](spark, SF_DIR)
        sql_df = spark.sql(oracles[name])
        assert sorted(api_df.columns) == sorted(sql_df.columns), name
        got_api = _norm(api_df.collect(), api_df.columns)
        got_sql = _norm(sql_df.collect(), sql_df.columns)
        assert got_api == got_sql, f"{name}: SQL text and DataFrame API diverge"
