"""llm_corpus_curation_sf1eq stability probe (r7 VERDICT #2).

Replicates bench.py's scale row (10x-amplified documents MATERIALIZED to
parquet outside the timed region, memo caches cleared, _settle before
each timed run) and DuckDB's mirror (CREATE TABLE of the same 10x
corpus, full-oracle replay), N settled runs per engine in ONE sitting,
so the per-run ratios are same-session paired. Gate from the r7 verdict:
three consecutive settled pairs all <= 1.6x.

Usage: python tools/probe_curation.py [n_runs] [sf_dir]
Run on a QUIET host; nothing else concurrent.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from extract_permits_spark.plans import analytics
    from extract_permits_spark.session import get_spark

    spark = get_spark("curation-probe")
    qs = analytics.queries()

    def settle() -> None:
        spark.catalog.clearCache()
        spark._jvm.System.gc()
        time.sleep(1.0)

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    amp = None
    for c in range(10):
        shifted = d.withColumn(
            "doc_id", F.col("doc_id") + F.lit(c * 10**7)
        )
        amp = shifted if amp is None else amp.unionAll(shifted)

    cur_dir = tempfile.mkdtemp(prefix="probe_curation_")
    spark_times: list[float] = []
    duck_times: list[float] = []
    try:
        amp.write.parquet(os.path.join(cur_dir, "documents.parquet"))

        # one untimed warmup at the BASE sf (mirrors the bench regime,
        # where the headline set has long since JIT-warmed every plan
        # shape before the scale row runs)
        from extract_permits_spark.plans import _registry as _reg

        _reg.clear_frame_caches()
        force(qs["llm_corpus_curation"](spark, sf_dir))

        for _ in range(n_runs):
            _reg.clear_frame_caches()
            settle()
            t0 = time.time()
            force(qs["llm_corpus_curation"](spark, cur_dir))
            spark_times.append(round(time.time() - t0, 2))

        import duckdb

        con = duckdb.connect()
        con.execute(
            "CREATE TABLE documents AS SELECT * FROM read_parquet("
            f"'{os.path.join(cur_dir, 'documents.parquet')}/*.parquet')"
        )
        sql = analytics.oracle_sql()["llm_corpus_curation"]
        for _ in range(n_runs):
            t0 = time.time()
            con.execute(sql).fetchall()
            duck_times.append(round(time.time() - t0, 2))
    finally:
        shutil.rmtree(cur_dir, ignore_errors=True)

    # same-run pairing (run i vs run i) — zipping against sorted duck
    # times flattered the spread (r9 review finding)
    ratios = [round(s / d, 2) for s, d in zip(spark_times, duck_times)]
    print(
        json.dumps(
            {
                "spark": spark_times,
                "duckdb": duck_times,
                "paired_ratios": ratios,
                "worst_ratio_vs_duck_median": round(
                    max(spark_times) / sorted(duck_times)[len(duck_times) // 2], 2
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
