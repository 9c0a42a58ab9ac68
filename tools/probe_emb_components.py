"""Flood-scale probe for emb_neardup_components (r12): the 10x-amplified
embeddings table — every vector plus 9 EXACT twins, the boilerplate-flood
shape — timed through the collapsed components path on Spark and through
the identical collapsed construction on DuckDB (pairwise bit_count over
the 1/10th-sized representative set + star edges + recursive min-label
closure). The UNCOLLAPSED pair-list path at this shape would pay 45
intra-flood pairs per twin group before the closure even starts, and its
bucket cap would silently drop any group above the cap; the collapsed
path's LSH join runs on distinct vectors only.

Usage: python tools/probe_emb_components.py [sf_dir]   # default sf0.1
Prints one JSON line {"spark": [...], "duckdb": [...], "rows": N}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    import tempfile
    import shutil

    import duckdb

    from extract_permits_spark.session import get_spark
    from extract_permits_spark.operators.graph import connected_components
    from extract_permits_spark.functions import similarity as simfn
    from extract_permits_spark.sources.readers import load_table
    from pyspark.sql import functions as F

    spark = get_spark("probe-emb-components")
    emb0 = load_table(spark, sf_dir, "embeddings")
    amp = emb0
    for c in range(1, copies):
        amp = amp.unionByName(
            emb0.withColumn("vec_id", F.col("vec_id") + F.lit(c * 10**7))
        )
    tmp = tempfile.mkdtemp(prefix="probe_embcomp_")
    path = os.path.join(tmp, "embeddings.parquet")
    amp.write.parquet(path)

    def run_spark() -> int:
        # mirrors _registry._emb_components_cached (groupBy collapse +
        # AQE-splittable star join — r12: map-side combine, no hot
        # window partition per flood)
        e = spark.read.parquet(path)
        reps_min = e.groupBy("embedding").agg(F.min("vec_id").alias("_rep"))
        reps = reps_min.select(F.col("_rep").alias("vec_id"), "embedding")
        rep_pairs = simfn.lsh_neardup_pairs(reps, min_cosine=0.35).select(
            "id_a", "id_b"
        )
        stars = (
            e.join(reps_min, "embedding")
            .where(F.col("vec_id") != F.col("_rep"))
            .select(F.col("_rep").alias("id_a"), F.col("vec_id").alias("id_b"))
        )
        return connected_components(rep_pairs.unionByName(stars)).count()

    try:
        spark_times, rows = [], 0
        rows = run_spark()  # untimed warmup (JIT on the composed plan)
        for _ in range(2):
            t0 = time.time()
            rows = run_spark()
            spark_times.append(round(time.time() - t0, 2))

        # the UNCOLLAPSED pair path at the same input, both cap settings:
        # with the default cap the flood buckets (copies x the base bucket
        # population) are silently DROPPED above 1000 — fewer component
        # members, the wrong dedup answer; with the cap lifted it pays the
        # quadratic intra-flood pair explosion the collapse avoids.
        def run_uncollapsed(cap: int) -> tuple[int, float]:
            e = spark.read.parquet(path)
            t0 = time.time()
            pairs = simfn.lsh_neardup_pairs(
                e, min_cosine=0.35, max_bucket_size=cap
            ).select("id_a", "id_b")
            n = connected_components(pairs).count()
            return n, round(time.time() - t0, 2)

        if os.environ.get("PROBE_SKIP_UNCOLLAPSED") == "1":
            unc_capped = unc_lifted = (None, None)
        else:
            unc_capped = run_uncollapsed(1000)
            unc_lifted = run_uncollapsed(10**9)

        from extract_permits_spark.plans.ann_sql import (
            lsh_neardup_components_sql,
        )

        con = duckdb.connect()
        con.execute(
            "CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{path}/*.parquet')"
        )
        sql = lsh_neardup_components_sql()
        duck_times = []
        for _ in range(2):
            t0 = time.time()
            n = len(con.execute(sql).fetchall())
            duck_times.append(round(time.time() - t0, 2))
        assert n == rows, (n, rows)
        print(
            json.dumps(
                {
                    "copies": copies,
                    "spark_collapsed": spark_times,
                    "duckdb_collapsed": duck_times,
                    "rows": rows,
                    "uncollapsed_capped_rows_time": unc_capped,
                    "uncollapsed_lifted_rows_time": unc_lifted,
                }
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
