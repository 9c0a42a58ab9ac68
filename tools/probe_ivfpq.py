"""IVFPQ serving probe: the index-amortization story, measured.

The `emb_ivfpq_topk` registry entry replays the full IVFADC build per
query (fits cached, but assignment+encode recomputed) because the
oracle contract needs a self-contained query. Production serves ANN the
other way: `write_ivfpq_index` persists the codes-only table ONCE,
partitioned by cluster_id, and every query is a partition-pruned ADC
scan. This probe measures that split at an amplified scale:

  1. amplify the embeddings fixture `amp`x (id-shifted, deterministically
     perturbed vectors so clusters stay balanced), materialize to parquet
     OUTSIDE every timed region;
  2. time the ONE-OFF index build (write_ivfpq_index);
  3. time `n_queries` indexed queries (ivfpq_topk_from_index, steady);
  4. time the same queries as brute-force exact cosine scans over the
     raw vectors (the no-index baseline);
  5. report bytes: raw corpus parquet vs codes-only index.

Prints one JSON line. Run on a QUIET host; nothing else concurrent.

Usage: python tools/probe_ivfpq.py [amp] [n_queries] [sf_dir]
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ID_STRIDE = 10**7


def _dir_bytes(path: str) -> int:
    return sum(
        os.path.getsize(f)
        for f in glob.glob(os.path.join(path, "**", "*"), recursive=True)
        if os.path.isfile(f)
    )


def main() -> None:
    amp = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from extract_permits_spark.functions import pq as pqfn
    from extract_permits_spark.functions import similarity as simfn
    from extract_permits_spark.plans.analytics import (
        _ivf_centroids_cached,
        _pq_book_cached,
    )
    from extract_permits_spark.session import get_spark
    from extract_permits_spark.sources.readers import load_table

    spark = get_spark()
    work = tempfile.mkdtemp(prefix="ivfpq_probe_")
    out: dict = {"amp": amp, "n_queries": n_queries, "sf_dir": sf_dir}
    try:
        emb = load_table(spark, sf_dir, "embeddings")
        # ---- materialize the amplified corpus (untimed) ----
        # One explode, not an amp-way union (a 1000-branch union plan
        # costs minutes of analysis). Perturb each copy on one coordinate
        # by a tiny per-copy epsilon: vectors stay distinct (no degenerate
        # ties) without moving en masse across clusters.
        big = (
            emb.select(
                "vec_id",
                "embedding",
                "label",
                F.explode(F.sequence(F.lit(0), F.lit(amp - 1))).alias("copy"),
            )
            .select(
                (
                    F.col("vec_id")
                    + F.col("copy").cast("long") * F.lit(ID_STRIDE)
                ).alias("vec_id"),
                F.transform(
                    "embedding",
                    lambda x, j: (
                        x
                        + F.when(
                            j == F.col("copy") % 64,
                            F.lit(1e-4) * (F.col("copy") + 1),
                        ).otherwise(F.lit(0.0))
                    ).cast("float"),
                ).alias("embedding"),
                "label",
            )
            .repartition(32)
        )
        corpus_path = os.path.join(work, "corpus")
        big.write.mode("overwrite").parquet(corpus_path)
        corpus = spark.read.parquet(corpus_path)
        n_rows = corpus.count()
        out["corpus_rows"] = n_rows
        out["corpus_bytes"] = _dir_bytes(corpus_path)

        # fits from the base fixture (cached artifacts — the bounded
        # driver state every IVFADC caller shares)
        book = _pq_book_cached(spark, emb, sf_dir)
        cents = _ivf_centroids_cached(spark, emb, sf_dir)
        qvecs = [
            [float(x) for x in r["embedding"]]
            for r in emb.where(F.col("vec_id") < n_queries)
            .orderBy("vec_id")
            .select("embedding")
            .collect()
        ]

        # ---- one-off index build (timed) ----
        idx_path = os.path.join(work, "ivfpq_index")
        t0 = time.perf_counter()
        pqfn.write_ivfpq_index(corpus, book, cents, idx_path)
        out["index_build_sec"] = round(time.perf_counter() - t0, 3)
        out["index_bytes"] = _dir_bytes(idx_path)

        # ---- indexed queries (1 warm + timed steady sweep) ----
        pqfn.ivfpq_topk_from_index(
            spark, idx_path, book, cents, qvecs[0], num_probes=6, topk=20
        ).collect()
        t0 = time.perf_counter()
        for q in qvecs:
            pqfn.ivfpq_topk_from_index(
                spark, idx_path, book, cents, q, num_probes=6, topk=20
            ).collect()
        out["indexed_query_sec_avg"] = round(
            (time.perf_counter() - t0) / n_queries, 4
        )

        # ---- brute-force baseline (1 warm + timed steady sweep) ----
        simfn.brute_force_topk(corpus, qvecs[0], k=20).collect()
        t0 = time.perf_counter()
        for q in qvecs:
            simfn.brute_force_topk(corpus, q, k=20).collect()
        out["brute_query_sec_avg"] = round(
            (time.perf_counter() - t0) / n_queries, 4
        )

        out["speedup_steady"] = round(
            out["brute_query_sec_avg"] / out["indexed_query_sec_avg"], 2
        )
        out["index_vs_corpus_bytes"] = round(
            out["index_bytes"] / out["corpus_bytes"], 4
        )
        # queries to amortize the build vs always-brute-force
        saved = out["brute_query_sec_avg"] - out["indexed_query_sec_avg"]
        out["breakeven_queries"] = (
            round(out["index_build_sec"] / saved, 1) if saved > 0 else None
        )
        print(json.dumps(out))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
