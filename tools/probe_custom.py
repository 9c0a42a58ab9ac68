"""Quiet-host probe for the bench's NON-registry runnables, bench.py
methodology verbatim (noop force / real partitioned write, 1 cold +
N settled steady samples, median+min reported). Complements
probe_regressions.py, which covers registry entries only.

    python tools/probe_custom.py [--steady N] name ...

names: permit_pipeline | dedup_simhash_production |
       dedup_minhash_md5_sf1eq | any registry entry
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = list(sys.argv[1:])
    steady = 3
    if "--steady" in args:
        i = args.index("--steady")
        steady = int(args[i + 1])
        del args[i : i + 2]
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from extract_permits_spark.plans import analytics
    from extract_permits_spark.session import (
        free_scratch_checkpoints,
        get_spark,
    )
    from extract_permits_spark.sources.readers import load_table

    spark = get_spark("probe-custom")
    qs = analytics.queries()

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    def settle():
        free_scratch_checkpoints()
        spark.catalog.clearCache()
        try:
            spark._jvm.System.gc()
        except Exception:
            pass

    force(qs["s3_scalar_max"](spark, sf_dir))

    cleanups = []

    def runnable(name: str):
        if name == "permit_pipeline":
            from extract_permits_spark.plans.permits import (
                permits_from_tpch,
                write_pipeline_partitioned,
            )

            def run():
                raw, universe = permits_from_tpch(spark, sf_dir)
                out = tempfile.mkdtemp(prefix="probe_pipeline_")
                try:
                    write_pipeline_partitioned(raw, universe, out)
                finally:
                    shutil.rmtree(out, ignore_errors=True)

            return run
        if name == "dedup_simhash_production":
            from extract_permits_spark.functions import similarity as simfn

            return lambda: force(
                simfn.simhash_pairs(
                    load_table(spark, sf_dir, "documents"), max_hamming=7
                )
            )
        if name == "dedup_minhash_md5_sf1eq":
            from extract_permits_spark.functions.similarity import (
                minhash_md5_pairs,
            )

            docs = load_table(spark, sf_dir, "documents")
            amp_lazy = docs
            for c in range(1, 10):
                amp_lazy = amp_lazy.unionByName(
                    docs.withColumn(
                        "doc_id", F.col("doc_id") + F.lit(c * 10**7)
                    )
                )
            docs_dir = tempfile.mkdtemp(prefix="probe_docs_sf1eq_")
            cleanups.append(docs_dir)
            amp_lazy.write.parquet(
                os.path.join(docs_dir, "documents.parquet")
            )
            amp = spark.read.parquet(
                os.path.join(docs_dir, "documents.parquet")
            )
            return lambda: force(minhash_md5_pairs(amp))
        return lambda: force(qs[name](spark, sf_dir))

    def loadavg() -> str:
        try:
            with open("/proc/loadavg") as f:
                return f.read().split()[0]
        except OSError:
            return "?"

    try:
        for name in names:
            run = runnable(name)
            settle()
            l0 = loadavg()
            t0 = time.time()
            run()
            cold = time.time() - t0
            samples = []
            for _ in range(steady):
                settle()
                t1 = time.time()
                run()
                samples.append(time.time() - t1)
            free_scratch_checkpoints()
            med = sorted(samples)[len(samples) // 2]
            print(
                f"{name}: cold={cold:.2f} median={med:.2f} "
                f"min={min(samples):.2f} samples="
                + ",".join(f"{s:.2f}" for s in samples)
                + f" load={l0}->{loadavg()}",
                flush=True,
            )
    finally:
        for d in cleanups:
            shutil.rmtree(d, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
