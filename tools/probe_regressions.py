"""Quiet-host probe for flagged bench rows (VERDICT r14 #2/#4/#5).

Replicates bench.py's per-row methodology (noop-write force, 1 cold +
N steady samples) for a handful of registry entries, optionally with
the scale rows' _settle() (clearCache + System.gc + scratch-checkpoint
free) before every steady sample — the knob the r14 verdict's three
anomalies (ev_funnel 0.58->4.00 s, text_tfidf headline/scale inversion,
mm_audio_fingerprint +40%) all share: headline rows measure in
whatever heap regime the predecessor rows left behind, scale rows
measure settled.

Usage:
    python tools/probe_regressions.py [--settle] [--steady N] name ...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = [a for a in sys.argv[1:]]
    settle_on = "--settle" in args
    if settle_on:
        args.remove("--settle")
    steady = 3
    if "--steady" in args:
        i = args.index("--steady")
        steady = int(args[i + 1])
        del args[i : i + 2]
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from extract_permits_spark.plans import analytics
    from extract_permits_spark.session import (
        free_scratch_checkpoints,
        get_spark,
    )

    spark = get_spark("probe-regressions")
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

    # warm the JVM/IO path once, like bench.py
    force(qs["s3_scalar_max"](spark, sf_dir))

    for name in names:
        run = lambda: force(qs[name](spark, sf_dir))  # noqa: E731
        t0 = time.time()
        run()
        cold = time.time() - t0
        samples = []
        for _ in range(steady):
            if settle_on:
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
            + (" (settled)" if settle_on else ""),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
