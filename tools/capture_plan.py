"""Capture ``explain("formatted")`` for registry entries (plus the two
non-registry bench runnables) into per-query text files — the committed
evidence for plan-shape claims in OPTIMIZATION_r*.md.

    python tools/capture_plan.py OUTDIR SUFFIX name ...

writes OUTDIR/<name><SUFFIX>.txt for each name (SUFFIX like "_before" /
"_after"). Special names:

- ``permit_pipeline``: the validated frame the partitioned write sinks
  (plans/permits.py: write_pipeline_partitioned's input).
- ``dedup_simhash_production``: the xxhash64 ``simhash_pairs`` runnable
  the bench times under the ``dedup_simhash`` row.

$SPARK_GRAFT_SF_DIR picks the fixture (default /root/testdata/sf0.1),
matching the bench's plan shapes.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)

    from extract_permits_spark.plans import analytics
    from extract_permits_spark.session import get_spark

    spark = get_spark("capture-plan")
    qs = analytics.queries()

    def frame_for(name: str):
        if name == "permit_pipeline":
            from extract_permits_spark.plans.permits import (
                permits_from_tpch,
                validated_permits,
            )

            raw, universe = permits_from_tpch(spark, sf_dir)
            return validated_permits(raw, universe)
        if name == "dedup_simhash_production":
            from extract_permits_spark.functions import similarity as simfn
            from extract_permits_spark.sources.readers import load_table

            return simfn.simhash_pairs(
                load_table(spark, sf_dir, "documents"), max_hamming=7
            )
        return qs[name](spark, sf_dir)

    for name in names:
        df = frame_for(name)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path} ({len(buf.getvalue().splitlines())} lines)", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
