"""One-off scan: which registry entries plan a partition-less logical
Window, and over what child subtree? Feeds the r11 exemption list."""
from __future__ import annotations

import sys, time

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession


def iter_nodes(plan):
    yield plan
    for i in range(plan.children().size()):
        yield from iter_nodes(plan.children().apply(i))


def main():
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    from extract_permits_spark.plans import analytics

    qs = analytics.queries()
    t0 = time.time()
    for name, fn in qs.items():
        try:
            df = fn(spark, "/root/testdata/sf0.001")
            plan = df._jdf.queryExecution().optimizedPlan()
        except Exception as e:
            print(f"{name}: BUILD-ERR {type(e).__name__}: {e}", flush=True)
            continue
        for node in iter_nodes(plan):
            if node.getClass().getSimpleName() == "Window":
                if node.partitionSpec().size() == 0:
                    child = node.children().apply(0)
                    print(
                        f"{name}: PARTITIONLESS child={child.getClass().getSimpleName()}",
                        flush=True,
                    )
    print(f"scan done in {time.time()-t0:.1f}s over {len(qs)} entries")


if __name__ == "__main__":
    main()
