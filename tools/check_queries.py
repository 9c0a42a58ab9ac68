"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, column names,
and an order-insensitive value representation. Usage:

    python tools/check_queries.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonical value representation: everything to strings, floats rounded
    out = pd.DataFrame(index=df.index)
    for c in df.columns:
        s = df[c]
        if s.dtype.kind == "f":
            out[c] = s.round(6).map(lambda v: f"{v:.6f}" if pd.notna(v) else "<NA>")
        elif s.dtype.kind == "b":
            out[c] = s.map(lambda v: str(bool(v)) if pd.notna(v) else "<NA>")
        else:
            out[c] = s.map(lambda v: "<NA>" if pd.isna(v) else str(v))
    return out.sort_values(list(out.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as mod
    from extract_permits_spark.session import get_spark

    spark = get_spark("check-queries")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = mod.queries(), mod.oracle_sql()
    failures = []
    executed = 0
    from extract_permits_spark.session import free_scratch_checkpoints

    for name, fn in qs.items():
        if only and name not in only:
            continue
        # previous entry's evaluations are complete — reclaim its scratch
        # localCheckpoint blocks so the 216-entry session doesn't
        # accumulate them (r13 GC finding; clearCache never frees these)
        free_scratch_checkpoints()
        executed += 1
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only check, {len(sdf)} rows "
                  f"({time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue
        # schema check mirrors the driver: names AND types must align
        type_map = {"bigint": "BIGINT", "int": "INTEGER", "double": "DOUBLE",
                    "string": "VARCHAR", "boolean": "BOOLEAN", "date": "DATE"}
        stypes = dict(fn(spark, sf_dir).dtypes)
        otypes = {
            c: str(t)
            for c, t in zip(
                con.execute(f"DESCRIBE SELECT * FROM ({oracles[name]}) LIMIT 0")
                .df()["column_name"],
                con.execute(f"DESCRIBE SELECT * FROM ({oracles[name]}) LIMIT 0")
                .df()["column_type"],
            )
        }
        dtype_mismatch = [
            f"{c}: spark={stypes[c]} duckdb={otypes.get(c)}"
            for c in stypes
            if type_map.get(stypes[c], stypes[c]).upper()
            != str(otypes.get(c, "MISSING")).upper()
        ]
        a, b = normalize(sdf), normalize(odf)
        if dtype_mismatch:
            print(f"FAIL {name}: dtype mismatch {dtype_mismatch}")
            failures.append(name)
        elif list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns spark={list(a.columns)} oracle={list(b.columns)}")
            failures.append(name)
        elif len(a) != len(b):
            print(f"FAIL {name}: rows spark={len(a)} oracle={len(b)}")
            failures.append(name)
        elif not a.equals(b):
            diff = (a != b).any(axis=1)
            print(f"FAIL {name}: {int(diff.sum())}/{len(a)} rows differ; first:")
            idx = diff.idxmax()
            print("  spark :", a.loc[idx].to_dict())
            print("  oracle:", b.loc[idx].to_dict())
            failures.append(name)
        else:
            print(f"ok   {name}: {len(a)} rows match ({time.time()-t0:.1f}s)")
    skipped = len(qs) - executed
    note = f" ({skipped} skipped by name filter)" if skipped else ""
    print(f"\n{executed - len(failures)}/{executed} pass{note}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
