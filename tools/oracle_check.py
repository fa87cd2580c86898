#!/usr/bin/env python
"""Local mirror of the driver's duckdb-oracle correctness gate (t2).

For every query in cassabon_spark.queries.REGISTRY:
  * run the Spark implementation at --sf
  * run the oracle SQL on DuckDB with the same parquet files as views
  * compare: row count, column names, and values (rows sorted, columns
    sorted by name, floats compared exactly AND with tolerance so we can
    tell "hash-breaking" from "cosmetic ulp" mismatches)

Usage: python tools/oracle_check.py [--sf /root/testdata/sf0.001] [--only name[,name]]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def duck_con(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return v


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


def cells_close(a, b, tol=1e-6):
    if a is None or b is None:
        return a is b
    if isinstance(a, float) and isinstance(b, float):
        return math.isclose(a, b, rel_tol=tol, abs_tol=tol)
    return a == b


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--only", default=None)
    ap.add_argument("--skip-spark", action="store_true", help="oracle SQL syntax check only")
    args = ap.parse_args()

    from cassabon_spark.queries import load_registry

    registry = load_registry()
    names = list(registry)
    if args.only:
        names = [n for n in names if n in set(args.only.split(","))]

    spark = None
    if not args.skip_spark:
        from cassabon_spark import get_spark

        spark = get_spark(shuffle_partitions=8)
        spark.sparkContext.setLogLevel("ERROR")

    con = duck_con(args.sf)
    n_pass = n_fail = n_rows_only = 0
    failures = []
    for name in names:
        qd = registry[name]
        t0 = time.time()
        try:
            if qd.sql is None:
                if spark is not None:
                    cnt = qd.fn(spark, args.sf).count()
                    print(f"  ~ {name}: rows-only ({cnt} rows) [{time.time()-t0:.1f}s]")
                n_rows_only += 1
                continue
            oracle = con.execute(qd.sql).fetchall()
            ocols = [d[0] for d in con.description]
            if spark is None:
                print(f"  ? {name}: oracle ok ({len(oracle)} rows)")
                continue
            sdf = qd.fn(spark, args.sf)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
            oc, orows = norm_rows(ocols, oracle)
            sc, srows_n = norm_rows(scols, srows)
            if oc != sc:
                raise AssertionError(f"columns differ: spark={sc} oracle={oc}")
            if len(orows) != len(srows_n):
                raise AssertionError(f"row count: spark={len(srows_n)} oracle={len(orows)}")
            exact = srows_n == orows
            if exact:
                print(f"  ✓ {name}: {len(orows)} rows exact [{time.time()-t0:.1f}s]")
                n_pass += 1
            else:
                # find first diff
                n_close = 0
                first_diff = None
                for i, (a, b) in enumerate(zip(srows_n, orows)):
                    if a != b:
                        if all(cells_close(x, y) for x, y in zip(a, b)):
                            n_close += 1
                            if first_diff is None:
                                first_diff = (i, a, b, "CLOSE")
                        else:
                            first_diff = (i, a, b, "FAR")
                            break
                raise AssertionError(
                    f"value mismatch ({n_close} close-only diffs); first: {first_diff}"
                )
        except Exception as e:
            print(f"  ✗ {name}: {str(e)[:300]}")
            n_fail += 1
            failures.append(name)
    print(
        f"\n{n_pass} exact, {n_rows_only} rows-only, {n_fail} FAILED"
        + (f": {failures}" if failures else "")
    )
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
