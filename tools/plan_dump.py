#!/usr/bin/env python
"""Dump .explain('formatted') for named registered queries into plans/<tag>/.

Usage: python tools/plan_dump.py --tag r14 --suffix after q1 q2 ...
The judge-facing before/after plan files for the optimization rounds are
produced with this tool (before = run from the prior round's tree).
"""

from __future__ import annotations

import argparse
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cassabon_spark.queries import load_registry  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--tag", default="r14")
    ap.add_argument("--suffix", default="after")
    ap.add_argument("--out-root", default=os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans"))
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from cassabon_spark import get_spark

    spark = get_spark(app_name="plan-dump")
    reg = load_registry()
    outdir = os.path.join(args.out_root, args.tag)
    os.makedirs(outdir, exist_ok=True)
    for name in args.names:
        qd = reg[name]
        df = qd.fn(spark, args.sf)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"{name}: {len(buf.getvalue().splitlines())} lines -> {path}")


if __name__ == "__main__":
    main()
