#!/usr/bin/env python
"""Normalized-dedup candidate mass vs band scheme (r12, VERDICT r11 #3).

r11 measured the normalized near-dup relation ~100x denser than raw on
the mutation-generation stress corpus (78,642,071 rep-level candidate
pairs at the default (4 bands x 2 rows) scheme vs 791,248 raw; max bucket
6,087 reps vs 50) and rejected signature-level grouping at 1.1%. The one
remaining lever is STRICTER BANDING — fewer, wider bands. This harness
measures it: for each band scheme, collapse the normalized corpus to
content reps, band them, and count the candidate-VERIFY mass as
sum-over-buckets C(n, 2) (bucket = (band, bkey, lang); the per-bucket
pair count every LSH verify join must examine — computed by aggregation,
never materialized) plus the max bucket size. The decision — stress-sweep
the strict entry or record a second measured rejection — follows from
these numbers and is written into SCALE_r12.md.

Usage: python tools/norm_band_mass.py [--dir /tmp/scale_sf1] [--schemes 2,4]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/scale_sf1")
    ap.add_argument("--schemes", default="2,4",
                    help="comma list of band widths (rows per band)")
    args = ap.parse_args()

    from cassabon_spark.functions.text import tokens_expr
    from cassabon_spark.queries.extensions import _snd_band_frame
    from cassabon_spark.session import get_spark, prep

    spark = get_spark()
    prep(spark)
    docs = spark.read.parquet(f"{args.dir}/documents.parquet")
    norm = F.array_join(F.array_sort(F.array_distinct(tokens_expr("text"))), " ")
    nd = docs.select("doc_id", "lang", norm.alias("text")).filter(
        F.size(tokens_expr("text")) >= 3
    )
    # one rep per distinct normalized content — the collapse the loop runs
    reps = (
        nd.groupBy("lang", "text")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id", "lang", "text")
        .persist()
    )
    n_reps = reps.count()
    print(f"# normalized band-scheme candidate mass — {args.dir}")
    print(f"reps (distinct normalized contents, >=3 tokens): {n_reps}\n")
    print("| scheme (bands x rows) | rep-level candidate mass "
          "(sum C(n,2) over buckets) | max bucket (reps) | wall (s) |")
    print("|---|---|---|---|")
    for w in [int(x) for x in args.schemes.split(",")]:
        t0 = time.time()
        bands = _snd_band_frame(reps, band_w=w)
        m = (
            bands.groupBy("band", "bkey", "lang")
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(
                F.sum(F.expr("n * (n - 1) div 2")).alias("mass"),
                F.max("n").alias("mx"),
            )
            .first()
        )
        wall = time.time() - t0
        print(f"| {8 // w} x {w} | {m['mass']:,} | {m['mx']:,} | {wall:.1f} |")
    reps.unpersist()


if __name__ == "__main__":
    main()
