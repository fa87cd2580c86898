#!/usr/bin/env python
"""Recall cost of the strict (2,4) band scheme on the normalized stress
corpus (r12 follow-up to tools/norm_band_mass.py; NEXT r12 #1).

norm_band_mass.py measured the candidate-mass side of the trade (9.7x
cut); this measures the RECALL side on the same corpus: verify BOTH
schemes' rep-level candidates exactly (Jaccard >= 0.7 over normalized
shingles) and report each verified pair set against their UNION. The
union of two independent band schemes over the same signature is the
closest executable stand-in for exact truth here (the full all-pairs
truth would need the shingle-blocked join whose hot normalized shingles
make it the one genuinely quadratic arm on this corpus); per the LSH
s-curve, (4,2) alone already catches ~94% of j=0.7 pairs and more above,
so the union's miss mass is small and the HEADLINE number — how many
verified pairs the strict scheme gives up — is exact by construction.

Usage: python tools/norm_band_recall.py [--dir /tmp/scale_sf1]
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
    args = ap.parse_args()

    from cassabon_spark.functions.text import tokens_expr
    from cassabon_spark.operators.skew import salted_self_pairs
    from cassabon_spark.queries.extensions import (
        _snd_band_frame,
        _snd_first_match,
    )
    from cassabon_spark.session import get_spark, prep

    spark = get_spark()
    prep(spark)
    docs = spark.read.parquet(f"{args.dir}/documents.parquet")
    norm = F.array_join(F.array_sort(F.array_distinct(tokens_expr("text"))), " ")
    nd = docs.select("doc_id", "lang", norm.alias("text")).filter(
        F.size(tokens_expr("text")) >= 3
    )
    reps = (
        nd.groupBy("lang", "text")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id", "lang", "text")
        .persist()
    )
    print(f"# strict-scheme recall on normalized reps — {args.dir}")
    print(f"reps: {reps.count()}\n")

    def verified(w):
        bands = _snd_band_frame(reps, band_w=w)
        cand = salted_self_pairs(
            bands,
            ["band", "bkey", "lang"],
            "doc_id",
            pair_cond=_snd_first_match(w),
            unique_pairs=True,
            n_cells=32,
            extra=[
                F.col("a.shs").alias("shs1"),
                F.col("b.shs").alias("shs2"),
            ],
        )
        inter = F.size(F.array_intersect("shs1", "shs2"))
        jac = inter / (F.size("shs1") + F.size("shs2") - inter)
        return (
            cand.filter(jac >= 0.7)
            .select(F.col("id1").alias("d1"), F.col("id2").alias("d2"))
            .persist()
        )

    t0 = time.time()
    p42 = verified(2)
    n42 = p42.count()
    t42 = time.time() - t0
    t0 = time.time()
    p24 = verified(4)
    n24 = p24.count()
    t24 = time.time() - t0
    union = p42.unionByName(p24).distinct().persist()
    nu = union.count()
    only42 = n42 and p42.join(p24, ["d1", "d2"], "left_anti").count()
    only24 = n24 and p24.join(p42, ["d1", "d2"], "left_anti").count()

    print("| scheme | verified rep pairs (j>=0.7) | recall vs union | "
          "unique to scheme | verify wall s |")
    print("|---|---|---|---|---|")
    print(f"| 4 x 2 | {n42:,} | {n42 / max(nu, 1):.4f} | {only42:,} | {t42:.1f} |")
    print(f"| 2 x 4 | {n24:,} | {n24 / max(nu, 1):.4f} | {only24:,} | {t24:.1f} |")
    print(f"\nunion: {nu:,} verified rep pairs")


if __name__ == "__main__":
    main()
