#!/usr/bin/env python
"""Recall cost of the strict (2,4) band scheme on the normalized stress
corpus (r13, VERDICT r12 #1 — the decision number the knob shipped
without).

norm_band_mass.py measured the candidate-mass side of the trade (9.7x
cut); this measures the RECALL side on the same corpus, against EXACT
truth. Three arms, all at the content-representative level (the truth
arm is collapse-safe exactly like dedup_lsh_band_ablation's):

  1. per-scheme verified pairs: band at (4,2) and (2,4), verify exact
     normalized Jaccard >= 0.7 row-locally (the schemes' own pair sets —
     these are subsets of truth by construction, so recall = n / truth).
  2. EXACT truth via prefix-filtered set-similarity join (AllPairs /
     PPJoin prefix principle, Bayardo et al. WWW'07; Xiao et al.
     WWW'08): order each doc's shingles by ascending global document
     frequency; for Jaccard >= t a pair MUST share a shingle inside the
     first |x| - ceil(t*|x|) + 1 shingles of EACH side (if all shared
     shingles sat outside x's prefix, |x ∩ y| <= ceil(t|x|) - 1 < t|x|
     <= t|x ∪ y|). Blocking prefix rows against full rows is therefore
     EXHAUSTIVE for the threshold — the plain shingle-block join's hot
     common shingles (the genuinely quadratic arm on sorted-token text)
     never block, because a hot shingle is by definition high-df and
     sorts out of every prefix. Both join sides ride salted_join.
  3. the two schemes' union (the old stand-in) — kept as a cross-check
     column (union ⊆ truth must hold).

Also reports the mutation-family split: the stress corpus packs
generations as doc_id = base*16 + gen (dup-farm ids >= 10M), so truth
pairs split into intra-family (the mutation-generation near-dups the
corpus was built to create) and cross-family.

Usage: python tools/norm_band_recall.py [--dir /tmp/scale_sf1]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

T = 0.7  # the family's verify threshold
TP, TQ = 7, 10  # T as an exact rational for the integer prefix bound


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/scale_sf1")
    args = ap.parse_args()

    from cassabon_spark.functions.text import tokens_expr, word_shingles_expr
    from cassabon_spark.operators.skew import salted_join, salted_self_pairs
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
    print(f"# strict-scheme recall vs EXACT truth, normalized reps — {args.dir}")
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
            cand.filter(jac >= T)
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

    # ---- exact truth: prefix-filtered shingle-block join over reps
    t0 = time.time()
    shs_arr = reps.select(
        "doc_id",
        "lang",
        F.array_distinct(word_shingles_expr(tokens_expr("text"), 3)).alias(
            "shs"
        ),
    ).persist()
    sh = shs_arr.select(
        "doc_id", "lang", F.size("shs").alias("n"), F.explode("shs").alias("s")
    )
    dfreq = sh.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    # mass probes: the plain shingle-block join (what the prefix filter
    # avoids) vs the prefix-blocked join actually run
    plain_mass = (
        dfreq.agg(F.sum(F.expr("df * (df - 1) div 2"))).first()[0]
    )
    ranked = sh.join(dfreq, "s").withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("doc_id").orderBy(F.asc("df"), F.asc("s"))
        ),
    )
    # INTEGER ceil of T*n (ADVICE r13): float ceil(double(T)*n) can
    # over-round at threshold-multiple sizes and silently shorten the
    # prefix below the exhaustiveness bound (double(0.7) happens to be
    # safe, but the 'EXACT truth' claim must not depend on which way a
    # binary double rounds). T = TP/TQ as a rational, like the
    # dedup_ngram_jaccard_prefix registry entry's (4n+4) div 5 form.
    plen = F.col("n") - F.expr(f"({TP} * n + {TQ - 1}) div {TQ}") + 1
    prefix = ranked.filter(F.col("rk") <= plen).select("doc_id", "lang", "s")
    pmass = (
        prefix.groupBy("s")
        .agg(F.count(F.lit(1)).alias("np"))
        .join(dfreq, "s")
        .agg(F.sum(F.col("np") * F.col("df")))
        .first()[0]
    )
    print("| mass probe | join rows |")
    print("|---|---|")
    print(f"| plain shingle-block sum C(df,2) | {plain_mass:,} |")
    print(f"| prefix-blocked sum np*df | {pmass:,} |\n")

    lt = prefix.select("s", "lang", F.col("doc_id").alias("da"))
    rt = sh.select("s", "lang", F.col("doc_id").alias("db"))
    cand_t = (
        salted_join(lt, rt, ["s", "lang"], left_salt_col="da", n_cells=32)
        .filter(F.col("da") != F.col("db"))
        .select(
            F.least("da", "db").alias("d1"), F.greatest("da", "db").alias("d2")
        )
        .distinct()
    )
    a = shs_arr.select(F.col("doc_id").alias("d1"), F.col("shs").alias("sa"))
    b = shs_arr.select(F.col("doc_id").alias("d2"), F.col("shs").alias("sb"))
    it = F.size(F.array_intersect("sa", "sb"))
    jt = it / (F.size("sa") + F.size("sb") - it)
    truth = (
        cand_t.join(a, "d1").join(b, "d2").filter(jt >= T)
        .select("d1", "d2")
        .persist()
    )
    ntruth = truth.count()
    ttruth = time.time() - t0

    # subset sanity: scheme pairs and their union must sit inside truth
    leak42 = p42.join(truth, ["d1", "d2"], "left_anti").count()
    leak24 = p24.join(truth, ["d1", "d2"], "left_anti").count()
    assert leak42 == 0 and leak24 == 0, (leak42, leak24)

    # mutation-family split (stress packing: doc_id = base*16 + gen for
    # the x10 generations, >= 10M for the dup-farm shard)
    fam = lambda c: F.when(F.col(c) >= 10_000_000, F.lit(-1)).otherwise(  # noqa: E731
        F.floor(F.col(c) / 16)
    )
    def fam_split(df):
        r = df.select(
            (fam("d1") == fam("d2")).alias("intra")
        ).groupBy("intra").count().collect()
        d = {row["intra"]: row["count"] for row in r}
        return d.get(True, 0), d.get(False, 0)

    ti, tx = fam_split(truth)
    i42, x42 = fam_split(p42)
    i24, x24 = fam_split(p24)

    print("| scheme | verified pairs | recall vs exact truth | intra-family "
          "recall | cross-family recall | verify wall s |")
    print("|---|---|---|---|---|---|")
    print(f"| 4 x 2 | {n42:,} | {n42 / max(ntruth, 1):.4f} | "
          f"{i42 / max(ti, 1):.4f} ({i42:,}/{ti:,}) | "
          f"{x42 / max(tx, 1):.4f} ({x42:,}/{tx:,}) | {t42:.1f} |")
    print(f"| 2 x 4 | {n24:,} | {n24 / max(ntruth, 1):.4f} | "
          f"{i24 / max(ti, 1):.4f} ({i24:,}/{ti:,}) | "
          f"{x24 / max(tx, 1):.4f} ({x24:,}/{tx:,}) | {t24:.1f} |")
    print(f"| union (old stand-in) | {nu:,} | {nu / max(ntruth, 1):.4f} | "
          f"- | - | - |")
    print(f"| exact truth (prefix join) | {ntruth:,} | 1.0000 | "
          f"({ti:,} intra / {tx:,} cross) | | {ttruth:.1f} |")


if __name__ == "__main__":
    main()
