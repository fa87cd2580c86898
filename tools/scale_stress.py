#!/usr/bin/env python
"""10x scale stress of the heaviest dedup/ANN pipelines (VERDICT r3 #2).

SCALE.md argues the dedup/ANN family survives 100 TB by design (blocking
keys, skew-split, int-code compression). This harness makes the central
claims EXECUTABLE at ~10x the bench scale:

  1. synthesize a ~sf1-equivalent corpus from sf0.1 (default
     /tmp/scale_sf1): documents x10 (one exact replica generation + nine
     mutated generations, so most of the corpus is NOT near-duplicate,
     like a real crawl) PLUS a heavy-duplication shard (10k identical
     docs -> one pathological LSH band bucket emitting ~50M candidate
     pairs, the skew regime operators/skew.py::salted_self_pairs exists
     for — the envelope tests/test_skew.py proves); embeddings x10
     with per-replica orthogonal-ish perturbation so ANN candidates
     don't collapse to exact ties;
  2. run dedup_minhash_lsh, dedup_simhash, similarity_ivfpq_adc ONCE each
     against that directory (same registered query fns the driver runs);
  3. pull per-stage task summaries from the Spark UI REST API and flag
     stragglers: any stage whose max task duration exceeds 10x its median
     (stages with sub-100ms medians are skipped as noise);
  4. print a markdown report (committed as SCALE_r04.md).

Usage: python tools/scale_stress.py [--dir /tmp/scale_sf1] [--src /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import calendar
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cassabon_spark.queries import load_registry  # noqa: E402

# the three heaviest pipelines (VERDICT r3 #2) plus the two BOUNDED
# production dedup shapes for contrast: the pair-listing entry's output is
# inherently quadratic in dup-group size (the 10k shard alone emits ~50M
# pairs), while cross-corpus probing and cluster-blocked semantic dedup
# bound the volume per batch/cluster — the shapes a 100 TB pipeline runs.
QUERIES = [
    "dedup_minhash_lsh",
    "dedup_simhash",
    "similarity_ivfpq_adc",
    "dedup_cross_corpus",
    "dedup_semdedup",
    # r8: the other two corpus-scaled-pivot entries (VERDICT r7 #2) — the
    # family the two-scale exponent gate exists to watch
    "dedup_embedding_cosine",
    "pipeline_d4_prototype_prune",
    # the streaming path end-to-end (r4): documents arrive as microbatches
    # and probe the static band index; the parquet sink absorbs the full
    # 50M-pair output executor-side (the memory sink could not)
    "streaming_neardup_lsh",
    # r10 (VERDICT r9 #1): the full probe-then-absorb loop, content-
    # collapsed — the r9 shape exceeded the 300 s await budget on this
    # corpus (banded every raw dup-farm copy); the stress row here IS the
    # round's done-criterion for the collapse
    "streaming_neardup_incremental",
    # r10 (NEXT #4, no-silent-caps): CDC chunking — chunk construction is
    # row-local HOF work, so the dup farm costs it only linear re-hashing
    # of identical chunk text; the control row proving a map-only pipeline
    # rides the same corpus flat.
    "dedup_cdc_chunks",
    # r11: the IVF nprobe ablation — its exact arm is bounded by |Q|=5
    # queries x corpus, so unlike the band ablation it never needed a
    # collapse to be sweep-safe; measured once (NEXT r11 #4) and kept.
    "similarity_probe_ablation",
    # r11 (VERDICT r10 #4): the band ablation joins the sweep now that
    # its exact-truth arm is content-collapsed — truth/candidates/hits
    # all run at rep level with member counts from expansion arithmetic,
    # so the dup farm contributes ONE rep to the truth shingle join
    # instead of a quadratic pair stream. The r10 exclusion reason
    # (quadratic-in-exact-dup-mass truth arm) no longer exists.
    "dedup_lsh_band_ablation",
    # r11: the rolling-window variant of the incremental loop — same
    # collapse machinery, so the dup farm must stay linear.
    # streaming_neardup_normalized is REJECTED from this sweep with
    # numbers (the no-silent-caps rule): on this corpus the normalized
    # near-dup RELATION itself is ~100x denser — token-sort shingles
    # collapse each base doc's 10 mutated generations into hot LSH
    # buckets (measured r11: 78,642,071 rep-level candidate pairs vs
    # 791,248 raw, max bucket 6,087 vs 50 reps) — so the pair OUTPUT is
    # quadratic in mutation-family size by the operator's own semantics
    # and no execution strategy makes it linear; DNF at the 300 s stream
    # guard. Content collapse cannot help (the colliding contents are
    # DISTINCT), and neither would a cluster-emitting output: the
    # candidate-VERIFY mass is the floor — the same candidate-mass
    # envelope class as dedup_semdedup's. See the entry docstring.
    "streaming_neardup_ttl",
    # r12 (VERDICT r11 #1): the rolling-window STATIC-INDEX probe path —
    # raw per-doc probe of a bid-stamped band index, no collapse
    # machinery; same dup-farm exposure as streaming_neardup_ttl.
    "streaming_neardup_lsh_ttl",
    # r12 (VERDICT r11 #3): normalized dedup at the STRICTER (2, 4) band
    # scheme — the measured lever for the ~100x densification that keeps
    # streaming_neardup_normalized out of this sweep: candidate-VERIFY
    # mass on this corpus drops 78,642,071 -> 8,107,434 (9.7x; max
    # bucket 6,087 -> 2,099 reps) at the ablation-ranked s-curve cost
    # (tools/norm_band_mass.py, SCALE_r12.md).
    "streaming_neardup_normalized_strict",
    # r13 (VERDICT r12 #6): adaptive band-scheme selection — the scalar
    # probe must pick (2,4) on this densified corpus (mean candidate mass
    # per rep ~1596 vs THETA 500) so the run completes where the fixed
    # (4,2) normalized entry DNFs; on the 1x src corpus (ratio ~111) it
    # picks the 0.94-s-curve default.
    "streaming_neardup_normalized_adaptive",
]
STRAGGLER_RATIO = 10.0
MEDIAN_FLOOR_MS = 100.0
# r12: a straggler must also be ABSOLUTELY slow. The ratio on a stage
# whose median sits at the ~100 ms scheduling floor measures emptiness,
# not skew: the incremental loop's salted probe-volume stages are wide
# and near-empty on late batches (most content already known), so one
# task holding the few real rows reads 1.2 s against a 107 ms floor
# median — 11-12x, flagged in two consecutive sweeps while every REAL
# straggler this harness ever caught ran 7-295 s (SCALE_r12.md). A task
# that finishes in under MAX_FLOOR_MS cannot delay a stage materially at
# this corpus; systematic hot-spots that stay individually fast are the
# growth gate's job (they inflate total task time superlinearly).
MAX_FLOOR_MS = 3000.0
# r13 (VERDICT r12 #5): standing per-stage adjudication classes, so a
# gate row self-adjudicates mechanically instead of needing prose in the
# round record. A stage whose NAME contains a pattern key and whose max
# task stays under the class's cap is a known bounded-residual shape:
# its row prints the class tag and PASSES. Entries are added only with a
# measured rejection recorded in a SCALE_r{N}.md (the no-silent-softening
# rule) — the raw ratio is always printed alongside the verdict.
STRAGGLER_CLASSES: dict[str, tuple[str, float]] = {}


def adjudicate(stage: dict) -> tuple[str, str]:
    """(class, verdict) for one stage row. Verdict is 'pass' or 'FAIL';
    class explains WHY a raw >10x ratio passes: 'floor-capped' (max task
    under MAX_FLOOR_MS — a stage nothing that fast can delay), or a
    STRAGGLER_CLASSES tag (known bounded residual under its cap)."""
    ratio, mx = stage["ratio"], stage["max_ms"]
    if ratio <= STRAGGLER_RATIO:
        return "ok", "pass"
    if mx <= MAX_FLOOR_MS:
        return "floor-capped", "pass"
    for pat, (tag, cap_ms) in STRAGGLER_CLASSES.items():
        if pat in stage["name"] and mx <= cap_ms:
            return tag, "pass"
    return "straggler", "FAIL"


# r7 (VERDICT r6 #4): a compute-heavy stage (median >= HEAVY_MS) running
# with fewer tasks than the cluster width is the AQE-byte-coalescing
# failure mode (SCALE_r06: a quadratic pair stage shrunk to 5 tasks) —
# counted as a FAILURE, not just displayed (threshold width//2: the
# observed failure mode is 5-of-32, and a stage reading a 31-file input
# should not flap the gate). Stages that are heavy but
# legitimately narrow (final top-k merges over <= width rows) have not
# appeared in any sweep; if one ever does, waive it here by stage name.
HEAVY_MS = 1000.0
# r8 (VERDICT r7 #3): two-scale exponent gate. Input grows ~10x from src
# (sf0.1) to the stress corpus; a linear pipeline's total task time grows
# ~10x (plus fixed overhead, which DEFLATES the measured ratio), a
# quadratic one ~100x. 25x splits the regimes with margin on both sides
# (measured calibration for the corpus-scaled-pivot family is recorded in
# SCALE_r08.md).
GROWTH_GATE = 25.0
# pivot-ASSIGNMENT exponent gate, 10x -> 100x embeddings (a 10x input
# jump where BOTH measurements are compute-dominated — the 1x corpus is
# all fixed overhead and useless as a denominator): the two-level
# quantizer's assignment is N*2*sqrt(k) = N^1.5, so its task time grows
# well under the jump squared (measured 12.3x: 20.4 s -> 252.2 s); the
# pre-r8 single-level N*k shape measured 93.4x (45.9 s -> 4287.4 s) —
# SCALE_r08.md A/B. 50x splits the regimes — a regression back to
# corpus-linear pivot scans trips this.
EMB100_GATE = 50.0
# --emb1000 gate: at the 100x -> 1000x jump both ends are pure compute, so
# the measured ratio sits closer to theory and varies with box warmth —
# observed 32.9x and 47.3x across runs (theory 31.6x) while the
# single-level shape's compute grows exactly 100x. 65x keeps ~1.4x margin
# below the quadratic and ~1.4x above the worst measured healthy run.
EMB1000_GATE = 65.0
# Entries waived from the per-query total-growth gate, with the reason
# printed. streaming_neardup_lsh: the harness RE-STREAMS the whole corpus
# through an incremental-probe operator, so total work is inherently
# batch_count x static-index shuffle with batch count corpus-scaled
# (bounded batch SIZE is the r6-measured optimum; the co-partitioned
# static cache that would remove the per-batch shuffle was measured
# catastrophically worse — it defeats AQE skew-splitting on hot LSH band
# keys, sf0.1 7 s -> >300 s timeout, SCALE_r08.md). The operator's scale
# contract is PER-BATCH cost (linear in batch + index), recorded in the
# per-batch column instead.
GROWTH_WAIVERS = {
    "streaming_neardup_lsh": "re-streams whole corpus; per-batch cost is the contract",
    "streaming_neardup_incremental": "re-streams whole corpus; per-batch cost is the contract",
    # r11: same incremental-loop class — the harness re-drives the whole
    # corpus batch-by-batch (NB corpus-scaled), so total work is
    # batch_count x probe cost by construction; per-batch cost is gated
    # by tools/snd_perbatch.py on the shared processor
    "streaming_neardup_ttl": "re-drives whole corpus; per-batch cost is the contract",
    "streaming_neardup_lsh_ttl": "re-drives whole corpus; per-batch cost is the contract",
    "streaming_neardup_normalized_strict": "re-streams whole corpus; per-batch cost is the contract",
    "streaming_neardup_normalized_adaptive": "re-streams whole corpus; per-batch cost is the contract",
}


def synthesize(spark, src: str, dst: str) -> None:
    """documents: 10 generations (gen 0 verbatim, gens 1-9 text-mutated ->
    distinct content) + a 20k-row identical-text shard; embeddings: 10
    generations with a deterministic per-generation perturbation on the
    vector tail. doc_id/vec_id stay unique via id*16+gen packing."""
    docs = spark.read.parquet(f"{src}/documents.parquet")
    gens = spark.range(10).select(F.col("id").cast("int").alias("gen"))
    d10 = (
        docs.crossJoin(gens)
        .select(
            (F.col("doc_id") * 16 + F.col("gen")).alias("doc_id"),
            F.when(F.col("gen") == 0, F.col("text"))
            .otherwise(
                F.concat_ws(
                    " ",
                    F.col("text"),
                    F.lit("gen"),
                    F.col("gen").cast("string"),
                    F.md5(F.concat_ws("|", F.col("doc_id"), F.col("gen"))),
                )
            )
            .alias("text"),
            "lang",
            "source",
            "n_chars",
        )
    )
    # heavy-duplication shard: one document repeated 10k times verbatim —
    # every MinHash band collides into ONE bucket (the skew-split regime)
    seed = docs.orderBy("doc_id").limit(1)
    shard = (
        seed.crossJoin(spark.range(10_000).select(F.col("id").alias("rep")))
        .select(
            (F.lit(10_000_000) + F.col("rep")).alias("doc_id"),
            "text",
            "lang",
            F.lit("dupfarm").alias("source"),
            "n_chars",
        )
    )
    d10.unionByName(shard).repartition(32).write.mode("overwrite").parquet(
        f"{dst}/documents.parquet"
    )
    emb = spark.read.parquet(f"{src}/embeddings.parquet")
    e10 = (
        emb.crossJoin(gens)
        .select(
            (F.col("vec_id") * 16 + F.col("gen")).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, i: (
                    x
                    + F.col("gen").cast("float")
                    * 0.01
                    * ((i % 7).cast("float") - 3.0)
                ).cast("float"),
            ).alias("embedding"),
            "label",
        )
    )
    e10.repartition(32).write.mode("overwrite").parquet(f"{dst}/embeddings.parquet")
    # r8: a 100x embeddings corpus for the pivot-ASSIGNMENT exponent gate.
    # At 10x the assignment stage is too small for task time to separate
    # the regimes (fixed overhead dominates); at 100x (200k vectors) the
    # single-level N*k shape costs ~150x its 1x task time while the
    # two-level N*2*sqrt(k) shape costs ~12x — see SCALE_r08.md.
    g100 = spark.range(100).select(F.col("id").cast("int").alias("gen"))
    e100 = (
        emb.crossJoin(g100)
        .select(
            (F.col("vec_id") * 128 + F.col("gen")).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, i: (
                    x
                    + F.col("gen").cast("float")
                    * 0.003
                    * ((i % 11).cast("float") - 5.0)
                ).cast("float"),
            ).alias("embedding"),
            "label",
        )
    )
    e100.repartition(32).write.mode("overwrite").parquet(
        f"{dst}/embeddings100.parquet"
    )


def _ui(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}{path}", timeout=30) as r:
        return json.loads(r.read())


def _rest_ts_ms(sub: str) -> float:
    """Spark REST API timestamps are GMT (suffix 'GMT'); parse as UTC.

    time.mktime would interpret the struct_time as LOCAL time, shifting the
    submitted-after-t0 stage filter by the UTC offset on any non-UTC box and
    silently mis-attributing stages to the growth ratios (ADVICE r8 #1) —
    calendar.timegm is the UTC inverse."""
    return calendar.timegm(time.strptime(sub[:19], "%Y-%m-%dT%H:%M:%S")) * 1000.0


def total_task_time_ms(spark, t0_ms: float) -> float:
    """Sum of executorRunTime over ALL completed stages submitted after t0
    — the scale-exponent signal: wall hides compute growth behind fixed
    scheduling overhead, but total task time grows with the work actually
    done. Used by the two-scale (1x vs 10x) superlinear gate (VERDICT r7
    #3: the corpus-scaled-pivot assignment pass was N*k with k ~ N —
    healthy width at any single scale, wrong exponent ACROSS scales;
    neither the straggler nor the narrow-heavy gate can see it)."""
    total = 0.0
    for st in _ui(spark, "/stages?status=complete"):
        sub = st.get("firstTaskLaunchedTime") or st.get("submissionTime")
        if sub is None:
            continue
        sub_ms = _rest_ts_ms(sub)
        if sub_ms < t0_ms:
            continue
        total += float(st.get("executorRunTime", 0))
    return total


def stage_straggler_report(spark, t0_ms: float) -> list[dict]:
    """Per-stage (submitted after t0) max/median task-duration ratios from
    the UI REST API — the executable form of 'no straggler task >10x
    median' (Spark UI task summary)."""
    out = []
    for st in _ui(spark, "/stages?status=complete"):
        sub = st.get("firstTaskLaunchedTime") or st.get("submissionTime")
        if sub is None:
            continue
        sub_ms = _rest_ts_ms(sub)
        if sub_ms < t0_ms or st.get("numCompleteTasks", 0) < 2:
            continue
        try:
            q = _ui(
                spark,
                f"/stages/{st['stageId']}/{st['attemptId']}/taskSummary?quantiles=0.5,1.0",
            )
        except Exception:
            continue
        med, mx = q["duration"][0], q["duration"][1]
        if med < MEDIAN_FLOOR_MS:
            continue
        row = {
            "stage": st["stageId"],
            "name": st.get("name", "")[:60],
            "tasks": st.get("numCompleteTasks"),
            "median_ms": round(med, 1),
            "max_ms": round(mx, 1),
            "ratio": round(mx / max(med, 1e-9), 2),
        }
        row["class"], row["verdict"] = adjudicate(row)
        out.append(row)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/scale_sf1")
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--label", default="SCALE")
    ap.add_argument(
        "--growth-gate",
        type=float,
        default=GROWTH_GATE,
        help="max allowed 1x->10x total-task-time growth factor",
    )
    ap.add_argument(
        "--emb1000",
        action="store_true",
        help="also measure the pivot-assignment exponent at 1000x "
        "embeddings (2M vectors, ~7 min) — re-measures the three-point "
        "N^1.5 fit recorded in SCALE_r08.md instead of trusting it",
    )
    ap.add_argument(
        "--only",
        default=None,
        help="comma list: restrict the sweep to these QUERIES entries "
        "(targeted re-measure of one row; skips the pivot-assignment "
        "exponent section, which needs no query context)",
    )
    args = ap.parse_args()
    if args.only:
        keep = set(args.only.split(","))
        unknown = keep - set(QUERIES)
        if unknown:
            ap.error(f"--only names not in QUERIES: {sorted(unknown)}")
        QUERIES[:] = [q for q in QUERIES if q in keep]

    # get_spark disables the UI; this harness NEEDS the UI REST API for
    # per-stage task summaries, so build an equivalent session with it on
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("cassabon-scale-stress")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.retainedStages", "2000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.isdir(f"{args.dir}/documents.parquet"):
        synthesize(spark, args.src, args.dir)
    if not os.path.isdir(f"{args.dir}/embeddings100.parquet"):
        # dir synthesized by a pre-r8 run: backfill just the 100x corpus
        synthesize(spark, args.src, args.dir)
    nd = spark.read.parquet(f"{args.dir}/documents.parquet").count()
    ne = spark.read.parquet(f"{args.dir}/embeddings.parquet").count()

    registry = load_registry()
    print(f"# {args.label} — 10x stress ({nd} docs incl. 10k-identical shard, {ne} vectors)\n")
    print(f"Corpus: {args.dir} synthesized from {args.src} (x10 generations "
          "+ dup-farm shard). One cold run per query, local[32].\n")
    width = int(cpus)

    # -------- two-scale exponent sweep (VERDICT r7 #3): 1x (src) baseline
    # first, so each query's total task time can be compared against its
    # 10x run below. Warm-up bias runs the WRONG way for a false pass:
    # the 1x sweep pays JVM/codegen warm-up, inflating the denominator.
    base_tt: dict[str, float] = {}
    for name in QUERIES:
        t0_ms = time.time() * 1000 - 1000
        registry[name].fn(spark, args.src).count()
        base_tt[name] = total_task_time_ms(spark, t0_ms)

    print("| query | wall s | rows | worst stage max/median | min tasks (heavy) | below-width heavy? | straggler (>10x)? | task-time growth 1x->10x |")
    print("|---|---|---|---|---|---|---|---|")
    n_straggler = n_narrow = n_superlinear = 0
    details = []
    for name in QUERIES:
        t0_ms = time.time() * 1000 - 1000
        t0 = time.time()
        n = registry[name].fn(spark, args.dir).count()
        wall = time.time() - t0
        stages = stage_straggler_report(spark, t0_ms)
        tt10 = total_task_time_ms(spark, t0_ms)
        worst = max(stages, key=lambda s: s["ratio"], default=None)
        bad = [s for s in stages if s["verdict"] == "FAIL"]
        n_straggler += len(bad)
        wtxt = (
            f"{worst['ratio']}x (stage {worst['stage']}, med {worst['median_ms']}ms)"
            if worst
            else "n/a"
        )
        # compute-heavy stages (median >= HEAVY_MS) below cluster width:
        # the AQE byte-coalescing failure mode — a FAILURE, not a display
        heavy = [s for s in stages if s["median_ms"] >= HEAVY_MS]
        min_tasks = min((s["tasks"] for s in heavy), default=None)
        narrow = [s for s in heavy if s["tasks"] < width // 2]
        n_narrow += len(narrow)
        # exponent gate: growth of total task time across the ~10x input
        # jump (2 s floor on the baseline keeps near-zero 1x runs from
        # manufacturing huge ratios out of scheduling noise)
        growth = tt10 / max(base_tt.get(name, 0.0), 2000.0)
        waived = name in GROWTH_WAIVERS
        slin = growth > args.growth_gate and not waived
        n_superlinear += int(slin)
        print(
            f"| {name} | {wall:.1f} | {n} | {wtxt} | "
            f"{min_tasks if min_tasks is not None else '-'} | "
            f"{'YES: ' + str([(s['stage'], s['tasks']) for s in narrow]) if narrow else 'no'} | "
            f"{'YES: ' + str([s['stage'] for s in bad]) if bad else 'no'} | "
            f"{growth:.1f}x ({base_tt.get(name, 0.0) / 1000:.1f}s -> {tt10 / 1000:.1f}s)"
            f"{' SUPERLINEAR!' if slin else ''}"
            f"{' waived: ' + GROWTH_WAIVERS[name] if waived else ''} |"
        )
        details.append((name, stages))

    if args.only:
        # targeted query re-measure: the pivot-assignment / ingest
        # sections have no per-query context — print stage details for
        # what ran and stop
        print()
        for name, stages in details:
            print(f"## {name} — stages with median >= {MEDIAN_FLOOR_MS:.0f}ms\n")
            print("| stage | name | tasks | median ms | max ms | raw ratio | class | verdict |")
            print("|---|---|---|---|---|---|---|---|")
            for s in sorted(stages, key=lambda s: -s["max_ms"])[:8]:
                print(
                    f"| {s['stage']} | {s['name']} | {s['tasks']} | "
                    f"{s['median_ms']} | {s['max_ms']} | {s['ratio']} | "
                    f"{s['class']} | {s['verdict']} |"
                )
            print()
        print(
            f"**Gate failures ({'/'.join(QUERIES)} only): {n_straggler} straggler "
            f"+ {n_narrow} narrow-heavy + {n_superlinear} superlinear**"
        )
        return

    # pivot-assignment exponent A/B (VERDICT r7 #2/#3): the two-level
    # quantizer's assignment work must stay ~N^1.5; measure its task time
    # on 1x vs 100x embeddings, where assignment compute dominates fixed
    # overhead (at 10x it does not — see SCALE_r08.md calibration). One
    # warm-up rep at 1x absorbs JVM/codegen warm-up.
    from cassabon_spark.operators.cells import two_level_cells

    emb_tt = {}
    for scale, path in [
        ("warm", f"{args.src}/embeddings.parquet"),
        ("10x", f"{args.dir}/embeddings.parquet"),
        ("100x", f"{args.dir}/embeddings100.parquet"),
    ]:
        emb = spark.read.parquet(path)
        t0_ms = time.time() * 1000 - 1000
        t0 = time.time()
        n = two_level_cells(emb).count()
        emb_tt[scale] = (total_task_time_ms(spark, t0_ms), time.time() - t0, n)
    egrowth = emb_tt["100x"][0] / max(emb_tt["10x"][0], 2000.0)
    eslin = egrowth > EMB100_GATE
    n_superlinear += int(eslin)
    print(
        f"| pivot_assignment_10x_to_100x | {emb_tt['100x'][1]:.1f} | {emb_tt['100x'][2]} "
        f"| - | - | - | - | {egrowth:.1f}x "
        f"({emb_tt['10x'][0] / 1000:.1f}s -> {emb_tt['100x'][0] / 1000:.1f}s, "
        f"gate {EMB100_GATE:.0f}x across the 10x jump)"
        f"{' SUPERLINEAR!' if eslin else ''} |"
    )
    if args.emb1000:
        # opt-in third exponent point (2M vectors): the 100x->1000x jump
        # is fully compute-dominated on BOTH ends, so the measured growth
        # is the pure assignment exponent (N^1.5 -> ~31.6x per 10x jump;
        # measured 32.9x / 47.3x across runs). Own gate (EMB1000_GATE).
        p1000 = f"{args.dir}/embeddings1000.parquet"
        if not os.path.isdir(p1000):
            emb = spark.read.parquet(f"{args.src}/embeddings.parquet")
            g1000 = spark.range(1000).select(F.col("id").cast("int").alias("gen"))
            (
                emb.crossJoin(g1000)
                .select(
                    (F.col("vec_id") * 1024 + F.col("gen")).alias("vec_id"),
                    F.transform(
                        "embedding",
                        lambda x, i: (
                            x
                            + F.col("gen").cast("float")
                            * 0.0003
                            * ((i % 13).cast("float") - 6.0)
                        ).cast("float"),
                    ).alias("embedding"),
                    "label",
                )
                .repartition(64)
                .write.mode("overwrite")
                .parquet(p1000)
            )
        emb = spark.read.parquet(p1000)
        t0_ms = time.time() * 1000 - 1000
        t0 = time.time()
        n = two_level_cells(emb).count()
        tt1000 = total_task_time_ms(spark, t0_ms)
        g1000x = tt1000 / max(emb_tt["100x"][0], 2000.0)
        slin1000 = g1000x > EMB1000_GATE
        n_superlinear += int(slin1000)
        print(
            f"| pivot_assignment_100x_to_1000x | {time.time() - t0:.1f} | {n} "
            f"| - | - | - | - | {g1000x:.1f}x "
            f"({emb_tt['100x'][0] / 1000:.1f}s -> {tt1000 / 1000:.1f}s, "
            f"gate {EMB1000_GATE:.0f}x across the 10x jump)"
            f"{' SUPERLINEAR!' if slin1000 else ''} |"
        )

    # carbon-ingest slot (VERDICT r4 #5): the full parse -> route -> all
    # rollup tiers -> SNAPSHOT-table sink path at 10x the ingest-bench line
    # volume (20M lines), under the same straggler criterion. The snapshot
    # sink also exercises the r5 action-log commit path at stress volume.
    import shutil
    import tempfile

    from cassabon_spark.config import RollupConfig
    from cassabon_spark.engine import Engine
    from cassabon_spark.session import prep as _prep

    _prep(spark)
    n_lines, n_paths = 20_000_000, 500
    lines = spark.range(n_lines).select(
        F.format_string(
            "svc.host%d.metric%d %d %d",
            (F.col("id") % n_paths) % 50,
            F.floor((F.col("id") % n_paths) / 50).cast("long"),
            (F.col("id") % 100) + 1,
            F.lit(1_700_000_000) + (F.col("id") / n_paths).cast("long"),
        ).alias("line")
    )
    lines.count()  # materialize the generator before timing the engine
    cfg = RollupConfig.from_dict(
        {"default": {"method": "average", "windows": ["10s:1h", "60s:1d"]}}
    )
    d = tempfile.mkdtemp(prefix="scale_ingest_")
    try:
        eng = Engine(
            spark, cfg, os.path.join(d, "store"), os.path.join(d, "idx"),
            table_format="snapshot",
        )
        t0_ms = time.time() * 1000 - 1000
        t0 = time.time()
        counters = eng.ingest_lines(lines)
        wall = time.time() - t0
        stages = stage_straggler_report(spark, t0_ms)
        worst = max(stages, key=lambda s: s["ratio"], default=None)
        bad = [s for s in stages if s["verdict"] == "FAIL"]
        n_straggler += len(bad)
        wtxt = (
            f"{worst['ratio']}x (stage {worst['stage']}, med {worst['median_ms']}ms)"
            if worst
            else "n/a"
        )
        heavy = [s for s in stages if s["median_ms"] >= HEAVY_MS]
        min_tasks = min((s["tasks"] for s in heavy), default=None)
        narrow = [s for s in heavy if s["tasks"] < width // 2]
        n_narrow += len(narrow)
        rate = round(counters["received"] / wall)
        print(
            f"| carbon_ingest_20M_snapshot | {wall:.1f} | {counters['received']} "
            f"({rate}/s) | {wtxt} | {min_tasks if min_tasks is not None else '-'} | "
            f"{'YES: ' + str([(s['stage'], s['tasks']) for s in narrow]) if narrow else 'no'} | "
            f"{'YES: ' + str([s['stage'] for s in bad]) if bad else 'no'} | - |"
        )
        details.append(("carbon_ingest_20M_snapshot", stages))
    finally:
        shutil.rmtree(d, ignore_errors=True)
    print()
    for name, stages in details:
        print(f"## {name} — stages with median >= {MEDIAN_FLOOR_MS:.0f}ms\n")
        print("| stage | name | tasks | median ms | max ms | raw ratio | class | verdict |")
        print("|---|---|---|---|---|---|---|---|")
        for s in sorted(stages, key=lambda s: -s["max_ms"])[:8]:
            print(
                f"| {s['stage']} | {s['name']} | {s['tasks']} | "
                f"{s['median_ms']} | {s['max_ms']} | {s['ratio']} | "
                f"{s['class']} | {s['verdict']} |"
            )
        print()
    # each gate reported under its own label (ADVICE r7: a narrow-heavy
    # failure previously printed under the straggler label)
    print(
        f"**Gate failures: {n_straggler} straggler (> {STRAGGLER_RATIO:.0f}x median) "
        f"+ {n_narrow} narrow-heavy (< width//2 tasks) "
        f"+ {n_superlinear} superlinear (task-time growth > {args.growth_gate:.0f}x at 10x input)**"
    )
    sys.exit(1 if n_straggler + n_narrow + n_superlinear else 0)


if __name__ == "__main__":
    main()
