#!/usr/bin/env python
"""Plan audit: .explain("formatted") every headline query and summarize the
scale signals that matter at 100 TB — is the filter pushed to the scan, is
the projection pruned, how many exchanges (shuffles) does the plan pay, did
the small side broadcast, how much of the plan runs in whole-stage codegen.

Usage: python tools/explain_audit.py [--sf DIR] [--only name,name] [--full name]
  --full prints the entire formatted plan for one query.

This is the review loop the build rules ask for ("after each operator
works, explain the plan and iterate") in executable form.
"""

from __future__ import annotations

import argparse
import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cassabon_spark import get_spark  # noqa: E402
from cassabon_spark.plans.window_audit import (  # noqa: E402
    bounded_anchor_windows,
    lowcard_windows,
    single_task_sorts,
)
from cassabon_spark.queries import load_registry  # noqa: E402
from cassabon_spark.session import prep  # noqa: E402

# Documented window-flag adjudications (the no-pushdown discipline): the
# detector cannot statically see that a window's INPUT is bounded by
# construction. Each entry waives a COUNTED number of single-task sort
# sites, and the flag still prints (prefixed `adjudicated:`) — so a plan
# change that introduces an ADDITIONAL single-task sort window in one of
# these entries exceeds its budget and surfaces as a raw flag (the
# adjudication is per-site-count, not per-entry silence).
ADJUDICATED_SINGLE_TASK_SORTS = {
    # window input is one row per SOURCE (post-aggregation, config-scale)
    "pipeline_token_budget_mix": 1,
    # window input is one row per DECILE (exactly 10 rows)
    "pipeline_quality_prune_curve": 1,
    # the <=514-row sketch quantile walk, which the plan materializes
    # twice (est-bound branch + rows-below verification branch) — the
    # count-based waiver surfaced the second site the r6 prefix-match
    # waiver had been masking; both verified bounded by construction
    "sketch_range_bounds": 2,
}

# r7 (VERDICT r6 #2): runtime bounded-anchor-window adjudications, same
# per-site-count budget discipline. The runtime detector reads the feeding
# shuffle's actual row/partition stats, so a waiver here asserts the SHAPE
# is accepted (documented why), not that the detector misread the plan.
ADJUDICATED_BOUNDED_ANCHOR = {
    # r10: the SQ8 candidate scan's top-R window (R=32, anchor = the
    # 5-query eval set). The plan carries the same map-side
    # WindowGroupLimit partial as every other per-query top-k entry
    # (verified: the entry's exact-truth window with K=5 prunes 2495 ->
    # 800 crossing rows in the SAME run), but R=32 exceeds the per-
    # (partition, query) row count at audit scale (~16), so the partial
    # keeps everything and the full 2495 rows cross — no exact top-32
    # could cross fewer. At corpus scale crossing is bounded by
    # R x |Q| x map_partitions with |Q|-parallel reduce, the accepted
    # shape of the whole ANN family; the flag is the R/K calibration
    # artifact, not a missing group limit.
    "similarity_ann_rerank": 1,
}

HEADLINE = [
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier_volume",
    "win_topk_per_group", "agg_rollup", "asof_join_last_order", "sessionize_30m",
    "carbon_rollup_tumbling_1h", "carbon_multi_tier_fanout", "carbon_read_gapfill",
    "dedup_minhash_lsh", "dedup_simhash", "similarity_topk_cosine",
    "similarity_ann_lsh", "text_quality_score", "text_bpe_token_count",
    "q6_forecast_revenue",
    # r4: keep the audit list in lockstep with bench.py's headline set
    "similarity_ivfpq_adc", "dedup_semdedup", "dedup_cross_corpus",
    "text_bm25_search", "streaming_neardup_lsh",
]


def formatted_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def executed_plan(df) -> str:
    """Run the query and return the FINAL adaptive plan — pre-execution
    explain under AQE shows the initial plan with no codegen markers and
    un-replanned joins; only the executed plan tells the truth. Must be
    df.collect(), not count(): count() wraps the plan in a new query
    execution and leaves THIS DataFrame's plan un-finalized."""
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def audit(plan: str) -> dict:
    # the executed-plan string repeats the tree under "== Initial Plan ==";
    # audit only the final section
    final = plan.split("== Initial Plan ==")[0]
    scans = re.findall(r"Scan parquet|FileScan parquet", final)
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", final)
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", final)
    return {
        "exchanges": len(re.findall(r"\bExchange\b", final)),
        "scans": len(scans),
        "scans_with_pushdown": sum(1 for p in pushed if p.strip()),
        "read_cols": sum(s.count(":") for s in schemas),
        "bhj": len(re.findall(r"BroadcastHashJoin", final)),
        "smj": len(re.findall(r"SortMergeJoin", final)),
        "bnlj": len(re.findall(r"BroadcastNestedLoopJoin", final)),
        "codegen_spans": len(set(re.findall(r"\*\((\d+)\)", final))),
        "python_nodes": len(re.findall(r"ArrowEvalPython|BatchEvalPython|MapInPandas|FlatMapGroupsInPandas", final)),
        "cartesian": len(re.findall(r"CartesianProduct", final)),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    ap.add_argument("--full", default=None)
    ap.add_argument(
        "--all",
        action="store_true",
        help="audit EVERY registered entry (one executed run each) — the "
        "registry-wide window-flag sweep; run at sf0.001 for speed",
    )
    args = ap.parse_args()

    registry = load_registry()
    spark = get_spark(app_name="explain-audit")
    spark.sparkContext.setLogLevel("ERROR")
    prep(spark)

    if args.full:
        print(formatted_plan(registry[args.full].fn(spark, args.sf)))
        return

    if args.all:
        names = sorted(registry)
    else:
        names = args.only.split(",") if args.only else HEADLINE
    cols = ["exchanges", "scans", "scans_with_pushdown", "read_cols",
            "bhj", "smj", "bnlj", "codegen_spans", "python_nodes", "cartesian"]
    print(f"{'query':32} " + " ".join(f"{c:>9}" for c in cols))
    for name in names:
        try:
            df = registry[name].fn(spark, args.sf)
            plan = executed_plan(df)
            a = audit(plan)
            flags = []
            if a["cartesian"]:
                flags.append("CARTESIAN!")
            if a["scans"] and a["scans_with_pushdown"] == 0 and "carbon" not in name:
                flags.append("no-pushdown")
            # r6 (VERDICT r5 #2): single-task / low-cardinality sort
            # windows — the scale-killer class the exchange/BNLJ counts
            # missed in round 5. Adjudications are site-COUNT budgets: a
            # regression that adds a second single-task sort to a waived
            # entry exceeds the budget and prints as a raw flag.
            hits = single_task_sorts(plan)
            if hits:
                budget = ADJUDICATED_SINGLE_TASK_SORTS.get(name, 0)
                if len(hits) <= budget:
                    flags.append(
                        f"adjudicated:single-task-sort-window(x{len(hits)})"
                    )
                else:
                    flags.append(f"single-task-sort-window(x{len(hits)})")
            lc = lowcard_windows(plan)
            if lc:
                flags.append(f"lowcard-window({';'.join(sorted(set(lc)))})")
            # r7: runtime bounded-anchor check — reads the executed plan's
            # shuffle map stats, so it sees cardinality the static
            # detectors cannot (anchors bounded by construction)
            ba = bounded_anchor_windows(df)
            if ba:
                budget = ADJUDICATED_BOUNDED_ANCHOR.get(name, 0)
                if len(ba) <= budget:
                    # mirror the single-task rendering (ADVICE r7): a
                    # count, so budget status is unambiguous per entry
                    flags.append(f"adjudicated:bounded-anchor-window(x{len(ba)})")
                else:
                    # over budget: every flag prints raw (none is waived —
                    # site budgets are all-or-nothing, like single-task)
                    flags.extend(ba)
            print(
                f"{name:32} " + " ".join(f"{a[c]:>9}" for c in cols)
                + ("  " + ",".join(flags) if flags else "")
            )
        except Exception as e:  # noqa: BLE001
            print(f"{name:32} ERROR {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
