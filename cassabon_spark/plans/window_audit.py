"""Detect single-task sort shapes in a physical plan string.

Round-5 lesson (VERDICT r5): exchange/BNLJ/Python/cartesian counts missed a
whole class of scale-killers — `row_number() OVER (ORDER BY ...)` (and
ntile over a low-cardinality partition key) plans as

    Window
    +- Sort
       +- Exchange SinglePartition

which funnels every ranked row through ONE task. `Exchange SinglePartition`
alone is NOT the signal: global aggregates legitimately plan a partial
aggregate followed by a SinglePartition final pass, and only pre-aggregated
(tiny) data crosses that exchange. The killer is a SinglePartition exchange
whose CONSUMER is a Sort (window or global sort without a limit): the full
input crosses it and is sorted in one task.

`audit_windows` works on `df._jdf.queryExecution().executedPlan().toString()`
(the final AQE plan — the same string tools/explain_audit.py audits) and
returns flag strings:

  * ``single-task-sort-window`` — SinglePartition exchange feeding a Sort
    (almost always under a Window; also catches a bare global sort that
    didn't become TakeOrderedAndProject).
  * ``lowcard-window(col,...)`` — a Window partitioned ONLY by columns from
    a known low-cardinality set (fixture columns like `lang`): at 100x each
    partition value's whole frame still flows through one task.

Used by tools/explain_audit.py (audit record column) and tests/test_rank.py
(the distributed-rank helper must never plan these shapes).
"""

from __future__ import annotations

import re

# fixture columns with a handful of distinct values: a window partitioned
# solely by these is a ~N/k single-task sort at scale
LOW_CARDINALITY_COLS = frozenset({"lang", "source", "label"})

_PASSTHROUGH = (
    "AQEShuffleRead",
    "ShuffleQueryStage",
    "ReusedQueryStage",
    "InputAdapter",
    "WholeStageCodegen",
    "ReusedExchange",
    "ColumnarToRow",
    "Coalesce",
)


def _node_start(line: str) -> int:
    """Column where the node text starts (tree depth proxy)."""
    m = re.search(r"[A-Za-z*]", line)
    return m.start() if m else len(line)


def _node_name(line: str) -> str:
    text = line[_node_start(line):]
    text = re.sub(r"^\*\(\d+\)\s*", "", text)  # codegen marker
    m = re.match(r"([A-Za-z][A-Za-z0-9]*)", text)
    return m.group(1) if m else ""


def _final_section(plan: str) -> str:
    return plan.split("== Initial Plan ==")[0]


def _ancestors(lines, idx):
    """Yield (name, line) for ancestors of lines[idx], nearest first."""
    depth = _node_start(lines[idx])
    for j in range(idx - 1, -1, -1):
        d = _node_start(lines[j])
        if d < depth and _node_name(lines[j]):
            yield _node_name(lines[j]), lines[j]
            depth = d


def single_task_sorts(plan: str) -> list[str]:
    """Lines proving a SinglePartition exchange feeds a Sort."""
    lines = _final_section(plan).splitlines()
    hits = []
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        for name, _aline in _ancestors(lines, i):
            if name in _PASSTHROUGH:
                continue
            if name == "Sort":
                hits.append(line.strip())
            break  # first meaningful consumer decides
    return hits


def lowcard_windows(plan: str) -> list[str]:
    """Window nodes partitioned only by known low-cardinality columns."""
    hits = []
    for line in _final_section(plan).splitlines():
        text = line[_node_start(line):]
        if not text.startswith("Window "):
            continue
        # Window [funcs...], [partition spec], [order spec]
        groups = _top_level_brackets(text)
        if len(groups) < 3:
            continue  # unpartitioned windows are caught by single_task_sorts
        part_cols = set(re.findall(r"([A-Za-z_][A-Za-z0-9_]*)#\d+", groups[-2]))
        if part_cols and part_cols <= LOW_CARDINALITY_COLS:
            hits.append(",".join(sorted(part_cols)))
    return hits


def _top_level_brackets(text: str) -> list[str]:
    """Top-level [...] groups of a node line (nesting-aware)."""
    groups, depth, start = [], 0, None
    for i, ch in enumerate(text):
        if ch == "[":
            if depth == 0:
                start = i
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth == 0 and start is not None:
                groups.append(text[start + 1 : i])
                start = None
    return groups


def audit_windows(plan: str) -> list[str]:
    """All window-scale flags for a final executed-plan string."""
    flags = []
    if single_task_sorts(plan):
        flags.append("single-task-sort-window")
    lc = lowcard_windows(plan)
    if lc:
        flags.append(f"lowcard-window({';'.join(sorted(set(lc)))})")
    return flags


# --------------------------------------------------- runtime detector (r7)
#
# VERDICT r6 #2: the static LOW_CARDINALITY_COLS set cannot see a window
# whose partition key is bounded BY CONSTRUCTION (e.g. anchors filtered to
# `vec_id < 8`): the column name carries no cardinality signal. But the
# audit harness EXECUTES every plan, so the executed plan carries the
# ground truth: for each Window, the shuffle that feeds it knows (a) how
# many rows actually crossed (shuffleRecordsWritten) and (b) how many
# reduce partitions are non-empty (MapOutputStatistics.bytesByPartitionId)
# — a hash-collision-tight lower bound on the partition key's distinct
# count. A window whose input is corpus-scale while only a handful of
# reduce partitions are non-empty sorts ~rows/groups rows per task with
# parallelism = #groups, no matter how wide the cluster: that is the
# bounded-anchor single-task-sort class, one level up.
#
# Windows already rewritten by Catalyst's InferWindowGroupLimit
# (SPARK-37099: `row_number()/rank() ... FILTER rnk <= k` plans a PARTIAL
# WindowGroupLimit below the exchange) pass automatically — only <= P*k
# rows per group cross the shuffle, so the rows threshold never trips.
# That rewrite IS the distributed two-phase top-k; this detector exists to
# catch the shapes Catalyst cannot rewrite (unfiltered ranks, dual rank
# windows over one frame, full-partition aggregation windows).
#
# Blind spot (documented): a window evaluated inside a localCheckpoint
# barrier (operators/rank.py) runs in its own query execution and is
# invisible to the final plan — those constructions are pinned by
# tests/test_rank.py instead.

_RUNTIME_PASSTHROUGH = frozenset(
    {
        "SortExec",
        "WindowGroupLimitExec",
        "WholeStageCodegenExec",
        "InputAdapter",
        "AQEShuffleReadExec",
        "CoalesceExec",
        "ColumnarToRowExec",
        "ProjectExec",
        "FilterExec",
    }
)


def _jwalk(node):
    """Yield every node of an executed SparkPlan, descending through AQE
    wrappers (AdaptiveSparkPlanExec.finalPhysicalPlan, QueryStageExec.plan)."""
    name = node.getClass().getSimpleName()
    yield node, name
    if name == "AdaptiveSparkPlanExec":
        yield from _jwalk(node.finalPhysicalPlan())
        return
    if name.endswith("QueryStageExec"):
        yield from _jwalk(node.plan())
        return
    for i in range(node.children().size()):
        yield from _jwalk(node.children().apply(i))


def _feeding_shuffle(window_node):
    """The ShuffleQueryStageExec feeding a Window through pass-through
    operators only, or None (broadcast-fed / checkpoint-fed windows)."""
    node = window_node
    while True:
        if node.children().size() != 1:
            return None
        node = node.children().apply(0)
        name = node.getClass().getSimpleName()
        if name == "ShuffleQueryStageExec":
            return node
        if name not in _RUNTIME_PASSTHROUGH:
            return None


def bounded_anchor_windows(
    df,
    rows_min: int = 1000,
    per_group_min: int = 250,
) -> list[str]:
    """Runtime bounded-anchor-window flags for an EXECUTED DataFrame.

    For each WindowExec in the final adaptive plan (WindowGroupLimitExec
    nodes are treated as pass-throughs — every group-limit shape Catalyst
    plans still has the WindowExec above it, which is the node inspected),
    reads the feeding shuffle's runtime statistics and flags

        bounded-anchor-window(<keys>;rows=R;groups~G)

    when the non-empty reduce-partition count G is at most a quarter of the
    shuffle width while R >= rows_min rows crossed and each group carries
    >= per_group_min rows: parallelism collapsed to G tasks on a
    corpus-scale input. Thresholds are calibrated for the sf0.001 audit
    scale (fixtures >= 500 rows; group-limited top-k shapes cross < 200).

    Must be called AFTER an action on df — map statistics and SQL metrics
    exist only post-execution.
    """
    jplan = df._jdf.queryExecution().executedPlan()
    flags: list[str] = []
    seen = set()
    for node, name in _jwalk(jplan):
        if name != "WindowExec":
            continue
        if node.partitionSpec().size() == 0:
            continue  # unpartitioned: single_task_sorts already covers it
        stage = _feeding_shuffle(node)
        if stage is None:
            continue
        sid = stage.id()
        ms = stage.mapStats()
        if not ms.isDefined():
            continue
        sizes = list(ms.get().bytesByPartitionId())
        width = len(sizes)
        groups = sum(1 for b in sizes if b > 0)
        ex = stage.plan()
        try:
            rows = int(ex.metrics().apply("shuffleRecordsWritten").value())
        except Exception:  # pragma: no cover - metric renamed upstream
            continue
        key = (sid, node.partitionSpec().toString())
        if key in seen:
            continue  # ReusedExchange: one physical shuffle, count once
        seen.add(key)
        if (
            groups > 0
            and groups <= max(2, width // 4)
            and rows >= rows_min
            and rows // groups >= per_group_min
        ):
            cols = re.findall(r"([A-Za-z_][A-Za-z0-9_]*)#\d+", node.partitionSpec().toString())
            flags.append(
                "bounded-anchor-window("
                f"{','.join(dict.fromkeys(cols))};rows={rows};groups~{groups})"
            )
    return flags
