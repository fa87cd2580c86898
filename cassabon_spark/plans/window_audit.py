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
