"""Distributed exact ranking — ROW_NUMBER / NTILE without a single-task sort.

A plain `row_number() OVER (ORDER BY ...)` (or one partitioned by a
low-cardinality column like `lang`) forces every ranked row through ONE
task: Spark plans `Exchange SinglePartition -> Sort -> Window`. Correct at
sf0.1, a driver-sized straggler at 100 TB. These helpers compute the exact
same rank with the classic distributed construction:

  1. `repartitionByRange(P, groups..., order...)` — rows land in P ordered
     range buckets (group columns lead, so each group occupies a contiguous
     run of buckets). P is EXPLICIT (spark.sql.shuffle.partitions), which
     marks the exchange user-specified so AQE neither coalesces nor
     skew-splits it — the partition index is then a stable function of this
     one exchange.
  2. `spark_partition_id()` is materialized as a data column immediately
     after the range exchange. Every downstream branch sees the same pid
     VALUES even if AQE plans the branches' reads differently, because the
     id is row data from step 1, not a per-read partition index.
  3. A window partitioned by (pid, groups...) ranks each bucket locally —
     P parallel sorts of ~N/P rows each, never a global sort.
  4. Bucket offsets (how many rows of the same group sit in lower-pid
     buckets) come from a tiny per-(pid, group) count frame — at most
     P + #groups rows — combined with a broadcast triangular join, NOT a
     window, so the offset computation itself never plans an unpartitioned
     sort window either. global rank = local rank + bucket offset.

Correctness requires the range exchange to be computed ONCE: the count
branch and the rank branch must see the SAME row->pid assignment (range
boundaries are sampled per execution) and the same upstream float values
(aggregate sums re-associate per execution). Catalyst's ReuseExchange is
NOT a reliable guarantee here — measured on pipeline_dsir_select, the
branches planned three independent range exchanges and the keep flag
flipped run-to-run at a rounding boundary. The helper therefore pins the
post-exchange frame with an eager `localCheckpoint()`: one materialization
(disk-backed, comparable to the shuffle write it sits on), after which
every branch reads frozen rows. `tests/test_rank.py` pins equality against
the naive single-task window across shapes and seeds.

Used by `pipeline_dsir_select` (global top-25% cut) and
`pipeline_ccnet_buckets` (per-lang NTILE(3)) in queries/extensions.py —
the round-5 audit flagged both as single-task window shapes.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["distributed_row_number", "distributed_prefix_sum", "ntile_from_rank"]

_PID = "__dr_pid"
_LRNK = "__dr_lrnk"
_CNT = "__dr_c"
_OFF = "__dr_off"


def distributed_row_number(
    df,
    order_cols,
    partition_cols=(),
    rank_col="rnk",
    total_col=None,
    reliable=False,
):
    """Exact ``ROW_NUMBER() OVER (PARTITION BY partition_cols ORDER BY
    order_cols)`` (and optionally ``COUNT(*) OVER (PARTITION BY
    partition_cols)`` as *total_col*) computed with P parallel sorts
    instead of one single-task global sort window.

    order_cols: list of Column expressions (may carry asc/desc); the
        composite (partition_cols, order_cols) ordering must be a total
        order over df's rows (include a unique tiebreak column) and the
        ordering keys must be non-null — the range partitioner and the
        local sort must agree on placement.
    partition_cols: string column names to rank within (e.g. ["lang"]).
        NULL group keys are ranked like any other group (a naive window
        would too): the offsets and total joins are null-safe (ADVICE r6 —
        a null-unsafe equi-join silently DROPPED null-keyed rows).

    Fault tolerance: the pid barrier is `localCheckpoint` — executor-local
    blocks, NOT a reliable checkpoint. On a long-running cluster job,
    losing an executor after the barrier materializes makes those
    partitions unrecoverable and fails the JOB (Spark does not recompute
    truncated lineage); the driver-side retry then recomputes from source.
    That trade is deliberate: the barrier exists for plan determinism, and
    a reliable `checkpoint()` would add a full write to the checkpoint dir
    on EVERY call. Callers that prefer surviving executor loss over the
    extra IO can pass reliable=True (requires
    `spark.sparkContext.setCheckpointDir(...)`).

    Returns df plus rank_col (int, 1-based) and, if requested, total_col
    (bigint rows in the row's partition group). Row order of the result is
    unspecified, as with any window.
    """
    pcols = list(partition_cols)
    order_cols = list(order_cols)
    spark = df.sparkSession
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))

    # 1+2. explicit-P range exchange, pid captured as data right after it,
    # then FROZEN: the offsets branch and the rank branch below must see
    # the identical row->pid assignment and upstream float values, and
    # exchange reuse does not reliably deduplicate the range exchange
    # across a broadcast boundary (see module docstring)
    ranged = df.repartitionByRange(n_parts, *[F.asc(c) for c in pcols], *order_cols)
    ranged = _pid_barrier(ranged, reliable)

    # 3. local rank: each (range bucket x group) chunk sorts in its own task
    w_local = Window.partitionBy(_PID, *pcols).orderBy(*order_cols)
    local = ranged.withColumn(_LRNK, F.row_number().over(w_local))

    # 4. tiny offsets frame: <= P + #groups rows; triangular broadcast join
    # (no window) accumulates lower-pid counts per group
    cnts = ranged.groupBy(_PID, *pcols).agg(F.count(F.lit(1)).alias(_CNT))
    a, b = cnts.alias("a"), cnts.alias("b")
    tri = [F.col(f"b.{_PID}") < F.col(f"a.{_PID}")]
    same_group = [F.col(f"a.{c}").eqNullSafe(F.col(f"b.{c}")) for c in pcols]
    cond = _and_all(same_group + tri)
    joined = a.join(F.broadcast(b), on=cond, how="left")
    group_keys = [F.col(f"a.{_PID}").alias(_PID)] + [
        F.col(f"a.{c}").alias(c) for c in pcols
    ]
    offs = joined.groupBy(*group_keys).agg(
        F.coalesce(F.sum(F.col(f"b.{_CNT}")), F.lit(0)).alias(_OFF)
    )

    # bigint: an int rank would silently wrap past 2^31 ranked rows —
    # exactly the corpus-wide regime this helper exists for
    out = _nullsafe_bjoin(local, offs, pcols).withColumn(
        rank_col, (F.col(_LRNK) + F.col(_OFF)).cast("bigint")
    )

    if total_col is not None:
        if pcols:
            tot = cnts.groupBy(*pcols).agg(
                F.sum(_CNT).cast("bigint").alias(total_col)
            )
            out = _nullsafe_bjoin(out, tot, pcols, on_pid=False)
        else:
            tot = cnts.agg(F.sum(_CNT).cast("bigint").alias(total_col))
            out = out.crossJoin(F.broadcast(tot))  # one-row envelope

    return out.drop(_PID, _LRNK, _OFF)


def distributed_prefix_sum(
    df,
    order_cols,
    value_col,
    partition_cols=(),
    out_col="prefix_sum",
    reliable=False,
):
    """Exact ``SUM(value) OVER (PARTITION BY partition_cols ORDER BY
    order_cols ROWS UNBOUNDED PRECEDING)`` — the running total — computed
    with P parallel local cumsums plus tiny per-bucket offsets, never a
    single-task (or low-cardinality-partitioned) ordered window.

    Same construction and caveats as distributed_row_number (total order
    required, non-null keys, pid frozen by the localCheckpoint barrier);
    value_col should be integral or lattice-quantized — the offset
    addition re-associates the sum across buckets, which is exact for
    ints and last-ulp-stable for quantized doubles.

    Used by pipeline_sequence_packing (per-lang token prefix sums: at
    100x a per-lang window funnels each language's whole corpus through
    one task — the r6 registry-wide audit caught it).
    """
    pcols = list(partition_cols)
    order_cols = list(order_cols)
    spark = df.sparkSession
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))

    ranged = df.repartitionByRange(n_parts, *[F.asc(c) for c in pcols], *order_cols)
    ranged = _pid_barrier(ranged, reliable)

    w_local = (
        Window.partitionBy(_PID, *pcols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = ranged.withColumn("__dr_lsum", F.sum(value_col).over(w_local))

    cnts = ranged.groupBy(_PID, *pcols).agg(F.sum(value_col).alias(_CNT))
    a, b = cnts.alias("a"), cnts.alias("b")
    tri = [F.col(f"b.{_PID}") < F.col(f"a.{_PID}")]
    same_group = [F.col(f"a.{c}").eqNullSafe(F.col(f"b.{c}")) for c in pcols]
    joined = a.join(F.broadcast(b), on=_and_all(same_group + tri), how="left")
    group_keys = [F.col(f"a.{_PID}").alias(_PID)] + [
        F.col(f"a.{c}").alias(c) for c in pcols
    ]
    offs = joined.groupBy(*group_keys).agg(
        F.coalesce(F.sum(F.col(f"b.{_CNT}")), F.lit(0)).alias(_OFF)
    )
    out = _nullsafe_bjoin(local, offs, pcols).withColumn(
        out_col, F.col("__dr_lsum") + F.col(_OFF)
    )
    return out.drop(_PID, "__dr_lsum", _OFF)


def _and_all(conds):
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


def _pid_barrier(ranged, reliable):
    """Materialize the range exchange and freeze the partition id as data.

    localCheckpoint (default) is executor-local: cheap, but an executor
    loss afterwards fails the job (driver retry recomputes from source).
    reliable=True writes to the configured checkpoint dir instead —
    survives executor loss at the cost of a full extra write per call."""
    ranged = ranged.withColumn(_PID, F.spark_partition_id())
    if reliable:
        # fail fast with a clear message (ADVICE r7): df.checkpoint()
        # without a configured dir otherwise surfaces as a deep Spark
        # exception in the middle of the job
        if ranged.sparkSession.sparkContext.getCheckpointDir() is None:
            raise ValueError(
                "reliable=True requires a reliable checkpoint directory: "
                "call spark.sparkContext.setCheckpointDir(<hdfs/dbfs path>) "
                "first, or use the default reliable=False (localCheckpoint)"
            )
        return ranged.checkpoint(eager=True)
    return ranged.localCheckpoint(eager=True)


def _nullsafe_bjoin(big, small, pcols, on_pid=True):
    """Broadcast-join `small` onto `big` on ([pid] +) pcols with NULL-SAFE
    group-key equality, so NULL group keys are ranked like any other group
    instead of silently dropping out of a null-unsafe equi-join (ADVICE
    r6). `small`'s join key columns are renamed and dropped after the join;
    its payload columns survive."""
    keys = ([_PID] if on_pid else []) + list(pcols)
    renames = {c: f"__dr_k{i}" for i, c in enumerate(keys)}
    small_r = small.select(
        *[F.col(c).alias(renames[c]) for c in keys],
        *[F.col(c) for c in small.columns if c not in keys],
    )
    conds = []
    for c in keys:
        lhs, rhs = F.col(c), F.col(renames[c])
        conds.append(lhs == rhs if c == _PID else lhs.eqNullSafe(rhs))
    return big.join(F.broadcast(small_r), _and_all(conds)).drop(
        *renames.values()
    )


def ntile_from_rank(rank_col, total_col, n):
    """SQL NTILE(n) reconstructed from an exact rank + partition total:
    with q, r = divmod(total, n), the first r buckets hold q+1 rows and
    the rest hold q — identical tie/cardinality semantics to the engines'
    NTILE over the same ordering (DuckDB + Spark both implement the SQL
    standard equal-height-with-leading-remainder rule).

    Returns a Column (1-based bucket id, int).
    """
    rnk = F.col(rank_col) if isinstance(rank_col, str) else rank_col
    tot = F.col(total_col) if isinstance(total_col, str) else total_col
    q = F.floor(tot / n)
    r = tot - q * n  # tot % n
    big = q + 1  # size of the first r buckets
    lead = r * big  # rows covered by the oversized buckets
    return (
        F.when(q == 0, rnk)  # fewer rows than buckets: one row per bucket
        .when(rnk <= lead, F.ceil(rnk / big))
        .otherwise(r + F.ceil((rnk - lead) / q))
        .cast("int")
    )
