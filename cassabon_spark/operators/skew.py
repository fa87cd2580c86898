"""Skew mitigation: salted two-phase aggregation.

Hot keys are the reference's unsolved problem (its Pearson-hash sharding
sends every row of a hot path to ONE peer, listener/peerlist.go:113-120 —
the node just melts). Spark-side, joins get AQE skew-join splitting for free
(session default `spark.sql.adaptive.skewJoin.enabled`), but a skewed
AGGREGATION key still funnels one reducer. `salted_agg` is the standard fix:

  phase 1: groupBy(keys + salt) — the hot key's rows spread over `n_salt`
           reducers, each producing a partial row
  phase 2: groupBy(keys) over the (tiny) partials — combines at most
           n_salt rows per key

Only decomposable aggregates are offered (sum/count/min/max, avg as
sum+count): exactly the set whose partial+final split is lossless. Catalyst
already does map-side partial aggregation, which absorbs MODERATE skew; the
salt matters when one key's post-map-side volume still swamps a single
reducer (billions of identical keys at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# name -> (phase-1 partial fn, phase-2 combine fn)
_DECOMPOSABLE = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salt: int = 32,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    aggs: output_name -> (input_col, fn) with fn in sum/count/min/max/avg.
    The salt is a deterministic spread — pmod over a per-row hash of the
    whole row — so replays produce identical partials (no rand(): keeps the
    operator usable in checkpoint-replayed streaming batches).
    """
    partials: list = []
    finals: list = []
    for name, (col, fn) in aggs.items():
        if fn == "avg":
            partials += [F.sum(col).alias(f"__s_{name}"), F.count(col).alias(f"__c_{name}")]
            finals.append(
                (F.sum(f"__s_{name}") / F.sum(f"__c_{name}")).alias(name)
            )
        elif fn in _DECOMPOSABLE:
            part, comb = _DECOMPOSABLE[fn]
            partials.append(part(col).alias(f"__p_{name}"))
            finals.append(comb(f"__p_{name}").alias(name))
        else:
            raise ValueError(f"{fn!r} is not decomposable; use groupBy().agg()")
    salt = F.pmod(F.hash(*df.columns), F.lit(n_salt)).alias("__salt")
    phase1 = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(*partials)
    return phase1.groupBy(*keys).agg(*finals)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_salt_col: str,
    cap: int = 64,
    n_cells: int = 16,
) -> DataFrame:
    """Skew-safe inner equi-join of two DISTINCT frames on `keys`, guarding
    OUTPUT-volume skew (the two-sided sibling of `salted_self_pairs`): a
    bucket whose match volume n_left x n_right exceeds cap^2 is grid-split
    — its left rows keep one cell (hash of `left_salt_col`), its right
    rows replicate across all `n_cells` cells — so no single task owns a
    hot key's cross-product tail. AQE skew-join cannot catch this class:
    the skew is in OUTPUT rows, not input partition bytes (a dup-farm
    content key is a few KB of input exploding into millions of pairs).

    The bucket-volume probe is lazy aggregations feeding a broadcast in
    the SAME query (no separate driver action); when nothing exceeds the
    cap the plan degenerates to the plain join plus the probe stage.
    Non-key columns of the two sides must be disjoint. Deterministic
    (hash salt, no rand()), so checkpoint-replayed streaming batches
    recompute identical partials. Output: keys once + both sides' payload
    columns, each matched pair exactly once.
    """
    sz_l = left.groupBy(*keys).agg(F.count(F.lit(1)).alias("__nl"))
    sz_r = right.groupBy(*keys).agg(F.count(F.lit(1)).alias("__nr"))
    big = (
        sz_l.join(sz_r, keys)
        .filter(F.col("__nl") * F.col("__nr") > cap * cap)
        .select(*keys)
        .withColumn("__big", F.lit(True))
    )
    salt = F.pmod(F.xxhash64(left_salt_col), F.lit(n_cells)).cast("int")
    lt = (
        left.join(F.broadcast(big), keys, "left")
        .withColumn("__cell", F.when(F.col("__big"), salt).otherwise(F.lit(0)))
        .drop("__big")
    )
    cells = F.when(
        F.col("__big"), F.sequence(F.lit(0), F.lit(n_cells - 1))
    ).otherwise(F.array(F.lit(0)))
    rt = (
        right.join(F.broadcast(big), keys, "left")
        .withColumn("__cell", F.explode(cells))
        .drop("__big")
    )
    # explicit width pin: quadratic-in-COMPUTE stages get AQE-coalesced by
    # BYTES otherwise (the salted_self_pairs lesson, SCALE_r06/r08)
    n_parts = int(left.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    lt = lt.repartition(n_parts, "__cell", *keys)
    rt = rt.repartition(n_parts, "__cell", *keys)
    return lt.join(rt, [*keys, "__cell"]).drop("__cell")


def salted_self_pairs(
    df: DataFrame,
    keys: list[str],
    id_col: str,
    cap: int = 64,
    n_cells: int = 16,
    pair_cond=None,
    unique_pairs: bool = False,
    extra=None,
) -> DataFrame:
    """All intra-bucket id pairs (id1 < id2) of a self-join on `keys`,
    skew-safe: buckets larger than `cap` are grid-split so no single task
    owns a degenerate bucket's quadratic pair tail.

    The failure mode this guards (VERDICT r1 #6): an LSH band join where
    thousands of identical documents share one (band, key) — the bucket's
    n^2/2 output pairs are REAL candidates (can't be dropped without
    changing semantics), but a plain self-join computes them all in the one
    task that owns the hot key. AQE skew-join won't split it: the skew is
    in output volume, not input partition bytes.

    Scheme: left side keeps one cell per row (its salt); right side of BIG
    buckets replicates across all `n_cells` cells. A pair (x, y) matches
    exactly where cell == salt(x), so each pair appears ONCE PER BUCKET and
    each task computes ~(n/n_cells) x n of the bucket instead of n x n.
    Small buckets pay an explode of a 1-element array.

    The bucket-size probe is NOT a separate driver action (VERDICT r2 #2:
    the r2 `isEmpty()` pre-job both cost a job and threw its work away) —
    `big` is a lazy aggregation feeding a broadcast join in the SAME query,
    so Spark schedules it as one more stage of the main job. When nothing
    exceeds `cap`, `big` is empty and the plan degenerates to the plain
    self-join plus one broadcast probe.

    Pair dedup: a pair sharing k buckets surfaces k times. By default the
    output is `.distinct()`-ed (a shuffle of the pair stream). Callers that
    can decide "is THIS bucket the pair's first match?" row-locally (e.g.
    LSH banding where each row carries the full band-key array) should pass
    `pair_cond` — an extra join predicate over aliases `a`/`b` (sides keep
    all input columns plus `__cell`) — and set `unique_pairs=True` to skip
    the distinct-shuffle entirely.

    Output: (id1, id2) pairs, plus any `extra` columns — aliased Column
    expressions over the `a`/`b` sides (e.g. the joined payloads a pairwise
    verifier needs, saving a re-join by id downstream). Deterministic
    (hash salt, no rand). `extra` with unique_pairs=False is rejected: the
    pair-stream distinct dedups on (id1, id2) only and would pick an
    arbitrary bucket's payload.
    """
    if extra and not unique_pairs:
        raise ValueError("extra columns require unique_pairs=True")
    sizes = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("__n"))
    big = (
        sizes.filter(F.col("__n") > cap)
        .select(*keys)
        .withColumn("__big", F.lit(True))
    )
    tagged = df.join(F.broadcast(big), keys, "left")
    salt = F.pmod(F.xxhash64(id_col), F.lit(n_cells)).cast("int")
    left = tagged.withColumn(
        "__cell", F.when(F.col("__big"), salt).otherwise(F.lit(0))
    ).drop("__big")
    cells = F.when(
        F.col("__big"), F.sequence(F.lit(0), F.lit(n_cells - 1))
    ).otherwise(F.array(F.lit(0)))
    right = tagged.withColumn("__cell", F.explode(cells)).drop("__big")
    # pin the pair-stage width with EXPLICIT (user-specified) repartitions
    # on the join keys: the inputs are small in BYTES but the stage is
    # quadratic in COMPUTE (pairs emitted per row x per-pair fold), and
    # AQE coalesces by bytes — measured on dedup_semdedup at the 10x
    # stress, the ~6 MB cells frame was coalesced to 5 tasks on some runs
    # (run-to-run stat jitter around the advisory size), turning a ~6 s
    # 30-task stage into a ~27 s 5-task one (SCALE_r06.md). A
    # user-specified partition count is exempt from AQE coalescing, and
    # if one side still broadcasts, the probe side keeps this width.
    n_parts = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    left = left.repartition(n_parts, "__cell", *keys)
    right = right.repartition(n_parts, "__cell", *keys)
    a, b = left.alias("a"), right.alias("b")
    cond = (F.col("a.__cell") == F.col("b.__cell")) & (
        F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    )
    for k in keys:
        cond = cond & (F.col(f"a.{k}") == F.col(f"b.{k}"))
    if pair_cond is not None:
        cond = cond & pair_cond
    out = a.join(b, cond).select(
        F.col(f"a.{id_col}").alias("id1"),
        F.col(f"b.{id_col}").alias("id2"),
        *(extra or []),
    )
    return out if unique_pairs else out.distinct()
