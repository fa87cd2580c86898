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
