"""Property tests for the r9 sketch production helpers
(operators/sketch.py) — the hypothesis side of tests/test_sketch_helpers
.py's concrete merge-law pins.

Laws fuzzed here:
  - kmv_bottom_k == sorted(set(h))[:k] (the definition, against a pure
    Python replication, including across shards);
  - kmv_jaccard_cols is EXACT when both sketches are untruncated
    (|A|, |B| <= k => the union bottom-k is the whole union and the
    estimate is literally |A ∩ B| / |A ∪ B|), and always in [0, 1] with
    sketch_k <= k under truncation;
  - hll_registers emits idx in [0, m) and rho in [1, 41], and the
    estimate is positive and finite for any nonempty input.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

import pytest

from cassabon_spark.operators.sketch import (
    HLL_M,
    hll_estimate,
    hll_registers,
    kmv_bottom_k,
    kmv_jaccard_cols,
)


# r15 test tiering (VERDICT r14 #2): sketch property/bounds suite (sketch
# entries stay oracle-covered). Excluded from the default verify tier;
# run with -m slow.
pytestmark = pytest.mark.slow

_hashes = st.sets(st.integers(min_value=0, max_value=2**47 - 1), min_size=1, max_size=60)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(a=_hashes, salts=st.integers(min_value=1, max_value=5))
def test_kmv_bottom_k_is_sorted_distinct_prefix(spark, a, salts):
    k = 16
    df = spark.createDataFrame([(h,) for h in a], "h bigint")
    got = kmv_bottom_k(df, [], k=k, n_salts=salts).collect()[0].bk
    assert got == sorted(a)[:k]


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(a=_hashes, b=_hashes)
def test_kmv_jaccard_exact_when_untruncated(spark, a, b):
    k = 128  # both sets <= 60 elements: sketches are the full sets
    row = spark.createDataFrame(
        [(sorted(a), sorted(b))], "bka array<bigint>, bkb array<bigint>"
    )
    got = row.select(*kmv_jaccard_cols(F.col("bka"), F.col("bkb"), k=k)).collect()[0]
    inter = len(a & b)
    union = len(a | b)
    assert got.sketch_k == union
    assert got.overlap == inter
    assert abs(got.est_jaccard - inter / union) < 1e-12


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(a=_hashes, b=_hashes)
def test_kmv_jaccard_bounds_under_truncation(spark, a, b):
    k = 8  # force truncation
    row = spark.createDataFrame(
        [(sorted(a)[:k], sorted(b)[:k])], "bka array<bigint>, bkb array<bigint>"
    )
    got = row.select(*kmv_jaccard_cols(F.col("bka"), F.col("bkb"), k=k)).collect()[0]
    assert 1 <= got.sketch_k <= k
    assert 0 <= got.overlap <= got.sketch_k
    assert 0.0 <= got.est_jaccard <= 1.0


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(vals=st.lists(st.text(min_size=1, max_size=12), min_size=1, max_size=40))
def test_hll_register_bounds_and_estimate(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], "tok string")
    reg = hll_registers(df, [], "tok").collect()
    assert 0 < len(reg) <= min(HLL_M, len(set(vals)))
    for r in reg:
        assert 0 <= r.idx < HLL_M
        assert 1 <= r.m <= 41
    est = hll_estimate(hll_registers(df, [], "tok"), []).collect()[0]
    assert est.nz_registers == len(reg)
    assert est.hll_estimate > 0.0
