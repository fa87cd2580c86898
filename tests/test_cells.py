"""two_level_cells (operators/cells.py) — the r8 two-level md5-pivot
quantizer that replaced the single-level corpus-scaled pivot assignment
(VERDICT r7 #2).

Pinned here: (a) parameter/modulus arithmetic and its scaling shape,
(b) exact agreement of the full hybrid flat/two-level assignment with an
independent numpy/hashlib replication (fixed frame AND a hypothesis
property over sizes/dims/probes/branches), (c) the every-vector-covered
invariant the sentinel + subset construction guarantees, (d) probe/carry/
rank_col semantics, and (e) the runtime bounded-anchor detector staying
clean on every registry entry r8 touched or added (VERDICT r7 #4: the r6
weak class must not land again).
"""

from __future__ import annotations

import hashlib
import math
import random

import pytest
from pyspark.sql import functions as F

from cassabon_spark.operators.cells import (
    CELL,
    KMIN,
    two_level_cells,
    two_level_params,
)


def _h48(s: str, prefix: str = "pvt:") -> int:
    return int(hashlib.md5((prefix + s).encode()).hexdigest()[:12], 16)


def test_two_level_params_shape():
    # tiny corpora: expected fine-pivot count stays ~KMIN
    for n in (1, 7, 16, 500, 2000):
        fmod, cmod = two_level_params(n)
        assert 1 <= fmod <= CELL
        assert cmod % fmod == 0
        if n >= KMIN:
            assert n / fmod >= KMIN - 1  # expected fine pivots >= ~KMIN
    # at scale: fmod pins to CELL, coarse count ~ sqrt(n/CELL)
    for n in (10**6, 10**8, 10**9):
        fmod, cmod = two_level_params(n)
        assert fmod == CELL
        k = math.ceil(n / CELL)
        assert cmod == CELL * int(math.sqrt(k))
        # the coarse broadcast stays bounded: ~sqrt(k) rows
        assert n / cmod <= math.sqrt(k) + 1


def _frame(spark, n, dim=8, seed=7):
    rng = random.Random(seed)
    rows = [
        (i * 3 + 1, [rng.uniform(-1, 1) for _ in range(dim)], i % 4)
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def _naive_cells(rows, coarse_probe, fine_probe, flat_max_k):
    """Pure-python replication: same hash moduli, same sentinel, same
    hybrid flat/two-level argmax with (cos DESC, pivot_id ASC) tie-break."""
    import numpy as np

    ids = [r[0] for r in rows]
    vecs = {r[0]: np.array(r[1], dtype=np.float32).astype(np.float64) for r in rows}
    n = len(ids)
    fmod, cmod = two_level_params(n)
    sid = min(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    fine = [i for i in ids if _h48(str(i)) % fmod == 0 or i == sid]
    coarse = [i for i in fine if _h48(str(i)) % cmod == 0 or i == sid]

    def cos(a, b):
        va, vb = vecs[a], vecs[b]
        return float(va @ vb) / (
            math.sqrt(float(va @ va)) * math.sqrt(float(vb @ vb))
        )

    def top(q, cands, k):
        return [
            p for _, p in sorted(((-cos(q, p), p) for p in cands))[:k]
        ]

    out = set()
    if math.ceil(n / fmod) <= flat_max_k:
        for v in ids:
            for p in top(v, fine, fine_probe):
                out.add((v, p))
        return out
    f2c = {f: top(f, coarse, 1)[0] for f in fine}
    for v in ids:
        probed = top(v, coarse, coarse_probe)
        cand = [f for f in fine if f2c[f] in probed]
        for p in top(v, cand, fine_probe):
            out.add((v, p))
    return out


@pytest.mark.parametrize("cp,fp,fmk", [(1, 1, 64), (2, 3, 64), (1, 1, 0), (2, 3, 0)])
def test_cells_match_naive_replication(spark, cp, fp, fmk):
    # fmk=64 exercises the flat branch at this frame size; fmk=0 forces
    # the two-level branch on the same frame
    df = _frame(spark, 300)
    got = {
        (r.vec_id, r.pivot_id)
        for r in two_level_cells(
            df, coarse_probe=cp, fine_probe=fp, flat_max_k=fmk
        ).collect()
    }
    assert got == _naive_cells(
        [(r.vec_id, r.embedding) for r in df.collect()], cp, fp, fmk
    )


def test_cells_cover_every_vector(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cells = two_level_cells(emb).collect()
    ids = {r.vec_id for r in emb.select("vec_id").collect()}
    # probe 1/1: exactly one row per vector — nothing dropped by the
    # coarse->fine equi-join (the sentinel/subset invariant), no dups
    assert sorted(r.vec_id for r in cells) == sorted(ids)
    assert all(r.pivot_id in ids for r in cells)
    assert all(r.vnrm > 0 for r in cells)


def test_cells_carry_and_probe_counts(spark):
    df = _frame(spark, 150)
    cells = two_level_cells(
        df, carry=("label",), coarse_probe=2, fine_probe=3
    ).collect()
    per_vec: dict[int, list] = {}
    for r in cells:
        per_vec.setdefault(r.vec_id, []).append(r.pivot_id)
    assert set(per_vec) == {r[0] for r in df.select("vec_id").collect()}
    for v, pivots in per_vec.items():
        assert 1 <= len(pivots) <= 3
        assert len(set(pivots)) == len(pivots)
    # carry column rides along with the right value (label = f(vec_id))
    assert all(r.label == ((r.vec_id - 1) // 3) % 4 for r in cells)


def test_cells_empty_frame(spark):
    df = _frame(spark, 10).filter(F.col("vec_id") < 0)
    got = two_level_cells(df, carry=("label",))
    assert got.count() == 0
    assert got.columns == ["vec_id", "embedding", "vnrm", "pivot_id", "label"]


@pytest.mark.parametrize(
    "entry",
    [
        "dedup_semdedup",
        "dedup_embedding_cosine",
        "pipeline_d4_prototype_prune",
        "similarity_ivf_2level",
        "sketch_hll_distinct",
        "pipeline_benchmark_decontam",
        "text_source_kl_drift",
        "pipeline_dedup_cascade",
        "pipeline_training_order",
        "sketch_hll_union",
        # r9-touched/added entries, same contract
        "dedup_threshold_ablation",
        "similarity_learned_coarse_recall",
        "sketch_kmv_jaccard",
        "sketch_kmv_distinct",
        "streaming_neardup_lsh",
        "streaming_neardup_incremental",
    ],
)
@pytest.mark.slow  # r15 tiering: 16 params x one full entry run ~= 4 min solo
def test_r8_entries_bounded_anchor_clean(spark, sf_dir, entry):
    # VERDICT r7 #4: the runtime detector as pytest-level CI for entries
    # touched each round (r8 list + r9 additions) — one cheap action each
    # at sf0.001
    from cassabon_spark.plans.window_audit import bounded_anchor_windows
    from cassabon_spark.queries import load_registry

    df = load_registry()[entry].fn(spark, sf_dir)
    df.collect()
    assert bounded_anchor_windows(df) == []


def test_ivf_2level_recall_vs_brute_force(spark, sf_dir):
    # the two-level ANN's top-5 must recall most of the brute-force top-5
    # (deterministic corpus + deterministic codebook => pinned number)
    from cassabon_spark.queries import load_registry

    reg = load_registry()
    truth = {
        (r.qid, r.cid)
        for r in reg["similarity_topk_cosine"].fn(spark, sf_dir).collect()
    }
    got = {
        (r.qid, r.cid)
        for r in reg["similarity_ivf_2level"].fn(spark, sf_dir).collect()
    }
    assert len(truth) == 25
    # Uniform-random 64-dim vectors have NO cluster structure, the worst
    # case for any cell-blocked ANN: md5-pivot cells are uncorrelated with
    # true neighborhoods, so recall here is the corpus's inherent ceiling,
    # not a quality bar. Measured: 9/25 at sf0.001 (hybrid flat path) —
    # identical to the fixed-codebook similarity_ivf_topk (9/25, k=16
    # nprobe=2) on the same corpus; the forced two-level path measured
    # 8/25. The pin guards the PLUMBING (blocking + probe wiring): a drop
    # to ~0 means probed cells stopped intersecting corpus cells.
    assert len(got & truth) >= 6


def test_cells_cte_two_level_branch_matches_duckdb(spark, sf_dir):
    # ADVICE r8 #2: at every shipped SF the hybrid resolves to the FLAT
    # branch (k_exp <= 64), so the registry's exact-oracle gate never
    # EXECUTES the CTE's coarse/f2c/v2c SQL — the "the two must change
    # together" invariant was CI-enforced only for the flat branch. Force
    # flat_max_k=0 on BOTH engines over the real sf0.001 embeddings and
    # compare (vec_id, pivot_id) sets, mirroring the naive-replication
    # test's fmk=0 rows but against the actual DuckDB twin.
    import duckdb

    from cassabon_spark.queries.extensions import _two_level_cells_cte

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet')"
    )
    sql = (
        f"WITH {_two_level_cells_cte(flat_max_k=0, coarse_probe=2, fine_probe=3)}\n"
        "SELECT vec_id, pivot_id FROM cells"
    )
    want = set(con.execute(sql).fetchall())
    con.close()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    got = {
        (r.vec_id, r.pivot_id)
        for r in two_level_cells(
            emb, coarse_probe=2, fine_probe=3, flat_max_k=0
        ).collect()
    }
    assert got == want and len(got) > 0


def test_cells_rank_col(spark):
    df = _frame(spark, 200)
    cells = two_level_cells(df, fine_probe=3, rank_col="frnk").collect()
    per_vec = {}
    for r in cells:
        per_vec.setdefault(r.vec_id, []).append(r.frnk)
    for ranks in per_vec.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    n=st.integers(min_value=1, max_value=140),
    dim=st.integers(min_value=2, max_value=8),
    cp=st.integers(min_value=1, max_value=2),
    fp=st.integers(min_value=1, max_value=3),
    fmk=st.sampled_from([0, 64]),
    seed=st.integers(min_value=0, max_value=10**6),
)
@pytest.mark.slow  # r15 tiering: property-vs-naive, ~14 s
def test_cells_property_matches_naive(spark, n, dim, cp, fp, fmk, seed):
    # property form of the fixed-frame replication test: ANY frame size
    # (including n < KMIN, where fmod clamps to 1 and every row is a
    # pivot), dimension, probe pair, hybrid branch, and id pattern must
    # agree exactly with the pure-python construction
    df = _frame(spark, n, dim=dim, seed=seed)
    got = {
        (r.vec_id, r.pivot_id)
        for r in two_level_cells(
            df, coarse_probe=cp, fine_probe=fp, flat_max_k=fmk
        ).collect()
    }
    assert got == _naive_cells(
        [(r.vec_id, r.embedding) for r in df.collect()], cp, fp, fmk
    )
