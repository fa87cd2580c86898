"""two_level_cells_learned (operators/cells.py, r9 — VERDICT r8 #3):
the learned-coarse variant of the two-level quantizer (coarse = sampled
KMeans centroids, fine = the same hash-modulo pivots).

The uniform testdata embeddings cap ANY cell-blocked ANN at ~chance
(measured 9/25 in test_cells.py), so the recall story needs a CLUSTERED
fixture: 20k vectors in 16 well-separated clusters (centroid +
0.25*noise, within-cluster cosine ~0.94, cross ~0), ABOVE the FLAT_MAX_K
threshold (k_exp = ceil(20000/256) = 79 > 64) so the genuine two-level
path runs in both variants — n_coarse = floor(sqrt(79)) = 8 coarse
cells, deliberately FEWER than the 16 true clusters (the production
regime: codebook below the data's mode count; learned centers adapt by
holding ~2 whole clusters per cell, random coarse pivots cover only ~half
the clusters).

Pinned: (a) recall@5 of learned-coarse ANN beats hash-coarse at EQUAL
probe budget (coarse_probe=1, fine_probe=3) by a real margin — measured
0.940 vs 0.752 on this fixture; at coarse_probe=2 the gap closes (0.936
vs 0.924: dot-product blocking is itself LSH-like, a second probe
recovers correlated routings — same lesson as the
similarity_learned_coarse_recall entry), (b) the learned variant keeps
the output contract (columns, every-vector cover, probe counts), (c)
degenerate inputs fall back cleanly.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from cassabon_spark.functions.vectors import dot_expr
from cassabon_spark.operators.cells import (
    two_level_cells,
    two_level_cells_learned,
    two_level_params,
)

N = 20_000
DIM = 16
K_CLUSTERS = 16
EPS = 0.25
N_QUERIES = 50


@pytest.fixture(scope="module")
def clustered(spark):
    rng = np.random.default_rng(1234)
    cent = rng.standard_normal((K_CLUSTERS, DIM))
    cent /= np.linalg.norm(cent, axis=1, keepdims=True)
    cl = rng.integers(0, K_CLUSTERS, size=N)
    noise = rng.standard_normal((N, DIM))
    noise /= np.linalg.norm(noise, axis=1, keepdims=True)
    vecs = (cent[cl] + EPS * noise).astype(np.float64)
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in vecs[i]]) for i in range(N)],
        "vec_id long, embedding array<double>",
    ).cache()
    df.count()
    # brute-force top-5 truth for the first N_QUERIES ids (numpy — the
    # fixture is driver-built anyway; margins are far above float jitter)
    sims = vecs[:N_QUERIES] @ vecs.T
    nrm = np.linalg.norm(vecs, axis=1)
    sims = sims / (nrm[:N_QUERIES, None] * nrm[None, :])
    truth = set()
    for q in range(N_QUERIES):
        sims[q, q] = -2.0  # exclude self
        for c in np.argsort(-sims[q])[:5]:
            truth.add((q, int(c)))
    yield df, truth
    df.unpersist()


def _ann_recall(spark, emb, truth, cells_fn, n_queries=N_QUERIES, **kw):
    """similarity_ivf_2level's search shape on top of a cells function:
    corpus indexed under rank-1 cells, queries probe their top-3 cells of
    the same pass, candidates reranked by true cosine, top-5 per query."""
    cells = cells_fn(emb, coarse_probe=1, fine_probe=3, rank_col="frnk", **kw)
    corpus = cells.filter(F.col("frnk") == 1).select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("ce"),
        F.col("vnrm").alias("cnrm"),
        "pivot_id",
    )
    qs = cells.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qe"),
        F.col("vnrm").alias("qnrm"),
        "pivot_id",
    )
    sim = dot_expr("qe", "ce") / (F.col("qnrm") * F.col("cnrm"))
    w = Window.partitionBy("qid").orderBy(F.desc(sim), F.asc("cid"))
    got = {
        (r.qid, r.cid)
        for r in (
            qs.join(corpus, "pivot_id")
            .filter(F.col("qid") != F.col("cid"))
            .dropDuplicates(["qid", "cid"])
            .withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= 5)
            .select("qid", "cid")
        ).collect()
    }
    return len(got & truth) / len(truth)


def test_two_level_path_engages():
    fmod, _ = two_level_params(N)
    import math

    assert math.ceil(N / fmod) > 64  # above FLAT_MAX_K: genuine two-level


def test_learned_coarse_recall_lift(spark, clustered):
    emb, truth = clustered
    assert len(truth) == 5 * N_QUERIES
    r_hash = _ann_recall(spark, emb, truth, two_level_cells)
    r_learned = _ann_recall(spark, emb, truth, two_level_cells_learned)
    # measured on this fixture: hash-coarse 0.752, learned-coarse 0.940 —
    # the lift is cluster ROUTING (8 learned centers hold ~2 whole
    # clusters each, so every query's cluster lives inside its probed
    # cell; ~8 random coarse pivot docs cover only ~half the 16 clusters,
    # and uncovered-cluster queries route by noise). The absolute ceiling
    # is the fine level's blocking (3 probed cells of ~5 per cluster).
    # Floors leave slack for KMeans seed/fold jitter.
    assert r_learned >= r_hash + 0.10
    assert r_learned >= 0.85


def test_learned_contract_matches_hash_variant(spark, clustered):
    emb, _ = clustered
    sample = emb.filter(F.col("vec_id") % 40 == 0)  # 500 rows: fast path
    out = two_level_cells_learned(sample, coarse_probe=1, fine_probe=2)
    assert set(out.columns) == {"vec_id", "embedding", "vnrm", "pivot_id"}
    rows = out.groupBy("vec_id").count().collect()
    assert len(rows) == sample.count()  # every vector covered
    assert all(1 <= r["count"] <= 2 for r in rows)  # <= fine_probe cells


def test_learned_empty_frame_falls_back(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert two_level_cells_learned(empty).count() == 0


def test_orphan_coarse_cells_drop_no_vectors(spark):
    """ADVICE r9 #1 regression: a learned centroid whose catchment holds
    NO hash-selected fine pivot must not swallow its vectors.

    Adversarial deterministic fixture: fine-pivot selection is a pure
    function of vec_id (md5 % fmod), so place EVERY pivot id's embedding
    at cluster A and every non-pivot id at the antipodal cluster B. KMeans
    (k = n_coarse = 2) finds A and B; centroid B owns zero fine pivots —
    before the owned-centroid guard, every B vector vanished from the
    inner fine-assign join with coarse_probe=1."""
    from cassabon_spark.functions.text import md5_bucket_expr
    from cassabon_spark.operators.cells import PIVOT_SALT

    n = 2_000
    fmod, _ = two_level_params(n)
    ids = spark.range(n).select(F.col("id").alias("vec_id"))
    is_pivot = (
        md5_bucket_expr(F.col("vec_id").cast("string"), prefix=PIVOT_SALT)
        % fmod
        == 0
    )
    rng = np.random.default_rng(7)
    a = rng.standard_normal(DIM)
    a /= np.linalg.norm(a)
    jitter = F.transform(
        F.sequence(F.lit(1), F.lit(DIM)),
        lambda i: (F.pmod(F.xxhash64(F.col("vec_id") * 31 + i), F.lit(1000))
                   .cast("double") / 10000.0),
    )
    base = F.when(
        is_pivot, F.array(*[F.lit(float(x)) for x in a])
    ).otherwise(F.array(*[F.lit(float(-x)) for x in a]))
    emb = ids.select(
        "vec_id",
        F.zip_with(base, jitter, lambda b, j: b + j).alias("embedding"),
    ).cache()
    try:
        n_pivots = emb.filter(is_pivot).count()
        assert 0 < n_pivots < n // 10  # the orphan regime is actually set up
        out = two_level_cells_learned(emb, coarse_probe=1, fine_probe=1)
        covered = out.select("vec_id").distinct().count()
        assert covered == n  # every vector assigned, orphan cells or not
    finally:
        emb.unpersist()


@pytest.fixture(scope="module")
def clustered_large(spark):
    """VERDICT r9 #4 fixture — the LARGE-n_coarse regime: 16,384 vectors
    in 48 well-separated clusters, quantized with cell=16 so
    k_exp = 1024 and n_coarse = 32 learned centroids, trained from an
    md5 sample capped at 1,600 rows (~50 training rows PER CENTROID —
    the ratio a 1e9-vector corpus gives a 100k-row sample, the scale
    question VERDICT r9 #4 asks about). Cluster count (48) deliberately
    EXCEEDS n_coarse (32), like production codebooks."""
    n, k_clusters = 16_384, 48
    rng = np.random.default_rng(4321)
    cent = rng.standard_normal((k_clusters, DIM))
    cent /= np.linalg.norm(cent, axis=1, keepdims=True)
    cl = rng.integers(0, k_clusters, size=n)
    noise = rng.standard_normal((n, DIM))
    noise /= np.linalg.norm(noise, axis=1, keepdims=True)
    vecs = (cent[cl] + EPS * noise).astype(np.float64)
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    ).cache()
    df.count()
    sims = vecs[:N_QUERIES] @ vecs.T
    nrm = np.linalg.norm(vecs, axis=1)
    sims = sims / (nrm[:N_QUERIES, None] * nrm[None, :])
    truth = set()
    for q in range(N_QUERIES):
        sims[q, q] = -2.0
        for c in np.argsort(-sims[q])[:5]:
            truth.add((q, int(c)))
    yield df, truth
    df.unpersist()


@pytest.mark.slow  # r15 tiering: large-ncoarse recall stress, ~14 s
def test_learned_large_ncoarse_recall_and_balance(spark, clustered_large):
    """Large-n_coarse quality gate (VERDICT r9 #4): with only ~50 training
    rows per centroid and more true clusters than centroids, the learned
    coarse level must still (a) cover every vector (orphan centroids ARE
    expected in this regime — the owned-centroid guard is load-bearing),
    (b) beat the hash-coarse router at equal probe budget, (c) keep fine
    cells from collapsing into giants (occupancy envelope)."""
    emb, truth = clustered_large
    kw = dict(cell=16, kmin=8)
    r_hash = _ann_recall(spark, emb, truth, two_level_cells, **kw)
    r_learned = _ann_recall(
        spark, emb, truth, two_level_cells_learned, sample_cap=1_600, **kw
    )
    # MEASURED (r10): learned 0.616 vs hash 0.628 — a wash, NOT a lift.
    # The r9 worry (training starvation at ~50 rows/centroid) is measured
    # to be a non-issue: sample_cap=16_384 (the full corpus) and
    # max_iter=30 both reproduce 0.616 exactly. What decides is the
    # REGIME: with n_coarse (32) below the true mode count (48), KMeans
    # must split/merge clusters and a coarse_probe=1 budget loses the
    # split halves — same as hash routing loses uncovered clusters. The
    # 16-cluster/8-centroid fixture above lifts (0.940 vs 0.752) because
    # its clusters are big enough that each centroid absorbs WHOLE
    # clusters. Conclusion pinned here: at n_coarse < cluster count the
    # learned router is at PARITY (never worse than hash minus noise),
    # and the deterministic hash variant stays the exact-gated default.
    assert r_learned >= r_hash - 0.05  # parity within jitter, never a cliff
    assert r_learned >= 0.55

    # occupancy envelope on rank-1 fine cells: every vector covered, and
    # no giant cell (a centroid catchment collapsing into one fine cell)
    cells = two_level_cells_learned(
        emb, coarse_probe=1, fine_probe=1, sample_cap=1_600, **kw
    )
    occ = cells.groupBy("pivot_id").count().select("count").collect()
    sizes = sorted(r["count"] for r in occ)
    assert sum(sizes) == 16_384  # full cover
    mean = sum(sizes) / len(sizes)
    assert sizes[-1] <= 50 * mean  # no giant cell

