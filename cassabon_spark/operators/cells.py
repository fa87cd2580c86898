"""Deterministic hybrid flat/two-level md5-pivot coarse quantizer
(VERDICT r7 #2).

The r3-r7 corpus-scaled cell rule picked k = max(8, ceil(N/256)) md5-chosen
pivots and assigned every vector to its nearest pivot by brute force:
`emb.crossJoin(broadcast(pivots))` — N*k cosine evaluations with k ~ N/256,
i.e. O(N^2/256) ASSIGNMENT work and a broadcast pivot table growing
linearly with the corpus (at N=1e8: ~390k pivots, ~100 MB broadcast, 390k
dots per row; at 1e9 unrunnable). The pair stage was linear; the
assignment stage was the quadratic one level down.

This module keeps the same FINE cell geometry (mean occupancy ~256, so
within-cell pair work stays linear in N) but routes assignment through a
coarse level of ~sqrt(k) pivots:

  1. fine pivots   — every row whose portable 48-bit md5 hash is
                     0 mod fmod (fmod ~ 256), expected N/256 pivots.
                     Map-only selection: no global sort, no
                     single-partition GlobalLimit funnel (the r7 rule's
                     `orderBy(md5).limit(k)` merged k ~ N rows through
                     one task — the other reason k must not scale with N).
  2. coarse pivots — the subset of fine pivots with hash 0 mod cmod,
                     cmod = fmod * floor(sqrt(k_expected)): expected
                     sqrt(k) pivots, a BOUNDED broadcast (~2k rows even
                     at N=1e9).
  3. assignment    — vectors score the sqrt(k) coarse pivots (broadcast
                     nested loop, partial-group-limited before the
                     shuffle), then only the fine pivots OF their probed
                     coarse cell(s) via an equi-join on coarse_id. Total
                     N * ~2*sqrt(k) dot products instead of N * k.

Everything is a pure function of (vec_id md5 hashes, embedding floats), so
a DuckDB oracle mirrors every step exactly — the construction stays under
the exact correctness gate at any N (`queries/extensions.py::
_two_level_cells_cte` is the SQL twin of `two_level_cells`; the two must
change together).

Degenerate-input guarantees:
  - the row with the globally minimal (md5(vec_id), vec_id) is ALWAYS both
    a fine and a coarse pivot, so neither level can be empty (hash-modulo
    selection alone has a ~e^-8 chance of selecting nothing);
  - coarse pivots are a subset of fine pivots (cmod is a multiple of
    fmod), so a probed coarse cell always holds >= 1 fine pivot — its own
    coarse pivot — except in the measure-zero case where two coarse pivots
    have float-identical cosine against EVERY row (then both engines drop
    the same rows, keeping the gate exact);
  - the fine-assign equi-join fans each coarse cell across SALT_FAN salts
    so one cell's N/sqrt(k) vector block is SALT_FAN tasks, not one.

Reference scope note: the reference engine (jeffpierce/cassabon) has no
vector operators at all; this supports the SemDeDup / D4 / embedding-dedup
family (Abbas et al. 2023, Tirumala et al. 2023) of SURVEY.md Part C.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cassabon_spark.functions.text import md5_bucket_expr
from cassabon_spark.functions.vectors import dot_expr, l2_norm_expr

CELL = 256  # target mean fine-cell occupancy (the r3-r7 value, unchanged)
KMIN = 8  # minimum EXPECTED fine-pivot count at tiny corpora
SALT_FAN = 16  # fine-assign fan-out per coarse cell
PIVOT_SALT = "pvt:"  # hash domain separator for pivot selection
# Hybrid threshold: when the EXPECTED fine-pivot count is at most this,
# assign flat against the (bounded, broadcastable) fine pivot set in one
# stage — N * <=64 dots, the standard small-codebook IVF shape — and skip
# the coarse level entirely. Two-level routing only pays once k actually
# grows (N > ~16k at cell=256). Measured motivation: at sf0.1 (2000
# vectors, k~8) the two-level construction's extra stages cost ~2x wall
# on dedup_semdedup while saving nothing (PERF_r08.md); at the 10x stress
# corpus (20k vectors, k_exp=79) the threshold is crossed and the
# two-level path runs, so every scale gate still exercises it.
FLAT_MAX_K = 64


def two_level_params(n: int, cell: int = CELL, kmin: int = KMIN) -> tuple[int, int]:
    """(fmod, cmod) hash moduli for corpus size n.

    fmod = clamp(n // kmin, 1, cell): expected fine pivots = n/fmod, which
    is ~n/cell at scale and >= kmin on tiny corpora (matching the r7
    rule's max(8, ceil(n/256)) geometry). cmod = fmod * floor(sqrt(k_exp))
    with k_exp = ceil(n/fmod): expected coarse pivots ~ sqrt(k_exp).

    Mirrored EXACTLY by the oracle SQL (prm/prm2 CTEs in
    `_two_level_cells_cte`): every operation is integer arithmetic plus
    one IEEE-exact sqrt/floor, so both engines derive identical moduli
    from their own COUNT(*).
    """
    fmod = max(1, min(cell, n // kmin))
    k_exp = math.ceil(n / fmod) if n else 1
    cfact = max(1, int(math.floor(math.sqrt(k_exp))))
    return fmod, fmod * cfact


def two_level_cells(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    carry: tuple[str, ...] = (),
    coarse_probe: int = 1,
    fine_probe: int = 1,
    cell: int = CELL,
    kmin: int = KMIN,
    rank_col: str | None = None,
    flat_max_k: int = FLAT_MAX_K,
) -> DataFrame:
    """Assign every row of `emb` to its `fine_probe` nearest fine cells —
    flat against the whole (bounded) fine pivot set while the expected
    codebook is <= flat_max_k, else searching only the `coarse_probe`
    nearest coarse cells (two-level).

    Returns [id_col, vec_col, 'vnrm', 'pivot_id'] + carry, one row per
    (vector, probed fine cell), plus the 1-based fine-probe rank as
    `rank_col` when requested (lets a caller derive both a top-1 and a
    top-k view from ONE assignment pass). 'vnrm' is the vector's L2 norm
    computed once (the same sequential fold an inline norm evaluates to,
    so downstream cosines stay oracle-exact). Runs ONE scalar action
    (count + sentinel argmin in a single aggregate) to derive the hash
    moduli.
    """
    stats = emb.agg(
        F.count(F.lit(1)).alias("n"),
        F.min(
            F.struct(
                F.md5(F.col(id_col).cast("string")).alias("m"),
                F.col(id_col).alias("i"),
            )
        ).alias("s"),
    ).first()
    n = int(stats["n"] or 0)
    if n == 0:
        rank0 = [F.lit(1).alias(rank_col)] if rank_col else []
        return emb.select(
            id_col,
            vec_col,
            F.lit(0.0).alias("vnrm"),
            F.col(id_col).alias("pivot_id"),
            *rank0,
            *carry,
        ).limit(0)
    sid = stats["s"]["i"]
    fmod, cmod = two_level_params(n, cell, kmin)
    k_exp = math.ceil(n / fmod)
    ph = md5_bucket_expr(F.col(id_col).cast("string"), prefix=PIVOT_SALT)

    fine = emb.filter((ph % fmod == 0) | (F.col(id_col) == sid)).select(
        F.col(id_col).alias("pivot_id"),
        F.col(vec_col).alias("pe"),
        l2_norm_expr(vec_col).alias("pnrm"),
        ph.alias("__ph"),
    )
    n_parts = int(emb.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    # the explicit repartition on the window key fuses crossJoin + dots +
    # window into ONE full-width stage (no ENSURE_REQUIREMENTS exchange
    # for AQE to byte-coalesce — SCALE_r08's five narrow-heavy catches)
    vec = emb.repartition(n_parts, id_col).withColumn("vnrm", l2_norm_expr(vec_col))
    sim_vf = dot_expr(vec_col, "pe") / (F.col("vnrm") * F.col("pnrm"))
    w_vf = Window.partitionBy(id_col).orderBy(F.desc(sim_vf), F.asc("pivot_id"))
    extra = [F.col("__r").alias(rank_col)] if rank_col else []

    if k_exp <= flat_max_k:
        # flat path: the codebook is bounded (<= flat_max_k rows), so a
        # single broadcast scan is both the cheapest and the scale-safe
        # plan — no coarse level, no extra stages
        ranked = (
            vec.crossJoin(F.broadcast(fine.drop("__ph")))
            .withColumn("__r", F.row_number().over(w_vf))
            .filter(F.col("__r") <= fine_probe)
        )
        return ranked.select(id_col, vec_col, "vnrm", "pivot_id", *extra, *carry)

    coarse = fine.filter(
        (F.col("__ph") % cmod == 0) | (F.col("pivot_id") == sid)
    ).select(
        F.col("pivot_id").alias("cpid"),
        F.col("pe").alias("cpe"),
        F.col("pnrm").alias("cpnrm"),
    )

    # fine pivot -> coarse cell: k x sqrt(k) work, filtered-rank top-1
    # (Catalyst plans the partial WindowGroupLimit below the exchange)
    sim_fc = dot_expr("pe", "cpe") / (F.col("pnrm") * F.col("cpnrm"))
    w_fc = Window.partitionBy("pivot_id").orderBy(F.desc(sim_fc), F.asc("cpid"))
    f2c = (
        fine.crossJoin(F.broadcast(coarse))
        .withColumn("__r", F.row_number().over(w_fc))
        .filter(F.col("__r") == 1)
        .select("pivot_id", "pe", "pnrm", F.col("cpid").alias("coarse_id"))
    )

    # vector -> coarse probe(s): N x sqrt(k) work against the BOUNDED
    # coarse broadcast — the step that was N x k against a linearly
    # growing broadcast under the single-level rule.
    sim_vc = dot_expr(vec_col, "cpe") / (F.col("vnrm") * F.col("cpnrm"))
    w_vc = Window.partitionBy(id_col).orderBy(F.desc(sim_vc), F.asc("cpid"))
    v2c = (
        vec.crossJoin(F.broadcast(coarse))
        .withColumn("__r", F.row_number().over(w_vc))
        .filter(F.col("__r") <= coarse_probe)
        .select(id_col, vec_col, "vnrm", *carry, F.col("cpid").alias("coarse_id"))
    )

    # vector -> fine within probed coarse cell(s): N x (k/sqrt(k)) work
    # through an equi-join on (coarse_id, salt). The salt spreads one
    # coarse cell's ~N/sqrt(k) vector block over SALT_FAN tasks (at test
    # scale AQE broadcasts the k*SALT_FAN fine side and the salt is a
    # no-op; at 1e9 rows the join shuffles on sqrt(k)*SALT_FAN keys).
    salt = F.pmod(F.hash(F.col(id_col)), F.lit(SALT_FAN)).cast("int")
    fan = (
        emb.sparkSession.range(SALT_FAN)
        .select(F.col("id").cast("int").alias("__salt"))
    )
    # pin the fine-assign join width with an EXPLICIT repartition (the
    # salted_self_pairs lesson, SCALE_r06/r08): the join inputs are small
    # in BYTES but the stage computes ~k/sqrt(k) dots per probe row, and
    # AQE coalesces by bytes — the first r8 stress run coalesced this
    # stage to 5 tasks at 1s+ medians. User-specified repartitions are
    # AQE-exempt; if the fine side still broadcasts, the probe side keeps
    # this width.
    probe = v2c.withColumn("__salt", salt).repartition(
        n_parts, "coarse_id", "__salt"
    )
    f_rep = f2c.crossJoin(fan).repartition(n_parts, "coarse_id", "__salt")
    ranked = (
        probe.join(f_rep, ["coarse_id", "__salt"])
        .withColumn("__r", F.row_number().over(w_vf))
        .filter(F.col("__r") <= fine_probe)
    )
    return ranked.select(id_col, vec_col, "vnrm", "pivot_id", *extra, *carry)


def two_level_cells_learned(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    carry: tuple[str, ...] = (),
    coarse_probe: int = 1,
    fine_probe: int = 1,
    cell: int = CELL,
    kmin: int = KMIN,
    rank_col: str | None = None,
    seed: int = 42,
    sample_cap: int = 100_000,
    max_iter: int = 10,
) -> DataFrame:
    """`two_level_cells` with a LEARNED coarse level (VERDICT r8 #3):
    coarse = sampled pyspark.ml KMeans centroids, fine = the same
    hash-modulo pivot docs. Same output contract and cost shape as the
    hash-coarse variant — assignment N * (n_coarse + ~sqrt(k)), bounded
    coarse broadcast — but on CLUSTERED corpora the learned centroids
    route vectors to the coarse cell that actually holds their neighbors,
    where ~sqrt(k) random pivot docs cover only ~(1 - 1/e) of the
    clusters (tests/test_cells.py measures the recall lift on a clustered
    fixture; the uniform corpus caps both variants at chance).

    NOT oracle-exact (k-means|| is not SQL-reproducible): use
    two_level_cells where the exact gate applies; this is the recall
    upgrade for production corpora, consumed by recall-gated entries and
    tests. Training runs over an md5-deterministic sample of at most
    ~sample_cap rows (k-means|| init + Lloyd iterations are linear in the
    sample, not the corpus); centroids return to the driver as
    n_coarse x dim doubles — the same bounded footprint as the hash
    variant's coarse broadcast.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    stats = emb.agg(F.count(F.lit(1)).alias("n")).first()
    n = int(stats["n"] or 0)
    if n == 0:
        return two_level_cells(
            emb, id_col, vec_col, carry, coarse_probe, fine_probe, cell, kmin,
            rank_col,
        )
    fmod, _ = two_level_params(n, cell, kmin)
    k_exp = math.ceil(n / fmod)
    n_coarse = max(2, int(math.floor(math.sqrt(k_exp))))
    ph = md5_bucket_expr(F.col(id_col).cast("string"), prefix=PIVOT_SALT)

    # fine pivots: hash-modulo, exactly as the exact-gated variant (the
    # sentinel row is unnecessary here — the learned path has no oracle to
    # stay exact against, and KMeans needs >= 1 row anyway; an empty fine
    # set can only occur with ~e^-k_exp probability, guarded below)
    fine = emb.filter(ph % fmod == 0).select(
        F.col(id_col).alias("pivot_id"),
        F.col(vec_col).alias("pe"),
        l2_norm_expr(vec_col).alias("pnrm"),
    )
    if fine.limit(1).count() == 0:  # measure-zero hash degeneracy
        return two_level_cells(
            emb, id_col, vec_col, carry, coarse_probe, fine_probe, cell, kmin,
            rank_col,
        )

    # train on an md5-deterministic sample (bounded training cost); unit
    # vectors so euclidean cells align with cosine neighborhoods.
    # CEILING division (ADVICE r9 #3): floor let the sample reach ~2x
    # sample_cap (n=199_999, cap=100_000 -> smod=1 sampled everything)
    smod = max(1, -(-n // sample_cap))
    unit = F.transform(
        F.col(vec_col), lambda x: x.cast("double") / l2_norm_expr(F.col(vec_col))
    )
    sample = emb.filter(
        F.pmod(md5_bucket_expr(F.col(id_col).cast("string"), prefix="kmr:"), F.lit(smod))
        == 0
    ).select(array_to_vector(unit).alias("fv"))
    model = KMeans(
        k=n_coarse, seed=seed, maxIter=max_iter, featuresCol="fv",
        predictionCol="cell",
    ).fit(sample)
    spark = emb.sparkSession
    coarse = F.broadcast(
        spark.createDataFrame(
            [(i, [float(x) for x in ctr]) for i, ctr in enumerate(model.clusterCenters())],
            "cpid int, cpe array<double>",
        ).withColumn("cpnrm", l2_norm_expr("cpe"))
    )

    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    vec = emb.repartition(n_parts, id_col).withColumn("vnrm", l2_norm_expr(vec_col))
    sim_vf = dot_expr(vec_col, "pe") / (F.col("vnrm") * F.col("pnrm"))
    w_vf = Window.partitionBy(id_col).orderBy(F.desc(sim_vf), F.asc("pivot_id"))
    extra = [F.col("__r").alias(rank_col)] if rank_col else []

    # fine pivot -> nearest learned centroid
    sim_fc = dot_expr("pe", "cpe") / (F.col("pnrm") * F.col("cpnrm"))
    w_fc = Window.partitionBy("pivot_id").orderBy(F.desc(sim_fc), F.asc("cpid"))
    f2c = (
        fine.crossJoin(coarse)
        .withColumn("__r", F.row_number().over(w_fc))
        .filter(F.col("__r") == 1)
        .select("pivot_id", "pe", "pnrm", F.col("cpid").alias("coarse_id"))
    )

    # Every-vector-cover guard (ADVICE r9 #1): the hash variant enforces
    # coarse ⊆ fine, so every probed coarse cell owns >= 1 fine pivot;
    # KMeans centroids carry no such guarantee — a centroid whose
    # catchment contains no hash-selected fine pivot is an ORPHAN cell,
    # and with coarse_probe=1 every vector routed to it would vanish from
    # the inner fine-assign join. Rank vectors over the OWNED centroids
    # only (those some fine pivot maps to): the owned-id set is bounded by
    # n_coarse (~2k at 1e9 rows), a pruning predicate, not data movement.
    # Cost: one extra k x n_coarse f2c pass — the same term the fine-side
    # join below already pays once.
    owned_ids = [r[0] for r in f2c.select("coarse_id").distinct().collect()]
    coarse_owned = F.broadcast(
        coarse.filter(F.col("cpid").isin(owned_ids))
    )

    # vector -> coarse_probe nearest OWNED centroids
    sim_vc = dot_expr(vec_col, "cpe") / (F.col("vnrm") * F.col("cpnrm"))
    w_vc = Window.partitionBy(id_col).orderBy(F.desc(sim_vc), F.asc("cpid"))
    v2c = (
        vec.crossJoin(coarse_owned)
        .withColumn("__r", F.row_number().over(w_vc))
        .filter(F.col("__r") <= coarse_probe)
        .select(id_col, vec_col, "vnrm", *carry, F.col("cpid").alias("coarse_id"))
    )

    # vector -> fine within probed coarse cell(s): identical salted
    # equi-join shape (and AQE-exempt width pins) as two_level_cells
    salt = F.pmod(F.hash(F.col(id_col)), F.lit(SALT_FAN)).cast("int")
    fan = spark.range(SALT_FAN).select(F.col("id").cast("int").alias("__salt"))
    probe = v2c.withColumn("__salt", salt).repartition(
        n_parts, "coarse_id", "__salt"
    )
    f_rep = f2c.crossJoin(fan).repartition(n_parts, "coarse_id", "__salt")
    ranked = (
        probe.join(f_rep, ["coarse_id", "__salt"])
        .withColumn("__r", F.row_number().over(w_vf))
        .filter(F.col("__r") <= fine_probe)
    )
    return ranked.select(id_col, vec_col, "vnrm", "pivot_id", *extra, *carry)
