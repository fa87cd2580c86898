"""As-of join semantics + extension-operator unit checks."""

from __future__ import annotations

import pyspark.sql.functions as F

from cassabon_spark.functions.text import minhash_expr, tokens_expr, word_shingles_expr
from cassabon_spark.functions.vectors import cosine_sim_expr
from cassabon_spark.operators.asof import asof_join


def test_asof_backward_join(spark):
    left = spark.createDataFrame(
        [(1, 10.0), (1, 25.0), (1, 5.0), (2, 10.0)], "k int, t double"
    )
    right = spark.createDataFrame(
        [(1, 8.0, "a"), (1, 20.0, "b"), (2, 50.0, "c")], "k int, t double, v string"
    )
    out = asof_join(left, right, on="t", by=["k"], value_cols=["v"], suffix="")
    got = {(r["k"], r["t"]): r["v"] for r in out.collect()}
    assert got == {
        (1, 10.0): "a",  # latest right with t<=10 is t=8
        (1, 25.0): "b",  # t=20
        (1, 5.0): None,  # nothing precedes
        (2, 10.0): None,  # right t=50 is in the future
    }


def test_asof_tie_on_equal_timestamp_matches(spark):
    # right row AT the same timestamp qualifies (<=, right sorts before left)
    left = spark.createDataFrame([(1, 10.0)], "k int, t double")
    right = spark.createDataFrame([(1, 10.0, "x")], "k int, t double, v string")
    out = asof_join(left, right, on="t", by=["k"], value_cols=["v"], suffix="")
    assert out.collect()[0]["v"] == "x"


def test_asof_single_shuffle_no_python(spark):
    left = spark.createDataFrame([(1, 1.0)], "k int, t double")
    right = spark.createDataFrame([(1, 1.0, 2.0)], "k int, t double, v double")
    out = asof_join(left, right, on="t", by=["k"], value_cols=["v"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # union + one window, not a join: no SortMergeJoin/BroadcastHashJoin node
    assert "Join" not in plan


def test_word_shingles(spark):
    df = spark.createDataFrame([("a b c d",)], "text string")
    out = df.select(word_shingles_expr(tokens_expr("text"), 3).alias("s")).collect()[0]["s"]
    assert out == ["a b c", "b c d"]
    # shorter than n -> empty
    df2 = spark.createDataFrame([("a b",)], "text string")
    out2 = df2.select(word_shingles_expr(tokens_expr("text"), 3).alias("s")).collect()[0]["s"]
    assert out2 == []


def test_minhash_identical_docs_same_signature(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps"), (2, "the quick brown fox jumps"), (3, "totally different words here now")],
        "id int, text string",
    )
    sh = df.select("id", word_shingles_expr(tokens_expr("text"), 3).alias("s"))
    sig = sh.select("id", *[minhash_expr(F.col("s"), i).alias(f"h{i}") for i in range(4)])
    rows = {r["id"]: (r["h0"], r["h1"], r["h2"], r["h3"]) for r in sig.collect()}
    assert rows[1] == rows[2]
    assert rows[1] != rows[3]


def test_cosine_sim(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [0.0, 1.0])],
        "a array<double>, b array<double>",
    )
    out = [r["c"] for r in df.select(cosine_sim_expr("a", "b").alias("c")).collect()]
    assert out[0] == 1.0
    assert abs(out[1]) < 1e-12


def test_asof_pandas_matches_jvm_implementation(spark):
    """Differential test: the grouped-map pandas merge_asof path must agree
    with the JVM union+last_value path row for row."""
    from cassabon_spark.operators.asof import asof_join, asof_join_pandas

    left = spark.createDataFrame(
        [("a", 5.0, "l1"), ("a", 11.0, "l2"), ("b", 3.0, "l3"), ("c", 9.0, "l4")],
        "k string, t double, payload string",
    )
    right = spark.createDataFrame(
        [("a", 4.0, 40.0), ("a", 10.0, 100.0), ("b", 7.0, 70.0)],
        "k string, t double, px double",
    )
    jvm = asof_join(left, right, on="t", by=["k"], value_cols=["px"])
    pnd = asof_join_pandas(left, right, on="t", by=["k"], value_cols=["px"])
    key = lambda rows: sorted((r["k"], r["t"], r["payload"], r["px_right"]) for r in rows)
    assert key(jvm.collect()) == key(pnd.collect())
    got = {(r["k"], r["t"]): r["px_right"] for r in pnd.collect()}
    assert got == {("a", 5.0): 40.0, ("a", 11.0): 100.0, ("b", 3.0): None, ("c", 9.0): None}


def test_gopher_rules_discriminate(spark, sf_dir):
    """Vacuous-pass guard (r1 lesson): the composite rules must reject SOME
    documents and pass most on this corpus, and rule counts never exceed
    n_docs."""
    from cassabon_spark.queries import load_registry

    rows = load_registry()["text_gopher_rules"].fn(spark, sf_dir).collect()
    assert rows
    tot = sum(r["n_docs"] for r in rows)
    allp = sum(r["pass_all"] for r in rows)
    assert 0 < allp < tot, (allp, tot)
    for r in rows:
        for c in ("pass_wordcount", "pass_meanwordlen", "pass_topword",
                  "pass_stopword", "pass_all"):
            assert 0 <= r[c] <= r["n_docs"]
        assert r["pass_all"] <= min(
            r["pass_wordcount"], r["pass_meanwordlen"],
            r["pass_topword"], r["pass_stopword"],
        )


def test_token_budget_mix_sums_exactly(spark, sf_dir):
    """Largest-remainder allocation: integer allocs sum EXACTLY to the
    budget and order by proportional share within +/-1."""
    from cassabon_spark.queries import load_registry
    from cassabon_spark.queries.extensions import _MIX_BUDGET

    rows = load_registry()["pipeline_token_budget_mix"].fn(spark, sf_dir).collect()
    assert sum(r["alloc"] for r in rows) == _MIX_BUDGET
    tt = sum(r["tokens"] for r in rows)
    for r in rows:
        exact = _MIX_BUDGET * r["tokens"] / tt
        assert abs(r["alloc"] - exact) < 1.0, (r["source"], r["alloc"], exact)


def test_centroid_confusion_beats_random(spark, sf_dir):
    """The label column carries real cluster signal: nearest-centroid
    accuracy must beat the 1/n_labels random floor by a wide margin."""
    from cassabon_spark.queries import load_registry

    rows = load_registry()["embedding_centroid_confusion"].fn(spark, sf_dir).collect()
    total = sum(r["n"] for r in rows)
    diag = sum(r["n"] for r in rows if r["label"] == r["pred"])
    n_labels = len({r["label"] for r in rows})
    assert n_labels >= 2
    assert diag / total > 2.0 / n_labels, (diag, total)


def test_bigram_surprisal_orders_against_unigram(spark, sf_dir):
    """Bigram model sanity: per-lang aggregates exist for every lang and
    surprisal is positive and finite; smoothing keeps max bounded by
    ln(c1_max + V) ~ ln corpus size."""
    import math

    from cassabon_spark.queries import load_registry

    rows = load_registry()["text_bigram_surprisal"].fn(spark, sf_dir).collect()
    assert rows and all(r["avg_surprisal"] > 0 for r in rows)
    assert all(r["max_surprisal"] < 25 for r in rows)  # ln of anything sane
    assert all(not math.isnan(r["avg_surprisal"]) for r in rows)


def test_funnel_stages_monotone(spark, sf_dir):
    """Ordered funnel: each later stage is a subset of the previous."""
    from cassabon_spark.queries import load_registry

    r = load_registry()["events_funnel_conversion"].fn(spark, sf_dir).collect()[0]
    assert r["stage_view"] >= r["stage_click"] >= r["stage_purchase"] >= 0
    assert 0.0 <= r["conv_rate"] <= 1.0


def test_cohort_retention_week0_full(spark, sf_dir):
    """Every cohort is fully active in its own first week (offset 0), and
    retention never exceeds 1."""
    from cassabon_spark.queries import load_registry

    rows = load_registry()["events_cohort_retention"].fn(spark, sf_dir).collect()
    assert rows
    by_cohort = {}
    for r in rows:
        assert 0.0 < r["retention"] <= 1.0
        assert r["week_offset"] >= 0
        by_cohort.setdefault(r["cohort_week"], {})[r["week_offset"]] = r["retention"]
    for cohort, offsets in by_cohort.items():
        assert offsets.get(0) == 1.0, (cohort, offsets)
