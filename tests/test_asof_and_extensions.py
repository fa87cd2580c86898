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
