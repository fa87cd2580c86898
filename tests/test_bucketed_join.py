"""Bucketed co-located joins: the Spark analog of the reference's
PRIMARY KEY (path, time) locality (metricmanager.go:158-171) applied to
JOINS — pre-bucketing both sides on the join key removes the shuffle
entirely, the thing that matters most for repeated large-table joins at
100 TB."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    # warehouse.dir is a static conf; scope the db to tmp via LOCATION instead
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bktest LOCATION '{tmp_path / 'wh'}'")
    prev_threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    # at sf0.001 orders fits the broadcast threshold, which would bypass the
    # bucketed path entirely; force the shuffle-join planner to show the
    # bucketing win (at real scale neither side broadcasts)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        (
            orders.write.bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .mode("overwrite")
            .saveAsTable("bktest.orders_b")
        )
        (
            lineitem.write.bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .mode("overwrite")
            .saveAsTable("bktest.lineitem_b")
        )
        ob = spark.table("bktest.orders_b")
        lb = spark.table("bktest.lineitem_b")
        joined = ob.join(lb, ob.o_orderkey == lb.l_orderkey).groupBy(
            "o_orderpriority"
        ).agg(F.sum("l_extendedprice").alias("rev"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # bucketing aligns both sides: SortMergeJoin with ZERO exchanges
        # before the join (the only exchange left is the final aggregation's)
        join_part = plan.split("SortMergeJoin")[-1] if "SortMergeJoin" in plan else plan
        assert "SortMergeJoin" in plan, plan
        assert "Exchange hashpartitioning" not in join_part, join_part
        # equality with the plain-parquet join
        plain = (
            spark.read.parquet(f"{sf_dir}/orders.parquet")
            .join(
                spark.read.parquet(f"{sf_dir}/lineitem.parquet"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .groupBy("o_orderpriority")
            .agg(F.sum("l_extendedprice").alias("rev"))
        )
        a = {(r["o_orderpriority"], round(r["rev"], 2)) for r in joined.collect()}
        b = {(r["o_orderpriority"], round(r["rev"], 2)) for r in plain.collect()}
        assert a == b
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_threshold)
        spark.sql("DROP DATABASE IF EXISTS bktest CASCADE")


def test_interval_join_tolerates_shared_column_names(spark):
    """ADVICE r3: bucketed_interval_join builds its residual predicate
    from DataFrame-qualified references, so inputs sharing a timestamp
    column name — including left_ts == right_ts — join correctly instead
    of failing on ambiguous resolution."""
    from cassabon_spark.operators.interval import bucketed_interval_join

    left = spark.createDataFrame(
        [("L1", "2020-01-01 00:10:00")], "lid string, ts string"
    ).select("lid", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [("R1", "2020-01-01 00:05:00"), ("R2", "2020-01-01 00:30:00")],
        "rid string, ts string",
    ).select("rid", F.col("ts").cast("timestamp"))
    out = bucketed_interval_join(left, right, "ts", "ts", -600, 0)
    rows = out.select("lid", "rid").collect()
    # only R1 falls in [L1-10min, L1): R2 is after L1
    assert {(r["lid"], r["rid"]) for r in rows} == {("L1", "R1")}
