"""Part B — the general relational surface (SURVEY §2 Part B).

The reference implements none of these (cassabon has no join, no SQL window
functions, no set ops — SURVEY §2 Part B table); they are the engine surface
Catalyst gives for free, declared here so the oracle harness exercises each
category: joins (broadcast/sort-merge/semi/anti/non-equi/as-of), aggregation
(hash agg, rollup/cube, distinct), SQL window functions (ranking/analytic/
frames), sorts/top-k, set ops, and scalar string/date/json/array functions.

Every query here is scale-minded: dims are broadcast, aggregations are
partial-before-shuffle (Catalyst default), top-k is TakeOrderedAndProject,
and window functions partition on high-cardinality keys.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from cassabon_spark.operators.asof import asof_join
from cassabon_spark.queries import R, T, register
from cassabon_spark.session import prep

# ---------------------------------------------------------------- q1 pricing

_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2)                                        AS sum_qty,
       ROUND(SUM(l_extendedprice), 2)                                   AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
       ROUND(ROUND(AVG(l_quantity), 8), 4)                                        AS avg_qty,
       ROUND(ROUND(AVG(l_extendedprice), 8), 4)                                   AS avg_price,
       ROUND(ROUND(AVG(l_discount), 8), 4)                                        AS avg_disc,
       COUNT(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", _Q1_SQL, "TPC-H Q1: scan + hash agg w/ partial agg")
def q1(spark, sf_dir):
    prep(spark)
    li = T(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc), 2).alias("sum_disc_price"),
            F.round(F.sum(disc * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            R(F.avg("l_quantity"), 4).alias("avg_qty"),
            R(F.avg("l_extendedprice"), 4).alias("avg_price"),
            R(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------- q3 top-k join

_Q3_SQL = """
SELECT l_orderkey,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       STRFTIME(o_orderdate, '%Y-%m-%d')                 AS o_orderdate,
       o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate  > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@register("q3_shipping_priority", _Q3_SQL, "TPC-H Q3: 3-way join + agg + global top-k")
def q3(spark, sf_dir):
    prep(spark)
    cust = T(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = T(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-03-15")
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-03-15")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------- q5 local supplier

_Q5_SQL = """
SELECT n_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders   ON c_custkey  = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey  = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


@register("q5_local_supplier_volume", _Q5_SQL, "TPC-H Q5: 6-way join, broadcast dims")
def q5(spark, sf_dir):
    prep(spark)
    cust = T(spark, sf_dir, "customer")
    orders = T(spark, sf_dir, "orders")
    li = T(spark, sf_dir, "lineitem")
    supp = T(spark, sf_dir, "supplier")
    nat = T(spark, sf_dir, "nation")
    reg = T(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


# ---------------------------------------------------------------- anti / semi joins

_ANTI_SQL = """
SELECT c_mktsegment, COUNT(*) AS customers_without_orders
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= DATE '1995-01-01'
                    AND o_orderdate < DATE '1996-01-01')
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


@register(
    "join_left_anti",
    _ANTI_SQL,
    "left_anti join: customers with no orders in calendar 1995",
)
def join_anti(spark, sf_dir):
    # Every customer has at least one order in this corpus, so a bare
    # "no orders ever" anti-join is vacuously empty; restricting the right
    # side to calendar 1995 leaves real survivors at every SF
    # (34 at sf0.001, 326 at sf0.01, 3305 at sf0.1) so the anti-join
    # mechanics discriminate. The filter is applied to the build side
    # BEFORE the join, so it pushes down to the orders scan.
    prep(spark)
    cust = T(spark, sf_dir, "customer")
    orders = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("customers_without_orders"))
        .orderBy("c_mktsegment")
    )


_SEMI_SQL = """
SELECT p_brand, COUNT(*) AS parts_sold
FROM part
WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
GROUP BY p_brand
ORDER BY p_brand
"""


@register("join_left_semi", _SEMI_SQL, "left_semi join: parts that appear in lineitem")
def join_semi(spark, sf_dir):
    prep(spark)
    part = T(spark, sf_dir, "part")
    li = T(spark, sf_dir, "lineitem")
    return (
        part.join(li, part.p_partkey == li.l_partkey, "left_semi")
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("parts_sold"))
        .orderBy("p_brand")
    )


# ---------------------------------------------------------------- full outer join

_FULL_SQL = """
WITH cn AS (SELECT c_nationkey AS k, COUNT(*) AS n_cust FROM customer GROUP BY 1),
     sn AS (SELECT s_nationkey AS k, COUNT(*) AS n_supp FROM supplier GROUP BY 1)
SELECT COALESCE(cn.k, sn.k)      AS nationkey,
       COALESCE(n_cust, 0)      AS n_cust,
       COALESCE(n_supp, 0)      AS n_supp
FROM cn FULL OUTER JOIN sn ON cn.k = sn.k
ORDER BY nationkey
"""


@register("join_full_outer", _FULL_SQL, "full outer join with coalesced sides")
def join_full(spark, sf_dir):
    prep(spark)
    cn = (
        T(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    sn = (
        T(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return (
        cn.join(sn, "k", "full_outer")
        .select(
            F.col("k").alias("nationkey"),
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
        .orderBy("nationkey")
    )


# ---------------------------------------------------------------- window functions

_TOPK_GRP_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 3
ORDER BY o_custkey, rn
"""


@register("win_topk_per_group", _TOPK_GRP_SQL, "per-group top-k via row_number")
def win_topk(spark, sf_dir):
    prep(spark)
    orders = T(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")
    )


_RUNNING_SQL = """
SELECT o_custkey, o_orderkey,
       ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
         AS running_spend
FROM orders
ORDER BY o_custkey, o_orderkey
"""


@register("win_running_sum", _RUNNING_SQL, "running aggregate over rows frame")
def win_running(spark, sf_dir):
    prep(spark)
    orders = T(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        orders.withColumn("running_spend", F.round(F.sum("o_totalprice").over(w), 2))
        .select("o_custkey", "o_orderkey", "running_spend")
        .orderBy("o_custkey", "o_orderkey")
    )


_LAG_SQL = """
WITH gaps AS (
  SELECT o_custkey,
         DATE_DIFF('day',
                   LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                          ORDER BY o_orderdate, o_orderkey),
                   o_orderdate) AS gap_days
  FROM orders
)
SELECT c_mktsegment,
       ROUND(ROUND(AVG(gap_days), 8), 4)     AS avg_gap_days,
       CAST(COUNT(gap_days) AS BIGINT) AS n_gaps
FROM gaps JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


@register("win_lag_order_gaps", _LAG_SQL, "lag analytic fn: days between consecutive orders")
def win_lag(spark, sf_dir):
    prep(spark)
    orders = T(spark, sf_dir, "orders")
    cust = T(spark, sf_dir, "customer")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = orders.withColumn(
        "gap_days", F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w))
    )
    return (
        gaps.join(F.broadcast(cust), gaps.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            R(F.avg("gap_days"), 4).alias("avg_gap_days"),
            F.count("gap_days").alias("n_gaps"),
        )
        .orderBy("c_mktsegment")
    )


_RANGE_FRAME_SQL = """
WITH daily AS (
  SELECT l_returnflag,
         DATE_DIFF('day', TIMESTAMP '1995-01-01', l_shipdate) AS day_num,
         SUM(l_extendedprice * (1 - l_discount)) AS rev
  FROM lineitem
  WHERE l_shipdate < TIMESTAMP '1995-04-01'
  GROUP BY 1, 2
)
SELECT l_returnflag, day_num,
       ROUND(ROUND(AVG(rev) OVER (PARTITION BY l_returnflag ORDER BY day_num
                            RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 6), 2)
         AS trailing_7d_avg
FROM daily
ORDER BY l_returnflag, day_num
"""


@register("win_range_frame_7d", _RANGE_FRAME_SQL, "range frame: 7-day trailing average")
def win_range(spark, sf_dir):
    prep(spark)
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") < "1995-04-01")
    daily = li.groupBy(
        "l_returnflag",
        F.datediff(F.col("l_shipdate"), F.lit("1995-01-01").cast("date")).alias("day_num"),
    ).agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"))
    w = Window.partitionBy("l_returnflag").orderBy("day_num").rangeBetween(-6, 0)
    return (
        daily.withColumn("trailing_7d_avg", R(F.avg("rev").over(w), 2))
        .select("l_returnflag", "day_num", "trailing_7d_avg")
        .orderBy("l_returnflag", "day_num")
    )


# ---------------------------------------------------------------- grouping sets

_ROLLUP_SQL = """
SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
       COALESCE(l_linestatus, 'ALL') AS l_linestatus,
       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
       ROUND(SUM(l_extendedprice), 2) AS total_price,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY gid, l_returnflag, l_linestatus
"""


@register("agg_rollup", _ROLLUP_SQL, "ROLLUP grouping sets with grouping_id")
def agg_rollup(spark, sf_dir):
    prep(spark)
    li = T(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("l_returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("l_linestatus"),
            F.col("gid").cast("bigint").alias("gid"),
            "total_price",
            "n_rows",
        )
        .orderBy("gid", "l_returnflag", "l_linestatus")
    )


_CUBE_SQL = """
SELECT COALESCE(o_orderstatus, 'ALL')    AS o_orderstatus,
       COALESCE(o_orderpriority, 'ALL')  AS o_orderpriority,
       CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
       COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS total
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY gid, o_orderstatus, o_orderpriority
"""


@register("agg_cube", _CUBE_SQL, "CUBE grouping sets")
def agg_cube(spark, sf_dir):
    prep(spark)
    orders = T(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("o_orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("o_orderpriority"),
            F.col("gid").cast("bigint").alias("gid"),
            "n_orders",
            "total",
        )
        .orderBy("gid", "o_orderstatus", "o_orderpriority")
    )


# ---------------------------------------------------------------- distinct + stats aggs

_DIST_SQL = """
SELECT o_orderpriority,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
       COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS revenue
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("agg_count_distinct", _DIST_SQL, "count distinct per group")
def agg_distinct(spark, sf_dir):
    prep(spark)
    orders = T(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


_STATS_SQL = """
SELECT l_returnflag,
       ROUND(ROUND(STDDEV_SAMP(l_quantity), 8), 4)           AS sd_qty,
       ROUND(ROUND(VAR_SAMP(l_extendedprice), 6), 2)         AS var_price,
       ROUND(ROUND(QUANTILE_CONT(l_quantity, 0.5), 8), 4)    AS median_qty,
       ROUND(ROUND(QUANTILE_CONT(l_extendedprice, 0.9), 8), 4) AS p90_price,
       ROUND(MIN(l_discount), 4)                   AS min_disc,
       ROUND(MAX(l_tax), 4)                        AS max_tax
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register("agg_stats_percentile", _STATS_SQL, "stddev/variance/exact percentiles")
def agg_stats(spark, sf_dir):
    prep(spark)
    li = T(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            R(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
            R(F.var_samp("l_extendedprice"), 2).alias("var_price"),
            R(F.percentile("l_quantity", 0.5), 4).alias("median_qty"),
            R(F.percentile("l_extendedprice", 0.9), 4).alias("p90_price"),
            F.round(F.min("l_discount"), 4).alias("min_disc"),
            F.round(F.max("l_tax"), 4).alias("max_tax"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------- set operations

_SETOP_SQL = """
SELECT 'both' AS tag, k FROM (
  SELECT DISTINCT c_nationkey AS k FROM customer
  INTERSECT
  SELECT DISTINCT s_nationkey FROM supplier)
UNION ALL
SELECT 'customer_only' AS tag, k FROM (
  SELECT DISTINCT c_nationkey AS k FROM customer
  EXCEPT
  SELECT DISTINCT s_nationkey FROM supplier)
ORDER BY tag, k
"""


@register("setop_intersect_except", _SETOP_SQL, "INTERSECT / EXCEPT / UNION ALL")
def setops(spark, sf_dir):
    prep(spark)
    cn = T(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k")).distinct()
    sn = T(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k")).distinct()
    both = cn.intersect(sn).withColumn("tag", F.lit("both"))
    only = cn.exceptAll(sn).withColumn("tag", F.lit("customer_only"))
    return both.unionByName(only).select("tag", "k").orderBy("tag", "k")


# ---------------------------------------------------------------- top-k global

_TOPK_SQL = """
SELECT o_orderkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
"""


@register("topk_global", _TOPK_SQL, "global top-k (TakeOrderedAndProject)")
def topk(spark, sf_dir):
    prep(spark)
    return (
        T(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
    )


# ---------------------------------------------------------------- scalar functions

_STRING_SQL = """
SELECT REGEXP_EXTRACT(p_type, '^(\\w+)', 1)       AS type_head,
       COUNT(*)                                   AS n_parts,
       CAST(SUM(LENGTH(p_name)) AS BIGINT)        AS name_chars,
       ROUND(ROUND(AVG(p_retailprice), 8), 4)               AS avg_price,
       MIN(LOWER(p_brand))                        AS first_brand,
       MAX(UPPER(SUBSTRING(p_name, 1, 3)))        AS max_prefix
FROM part
GROUP BY 1
ORDER BY type_head
"""


@register("scalar_string_funcs", _STRING_SQL, "regexp/substring/case string functions")
def scalar_string(spark, sf_dir):
    prep(spark)
    part = T(spark, sf_dir, "part")
    return (
        part.groupBy(F.regexp_extract("p_type", r"^(\w+)", 1).alias("type_head"))
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum(F.length("p_name")).cast("bigint").alias("name_chars"),
            R(F.avg("p_retailprice"), 4).alias("avg_price"),
            F.min(F.lower("p_brand")).alias("first_brand"),
            F.max(F.upper(F.substring("p_name", 1, 3))).alias("max_prefix"),
        )
        .orderBy("type_head")
    )


_DATE_SQL = """
SELECT STRFTIME(DATE_TRUNC('month', o_orderdate), '%Y-%m') AS order_month,
       COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS revenue
FROM orders
WHERE o_orderdate >= TIMESTAMP '2000-01-01'
GROUP BY 1
ORDER BY order_month
"""


@register("scalar_date_trunc", _DATE_SQL, "date_trunc monthly aggregation")
def scalar_date(spark, sf_dir):
    prep(spark)
    orders = T(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= "2000-01-01")
    return (
        orders.groupBy(
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias("order_month")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .orderBy("order_month")
    )


_JSON_SQL = """
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(COUNT(*) FILTER (WHERE TRY_CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) IS NULL)
            AS BIGINT)                                               AS null_k,
       ROUND(AVG(TRY_CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT)), 4) AS avg_k
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@register("scalar_json_extract", _JSON_SQL, "JSON scalar extraction from events.props")
def scalar_json(spark, sf_dir):
    prep(spark)
    ev = T(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").try_cast("bigint")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_if(k.isNull()).cast("bigint").alias("null_k"),
            R(F.avg(k), 4).alias("avg_k"),
        )
        .orderBy("event_type")
    )


_ARRAY_SQL = """
SELECT label,
       COUNT(*) AS n_vecs,
       CAST(MIN(LEN(embedding)) AS BIGINT) AS dim,
       ROUND(AVG(LIST_SUM(LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)))), 4) AS avg_sum,
       ROUND(AVG(SQRT(LIST_SUM(LIST_TRANSFORM(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4) AS avg_norm
FROM embeddings
GROUP BY label
ORDER BY label
"""


@register("scalar_array_funcs", _ARRAY_SQL, "higher-order array functions on embeddings")
def scalar_array(spark, sf_dir):
    prep(spark)
    from cassabon_spark.functions.vectors import l2_norm_expr

    emb = T(spark, sf_dir, "embeddings")
    vsum = F.aggregate("embedding", F.lit(0.0), lambda a, x: a + x.cast("double"))
    return (
        emb.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.min(F.size("embedding")).cast("bigint").alias("dim"),
            R(F.avg(vsum), 4).alias("avg_sum"),
            R(F.avg(l2_norm_expr("embedding")), 4).alias("avg_norm"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------- pivot

# SUM, not AVG: per-day sums of ~4dp values are grid-exact at 4dp, so both
# engines snap to the same decimal; an AVG here can land exactly on a rounding
# midpoint (observed: 38.37875 -> .3788 vs .3787 across engines).
_PIVOT_SQL = """
SELECT STRFTIME(DATE_TRUNC('day', ts), '%Y-%m-%d') AS day,
       ROUND(SUM(value) FILTER (WHERE event_type = 'click'), 4)    AS click,
       ROUND(SUM(value) FILTER (WHERE event_type = 'error'), 4)    AS error,
       ROUND(SUM(value) FILTER (WHERE event_type = 'purchase'), 4) AS purchase,
       ROUND(SUM(value) FILTER (WHERE event_type = 'signup'), 4)   AS signup,
       ROUND(SUM(value) FILTER (WHERE event_type = 'view'), 4)     AS view
FROM events
GROUP BY 1
ORDER BY day
"""


@register("pivot_daily_event_value", _PIVOT_SQL, "pivot event values to columns per day")
def pivot_daily(spark, sf_dir):
    prep(spark)
    ev = T(spark, sf_dir, "events")
    out = (
        ev.groupBy(F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"))
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .agg(F.round(F.sum("value"), 4))
        .orderBy("day")
    )
    return out


# ---------------------------------------------------------------- non-equi range join

_RANGE_JOIN_SQL = """
SELECT p.event_id, CAST(COUNT(c.event_id) AS BIGINT) AS clicks_before
FROM events p
LEFT JOIN events c
  ON c.user_id = p.user_id
 AND c.event_type = 'click'
 AND c.ts >= p.ts - INTERVAL 1 HOUR
 AND c.ts <  p.ts
WHERE p.event_type = 'purchase'
GROUP BY p.event_id
ORDER BY p.event_id
"""


@register("range_join_clicks_before", _RANGE_JOIN_SQL, "interval/range join (non-equi)")
def range_join(spark, sf_dir):
    prep(spark)
    ev = T(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    cond = (
        (c.c_user == p.p_user)
        & (c.c_ts >= p.p_ts - F.expr("INTERVAL 1 HOUR"))
        & (c.c_ts < p.p_ts)
    )
    return (
        p.join(c, cond, "left")
        .groupBy("event_id")
        .agg(F.count("c_ts").alias("clicks_before"))
        .orderBy("event_id")
    )


# ---------------------------------------------------------------- as-of join

_ASOF_SQL = """
WITH daily AS (  -- dedupe to one row per (custkey, date) so as-of is deterministic
  SELECT o_custkey, o_orderdate, MAX(o_totalprice) AS best_price
  FROM orders GROUP BY 1, 2
)
SELECT e.event_type,
       CAST(COUNT(d.best_price) AS BIGINT)  AS matched,
       ROUND(ROUND(AVG(d.best_price), 6), 2)          AS avg_last_price
FROM events e
ASOF LEFT JOIN daily d
  ON e.user_id = d.o_custkey AND d.o_orderdate <= e.ts
GROUP BY e.event_type
ORDER BY e.event_type
"""


@register("asof_join_last_order", _ASOF_SQL, "as-of join: latest order state at event time")
def asof_q(spark, sf_dir):
    prep(spark)
    ev = T(spark, sf_dir, "events")
    daily = (
        T(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_totalprice").alias("best_price"))
    )
    joined = asof_join(
        ev.select("event_id", "event_type", "user_id", F.col("ts").cast("double").alias("ts")),
        # o_orderdate is TIMESTAMP_NTZ (parquet millis, not UTC-adjusted): no
        # direct double cast — go through unix_timestamp in the UTC session.
        daily.withColumn("odate", F.unix_timestamp("o_orderdate").cast("double")),
        on="ts",
        right_on="odate",
        by=["user_id"],
        right_by=["o_custkey"],
        value_cols=["best_price"],
        suffix="",
    )
    return (
        joined.groupBy("event_type")
        .agg(
            F.count("best_price").alias("matched"),
            R(F.avg("best_price"), 2).alias("avg_last_price"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------- sessionization

_SESSION_SQL = """
WITH marked AS (
  SELECT user_id, ts, value, event_id,
         CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                OR EPOCH(ts) - EPOCH(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) >= 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM events
),
sess AS (
  SELECT user_id, ts, value,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
  FROM marked
),
per_sess AS (
  SELECT user_id, sess_id, COUNT(*) AS n_events,
         EPOCH(MAX(ts)) - EPOCH(MIN(ts)) AS dur_s
  FROM sess GROUP BY 1, 2
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT)        AS n_sessions,
       ROUND(ROUND(AVG(n_events), 8), 4)         AS avg_events,
       ROUND(ROUND(AVG(dur_s), 6), 2)            AS avg_dur_s
FROM per_sess
GROUP BY user_id
ORDER BY user_id
"""


@register(
    "sessionize_30m",
    _SESSION_SQL,
    "30-min-gap sessionization (gaps-and-islands; streaming analog = session_window)",
)
def sessionize(spark, sf_dir):
    prep(spark)
    ev = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_d = F.col("ts").cast("double")  # epoch seconds incl. fraction == DuckDB EPOCH()
    prev = F.lag(ts_d).over(w)
    marked = ev.withColumn(
        "new_sess", F.when(prev.isNull() | ((ts_d - prev) >= 1800), F.lit(1)).otherwise(F.lit(0))
    )
    sess = marked.withColumn(
        "sess_id",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    per_sess = sess.groupBy("user_id", "sess_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max(F.col("ts").cast("double")) - F.min(F.col("ts").cast("double"))).alias("dur_s"),
    )
    return (
        per_sess.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            R(F.avg("n_events"), 4).alias("avg_events"),
            R(F.avg("dur_s"), 2).alias("avg_dur_s"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------- EXISTS subquery

_EXISTS_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.08
)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register(
    "subq_exists_discounted",
    _EXISTS_SQL,
    "TPC-H Q4-shaped EXISTS subquery: Catalyst rewrites to a left-semi join "
    "(one shuffle, no per-row subquery execution)",
)
def subq_exists(spark, sf_dir):
    prep(spark)
    o = T(spark, sf_dir, "orders")
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_discount") > 0.08)
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------- correlated scalar subquery

_SCALAR_SUBQ_SQL = """
SELECT l_partkey,
       ROUND(SUM(l_extendedprice), 2) AS below_avg_revenue,
       COUNT(*) AS n_small
FROM lineitem l
WHERE l_quantity < (
  SELECT 0.5 * AVG(l2.l_quantity) FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
)
GROUP BY l_partkey
HAVING COUNT(*) >= 3
ORDER BY l_partkey
"""


@register(
    "subq_scalar_below_avg",
    _SCALAR_SUBQ_SQL,
    "TPC-H Q17-shaped correlated scalar subquery, de-correlated as agg + "
    "self-join on the correlation key (what Catalyst's rewrite produces)",
)
def subq_scalar(spark, sf_dir):
    prep(spark)
    li = T(spark, sf_dir, "lineitem")
    avg_by_part = li.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        (F.avg("l_quantity") * 0.5).alias("half_avg")
    )
    return (
        li.join(avg_by_part, li.l_partkey == avg_by_part.ap_partkey)
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .groupBy("l_partkey")
        .agg(
            F.round(F.sum("l_extendedprice"), 2).alias("below_avg_revenue"),
            F.count(F.lit(1)).alias("n_small"),
        )
        .filter(F.col("n_small") >= 3)
        .orderBy("l_partkey")
    )


# ---------------------------------------------------------------- GROUPING SETS

_GSETS_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
       ROUND(SUM(l_extendedprice), 2) AS revenue,
       COUNT(*) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
"""


@register(
    "agg_grouping_sets",
    _GSETS_SQL,
    "explicit GROUPING SETS (finer than rollup/cube) via the SQL surface",
)
def agg_gsets(spark, sf_dir):
    prep(spark)
    T(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
               ROUND(SUM(l_extendedprice), 2) AS revenue,
               COUNT(*) AS n
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
        """
    )


# ---------------------------------------------------------------- distribution window fns

_NTILE_SQL = """
WITH spend AS (
  SELECT o_custkey, ROUND(SUM(o_totalprice), 2) AS total
  FROM orders GROUP BY o_custkey
)
SELECT o_custkey, total,
       CAST(NTILE(4) OVER w AS BIGINT)      AS quartile,
       ROUND(ROUND(CUME_DIST() OVER w, 8), 4)       AS cume,
       ROUND(ROUND(PERCENT_RANK() OVER w, 8), 4)    AS pct_rank
FROM spend
WINDOW w AS (ORDER BY total DESC, o_custkey)
ORDER BY total DESC, o_custkey
LIMIT 100
"""


@register(
    "win_ntile_cume_dist",
    _NTILE_SQL,
    "distribution window functions: ntile / cume_dist / percent_rank",
)
def win_ntile(spark, sf_dir):
    prep(spark)
    from cassabon_spark.operators.rank import distributed_row_number, ntile_from_rank

    o = T(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(F.round(F.sum("o_totalprice"), 2).alias("total"))
    # ntile/cume_dist/percent_rank over the WHOLE ranking is the query's
    # semantics (VERDICT r2 note #3) — but with a UNIQUE ordering key
    # (total, o_custkey) every distribution function is an exact function
    # of (row_number, count): cume_dist = rnk/n (no peers), percent_rank
    # = (rnk-1)/(n-1), ntile via the standard remainder rule. r6: computed
    # through the distributed ranker, so the global sort runs at cluster
    # width instead of Exchange SinglePartition -> Sort -> Window (the
    # registry-wide audit caught this one; one row per CUSTOMER still
    # scales with the corpus). Identical output to the oracle's windows.
    ranked = distributed_row_number(
        spend,
        [F.desc("total"), F.asc("o_custkey")],
        rank_col="rnk",
        total_col="n",
    )
    return (
        ranked.select(
            "o_custkey",
            "total",
            ntile_from_rank("rnk", "n", 4).cast("bigint").alias("quartile"),
            R(F.col("rnk") / F.col("n"), 4).alias("cume"),
            # n == 1 guard: (rnk-1)/(n-1) is 0/0 there, but SQL
            # PERCENT_RANK() over a single row is defined as 0.0
            R(
                F.when(F.col("n") == 1, F.lit(0.0)).otherwise(
                    (F.col("rnk") - 1) / (F.col("n") - 1)
                ),
                4,
            ).alias("pct_rank"),
        )
        .orderBy(F.desc("total"), F.asc("o_custkey"))
        .limit(100)
    )


# ---------------------------------------------------------------- value window fns

_NTH_SQL = """
SELECT o_custkey,
       o_orderkey,
       FIRST_VALUE(o_totalprice) OVER w AS first_price,
       LAST_VALUE(o_totalprice)  OVER w AS latest_price,
       NTH_VALUE(o_totalprice, 2) OVER w AS second_price
FROM orders
WHERE o_custkey < 50
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
ORDER BY o_custkey, o_orderkey
"""


@register(
    "win_first_last_nth",
    _NTH_SQL,
    "value window functions: first_value / last_value / nth_value over an "
    "unbounded frame",
)
def win_nth(spark, sf_dir):
    prep(spark)
    o = T(spark, sf_dir, "orders").filter(F.col("o_custkey") < 50)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.first_value("o_totalprice").over(w).alias("first_price"),
            F.last_value("o_totalprice").over(w).alias("latest_price"),
            F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


# ---------------------------------------------------------------- map functions

_MAP_SQL = """
WITH m AS (
  SELECT p_brand,
         MAP(['size', 'retail'], [CAST(p_size AS DOUBLE), p_retailprice]) AS props
  FROM part
)
SELECT p_brand,
       COUNT(*) AS n,
       ROUND(SUM(props['size'][1]), 2)   AS total_size,
       ROUND(SUM(props['retail'][1]), 2) AS total_retail
FROM m
GROUP BY p_brand
ORDER BY p_brand
"""


@register(
    "scalar_map_funcs",
    _MAP_SQL,
    "map construction + element_at access (MapType surface)",
)
def scalar_map(spark, sf_dir):
    prep(spark)
    p = T(spark, sf_dir, "part")
    props = F.create_map(
        F.lit("size"), F.col("p_size").cast("double"),
        F.lit("retail"), F.col("p_retailprice"),
    )
    m = p.select("p_brand", props.alias("props"))
    return (
        m.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.element_at("props", F.lit("size"))), 2).alias("total_size"),
            F.round(F.sum(F.element_at("props", F.lit("retail"))), 2).alias("total_retail"),
        )
        .orderBy("p_brand")
    )


# ---------------------------------------------------------------- q6 forecast revenue

_Q6_SQL = """
SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
       COUNT(*) AS n_candidates
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1994-01-01'
  AND l_shipdate <  TIMESTAMP '1995-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@register(
    "q6_forecast_revenue",
    _Q6_SQL,
    "TPC-H Q6: pure filter + agg — every predicate rides the parquet scan "
    "(min/max row-group skipping), the canonical pushdown query",
)
def q6(spark, sf_dir):
    prep(spark)
    li = T(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= "1994-01-01")
        & (F.col("l_shipdate") < "1995-01-01")
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_candidates"),
    )


# ---------------------------------------------------------------- q14 promo effect

_Q14_SQL = """
SELECT ROUND(ROUND(100.00 * SUM(CASE WHEN p_type LIKE 'PROMO%'
                         THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
             / SUM(l_extendedprice * (1 - l_discount)), 8), 4) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1995-09-01'
  AND l_shipdate <  TIMESTAMP '1995-10-01'
"""


@register(
    "q14_promo_effect",
    _Q14_SQL,
    "TPC-H Q14: fact-dim join + conditional aggregation; part broadcasts",
)
def q14(spark, sf_dir):
    prep(spark)
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-09-01") & (F.col("l_shipdate") < "1995-10-01")
    )
    p = T(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(F.lit(0.0))
    return li.join(F.broadcast(p), li.l_partkey == p.p_partkey).agg(
        R(100.0 * F.sum(promo) / F.sum(rev), 4).alias("promo_revenue_pct")
    )


# ---------------------------------------------------------------- math scalars

_MATH_SQL = """
SELECT l_linenumber,
       COUNT(*) AS n,
       ROUND(SUM(ABS(l_extendedprice - l_quantity * 1000)), 2) AS sum_abs_dev,
       ROUND(SUM(POW(l_discount, 2)), 4)                       AS sum_disc_sq,
       ROUND(SUM(LN(l_extendedprice)), 4)                      AS sum_log_price,
       ROUND(SUM(FLOOR(l_quantity / 7)), 1)                    AS sum_floor_q7,
       ROUND(SUM(CEIL(l_tax * 100)), 1)                        AS sum_ceil_tax,
       CAST(SUM(CAST(l_orderkey AS BIGINT) % 7) AS BIGINT)     AS sum_mod7
FROM lineitem
GROUP BY l_linenumber
ORDER BY l_linenumber
"""


@register(
    "scalar_math_funcs",
    _MATH_SQL,
    "math scalar functions: abs/pow/ln/floor/ceil/pmod, all whole-stage codegen",
)
def scalar_math(spark, sf_dir):
    prep(spark)
    li = T(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_linenumber")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.abs(F.col("l_extendedprice") - F.col("l_quantity") * 1000)), 2)
            .alias("sum_abs_dev"),
            F.round(F.sum(F.pow("l_discount", F.lit(2))), 4).alias("sum_disc_sq"),
            F.round(F.sum(F.log("l_extendedprice")), 4).alias("sum_log_price"),
            F.round(F.sum(F.floor(F.col("l_quantity") / 7)), 1).alias("sum_floor_q7"),
            F.round(F.sum(F.ceil(F.col("l_tax") * 100)), 1).alias("sum_ceil_tax"),
            F.sum(F.pmod(F.col("l_orderkey").cast("bigint"), F.lit(7)))
            .cast("bigint")
            .alias("sum_mod7"),
        )
        .orderBy("l_linenumber")
    )


# ---------------------------------------------------------------- unpivot

_UNPIVOT_SQL = """
WITH wide AS (
  SELECT l_returnflag,
         ROUND(SUM(l_quantity), 2)      AS qty,
         ROUND(SUM(l_discount), 2)      AS disc,
         ROUND(SUM(l_tax), 2)           AS tax
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, metric, value
FROM wide UNPIVOT (value FOR metric IN (qty, disc, tax))
ORDER BY l_returnflag, metric
"""


@register(
    "unpivot_lineitem_sums",
    _UNPIVOT_SQL,
    "unpivot/melt: wide per-flag sums to long (metric, value) form — the "
    "inverse of the pivot query",
)
def unpivot_sums(spark, sf_dir):
    prep(spark)
    li = T(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 2).alias("qty"),
        F.round(F.sum("l_discount"), 2).alias("disc"),
        F.round(F.sum("l_tax"), 2).alias("tax"),
    )
    return (
        wide.unpivot("l_returnflag", ["qty", "disc", "tax"], "metric", "value")
        .orderBy("l_returnflag", "metric")
    )


# ---------------------------------------------------------------- q10 returned items

_Q10_SQL = """
SELECT c.c_custkey, c.c_name, n.n_name,
       CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l.l_discount AS DECIMAL(18,6)))), 2) AS DOUBLE) AS revenue,
       ROUND(c.c_acctbal, 2) AS acctbal
FROM customer c
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON n.n_nationkey = c.c_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1996-04-01'
GROUP BY 1, 2, 3, c.c_acctbal
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register(
    "q10_returned_items",
    _Q10_SQL,
    "TPC-H Q10: 4-way join (broadcast dims), agg, global top-20 by revenue",
)
def q10(spark, sf_dir):
    prep(spark)
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = T(spark, sf_dir, "nation")
    # exact decimal summation: float sums of ~1000 terms land on .xx5
    # half-way cases that round differently per engine; decimal math is
    # associative and identical in Spark and DuckDB
    rev = F.col("l_extendedprice").cast("decimal(18,6)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,6)")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(F.round(F.sum(rev), 2).cast("double").alias("revenue"))
        .select(
            "c_custkey", "c_name", "n_name", "revenue",
            F.round("c_acctbal", 2).alias("acctbal"),
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------- q18 big orders

_Q18_SQL = """
WITH big AS (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 210
)
SELECT c.c_name, o.o_orderkey,
       CAST(EPOCH(o.o_orderdate) AS BIGINT) AS orderdate_s,
       ROUND(o.o_totalprice, 2) AS totalprice,
       ROUND(SUM(l.l_quantity), 2) AS total_qty
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
GROUP BY 1, 2, 3, o.o_totalprice
ORDER BY totalprice DESC, o_orderkey
LIMIT 100
"""


@register(
    "q18_large_volume_orders",
    _Q18_SQL,
    "TPC-H Q18: HAVING-filtered agg feeds an IN subquery (left-semi); "
    "orders re-joined to lineitem for the report",
)
def q18(spark, sf_dir):
    prep(spark)
    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 210)
        .select("l_orderkey")
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey, "left_semi")
        .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy("c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .select(
            "c_name",
            "o_orderkey",
            F.unix_timestamp("o_orderdate").alias("orderdate_s"),
            F.round("o_totalprice", 2).alias("totalprice"),
            "total_qty",
        )
        .orderBy(F.desc("totalprice"), "o_orderkey")
        .limit(100)
    )


# ---------------------------------------------------------------- mode + histogram

_MODE_SQL = """
SELECT l_returnflag,
       MODE(l_linestatus)  AS mode_status,
       CAST(MODE(l_linenumber) AS BIGINT) AS mode_linenumber
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register(
    "agg_mode",
    _MODE_SQL,
    "mode() aggregate (most frequent value per group) — data-profiling "
    "primitive; restricted to columns whose max frequency is unique (mode "
    "is engine-nondeterministic under ties, verified at sf0.001)",
)
def agg_mode(spark, sf_dir):
    prep(spark)
    li = T(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.mode("l_linestatus").alias("mode_status"),
            F.mode("l_linenumber").cast("bigint").alias("mode_linenumber"),
        )
        .orderBy("l_returnflag")
    )


_HIST_SQL = """
WITH b AS (
  SELECT CAST(FLOOR(l_extendedprice / 10000) AS BIGINT) AS bucket
  FROM lineitem
)
SELECT bucket,
       bucket * 10000      AS lo,
       bucket * 10000 + 10000 AS hi,
       COUNT(*)            AS n
FROM b
GROUP BY bucket
ORDER BY bucket
"""


@register(
    "agg_histogram",
    _HIST_SQL,
    "value histogram via floor-div bucketing — the profiling pass a "
    "training-data pipeline runs before choosing filters; one map-side-"
    "combined aggregation",
)
def agg_histogram(spark, sf_dir):
    prep(spark)
    li = T(spark, sf_dir, "lineitem")
    bucket = F.floor(F.col("l_extendedprice") / 10000).cast("bigint")
    return (
        li.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bucket",
            (F.col("bucket") * 10000).alias("lo"),
            (F.col("bucket") * 10000 + 10000).alias("hi"),
            "n",
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------- union distinct

_UNION_SQL = """
WITH u AS (
  SELECT c_nationkey AS k FROM customer
  UNION
  SELECT s_nationkey FROM supplier
),
ua AS (
  SELECT c_nationkey AS k FROM customer
  UNION ALL
  SELECT s_nationkey FROM supplier
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM u)  AS n_distinct_keys,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM ua) AS n_all_rows
"""


@register(
    "setop_union_distinct",
    _UNION_SQL,
    "UNION (distinct) vs UNION ALL: the distinct variant pays one shuffle "
    "on the key, the ALL variant is a free concatenation — completing the "
    "set-op family alongside intersect/except",
)
def setop_union(spark, sf_dir):
    prep(spark)
    cn = T(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    sn = T(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    u = cn.union(sn).distinct().agg(F.count(F.lit(1)).alias("n_distinct_keys"))
    ua = cn.union(sn).agg(F.count(F.lit(1)).alias("n_all_rows"))
    return u.crossJoin(ua)


# ---------------------------------------------------------------- corr / covar

_CORR_SQL = """
SELECT l_returnflag,
       ROUND(ROUND(CORR(l_extendedprice, l_quantity), 8), 4)      AS corr_price_qty,
       ROUND(ROUND(COVAR_SAMP(l_extendedprice, l_discount), 8), 4) AS covar_price_disc,
       ROUND(ROUND(STDDEV_SAMP(l_extendedprice), 8), 4)            AS sd_price
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register(
    "agg_corr_covar",
    _CORR_SQL,
    "correlation / sample covariance / sample stddev per group — the "
    "bivariate-stats aggregates, one hash aggregation",
)
def agg_corr_covar(spark, sf_dir):
    prep(spark)
    li = T(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            R(F.corr("l_extendedprice", "l_quantity"), 4).alias("corr_price_qty"),
            R(F.covar_samp("l_extendedprice", "l_discount"), 4).alias("covar_price_disc"),
            R(F.stddev_samp("l_extendedprice"), 4).alias("sd_price"),
        )
        .orderBy("l_returnflag")
    )


# ------------------------------------------------- funnel / cohort (round 3)

# Ordered conversion funnel view -> click -> purchase: each stage counts
# users whose FIRST qualifying event happens strictly AFTER their previous
# stage's first event (the standard product-analytics funnel, not a mere
# per-type count). Every stage is a user-keyed aggregation — co-partitioned
# shuffles on user_id, no window over the raw event stream.
_FUNNEL_SQL = """
WITH v AS (
  SELECT user_id, MIN(ts) AS t0 FROM events WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, MIN(e.ts) AS t1
  FROM events e JOIN v ON v.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t0
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN c ON c.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t1
  GROUP BY e.user_id
)
SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS stage_view,
       CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS stage_click,
       CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS stage_purchase,
       ROUND(ROUND((SELECT COUNT(*) FROM p) * 1.0
             / (SELECT COUNT(*) FROM v), 8), 4)  AS conv_rate,
       ROUND(ROUND((SELECT AVG(EPOCH(p.t2) - EPOCH(v.t0))
                    FROM p JOIN v ON v.user_id = p.user_id), 6), 2) AS avg_secs_to_convert
"""


@register(
    "events_funnel_conversion",
    _FUNNEL_SQL,
    "ordered conversion funnel (view -> click -> purchase, strict event-time "
    "ordering per user): stage survivor counts, conversion rate, mean "
    "time-to-convert",
)
def events_funnel(spark, sf_dir):
    prep(spark)
    ev = T(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    secs = p.join(v, "user_id").agg(
        F.avg(F.col("t2").cast("double") - F.col("t0").cast("double")).alias("s")
    )
    return (
        v.agg(F.count(F.lit(1)).alias("stage_view"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("stage_click")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("stage_purchase")))
        .crossJoin(secs)
        .select(
            "stage_view",
            "stage_click",
            "stage_purchase",
            R(F.col("stage_purchase") / F.col("stage_view"), 4).alias("conv_rate"),
            F.round(F.round(F.col("s"), 6), 2).alias("avg_secs_to_convert"),
        )
    )


# Weekly cohort retention: users cohorted by the Monday-truncated week of
# their first event; retention = fraction of the cohort active at each
# week offset. Timestamps are NTZ so week arithmetic is exact 604800-second
# steps (no DST). The retention matrix is (weeks x weeks)-sized — tiny at
# any scale; the heavy lifting is two user-keyed aggregations.
_COHORT_SQL = """
WITH first_seen AS (
  SELECT user_id, DATE_TRUNC('week', MIN(ts)) AS cohort FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT user_id, DATE_TRUNC('week', ts) AS wk FROM events
),
ret AS (
  SELECT f.cohort,
         CAST((EPOCH(a.wk) - EPOCH(f.cohort)) / 604800 AS BIGINT) AS week_offset,
         COUNT(DISTINCT a.user_id) AS active_users
  FROM activity a JOIN first_seen f USING (user_id)
  GROUP BY 1, 2
),
sizes AS (SELECT cohort, COUNT(*) AS cohort_size FROM first_seen GROUP BY cohort)
SELECT CAST(r.cohort AS DATE)                     AS cohort_week,
       r.week_offset,
       CAST(r.active_users AS BIGINT)             AS active_users,
       ROUND(ROUND(r.active_users * 1.0 / s.cohort_size, 8), 4) AS retention
FROM ret r JOIN sizes s USING (cohort)
ORDER BY cohort_week, week_offset
"""


@register(
    "events_cohort_retention",
    _COHORT_SQL,
    "weekly cohort retention matrix: first-seen-week cohorts, per-offset "
    "active-user fractions; week arithmetic exact over NTZ timestamps",
)
def events_cohort_retention(spark, sf_dir):
    prep(spark)
    ev = T(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("wk")
    ).distinct()
    ret = (
        activity.join(first_seen, "user_id")
        .withColumn(
            "week_offset",
            (
                (F.col("wk").cast("double") - F.col("cohort").cast("double"))
                / F.lit(604800)
            ).cast("bigint"),
        )
        .groupBy("cohort", "week_offset")
        .agg(F.countDistinct("user_id").alias("active_users"))
    )
    sizes = first_seen.groupBy("cohort").agg(F.count(F.lit(1)).alias("cohort_size"))
    return (
        ret.join(sizes, "cohort")
        .select(
            F.to_date("cohort").alias("cohort_week"),
            "week_offset",
            "active_users",
            R(F.col("active_users") / F.col("cohort_size"), 4).alias("retention"),
        )
        .orderBy("cohort_week", "week_offset")
    )
