"""TPC-H completion set (SURVEY §2 Part B) — the 15 query shapes not yet in
`relational.py`, adapted to the reduced testdata schema.

The testdata star schema (TESTDATA.md) omits `partsupp` and several TPC-H
columns (receipt/commit dates, ship mode/instruct, phone, comments, mfgr,
container). Each query here keeps the ORIGINAL's distinctive plan shape —
that is what the engine must demonstrate — with predicates re-based onto the
columns that exist:

  * part-supplier relation  -> DISTINCT (l_partkey, l_suppkey) from lineitem
  * "late" line             -> l_shipdate > o_orderdate + 60 days
  * supply cost             -> 0.6 * p_retailprice surrogate
  * customer country code   -> trailing digit of c_name
  * supplier "complaint"    -> s_acctbal < 0

Scale notes (100 TB target): nation/region/supplier are true fixed-size dims
— always broadcast. part/customer grow with SF; they are broadcast here
(MBs at bench scale) but the join keys stay equi so Catalyst/AQE can fall
back to shuffle-hash/sort-merge when the dim outgrows the threshold.
Revenue sums run in DECIMAL(18,6) on both engines (associative, bit-identical
across Spark and DuckDB) and cast to DOUBLE at the boundary; quantity sums
stay double because l_quantity is integral (exact under any summation order).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cassabon_spark.queries import R, T, register
from cassabon_spark.session import prep


def _dec(col: str):
    return F.col(col).cast("decimal(18,6)")


def _rev():
    """Line revenue in exact decimal: extendedprice * (1 - discount)."""
    return _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))


_DEC_REV_SQL = "CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))"


# ---------------------------------------------------------------- q2 min-cost supplier

_Q2_SQL = """
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
     eu AS (SELECT s_suppkey, s_name, s_acctbal, n_name
            FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'EUROPE'),
     cand AS (SELECT p_partkey, p_type, s_name, n_name, s_acctbal
              FROM part
              JOIN ps ON p_partkey = l_partkey
              JOIN eu ON l_suppkey = s_suppkey
              WHERE p_size <= 10 AND p_type = 'STANDARD')
SELECT p_partkey, p_type, s_name, n_name, ROUND(s_acctbal, 2) AS acctbal
FROM cand c1
WHERE s_acctbal = (SELECT MIN(s_acctbal) FROM cand c2 WHERE c2.p_partkey = c1.p_partkey)
ORDER BY acctbal DESC, s_name, p_partkey
LIMIT 100
"""


@register(
    "q2_min_cost_supplier",
    _Q2_SQL,
    "TPC-H Q2 shape: correlated MIN subquery over a derived part-supplier "
    "relation (no partsupp in schema: DISTINCT (l_partkey,l_suppkey) stands "
    "in). Spark plan: groupBy-min + equi re-join instead of a correlated "
    "probe — one shuffle on p_partkey, dims broadcast.",
)
def q2(spark, sf_dir):
    prep(spark)
    ps = T(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    eu = (
        T(spark, sf_dir, "supplier")
        .join(F.broadcast(T(spark, sf_dir, "nation")), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(T(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    part = T(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 10) & (F.col("p_type") == "STANDARD")
    )
    cand = (
        ps.join(F.broadcast(part), ps.l_partkey == part.p_partkey)
        .join(F.broadcast(eu), ps.l_suppkey == eu.s_suppkey)
        .select("p_partkey", "p_type", "s_name", "n_name", "s_acctbal")
    )
    mins = cand.groupBy(F.col("p_partkey").alias("mk")).agg(F.min("s_acctbal").alias("min_bal"))
    return (
        cand.join(F.broadcast(mins),
                  (cand.p_partkey == mins.mk) & (cand.s_acctbal == mins.min_bal))
        .select("p_partkey", "p_type", "s_name", "n_name",
                F.round("s_acctbal", 2).alias("acctbal"))
        .orderBy(F.desc("acctbal"), "s_name", "p_partkey")
        .limit(100)
    )


# ---------------------------------------------------------------- q4 order priority

_Q4_SQL = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register(
    "q4_order_priority",
    _Q4_SQL,
    "TPC-H Q4 shape: EXISTS with a correlated non-equi predicate -> left_semi "
    "join (hash on orderkey, residual shipdate filter); 'late' = shipped "
    ">60 days after order date (schema has no commit/receipt dates).",
)
def q4(spark, sf_dir):
    prep(spark)
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-07-01") & (F.col("o_orderdate") < "1996-10-01")
    )
    li = T(spark, sf_dir, "lineitem")
    late = (li.l_orderkey == o.o_orderkey) & (
        li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("bigint").alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------- q7 volume shipping

_Q7_SQL = f"""
WITH flat AS (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(YEAR(l_shipdate) AS INTEGER) AS l_year,
         {_DEC_REV_SQL} AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
      OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
    AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
)
SELECT supp_nation, cust_nation, l_year,
       CAST(ROUND(SUM(volume), 2) AS DOUBLE) AS revenue
FROM flat
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


@register(
    "q7_volume_shipping",
    _Q7_SQL,
    "TPC-H Q7: two-nation trade volume by ship year. nation joined twice "
    "(supplier side and customer side), both broadcast; the disjunctive "
    "nation-pair predicate prunes before the groupBy shuffle.",
)
def q7(spark, sf_dir):
    prep(spark)
    li = T(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between("1996-01-01", "1997-12-31 23:59:59")
    )
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    s = T(spark, sf_dir, "supplier")
    nat = T(spark, sf_dir, "nation")
    n1 = nat.select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("supp_nation"))
    n2 = nat.select(F.col("n_nationkey").alias("ck"), F.col("n_name").alias("cust_nation"))
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_8")
    ) | ((F.col("supp_nation") == "NATION_8") & (F.col("cust_nation") == "NATION_3"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("ck"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year"))
        .agg(F.round(F.sum(_rev()), 2).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ---------------------------------------------------------------- q8 market share

_Q8_SQL = f"""
WITH flat AS (
  SELECT CAST(YEAR(o_orderdate) AS INTEGER) AS o_year,
         {_DEC_REV_SQL} AS volume,
         n2.n_name AS supp_nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA' AND p_type = 'PROMO'
    AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
)
SELECT o_year,
       ROUND(ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN volume ELSE 0 END) AS DOUBLE)
                   / CAST(SUM(volume) AS DOUBLE), 8), 4) AS mkt_share
FROM flat
GROUP BY o_year
ORDER BY o_year
"""


@register(
    "q8_market_share",
    _Q8_SQL,
    "TPC-H Q8: one nation's share of regional PROMO revenue by order year. "
    "Conditional decimal sums -> exact numerator/denominator on both "
    "engines; the ratio is divided in DOUBLE and double-rounded (R policy).",
)
def q8(spark, sf_dir):
    prep(spark)
    li = T(spark, sf_dir, "lineitem")
    p = T(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = T(spark, sf_dir, "supplier")
    o = T(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between("1996-01-01", "1997-12-31 23:59:59")
    )
    c = T(spark, sf_dir, "customer")
    nat = T(spark, sf_dir, "nation")
    n1 = nat.select(F.col("n_nationkey").alias("ck"), F.col("n_regionkey").alias("crk"))
    n2 = nat.select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("supp_nation"))
    reg = T(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    vol = _rev()
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("ck"))
        .join(F.broadcast(reg), F.col("crk") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("sk"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            R(
                F.sum(F.when(F.col("supp_nation") == "NATION_5", vol).otherwise(F.lit(0))).cast("double")
                / F.sum(vol).cast("double"),
                4,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# ---------------------------------------------------------------- q9 product profit

_Q9_SQL = f"""
WITH flat AS (
  SELECT n_name AS nation, CAST(YEAR(o_orderdate) AS INTEGER) AS o_year,
         {_DEC_REV_SQL}
           - CAST(0.6 AS DECIMAL(18,6)) * CAST(l_quantity AS DECIMAL(18,6))
             * CAST(p_retailprice AS DECIMAL(18,6)) AS amount
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE p_type = 'ECONOMY'
)
SELECT nation, o_year, CAST(ROUND(SUM(amount), 2) AS DOUBLE) AS sum_profit
FROM flat
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
"""


@register(
    "q9_product_profit",
    _Q9_SQL,
    "TPC-H Q9 shape: profit per supplier-nation per year. Supply cost "
    "surrogate = 0.6 * p_retailprice (no partsupp.ps_supplycost in schema); "
    "all arithmetic in decimal so both engines sum bit-identically.",
)
def q9(spark, sf_dir):
    prep(spark)
    li = T(spark, sf_dir, "lineitem")
    p = T(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    s = T(spark, sf_dir, "supplier")
    o = T(spark, sf_dir, "orders")
    nat = T(spark, sf_dir, "nation")
    amount = _rev() - (
        F.lit(0.6).cast("decimal(18,6)") * _dec("l_quantity") * _dec("p_retailprice")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.round(F.sum(amount), 2).cast("double").alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


# ---------------------------------------------------------------- q11 important stock

_Q11_SQL = """
WITH nl AS (
  SELECT l_partkey, CAST(l_extendedprice AS DECIMAL(18,6)) AS v
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_3'
),
pv AS (SELECT l_partkey, SUM(v) AS value FROM nl GROUP BY l_partkey)
SELECT l_partkey AS p_partkey, CAST(ROUND(value, 2) AS DOUBLE) AS traded_value
FROM pv
WHERE value > (SELECT SUM(value) * 0.001 FROM pv)
ORDER BY traded_value DESC, p_partkey
"""


@register(
    "q11_important_stock",
    _Q11_SQL,
    "TPC-H Q11 shape: per-part traded value for one nation's suppliers, "
    "HAVING value > fraction-of-global-total (scalar subquery). Spark: the "
    "per-part agg is computed once, the global total reduced from it and "
    "broadcast back as a cross-join scalar — no second scan.",
)
def q11(spark, sf_dir):
    prep(spark)
    li = T(spark, sf_dir, "lineitem")
    s = T(spark, sf_dir, "supplier")
    nat = T(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    nl = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("l_partkey", _dec("l_extendedprice").alias("v"))
    )
    pv = nl.groupBy("l_partkey").agg(F.sum("v").alias("value"))
    total = pv.agg((F.sum("value") * F.lit(0.001)).alias("threshold"))
    return (
        pv.crossJoin(F.broadcast(total))
        .filter(F.col("value") > F.col("threshold"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round("value", 2).cast("double").alias("traded_value"),
        )
        .orderBy(F.desc("traded_value"), "p_partkey")
    )


# ---------------------------------------------------------------- q12 ship speed

_Q12_SQL = """
SELECT CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY THEN 'SLOW'
            WHEN l_shipdate > o_orderdate + INTERVAL 30 DAY THEN 'MEDIUM'
            ELSE 'FAST' END AS ship_speed,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY 1
ORDER BY 1
"""


@register(
    "q12_ship_speed",
    _Q12_SQL,
    "TPC-H Q12 shape: conditional counts by shipping-delay bucket (no "
    "l_shipmode in schema; bucket = days between order and ship date). "
    "Single fact-fact equi join then one 3-group hash agg.",
)
def q12(spark, sf_dir):
    prep(spark)
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    o = T(spark, sf_dir, "orders")
    speed = (
        F.when(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"), "SLOW")
        .when(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"), "MEDIUM")
        .otherwise("FAST")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(speed.alias("ship_speed"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("bigint").alias("low_line_count"),
        )
        .orderBy("ship_speed")
    )


# ---------------------------------------------------------------- q13 customer distribution

_Q13_SQL = """
WITH c_orders AS (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT OUTER JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
  GROUP BY c_custkey
)
SELECT CAST(c_count AS BIGINT) AS c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@register(
    "q13_customer_distribution",
    _Q13_SQL,
    "TPC-H Q13: order-count-per-customer histogram. Left outer join keeps "
    "order-less customers (count 0); join-side filter (priority <> 5-LOW "
    "standing in for the comment NOT LIKE) stays in the join condition so "
    "the outer row survives. Two cascaded hash aggs.",
)
def q13(spark, sf_dir):
    prep(spark)
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "5-LOW")
    c_orders = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        c_orders.groupBy(F.col("c_count").cast("bigint").alias("c_count"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# ---------------------------------------------------------------- q15 top supplier

_Q15_SQL = f"""
WITH rev AS (
  SELECT l_suppkey AS supplier_no, SUM({_DEC_REV_SQL}) AS total
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(ROUND(total, 2) AS DOUBLE) AS total_revenue
FROM supplier
JOIN rev ON s_suppkey = supplier_no
WHERE total = (SELECT MAX(total) FROM rev)
ORDER BY s_suppkey
"""


@register(
    "q15_top_supplier",
    _Q15_SQL,
    "TPC-H Q15: supplier(s) with max quarterly revenue. The revenue agg is "
    "small (one row per supplier) so the MAX scalar comes from re-reducing "
    "it and broadcasting back — decimal totals make the = comparison exact.",
)
def q15(spark, sf_dir):
    prep(spark)
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    s = T(spark, sf_dir, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(F.sum(_rev()).alias("total"))
    mx = rev.agg(F.max("total").alias("mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total") == F.col("mx"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", F.round("total", 2).cast("double").alias("total_revenue"))
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------- q16 supplier-part counts

_Q16_SQL = """
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT p_brand, p_type, p_size, CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM ps
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#5'
  AND p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


@register(
    "q16_supplier_part_counts",
    _Q16_SQL,
    "TPC-H Q16 shape: distinct-supplier counts per (brand, type, size) with "
    "a NOT IN exclusion ('complaint' surrogate: negative acctbal) -> "
    "left_anti against a broadcast exclusion list, then count-distinct "
    "(Catalyst expands to two-phase agg).",
)
def q16(spark, sf_dir):
    prep(spark)
    ps = T(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    part = T(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45))
    )
    bad = T(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        ps.join(F.broadcast(bad), ps.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(part), ps.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# ---------------------------------------------------------------- q17 small-quantity revenue

_Q17_SQL = """
WITH pa AS (
  SELECT l_partkey AS pk, 0.5 * AVG(l_quantity) AS half_avg
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(ROUND(ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0, 6), 2) AS DOUBLE) AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN pa   ON pk = l_partkey
WHERE p_brand = 'Brand#7' AND l_quantity < half_avg
"""


@register(
    "q17_small_quantity_revenue",
    _Q17_SQL,
    "TPC-H Q17: lines below half the part's average quantity. The "
    "correlated AVG becomes a groupBy over lineitem re-joined on partkey; "
    "l_quantity is integral so the AVG (exact sum / exact count) is the "
    "same IEEE double on both engines and the < comparison is stable.",
)
def q17(spark, sf_dir):
    prep(spark)
    li = T(spark, sf_dir, "lineitem")
    part = T(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#7")
    pa = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.lit(0.5) * F.avg("l_quantity")).alias("half_avg")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(pa, F.col("pk") == li.l_partkey)
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(
            F.round(
                F.round(F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0), 6), 2
            ).cast("double").alias("avg_yearly")
        )
    )


# ---------------------------------------------------------------- q19 disjunctive predicates

_Q19_SQL = f"""
SELECT CAST(ROUND(SUM({_DEC_REV_SQL}), 2) AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
"""


@register(
    "q19_disjunctive_predicates",
    _Q19_SQL,
    "TPC-H Q19 shape: three OR'd brand/size/quantity branches over an equi "
    "join. The join stays a (broadcast) hash join on p_partkey; the "
    "disjunction is a post-join residual filter, with the brand IN-list "
    "derivable for part-side pruning.",
)
def q19(spark, sf_dir):
    prep(spark)
    li = T(spark, sf_dir, "lineitem")
    part = T(spark, sf_dir, "part")
    cond = (
        (F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5) & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10) & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(20, 30)
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(
            F.round(F.sum(_rev()), 2).cast("double").alias("revenue"),
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------- q20 excess suppliers

_Q20_SQL = """
WITH sq AS (
  SELECT l_partkey, l_suppkey, SUM(l_quantity) AS qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY l_partkey, l_suppkey
),
pq AS (
  SELECT l_partkey AS pk, SUM(qty) AS total_qty, COUNT(*) AS n_supp
  FROM sq GROUP BY l_partkey
),
excess AS (
  SELECT DISTINCT l_suppkey
  FROM sq
  JOIN pq ON pk = l_partkey
  JOIN part ON p_partkey = l_partkey
  WHERE p_type = 'PROMO' AND qty > 2.0 * total_qty / n_supp
)
SELECT s_name, ROUND(s_acctbal, 2) AS acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'AFRICA'
  AND s_suppkey IN (SELECT l_suppkey FROM excess)
ORDER BY s_name
"""


@register(
    "q20_excess_suppliers",
    _Q20_SQL,
    "TPC-H Q20 shape: nested-aggregate semi-join chain — suppliers in one "
    "region that shipped >2x the average per-supplier share of a PROMO part "
    "in 1996 (availqty surrogate). Quantity sums are integral-exact; the "
    "threshold arithmetic is the same IEEE expression on both engines.",
)
def q20(spark, sf_dir):
    prep(spark)
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    sq = li.groupBy("l_partkey", "l_suppkey").agg(F.sum("l_quantity").alias("qty"))
    pq = sq.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum("qty").alias("total_qty"), F.count(F.lit(1)).alias("n_supp")
    )
    promo = T(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    excess = (
        sq.join(pq, sq.l_partkey == pq.pk)
        .join(F.broadcast(promo), sq.l_partkey == promo.p_partkey, "left_semi")
        .filter(F.col("qty") > F.lit(2.0) * F.col("total_qty") / F.col("n_supp"))
        .select("l_suppkey")
        .distinct()
    )
    s = T(spark, sf_dir, "supplier")
    nat = T(spark, sf_dir, "nation")
    reg = T(spark, sf_dir, "region").filter(F.col("r_name") == "AFRICA")
    return (
        s.join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(excess, s.s_suppkey == excess.l_suppkey, "left_semi")
        .select("s_name", F.round("s_acctbal", 2).alias("acctbal"))
        .orderBy("s_name")
    )


# ---------------------------------------------------------------- q21 waiting suppliers

_Q21_SQL = """
WITH l AS (
  SELECT l_orderkey, l_suppkey,
         (l_shipdate > o_orderdate + INTERVAL 60 DAY) AS is_late
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
)
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM l l1
JOIN supplier ON l1.l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND l1.is_late
  AND EXISTS (SELECT 1 FROM l l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM l l3
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.is_late)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


@register(
    "q21_waiting_suppliers",
    _Q21_SQL,
    "TPC-H Q21 shape: sole-late-supplier on finished orders ('late' = "
    "shipped >60d after order date; schema has no receipt/commit dates). "
    "EXISTS -> left_semi and NOT EXISTS -> left_anti, both hash joins on "
    "l_orderkey with a suppkey<>suppkey residual.",
)
def q21(spark, sf_dir):
    prep(spark)
    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    lines = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")).alias("is_late"),
    )
    l1 = lines.alias("l1")
    l2 = lines.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2")
    ).alias("l2")
    l3 = lines.filter("is_late").select(
        F.col("l_orderkey").alias("ok3"), F.col("l_suppkey").alias("sk3")
    ).alias("l3")
    s = T(spark, sf_dir, "supplier")
    nat = T(spark, sf_dir, "nation")
    reg = T(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        l1.filter("is_late")
        .join(l2, (F.col("l1.l_orderkey") == F.col("ok2")) & (F.col("l1.l_suppkey") != F.col("sk2")), "left_semi")
        .join(l3, (F.col("l1.l_orderkey") == F.col("ok3")) & (F.col("l1.l_suppkey") != F.col("sk3")), "left_anti")
        .join(F.broadcast(s), F.col("l1.l_suppkey") == s.s_suppkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


# ---------------------------------------------------------------- q22 sales opportunity

_Q22_SQL = """
WITH sel AS (
  SELECT regexp_extract(c_name, '([0-9])$', 1) AS cntrycode, c_acctbal, c_custkey
  FROM customer
),
avg_bal AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS a
  FROM sel
  WHERE c_acctbal > 0.0 AND cntrycode IN ('1','3','5','7','9')
)
SELECT cntrycode, CAST(COUNT(*) AS BIGINT) AS numcust,
       CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,6))), 2) AS DOUBLE) AS totacctbal
FROM sel, avg_bal
WHERE cntrycode IN ('1','3','5','7','9')
  AND c_acctbal > a
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY cntrycode
ORDER BY cntrycode
"""


@register(
    "q22_sales_opportunity",
    _Q22_SQL,
    "TPC-H Q22 shape: dormant customers (no order since 2000; every "
    "customer has SOME order in this testdata) above the positive-balance "
    "average, grouped by 'country code' (trailing digit of c_name; schema "
    "has no phone). Scalar AVG computed as exact-decimal-sum / count so the "
    "> threshold compare is the same double on both engines; NOT EXISTS -> "
    "left_anti on recent orders.",
)
def q22(spark, sf_dir):
    prep(spark)
    c = T(spark, sf_dir, "customer").select(
        F.regexp_extract("c_name", "([0-9])$", 1).alias("cntrycode"),
        "c_acctbal",
        "c_custkey",
    )
    codes = ["1", "3", "5", "7", "9"]
    sel = c.filter(F.col("cntrycode").isin(codes))
    avg_bal = sel.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(_dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("a")
    )
    o = (
        T(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "2000-01-01")
        .select("o_custkey")
    )
    return (
        sel.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(o, sel.c_custkey == o.o_custkey, "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("numcust"),
            F.round(F.sum(_dec("c_acctbal")), 2).cast("double").alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )
