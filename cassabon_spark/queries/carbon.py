"""Part A — the reference's own operator surface (SURVEY §2 Part A),
exercised over the driver's testdata by treating `events` as a Carbon metric
stream: path = 'evt.' || event_type, value = value, ts = epoch(ts).

Every query here drives the REAL engine operators from cassabon_spark.*
(parse, route, rollup, read path, index, delete) — the oracle SQL reproduces
their semantics independently in DuckDB.

Fixed query window: events span 2024-01-01 .. 2024-01-31 UTC.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cassabon_spark.config import RollupConfig
from cassabon_spark.operators.index import expand_ancestors, search_glob
from cassabon_spark.operators.query import query_metrics_df
from cassabon_spark.operators.rollup import rollup_all_tiers, rollup_finest, route
from cassabon_spark.queries import EV, T, register
from cassabon_spark.session import prep

# 2-tier config: 1h finest, 6h coarse (6h = exact multiple, validator-legal).
EVENTS_CONFIG = RollupConfig.from_dict(
    {
        r"^evt\.purchase$": {"method": "sum", "windows": ["1h:365d", "6h:730d"]},
        r"^evt\.error$": {"method": "last", "windows": ["1h:365d", "6h:730d"]},
        "default": {"method": "average", "windows": ["1h:365d", "6h:730d"]},
    }
)

JAN_5 = 1704412800  # 2024-01-05 00:00:00 UTC — exactly on the hour boundary
JAN_8 = 1704672000  # 2024-01-08 00:00:00 UTC


def _metrics(spark, sf_dir):
    """events -> CarbonMetric triple (path, value, ts DOUBLE epoch)."""
    ev = EV(spark, sf_dir)
    return ev.select(
        F.concat(F.lit("evt."), F.col("event_type")).alias("path"),
        F.col("value"),
        F.col("ts").cast("double").alias("ts"),
        F.col("event_id"),
    )


# SQL fragment mirroring _metrics
_M = "SELECT 'evt.' || event_type AS path, value, EPOCH(ts) AS ts, event_id FROM events"


# ---------------------------------------------------------------- A3 parse/validate

_PARSE_SQL = f"""
WITH lines AS (
  SELECT PRINTF('%s %d %d', 'evt.' || event_type,
                CAST(FLOOR(value * 100) AS BIGINT),
                CAST(FLOOR(EPOCH(ts)) AS BIGINT)) AS line
  FROM events
  UNION ALL SELECT * FROM (VALUES ('malformed_line'), ('two fields'),
    ('a b c d'), ('carbon.terrible 9 Qsplork'),
    ('<<peerlist={{"A":"127.0.0.1:2003"}}>>')) v(line)
),
parsed AS (
  SELECT f[1] AS path,
         TRY_CAST(f[2] AS DOUBLE) AS value,
         TRY_CAST(f[3] AS DOUBLE) AS ts
  FROM (SELECT STRING_SPLIT_REGEX(TRIM(line), '\\s+') AS f FROM lines
        WHERE NOT REGEXP_MATCHES(line, '^\\s*<<.*>>\\s*$'))
  WHERE LEN(f) = 3
)
SELECT path,
       COUNT(*) AS n,
       ROUND(SUM(value) / 100, 2) AS total
FROM parsed
WHERE path IS NOT NULL AND value IS NOT NULL AND ts IS NOT NULL
GROUP BY path
ORDER BY path
"""


@register(
    "carbon_parse_validate",
    _PARSE_SQL,
    "A3: wire-line parse/validate incl. malformed-line drops (carbon_plaintext.go:208-255)",
)
def carbon_parse(spark, sf_dir):
    prep(spark)
    from cassabon_spark.sources.carbon import parse_carbon_lines

    ev = EV(spark, sf_dir)
    lines = ev.select(
        F.format_string(
            "%s %d %d",
            F.concat(F.lit("evt."), F.col("event_type")),
            F.floor(F.col("value") * 100).cast("bigint"),
            F.floor(F.col("ts").cast("double")).cast("bigint"),
        ).alias("line")
    )
    bad = spark.createDataFrame(
        [
            ("malformed_line",),
            ("two fields",),
            ("a b c d",),
            ("carbon.terrible 9 Qsplork",),
            ('<<peerlist={"A":"127.0.0.1:2003"}>>',),
        ],
        "line string",
    )
    metrics, _ = parse_carbon_lines(lines.unionByName(bad))
    return (
        metrics.groupBy("path")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value") / 100, 2).alias("total"),
        )
        .orderBy("path")
    )


# ---------------------------------------------------------------- A5 routing

_ROUTE_SQL = f"""
WITH m AS ({_M})
SELECT CASE WHEN REGEXP_MATCHES(path, '^evt\\.purchase$') THEN '^evt\\.purchase$'
            WHEN REGEXP_MATCHES(path, '^evt\\.error$')    THEN '^evt\\.error$'
            ELSE 'default' END AS expression,
       CASE WHEN REGEXP_MATCHES(path, '^evt\\.purchase$') THEN 'sum'
            WHEN REGEXP_MATCHES(path, '^evt\\.error$')    THEN 'last'
            ELSE 'average' END AS method,
       path,
       COUNT(*) AS n
FROM m
GROUP BY 1, 2, 3
ORDER BY path
"""


@register(
    "carbon_route_first_match",
    _ROUTE_SQL,
    "A5: first-match-wins regex routing as a Catalyst when-chain (metricstore.go:11-22)",
)
def carbon_route(spark, sf_dir):
    prep(spark)
    routed = route(_metrics(spark, sf_dir), EVENTS_CONFIG)
    return (
        routed.groupBy("expression", "method", "path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("path")
    )


# ---------------------------------------------------------------- A6/A7 tumbling rollup

_ROLLUP_SQL = f"""
WITH m AS ({_M})
SELECT path,
       CAST(FLOOR(ts / 3600) * 3600 + 3600 AS BIGINT) AS time_s,  -- window CLOSE
       COUNT(*)                   AS cnt,
       ROUND(SUM(value), 4)       AS vsum,
       ROUND(MIN(value), 4)       AS vmin,
       ROUND(MAX(value), 4)       AS vmax,
       ROUND(ARG_MAX(value, ts), 4) AS vlast
FROM m
GROUP BY 1, 2
ORDER BY path, time_s
"""


@register(
    "carbon_rollup_tumbling_1h",
    _ROLLUP_SQL,
    "A6/A7: tumbling agg, all 5 methods, close-time stamping (metricstore.go:25-43,61-185)",
)
def carbon_rollup(spark, sf_dir):
    prep(spark)
    finest = rollup_finest(route(_metrics(spark, sf_dir), EVENTS_CONFIG), EVENTS_CONFIG)
    return (
        finest.select(
            "path",
            F.unix_timestamp("time").alias("time_s"),
            "cnt",
            F.round("vsum", 4).alias("vsum"),
            F.round("vmin", 4).alias("vmin"),
            F.round("vmax", 4).alias("vmax"),
            F.round("vlast", 4).alias("vlast"),
        )
        .orderBy("path", "time_s")
    )


# ---------------------------------------------------------------- A8 multi-tier

_TIERS_SQL = f"""
WITH m AS ({_M}),
fine AS (
  SELECT path, CAST(FLOOR(ts / 3600) * 3600 + 3600 AS BIGINT) AS time_s,
         COUNT(*) AS cnt, SUM(value) AS vsum
  FROM m GROUP BY 1, 2
),
coarse AS (  -- derived from the fine tier: close = ceil(fine_close / 21600) * 21600
  SELECT path,
         CAST(FLOOR((time_s + 21600 - 1) / 21600) * 21600 AS BIGINT) AS time_s,
         CAST(SUM(cnt) AS BIGINT) AS cnt, SUM(vsum) AS vsum
  FROM fine GROUP BY 1, 2
)
SELECT path, time_s, cnt, ROUND(vsum, 4) AS vsum, 3600  AS resolution_s FROM fine
UNION ALL
SELECT path, time_s, cnt, ROUND(vsum, 4) AS vsum, 21600 AS resolution_s FROM coarse
ORDER BY resolution_s, path, time_s
"""


@register(
    "carbon_multi_tier_fanout",
    _TIERS_SQL,
    "A8: coarse tiers derived losslessly from the finest (metricstore.go:76-81, re-architected)",
)
def carbon_tiers(spark, sf_dir):
    prep(spark)
    tiers = rollup_all_tiers(_metrics(spark, sf_dir), EVENTS_CONFIG)
    return (
        tiers.select(
            "path",
            F.unix_timestamp("time").alias("time_s"),
            "cnt",
            F.round("vsum", 4).alias("vsum"),
            F.col("resolution_s").cast("int").alias("resolution_s"),
        )
        .orderBy("resolution_s", "path", "time_s")
    )


_PCTL_SQL = f"""
WITH m AS ({_M})
SELECT path,
       CAST(FLOOR(ts / 3600) * 3600 + 3600 AS BIGINT) AS time_s,
       ROUND(ROUND(QUANTILE_CONT(value, 0.50), 8), 4) AS p50,
       ROUND(ROUND(QUANTILE_CONT(value, 0.95), 8), 4) AS p95,
       ROUND(ROUND(QUANTILE_CONT(value, 0.99), 8), 4) AS p99,
       COUNT(*) AS cnt
FROM m
WHERE path IN ('evt.click', 'evt.view', 'evt.purchase')
GROUP BY 1, 2
HAVING time_s >= {JAN_5 + 3600} AND time_s <= {JAN_8}
ORDER BY path, time_s
"""


@register(
    "carbon_percentile_rollup",
    _PCTL_SQL,
    "statsd-style timer rollup beyond the reference's 5 methods: exact "
    "interpolated p50/p95/p99 per (path, 1h window) — percentile() is a "
    "JVM aggregate, one shuffle like any other rollup method. CONTRACT: "
    "exact percentiles are single-tier only — they do not re-aggregate to "
    "coarser windows (p95 of 6h is not derivable from 1h p95s); coarser "
    "tiers use carbon_percentile_sketch_rollup's mergeable histogram",
)
def carbon_percentile(spark, sf_dir):
    prep(spark)
    from cassabon_spark.queries import R

    m = _metrics(spark, sf_dir).filter(
        F.col("path").isin(["evt.click", "evt.view", "evt.purchase"])
    )
    win = F.window(F.timestamp_seconds("ts"), "3600 seconds")
    out = (
        m.groupBy("path", win.alias("win"))
        .agg(
            R(F.expr("percentile(value, 0.50)"), 4).alias("p50"),
            R(F.expr("percentile(value, 0.95)"), 4).alias("p95"),
            R(F.expr("percentile(value, 0.99)"), 4).alias("p99"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .withColumn("time_s", F.unix_timestamp("win.end"))
        .filter((F.col("time_s") >= JAN_5 + 3600) & (F.col("time_s") <= JAN_8))
    )
    return out.select("path", "time_s", "p50", "p95", "p99", "cnt").orderBy(
        "path", "time_s"
    )



# ------------------------------------------- mergeable percentile sketch

# The sketch's value range is the operator's declared contract (statsd
# histogram style): events.value lives in [0, 500); 250 bins -> 2.0
# absolute error bound. Source rows carry BOTH window keys so the fine
# (1h) sketch merges losslessly into the coarse (6h) tier.
_SK_LO, _SK_HI, _SK_BINS = 0.0, 500.0, 250

from cassabon_spark.operators.sketch import (  # noqa: E402
    histogram_sketch,
    merge_sketches,
    sketch_quantiles,
    sketch_quantiles_sql,
)

_SK_SRC = f"""
SELECT * FROM (
  SELECT 'evt.' || event_type AS path,
         CAST(FLOOR(EPOCH(ts) / 21600) * 21600 + 21600 AS BIGINT) AS time_s,
         value
  FROM events
  WHERE 'evt.' || event_type IN ('evt.click', 'evt.view', 'evt.purchase')
)
WHERE time_s > {JAN_5} AND time_s <= {JAN_8}
"""

_PCTL_SKETCH_SQL = (
    "SELECT path, time_s, ROUND(ROUND(q50, 8), 4) AS p50, "
    "ROUND(ROUND(q95, 8), 4) AS p95, ROUND(ROUND(q99, 8), 4) AS p99 FROM ("
    + sketch_quantiles_sql(
        _SK_SRC, ["path", "time_s"], [0.50, 0.95, 0.99],
        _SK_LO, _SK_HI, _SK_BINS,
    )
    + ") ORDER BY path, time_s"
)


@register(
    "carbon_percentile_sketch_rollup",
    _PCTL_SKETCH_SQL,
    "multi-tier percentile rollup via a mergeable fixed-range histogram "
    "sketch (operators/sketch.py): 1h sketches merge by count-addition "
    "into 6h windows, p50/p95/p99 interpolated from the merged bins. "
    "This is the re-aggregatable percentile the exact rollup cannot be; "
    "error bound (hi-lo)/nbins = 2.0. Bin arithmetic is IEEE add/mul/div "
    "only, so the DuckDB oracle reproduces every estimate bit-for-bit.",
)
def carbon_percentile_sketch(spark, sf_dir):
    prep(spark)
    from cassabon_spark.queries import R

    m = _metrics(spark, sf_dir).filter(
        F.col("path").isin(["evt.click", "evt.view", "evt.purchase"])
    )
    keyed = m.select(
        "path",
        (F.floor(F.col("ts") / 3600) * 3600 + 3600).cast("bigint").alias("w1"),
        (F.floor(F.col("ts") / 21600) * 21600 + 21600)
        .cast("bigint")
        .alias("time_s"),
        "value",
    )
    # fine tier: one sketch per (path, 1h window) — what the store persists
    fine = histogram_sketch(
        keyed, ["path", "time_s", "w1"], "value", _SK_LO, _SK_HI, _SK_BINS
    )
    # coarse tier: drop the fine key, ADD counts (the lossless merge)
    merged = merge_sketches(fine, ["path", "time_s"])
    out = sketch_quantiles(
        merged, ["path", "time_s"], [0.50, 0.95, 0.99], _SK_LO, _SK_HI, _SK_BINS
    )
    return (
        out.filter((F.col("time_s") > JAN_5) & (F.col("time_s") <= JAN_8))
        .select(
            "path",
            "time_s",
            R(F.col("q50"), 4).alias("p50"),
            R(F.col("q95"), 4).alias("p95"),
            R(F.col("q99"), 4).alias("p99"),
        )
        .orderBy("path", "time_s")
    )


# ---------------------------------------------------------------- A10/A11 scan

_SCAN_SQL = f"""
WITH m AS ({_M})
SELECT path, CAST(FLOOR(ts) AS BIGINT) AS ts_s, ROUND(value, 4) AS value
FROM m
WHERE path IN ('evt.click', 'evt.purchase')
  AND ts >= {JAN_5} AND ts <= {JAN_5 + 7200}
ORDER BY path, ts_s, value
"""


@register(
    "carbon_time_range_scan",
    _SCAN_SQL,
    "A10/A11: path + time-range scan w/ predicate pushdown (metricquery.go:127-138)",
)
def carbon_scan(spark, sf_dir):
    prep(spark)
    m = _metrics(spark, sf_dir)
    return (
        m.filter(F.col("path").isin(["evt.click", "evt.purchase"]))
        .filter((F.col("ts") >= JAN_5) & (F.col("ts") <= JAN_5 + 7200))
        .select(
            "path",
            F.floor("ts").cast("bigint").alias("ts_s"),
            F.round("value", 4).alias("value"),
        )
        .orderBy("path", "ts_s", "value")
    )


# ---------------------------------------------------------------- A12-A15 read path

# step == tier == 3600 here, so merge slots equal window closes; normalFrom
# ALWAYS advances one full step from the boundary-aligned JAN_5
# (metricquery.go:124 — replicate exactly).
_GAPFILL_SQL = f"""
WITH m AS ({_M}),
store AS (  -- finest tier rows, scan-filtered to [from, to] on close time
  SELECT path, CAST(FLOOR(ts / 3600) * 3600 + 3600 AS BIGINT) AS time_s,
         COUNT(*) AS cnt, SUM(value) AS vsum
  FROM m
  WHERE path IN ('evt.click', 'evt.view', 'evt.signup')
  GROUP BY 1, 2
  HAVING time_s >= {JAN_5} AND time_s <= {JAN_8}
),
rebucket AS (  -- A14 merge: slot = ceil(time/step)*step; weighted average
  SELECT path,
         CAST(FLOOR((time_s + 3600 - 1) / 3600) * 3600 AS BIGINT) AS slot_s,
         SUM(vsum) / SUM(cnt) AS stat
  FROM store GROUP BY 1, 2
  HAVING slot_s >= {JAN_5 + 3600} AND slot_s <= {JAN_8}
),
spine AS (
  SELECT p.path, s.slot_s
  FROM (SELECT UNNEST(['evt.click', 'evt.view', 'evt.signup']) AS path) p,
       (SELECT UNNEST(GENERATE_SERIES({JAN_5 + 3600}, {JAN_8}, 3600)) AS slot_s) s
)
SELECT spine.path, spine.slot_s,
       ROUND(CASE WHEN ISNAN(stat) THEN NULL ELSE stat END, 4) AS stat
FROM spine LEFT JOIN rebucket
  ON spine.path = rebucket.path AND spine.slot_s = rebucket.slot_s
ORDER BY spine.path, spine.slot_s
"""


@register(
    "carbon_read_gapfill",
    _GAPFILL_SQL,
    "A12-A15: normalize/merge/gap-fill/NaN-scrub read path (metricquery.go:124-220)",
)
def carbon_gapfill(spark, sf_dir):
    prep(spark)
    finest = rollup_finest(route(_metrics(spark, sf_dir), EVENTS_CONFIG), EVENTS_CONFIG)
    grid = query_metrics_df(
        spark,
        finest,
        paths=["evt.click", "evt.view", "evt.signup"],
        from_s=JAN_5,
        to_s=JAN_8,
        step=3600,
        method="average",
    )
    return grid.select("path", "slot_s", F.round("stat", 4).alias("stat")).orderBy(
        "path", "slot_s"
    )


# ---------------------------------------------------------------- A16 fan-in

_FANIN_SQL = f"""
WITH m AS ({_M}),
g AS (
  SELECT path, CAST(FLOOR(ts / 86400) * 86400 + 86400 AS BIGINT) AS slot_s,
         SUM(value) AS vsum, COUNT(*) AS cnt
  FROM m GROUP BY 1, 2
)
SELECT slot_s,
       CAST(COUNT(*) AS BIGINT)  AS n_paths,
       ROUND(SUM(vsum), 4)       AS vsum_total,
       ROUND(ROUND(SUM(vsum) / SUM(cnt), 8), 4) AS avg_value
FROM g GROUP BY slot_s ORDER BY slot_s
"""


@register(
    "carbon_multipath_fanin",
    _FANIN_SQL,
    "A16: N paths per query, shared grid (api.go:159, metricquery.go:106-225)",
)
def carbon_fanin(spark, sf_dir):
    prep(spark)
    from cassabon_spark.queries import R

    m = _metrics(spark, sf_dir)
    g = m.groupBy(
        "path",
        (F.floor(F.col("ts") / 86400) * 86400 + 86400).cast("bigint").alias("slot_s"),
    ).agg(F.sum("value").alias("vsum"), F.count(F.lit(1)).alias("cnt"))
    return (
        g.groupBy("slot_s")
        .agg(
            F.count(F.lit(1)).alias("n_paths"),
            F.round(F.sum("vsum"), 4).alias("vsum_total"),
            R(F.sum("vsum") / F.sum("cnt"), 4).alias("avg_value"),
        )
        .orderBy("slot_s")
    )


# ---------------------------------------------------------------- A19 delete dry-run

_DELETE_SQL = f"""
WITH m AS ({_M}),
fine AS (
  SELECT path, CAST(FLOOR(ts / 3600) * 3600 + 3600 AS BIGINT) AS time_s FROM m
),
coarse AS (
  SELECT path, CAST(FLOOR((time_s + 21600 - 1) / 21600) * 21600 AS BIGINT) AS time_s
  FROM (SELECT DISTINCT path, time_s FROM fine)
),
store AS (
  SELECT path, time_s, 3600 AS resolution_s FROM (SELECT DISTINCT path, time_s FROM fine)
  UNION ALL
  SELECT path, time_s, 21600 AS resolution_s FROM (SELECT DISTINCT path, time_s FROM coarse)
)
SELECT path, resolution_s, COUNT(*) AS cnt
FROM store
WHERE path IN ('evt.click', 'evt.error') AND time_s >= {JAN_5} AND time_s <= {JAN_8}
GROUP BY path, resolution_s
ORDER BY path, resolution_s
"""


@register(
    "carbon_delete_dryrun",
    _DELETE_SQL,
    "A19: per path x tier count in range, dry-run default (metricquery.go:25-84)",
)
def carbon_delete(spark, sf_dir):
    prep(spark)
    from cassabon_spark.operators.query import delete_metrics

    tiers = rollup_all_tiers(_metrics(spark, sf_dir), EVENTS_CONFIG)
    report, remaining = delete_metrics(
        tiers, ["evt.click", "evt.error"], JAN_5, JAN_8, dry_run=True
    )
    assert remaining is None
    return report.select("path", F.col("resolution_s").cast("int").alias("resolution_s"), "cnt")


# ---------------------------------------------------------------- A18 index expansion

_INDEX_SQL = """
WITH paths AS (
  SELECT DISTINCT 'evt.' || event_type || '.u' || CAST(user_id % 10 AS VARCHAR) AS full_path
  FROM events
),
parts AS (SELECT full_path, STRING_SPLIT(full_path, '.') AS p FROM paths),
expanded AS (
  SELECT ARRAY_TO_STRING(p[1:d], '.') AS path,
         CAST(d AS INT) AS depth,
         '' AS tenant,
         d = LEN(p) AS leaf
  FROM parts, UNNEST(GENERATE_SERIES(1, LEN(p))) AS g(d)
)
SELECT path, depth, tenant, MAX(leaf) AS leaf
FROM expanded GROUP BY 1, 2, 3
ORDER BY path
"""


@register(
    "carbon_index_ancestors",
    _INDEX_SQL,
    "A18: ancestor expansion into the path index (indexmanager.go:225-278)",
)
def carbon_index(spark, sf_dir):
    prep(spark)
    ev = EV(spark, sf_dir)
    paths = ev.select(
        F.concat(
            F.lit("evt."),
            F.col("event_type"),
            F.lit(".u"),
            (F.col("user_id") % 10).cast("string"),
        ).alias("path")
    ).distinct()
    return expand_ancestors(paths).orderBy("path")


# ---------------------------------------------------------------- A17 glob search

_GLOB_SQL = """
WITH paths AS (
  SELECT DISTINCT 'evt.' || event_type || '.u' || CAST(user_id % 10 AS VARCHAR) AS full_path
  FROM events
),
parts AS (SELECT full_path, STRING_SPLIT(full_path, '.') AS p FROM paths),
expanded AS (
  SELECT ARRAY_TO_STRING(p[1:d], '.') AS path, CAST(d AS INT) AS depth, '' AS tenant,
         d = LEN(p) AS leaf
  FROM parts, UNNEST(GENERATE_SERIES(1, LEN(p))) AS g(d)
),
idx AS (SELECT path, depth, tenant, MAX(leaf) AS leaf FROM expanded GROUP BY 1, 2, 3)
SELECT path, depth, tenant, leaf
FROM idx
WHERE depth = 3 AND REGEXP_MATCHES(path, '^evt\\..*\\.u3$')
ORDER BY path
"""


@register(
    "carbon_glob_search",
    _GLOB_SQL,
    "A17: glob->regex, depth-matched, sorted (indexmanager.go:303-386)",
)
def carbon_glob(spark, sf_dir):
    prep(spark)
    ev = EV(spark, sf_dir)
    paths = ev.select(
        F.concat(
            F.lit("evt."),
            F.col("event_type"),
            F.lit(".u"),
            (F.col("user_id") % 10).cast("string"),
        ).alias("path")
    ).distinct()
    idx = expand_ancestors(paths)
    return search_glob(idx, "evt.*.u3")


# ---------------------------------------------------------------- A4 pearson compat

# The permutation table is formula-derived (entry k = high nibble k%16, low
# nibble 15-k//16 — pearson/pearson.go:9-26), so the oracle rebuilds it in
# SQL and folds the path bytes through it with list_reduce: the pandas-UDF
# hash is verified bit-for-bit, not just structurally.
_PEARSON_SQL = """
WITH tab AS (
  SELECT LIST_TRANSFORM(GENERATE_SERIES(0, 255),
                        k -> ((k % 16) * 16) | (15 - k // 16)) AS t
),
paths AS (SELECT DISTINCT 'evt.' || event_type AS path FROM events),
hashed AS (
  SELECT path,
         LIST_REDUCE(
           [0] || LIST_TRANSFORM(GENERATE_SERIES(1, LEN(path)),
                                 i -> ORD(SUBSTR(path, i, 1))),
           (acc, b) -> t[XOR(acc, b) + 1]) AS h
  FROM paths, tab
)
SELECT path, CAST(h AS BIGINT) AS hash8, CAST(h % 4 AS BIGINT) AS shard
FROM hashed ORDER BY path
"""


@register(
    "carbon_pearson_shards",
    _PEARSON_SQL,
    "A4: bit-compatible Pearson-hash shard assignment (pearson.go:30-41, "
    "peerlist.go:113-120), exact-oracle-checked by rebuilding the formula-derived "
    "permutation table in SQL",
)
def carbon_pearson(spark, sf_dir):
    prep(spark)
    # r14: pure-Catalyst byte fold (guide §4) — the pandas UDF paid the
    # JVM->Python->JVM Arrow transpose per batch for a 1-byte hash; the
    # expression form removes the plan's ArrowEvalPython node entirely.
    # Bit-identical values (tests pin the reference goldens on both forms).
    from cassabon_spark.functions.pearson import pearson_hash8_expr

    m = _metrics(spark, sf_dir).select("path").distinct()
    return (
        m.withColumn("hash8", pearson_hash8_expr(F.col("path")).cast("bigint"))
        .withColumn("shard", (F.col("hash8") % 4).cast("bigint"))
        .select("path", "hash8", "shard")
        .orderBy("path")
    )


# ---------------------------------------------------------------- A20 index delete

_IDX_DEL_SQL = """
WITH paths AS (
  SELECT DISTINCT 'evt.' || event_type || '.u' || CAST(user_id % 10 AS VARCHAR) AS full_path
  FROM events
),
parts AS (SELECT full_path, STRING_SPLIT(full_path, '.') AS p FROM paths),
expanded AS (
  SELECT ARRAY_TO_STRING(p[1:d], '.') AS path, CAST(d AS INT) AS depth, '' AS tenant,
         d = LEN(p) AS leaf
  FROM parts, UNNEST(GENERATE_SERIES(1, LEN(p))) AS g(d)
),
idx AS (SELECT path, depth, tenant, MAX(leaf) AS leaf FROM expanded GROUP BY 1, 2, 3)
SELECT path, depth, tenant, leaf
FROM idx
WHERE NOT (depth = 3 AND REGEXP_MATCHES(path, '^evt\\.error\\..*$'))
ORDER BY path
"""


@register(
    "carbon_index_delete",
    _IDX_DEL_SQL,
    "A20: DELETE /paths — routed but unimplemented upstream (api.go:50, "
    "indexmanager.go:294-296); implemented here as a depth-scoped anti-filter "
    "on the index table",
)
def carbon_index_delete(spark, sf_dir):
    prep(spark)
    from cassabon_spark.operators.index import delete_paths

    ev = EV(spark, sf_dir)
    paths = ev.select(
        F.concat(
            F.lit("evt."),
            F.col("event_type"),
            F.lit(".u"),
            (F.col("user_id") % 10).cast("string"),
        ).alias("path")
    ).distinct()
    idx = expand_ancestors(paths)
    return delete_paths(idx, "evt.error.*").orderBy("path")


# ------------------------------------------------- Graphite-style series fns

# The reference returns raw series and leaves function application to the
# Graphite front-end (graphite-web); these two queries show the same
# post-processing running INSIDE the engine over the gap-filled grid —
# derivative (per-step delta, null across gaps like Graphite's derivative)
# and a trailing 3-slot moving average (nulls excluded from the mean).

_DERIV_SQL = f"""
WITH m AS ({_M}),
store AS (
  SELECT path, CAST(FLOOR(ts / 3600) * 3600 + 3600 AS BIGINT) AS time_s,
         COUNT(*) AS cnt, SUM(value) AS vsum
  FROM m
  WHERE path IN ('evt.click', 'evt.view')
  GROUP BY 1, 2
  HAVING time_s >= {JAN_5 + 3600} AND time_s <= {JAN_8}
),
spine AS (
  SELECT p.path, s.slot_s
  FROM (SELECT UNNEST(['evt.click', 'evt.view']) AS path) p,
       (SELECT UNNEST(GENERATE_SERIES({JAN_5 + 3600}, {JAN_8}, 3600)) AS slot_s) s
),
grid AS (
  SELECT spine.path, spine.slot_s, vsum / cnt AS stat
  FROM spine LEFT JOIN store ON store.path = spine.path AND store.time_s = spine.slot_s
)
SELECT path, slot_s,
       ROUND(ROUND(stat - LAG(stat) OVER (PARTITION BY path ORDER BY slot_s), 8), 4) AS deriv
FROM grid
ORDER BY path, slot_s
"""


@register(
    "carbon_series_derivative",
    _DERIV_SQL,
    "Graphite derivative() over the gap-filled grid: per-step delta, null "
    "across gaps (the post-processing graphite-web applies, in-engine)",
)
def carbon_derivative(spark, sf_dir):
    prep(spark)
    from pyspark.sql import Window

    from cassabon_spark.queries import R

    finest = rollup_finest(route(_metrics(spark, sf_dir), EVENTS_CONFIG), EVENTS_CONFIG)
    grid = query_metrics_df(
        spark,
        finest,
        paths=["evt.click", "evt.view"],
        from_s=JAN_5,
        to_s=JAN_8,
        step=3600,
        method="average",
    )
    w = Window.partitionBy("path").orderBy("slot_s")
    return (
        grid.withColumn("deriv", R(F.col("stat") - F.lag("stat").over(w), 4))
        .select("path", "slot_s", "deriv")
        .orderBy("path", "slot_s")
    )


_MOVAVG_SQL = f"""
WITH m AS ({_M}),
store AS (
  SELECT path, CAST(FLOOR(ts / 3600) * 3600 + 3600 AS BIGINT) AS time_s,
         COUNT(*) AS cnt, SUM(value) AS vsum
  FROM m
  WHERE path IN ('evt.click', 'evt.view')
  GROUP BY 1, 2
  HAVING time_s >= {JAN_5 + 3600} AND time_s <= {JAN_8}
),
spine AS (
  SELECT p.path, s.slot_s
  FROM (SELECT UNNEST(['evt.click', 'evt.view']) AS path) p,
       (SELECT UNNEST(GENERATE_SERIES({JAN_5 + 3600}, {JAN_8}, 3600)) AS slot_s) s
),
grid AS (
  SELECT spine.path, spine.slot_s, vsum / cnt AS stat
  FROM spine LEFT JOIN store ON store.path = spine.path AND store.time_s = spine.slot_s
)
SELECT path, slot_s,
       ROUND(ROUND(AVG(stat) OVER (PARTITION BY path ORDER BY slot_s
                       ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 8), 4) AS mov_avg
FROM grid
ORDER BY path, slot_s
"""


@register(
    "carbon_series_moving_avg",
    _MOVAVG_SQL,
    "Graphite movingAverage(3) over the gap-filled grid: trailing rows-frame "
    "mean, nulls excluded (in-engine series post-processing)",
)
def carbon_moving_avg(spark, sf_dir):
    prep(spark)
    from pyspark.sql import Window

    from cassabon_spark.queries import R

    finest = rollup_finest(route(_metrics(spark, sf_dir), EVENTS_CONFIG), EVENTS_CONFIG)
    grid = query_metrics_df(
        spark,
        finest,
        paths=["evt.click", "evt.view"],
        from_s=JAN_5,
        to_s=JAN_8,
        step=3600,
        method="average",
    )
    w = Window.partitionBy("path").orderBy("slot_s").rowsBetween(-2, 0)
    return (
        grid.withColumn("mov_avg", R(F.avg("stat").over(w), 4))
        .select("path", "slot_s", "mov_avg")
        .orderBy("path", "slot_s")
    )


_GRID_CTE = f"""
WITH m AS ({_M}),
store AS (
  SELECT path, CAST(FLOOR(ts / 3600) * 3600 + 3600 AS BIGINT) AS time_s,
         COUNT(*) AS cnt, SUM(value) AS vsum
  FROM m
  WHERE path IN ('evt.click', 'evt.view')
  GROUP BY 1, 2
  HAVING time_s >= {JAN_5 + 3600} AND time_s <= {JAN_8}
),
spine AS (
  SELECT p.path, s.slot_s
  FROM (SELECT UNNEST(['evt.click', 'evt.view']) AS path) p,
       (SELECT UNNEST(GENERATE_SERIES({JAN_5 + 3600}, {JAN_8}, 3600)) AS slot_s) s
),
grid AS (
  SELECT spine.path, spine.slot_s, vsum / cnt AS stat
  FROM spine LEFT JOIN store ON store.path = spine.path AND store.time_s = spine.slot_s
)
"""

_PERSEC_INTEGRAL_SQL = f"""
{_GRID_CTE},
ps AS (
  SELECT path, slot_s,
         CASE WHEN stat - LAG(stat) OVER w >= 0
              THEN (stat - LAG(stat) OVER w) / 3600.0 END AS rate
  FROM grid
  WINDOW w AS (PARTITION BY path ORDER BY slot_s)
)
SELECT path, slot_s,
       ROUND(ROUND(CASE WHEN rate IS NOT NULL THEN
         SUM(rate) OVER (PARTITION BY path ORDER BY slot_s
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       END, 10), 6) AS cum_rate
FROM ps
ORDER BY path, slot_s
"""


@register(
    "carbon_series_persecond_integral",
    _PERSEC_INTEGRAL_SQL,
    "Graphite perSecond() |> integral() chained over the gap-filled grid: "
    "counter rate from the series' inferred step, then running total — the "
    "render pipeline's function chaining, in-engine",
)
def carbon_persecond_integral(spark, sf_dir):
    prep(spark)
    from cassabon_spark.functions.series import integral, per_second
    from cassabon_spark.queries import R

    finest = rollup_finest(route(_metrics(spark, sf_dir), EVENTS_CONFIG), EVENTS_CONFIG)
    grid = query_metrics_df(
        spark,
        finest,
        paths=["evt.click", "evt.view"],
        from_s=JAN_5,
        to_s=JAN_8,
        step=3600,
        method="average",
    )
    chained = integral(per_second(grid))
    return (
        chained.select("path", "slot_s", R(F.col("stat"), 6).alias("cum_rate"))
        .orderBy("path", "slot_s")
    )


_ASPERCENT_SQL = f"""
{_GRID_CTE}
SELECT path, slot_s,
       ROUND(ROUND(CASE WHEN SUM(stat) OVER (PARTITION BY slot_s) <> 0
                        THEN stat * 100.0 / SUM(stat) OVER (PARTITION BY slot_s)
                   END, 8), 4) AS pct
FROM grid
ORDER BY path, slot_s
"""


@register(
    "carbon_series_aspercent",
    _ASPERCENT_SQL,
    "Graphite asPercent() over the grid: each series as a share of the "
    "per-slot total — one window aggregation, no self-join",
)
def carbon_aspercent(spark, sf_dir):
    prep(spark)
    from cassabon_spark.functions.series import as_percent
    from cassabon_spark.queries import R

    finest = rollup_finest(route(_metrics(spark, sf_dir), EVENTS_CONFIG), EVENTS_CONFIG)
    grid = query_metrics_df(
        spark,
        finest,
        paths=["evt.click", "evt.view"],
        from_s=JAN_5,
        to_s=JAN_8,
        step=3600,
        method="average",
    )
    return (
        as_percent(grid)
        .select("path", "slot_s", R(F.col("stat"), 4).alias("pct"))
        .orderBy("path", "slot_s")
    )


_INTERP_SQL = f"""
{_GRID_CTE},
marks AS (
  SELECT path, slot_s, stat,
         LAST_VALUE(stat IGNORE NULLS) OVER wb AS pv,
         LAST_VALUE(CASE WHEN stat IS NOT NULL THEN slot_s END IGNORE NULLS) OVER wb AS ps,
         FIRST_VALUE(stat IGNORE NULLS) OVER wf AS nv,
         FIRST_VALUE(CASE WHEN stat IS NOT NULL THEN slot_s END IGNORE NULLS) OVER wf AS ns
  FROM grid
  WINDOW wb AS (PARTITION BY path ORDER BY slot_s
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wf AS (PARTITION BY path ORDER BY slot_s
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT path, slot_s,
       ROUND(ROUND(CASE WHEN stat IS NOT NULL THEN stat
                   WHEN pv IS NOT NULL AND nv IS NOT NULL
                   THEN pv + (nv - pv) * (slot_s - ps) * 1.0 / (ns - ps)
                   END, 8), 4) AS filled
FROM marks
ORDER BY path, slot_s
"""


@register(
    "carbon_series_interpolate",
    _INTERP_SQL,
    "Graphite interpolate() over the grid: straight-line fill of interior "
    "gaps via one backward + one forward window pass — no self-join, edges "
    "stay null",
)
def carbon_interpolate(spark, sf_dir):
    prep(spark)
    from cassabon_spark.functions.series import interpolate
    from cassabon_spark.queries import R

    finest = rollup_finest(route(_metrics(spark, sf_dir), EVENTS_CONFIG), EVENTS_CONFIG)
    grid = query_metrics_df(
        spark,
        finest,
        paths=["evt.click", "evt.view"],
        from_s=JAN_5,
        to_s=JAN_8,
        step=3600,
        method="average",
    )
    return (
        interpolate(grid)
        .select("path", "slot_s", R(F.col("stat"), 4).alias("filled"))
        .orderBy("path", "slot_s")
    )


_HIGHEST_SQL = f"""
{_GRID_CTE},
ranked AS (
  SELECT path FROM grid GROUP BY path
  ORDER BY AVG(stat) DESC NULLS LAST, path
  LIMIT 1
)
SELECT g.path, g.slot_s, ROUND(ROUND(g.stat, 8), 4) AS stat
FROM grid g JOIN ranked r ON r.path = g.path
ORDER BY g.path, g.slot_s
"""


@register(
    "carbon_series_highest",
    _HIGHEST_SQL,
    "Graphite highestAverage(1) over the grid: rank whole series by mean, "
    "keep the top one via a broadcast semi-join — no per-slot shuffle",
)
def carbon_highest(spark, sf_dir):
    prep(spark)
    from cassabon_spark.functions.series import top_series
    from cassabon_spark.queries import R

    finest = rollup_finest(route(_metrics(spark, sf_dir), EVENTS_CONFIG), EVENTS_CONFIG)
    grid = query_metrics_df(
        spark,
        finest,
        paths=["evt.click", "evt.view"],
        from_s=JAN_5,
        to_s=JAN_8,
        step=3600,
        method="average",
    )
    return (
        top_series(grid, 1, "avg")
        .select("path", "slot_s", R(F.col("stat"), 4).alias("stat"))
        .orderBy("path", "slot_s")
    )


_GROUPBYNODE_SQL = f"""
{_GRID_CTE}
SELECT 'evt' AS path, slot_s, ROUND(ROUND(SUM(stat), 8), 4) AS stat
FROM grid
GROUP BY slot_s
ORDER BY slot_s
"""


@register(
    "carbon_series_groupbynode",
    _GROUPBYNODE_SQL,
    "Graphite groupByNode(0, sum) over the grid: series sharing a path "
    "segment combine element-wise — one map-side-combined shuffle on the "
    "(segment, slot) key",
)
def carbon_groupbynode(spark, sf_dir):
    prep(spark)
    from cassabon_spark.functions.series import group_by_node
    from cassabon_spark.queries import R

    finest = rollup_finest(route(_metrics(spark, sf_dir), EVENTS_CONFIG), EVENTS_CONFIG)
    grid = query_metrics_df(
        spark,
        finest,
        paths=["evt.click", "evt.view"],
        from_s=JAN_5,
        to_s=JAN_8,
        step=3600,
        method="average",
    )
    return (
        group_by_node(grid, 0, "sum")
        .select("path", "slot_s", R(F.col("stat"), 4).alias("stat"))
        .orderBy("slot_s")
    )


# ------------------------------------- round-2 render-function promotions

_SORTTOTAL_SQL = f"""
{_GRID_CTE},
ranked AS (
  SELECT path, ROW_NUMBER() OVER (ORDER BY SUM(stat) DESC NULLS LAST, path) AS ord
  FROM grid GROUP BY path
)
SELECT g.path, g.slot_s, ROUND(ROUND(g.stat, 8), 4) AS stat, r.ord
FROM grid g JOIN ranked r ON g.path = r.path
ORDER BY r.ord, g.path, g.slot_s
"""


@register(
    "carbon_series_sort_by_total",
    _SORTTOTAL_SQL,
    "Graphite sortByTotal() over the grid: presentation order as a dense "
    "__ord rank from a whole-series aggregate, broadcast back onto the "
    "grid — the render boundary orders its collect by it",
)
def carbon_sort_by_total(spark, sf_dir):
    prep(spark)
    from cassabon_spark.functions.series import sort_by
    from cassabon_spark.queries import R

    finest = rollup_finest(route(_metrics(spark, sf_dir), EVENTS_CONFIG), EVENTS_CONFIG)
    grid = query_metrics_df(
        spark,
        finest,
        paths=["evt.click", "evt.view"],
        from_s=JAN_5,
        to_s=JAN_8,
        step=3600,
        method="average",
    )
    return (
        sort_by(grid, "total", reverse=True)
        .select(
            "path",
            "slot_s",
            R(F.col("stat"), 4).alias("stat"),
            F.col("__ord").alias("ord"),
        )
        .orderBy("ord", "path", "slot_s")
    )


# consolidation = the engine's maxDataPoints/consolidateBy path: the READ
# re-buckets the 1h tier onto a 3h grid with the consolidation method (A14
# machinery with method override), so the coarse grid is computed scan-side,
# never by post-processing a collected fine grid.
_CONSOLIDATE_SQL = f"""
WITH m AS ({_M}),
store AS (
  SELECT path, CAST(FLOOR(ts / 3600) * 3600 + 3600 AS BIGINT) AS time_s,
         COUNT(*) AS cnt, SUM(value) AS vsum
  FROM m
  WHERE path IN ('evt.click', 'evt.view')
  GROUP BY 1, 2
  -- scan window matches the read path: [from, to] on close time; 1h rows
  -- BEFORE the first 3h boundary still merge into it (A14 ceil-merge)
  HAVING time_s >= {JAN_5} AND time_s <= {JAN_8}
),
rebucket AS (
  SELECT path,
         CAST(FLOOR((time_s + 10800 - 1) / 10800) * 10800 AS BIGINT) AS slot_s,
         MAX(vsum / cnt) AS stat
  FROM store GROUP BY 1, 2
),
spine AS (
  SELECT p.path, s.slot_s
  FROM (SELECT UNNEST(['evt.click', 'evt.view']) AS path) p,
       (SELECT UNNEST(GENERATE_SERIES({JAN_5 + 10800}, {JAN_8}, 10800)) AS slot_s) s
)
SELECT spine.path, spine.slot_s, ROUND(ROUND(rebucket.stat, 8), 4) AS stat
FROM spine LEFT JOIN rebucket
  ON rebucket.path = spine.path AND rebucket.slot_s = spine.slot_s
ORDER BY spine.path, spine.slot_s
"""


@register(
    "carbon_render_consolidate",
    _CONSOLIDATE_SQL,
    "consolidateBy('max') + maxDataPoints coarsening as the READ path runs "
    "it: the 1h tier re-buckets onto a 3h grid scan-side with the "
    "consolidation method (engine.render_target's guard), so the driver "
    "never collects the fine grid",
)
def carbon_render_consolidate(spark, sf_dir):
    prep(spark)
    from cassabon_spark.queries import R

    finest = rollup_finest(route(_metrics(spark, sf_dir), EVENTS_CONFIG), EVENTS_CONFIG)
    grid = query_metrics_df(
        spark,
        finest,
        paths=["evt.click", "evt.view"],
        from_s=JAN_5,
        to_s=JAN_8,
        step=10800,  # 3x coarser than the tier: the maxDataPoints factor
        method="max",  # consolidateBy('max')
        resolution_s=3600,
    )
    return grid.select(
        "path", "slot_s", R(F.col("stat"), 4).alias("stat")
    ).orderBy("path", "slot_s")


# timeShift('1d'): fetch [from-1d, to-1d], display at [from, to] — the
# fetch-window extension is the semantic fixed this round (ADVICE r1 #1).
_TIMESHIFT_SQL = f"""
WITH m AS ({_M}),
store AS (
  SELECT path, CAST(FLOOR(ts / 3600) * 3600 + 3600 AS BIGINT) AS time_s,
         COUNT(*) AS cnt, SUM(value) AS vsum
  FROM m
  WHERE path IN ('evt.click', 'evt.view')
  GROUP BY 1, 2
  HAVING time_s >= {JAN_5 - 86400 + 3600} AND time_s <= {JAN_8 - 86400}
),
spine AS (
  SELECT p.path, s.slot_s
  FROM (SELECT UNNEST(['evt.click', 'evt.view']) AS path) p,
       (SELECT UNNEST(GENERATE_SERIES({JAN_5 - 86400 + 3600}, {JAN_8 - 86400}, 3600)) AS slot_s) s
)
SELECT spine.path, spine.slot_s + 86400 AS slot_s,
       ROUND(ROUND(store.vsum / store.cnt, 8), 4) AS stat
FROM spine LEFT JOIN store
  ON store.path = spine.path AND store.time_s = spine.slot_s
ORDER BY spine.path, slot_s
"""


@register(
    "carbon_series_timeshift",
    _TIMESHIFT_SQL,
    "Graphite timeShift(series, '1d') with the implied-minus convention: "
    "the read FETCHES [from-1d, to-1d] and relabels the slots into "
    "[from, to] — data moves, the display window does not",
)
def carbon_timeshift(spark, sf_dir):
    prep(spark)
    from cassabon_spark.functions.series import time_shift
    from cassabon_spark.queries import R

    finest = rollup_finest(route(_metrics(spark, sf_dir), EVENTS_CONFIG), EVENTS_CONFIG)
    shifted_fetch = query_metrics_df(
        spark,
        finest,
        paths=["evt.click", "evt.view"],
        from_s=JAN_5 - 86400,
        to_s=JAN_8 - 86400,
        step=3600,
        method="average",
    )
    return (
        time_shift(shifted_fetch, 86400)
        .select("path", "slot_s", R(F.col("stat"), 4).alias("stat"))
        .orderBy("path", "slot_s")
    )


# ------------------------------------------------- graphite 1.1 tagged series

# Tagged-series ingest: serialize events as `path;region=rN` lines, run the
# REAL A3 parser + tag splitter (operators/tags.py), aggregate per (base,
# region). The reference predates carbon tags; this is the graphite 1.1
# surface users expect — string-exact across engines, so fully oracle-able.
_TAGGED_SQL = f"""
WITH m AS ({_M}),
lines AS (
  SELECT PRINTF('%s;region=r%d %d %d',
                path, user_id % 3,
                CAST(FLOOR(value * 100) AS BIGINT),
                CAST(FLOOR(ts) AS BIGINT)) AS line
  FROM (SELECT 'evt.' || event_type AS path, value, EPOCH(ts) AS ts, user_id
        FROM events)
),
parsed AS (
  SELECT f[1] AS path,
         TRY_CAST(f[2] AS DOUBLE) AS value
  FROM (SELECT STRING_SPLIT_REGEX(TRIM(line), '\\s+') AS f FROM lines)
  WHERE LEN(f) = 3
),
split AS (
  SELECT STRING_SPLIT(path, ';')[1] AS base,
         STRING_SPLIT(STRING_SPLIT(path, ';')[2], '=')[2] AS region,
         value
  FROM parsed
  WHERE path IS NOT NULL AND value IS NOT NULL
)
SELECT base, region,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(value) / 100, 2) AS total
FROM split
GROUP BY 1, 2
ORDER BY base, region
"""


@register(
    "carbon_tagged_series",
    _TAGGED_SQL,
    "graphite 1.1 tagged metrics: `path;tag=value` lines through the real "
    "A3 parser + tag splitter (operators/tags.py map_from_entries — no "
    "Python), aggregated per (base name, tag value). Beyond-reference "
    "surface: cassabon predates carbon tags",
)
def carbon_tagged_series(spark, sf_dir):
    prep(spark)
    from cassabon_spark.operators.tags import base_expr, tags_map_expr
    from cassabon_spark.sources.carbon import parse_carbon_lines

    ev = EV(spark, sf_dir)
    lines = ev.select(
        F.format_string(
            "%s;region=r%d %d %d",
            F.concat(F.lit("evt."), F.col("event_type")),
            F.col("user_id") % 3,
            F.floor(F.col("value") * 100).cast("bigint"),
            F.floor(F.col("ts").cast("double")).cast("bigint"),
        ).alias("line")
    )
    metrics, _ = parse_carbon_lines(lines)
    split = metrics.select(
        base_expr("path").alias("base"),
        F.element_at(tags_map_expr("path"), "region").alias("region"),
        "value",
    )
    return (
        split.groupBy("base", "region")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.sum("value") / 100, 2).alias("total"),
        )
        .orderBy("base", "region")
    )


# ----------------------------------------------- dashboard functions, round 4
#
# VERDICT r3 #6: the graphite function library (functions/series.py, ~155
# names) is unit-tested but only ~15 names rode exact oracles. This section
# puts the next 10 most dashboard-critical functions under the DuckDB gate,
# each applied over the SAME gap-filled engine grid the earlier series
# entries use (reference read path these feed: datastore/metricquery.go:
# 139-220; function semantics: graphite-web render/functions.py).


def _grid_df(spark, sf_dir, paths=("evt.click", "evt.view"), method="average"):
    """The shared render grid: finest-tier rollup -> gap-filled hourly grid
    over Jan 5-8 (72 slots/series), exactly _GRID_CTE's Spark twin."""
    finest = rollup_finest(route(_metrics(spark, sf_dir), EVENTS_CONFIG), EVENTS_CONFIG)
    return query_metrics_df(
        spark,
        finest,
        paths=list(paths),
        from_s=JAN_5,
        to_s=JAN_8,
        step=3600,
        method=method,
    )


_SUMMARIZE_SQL = f"""
{_GRID_CTE}
SELECT path,
       CAST(FLOOR((slot_s + 21600 - 1) / 21600) * 21600 AS BIGINT) AS slot_s,
       ROUND(ROUND(SUM(stat), 8), 4) AS stat
FROM grid
GROUP BY 1, 2
ORDER BY path, slot_s
"""


@register(
    "carbon_series_summarize",
    _SUMMARIZE_SQL,
    "Graphite summarize('6h','sum') over the grid: re-bucket to a coarser "
    "step, buckets label with their CLOSE time (engine A7 convention), "
    "nulls excluded from the sum",
)
def carbon_summarize(spark, sf_dir):
    prep(spark)
    from cassabon_spark.functions.series import summarize
    from cassabon_spark.queries import R

    return (
        summarize(_grid_df(spark, sf_dir), 21600, "sum")
        .select("path", "slot_s", R(F.col("stat"), 4).alias("stat"))
        .orderBy("path", "slot_s")
    )


_SMART_SUMMARIZE_SQL = f"""
{_GRID_CTE}
SELECT path,
       CAST(FLOOR((slot_s - {JAN_5 + 3600} + 21600 - 1) / 21600) * 21600
            + {JAN_5 + 3600} AS BIGINT) AS slot_s,
       ROUND(ROUND(AVG(stat), 8), 4) AS stat
FROM grid
GROUP BY 1, 2
ORDER BY path, slot_s
"""


@register(
    "carbon_series_smart_summarize",
    _SMART_SUMMARIZE_SQL,
    "Graphite smartSummarize('6h','avg'): summarize with buckets aligned "
    "to the query start (no partial leading bucket), close-labelled",
)
def carbon_smart_summarize(spark, sf_dir):
    prep(spark)
    from cassabon_spark.functions.series import smart_summarize
    from cassabon_spark.queries import R

    return (
        smart_summarize(_grid_df(spark, sf_dir), 21600, "avg", origin_s=JAN_5 + 3600)
        .select("path", "slot_s", R(F.col("stat"), 4).alias("stat"))
        .orderBy("path", "slot_s")
    )


# Counter-wrap derivative: build a synthetic wrapping counter from the grid
# (fill gaps with 0, running-sum, mod 997) and recover the true deltas with
# graphite's wrap formula (maxValue - prev + cur + 1). The mod/fmod and the
# running sum are computed in identical order on both engines.
_NND_WRAP_SQL = f"""
{_GRID_CTE},
-- quantize the grid BEFORE the running sum: the raw averages agree only to
-- ~1 ulp across engines, and the mod turns an ulp into a 997-sized jump
-- near wrap points; summing identical 4-decimal values in identical order
-- is bit-reproducible
q AS (
  SELECT path, slot_s, ROUND(ROUND(stat, 8), 4) AS stat FROM grid
),
-- ... and quantize the COUNTER too: DuckDB evaluates windowed SUM with a
-- segment tree, so even identical prefixes can differ in the last ulp
-- row-to-row; rounding re-quantizes both engines onto one decimal grid
counter AS (
  SELECT path, slot_s,
         ROUND(ROUND(FMOD(SUM(COALESCE(stat, 0)) OVER (
             PARTITION BY path ORDER BY slot_s
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 997), 8), 4) AS c
  FROM q
),
delta AS (
  SELECT path, slot_s, c, c - LAG(c) OVER (PARTITION BY path ORDER BY slot_s) AS d,
         LAG(c) OVER (PARTITION BY path ORDER BY slot_s) AS prev
  FROM counter
)
SELECT path, slot_s,
       ROUND(ROUND(CASE WHEN d >= 0 THEN d
                        WHEN d < 0 AND 996 - prev + c + 1 >= 0 THEN 996 - prev + c + 1
                   END, 8), 4) AS stat
FROM delta
ORDER BY path, slot_s
"""


@register(
    "carbon_series_nnd_wrap",
    _NND_WRAP_SQL,
    "Graphite nonNegativeDerivative(maxValue=996) counter-WRAP recovery "
    "over a synthetic mod-997 wrapping counter built from the grid: a "
    "negative delta is a wrap, recovered as maxValue - prev + cur + 1",
)
def carbon_nnd_wrap(spark, sf_dir):
    prep(spark)
    from pyspark.sql import Window

    from cassabon_spark.functions.series import (
        integral,
        non_negative_derivative_max,
        transform_null,
    )
    from cassabon_spark.queries import R

    quantized = _grid_df(spark, sf_dir).withColumn(
        "stat", F.round(F.round("stat", 8), 4)
    )
    counter = (
        integral(transform_null(quantized, 0.0))
        .withColumn("stat", F.round(F.round(F.col("stat") % 997, 8), 4))
    )
    return (
        non_negative_derivative_max(counter, 996.0)
        .select("path", "slot_s", R(F.col("stat"), 4).alias("stat"))
        .orderBy("path", "slot_s")
    )


_MOVMED_SQL = f"""
{_GRID_CTE}
SELECT path, slot_s,
       ROUND(ROUND(MEDIAN(stat) OVER (PARTITION BY path ORDER BY slot_s
                   ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 8), 4) AS stat
FROM grid
ORDER BY path, slot_s
"""


@register(
    "carbon_series_moving_median",
    _MOVMED_SQL,
    "Graphite movingMedian(5): trailing 5-slot exact interpolated median, "
    "nulls excluded — JVM percentile aggregate over a rows frame",
)
def carbon_moving_median(spark, sf_dir):
    prep(spark)
    from cassabon_spark.functions.series import moving_median
    from cassabon_spark.queries import R

    return (
        moving_median(_grid_df(spark, sf_dir), 5)
        .select("path", "slot_s", R(F.col("stat"), 4).alias("stat"))
        .orderBy("path", "slot_s")
    )


_STDEV_SQL = f"""
{_GRID_CTE}
SELECT path, slot_s,
       ROUND(ROUND(STDDEV_POP(stat) OVER (PARTITION BY path ORDER BY slot_s
                   ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 8), 4) AS stat
FROM grid
ORDER BY path, slot_s
"""


@register(
    "carbon_series_stdev",
    _STDEV_SQL,
    "Graphite stdev(5): trailing 5-slot population stddev (graphite "
    "safeStdDev divides by n), nulls excluded",
)
def carbon_stdev(spark, sf_dir):
    prep(spark)
    from cassabon_spark.functions.series import stdev
    from cassabon_spark.queries import R

    return (
        stdev(_grid_df(spark, sf_dir), 5)
        .select("path", "slot_s", R(F.col("stat"), 4).alias("stat"))
        .orderBy("path", "slot_s")
    )


_PCTL_OF_SERIES_SQL = f"""
{_GRID_CTE}
SELECT 'percentileOfSeries' AS path, slot_s,
       ROUND(ROUND(QUANTILE_CONT(stat, 0.9), 8), 4) AS stat
FROM grid
GROUP BY slot_s
ORDER BY slot_s
"""


@register(
    "carbon_series_percentileofseries",
    _PCTL_OF_SERIES_SQL,
    "Graphite percentileOfSeries(90): exact interpolated p90 ACROSS series "
    "per slot (the across-series combine family)",
)
def carbon_percentileofseries(spark, sf_dir):
    prep(spark)
    from cassabon_spark.functions.series import percentile_of_series
    from cassabon_spark.queries import R

    return (
        percentile_of_series(_grid_df(spark, sf_dir), 90.0)
        .select("path", "slot_s", R(F.col("stat"), 4).alias("stat"))
        .orderBy("slot_s")
    )


_AVGABOVE_SQL = f"""
{_GRID_CTE},
keep AS (
  SELECT path FROM grid GROUP BY path HAVING AVG(stat) > 50.0
)
SELECT g.path, g.slot_s, ROUND(ROUND(g.stat, 8), 4) AS stat
FROM grid g JOIN keep USING (path)
ORDER BY g.path, g.slot_s
"""


@register(
    "carbon_series_averageabove",
    _AVGABOVE_SQL,
    "Graphite averageAbove(50): keep whole series whose mean exceeds the "
    "threshold — broadcast semi-join of the per-series verdict",
)
def carbon_averageabove(spark, sf_dir):
    prep(spark)
    from cassabon_spark.functions.series import average_above
    from cassabon_spark.queries import R

    return (
        average_above(_grid_df(spark, sf_dir), 50.0)
        .select("path", "slot_s", R(F.col("stat"), 4).alias("stat"))
        .orderBy("path", "slot_s")
    )


_KEEPLAST_SQL = f"""
{_GRID_CTE},
marks AS (
  SELECT path, slot_s, stat,
         LAST_VALUE(stat IGNORE NULLS) OVER wb AS fillv,
         LAST_VALUE(CASE WHEN stat IS NOT NULL THEN slot_s END IGNORE NULLS)
             OVER wb AS last_slot
  FROM grid
  WINDOW wb AS (PARTITION BY path ORDER BY slot_s
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT path, slot_s,
       ROUND(ROUND(CASE WHEN stat IS NOT NULL THEN stat
                        WHEN slot_s - last_slot <= 2 * 3600 THEN fillv
                   END, 8), 4) AS stat
FROM marks
ORDER BY path, slot_s
"""


@register(
    "carbon_series_keeplastvalue",
    _KEEPLAST_SQL,
    "Graphite keepLastValue(limit=2): forward-fill nulls with the most "
    "recent non-null value, at most 2 consecutive slots",
)
def carbon_keeplastvalue(spark, sf_dir):
    prep(spark)
    from cassabon_spark.functions.series import keep_last_value
    from cassabon_spark.queries import R

    return (
        keep_last_value(_grid_df(spark, sf_dir), limit=2)
        .select("path", "slot_s", R(F.col("stat"), 4).alias("stat"))
        .orderBy("path", "slot_s")
    )


_ASPCT_SERIES_SQL = f"""
{_GRID_CTE},
num AS (SELECT slot_s, stat FROM grid WHERE path = 'evt.click'),
tot AS (SELECT slot_s, stat FROM grid WHERE path = 'evt.view')
SELECT 'evt.click' AS path, num.slot_s,
       ROUND(ROUND(CASE WHEN tot.stat IS NOT NULL AND tot.stat <> 0
                        THEN num.stat * 100.0 / tot.stat END, 8), 4) AS pct_of_view,
       ROUND(ROUND(num.stat * (100.0 / 50.0), 8), 4) AS pct_of_const
FROM num LEFT JOIN tot ON tot.slot_s = num.slot_s
ORDER BY num.slot_s
"""


@register(
    "carbon_series_aspercent_total",
    _ASPCT_SERIES_SQL,
    "Graphite asPercent TOTAL forms: two-argument asPercent(series, "
    "totalSeries) (evt.click as % of evt.view per slot, null where the "
    "total is null/0) and the constant-total form asPercent(series, 50)",
)
def carbon_aspercent_total(spark, sf_dir):
    prep(spark)
    from cassabon_spark.functions.series import as_percent, as_percent_of_series
    from cassabon_spark.queries import R

    grid = _grid_df(spark, sf_dir)
    click = grid.filter(F.col("path") == "evt.click")
    view = grid.filter(F.col("path") == "evt.view")
    of_view = as_percent_of_series(click, view).select(
        "path", "slot_s", F.col("stat").alias("__pv")
    )
    of_const = as_percent(click, total=50.0).select(
        F.col("slot_s").alias("__cs"), F.col("stat").alias("__cv")
    )
    return (
        of_view.join(F.broadcast(of_const), F.col("slot_s") == F.col("__cs"))
        .select(
            "path",
            "slot_s",
            R(F.col("__pv"), 4).alias("pct_of_view"),
            R(F.col("__cv"), 4).alias("pct_of_const"),
        )
        .orderBy("slot_s")
    )


# Holt-Winters forecast, EXACT-oracled: the additive triple-smoothing
# recurrence (graphite-web holtWintersAnalysis: alpha=.1, beta=.0035,
# gamma=.1, season = 24 slots) is sequential in time, so the DuckDB oracle
# replays it as a RECURSIVE CTE carrying (level, trend, seasonal[24]) row
# state per path — the same op-by-op double arithmetic the applyInPandas
# numpy loop runs, on a grid quantized to the 4-decimal lattice first so
# both engines iterate bit-identical inputs. 72 iterations x 2 paths.
_HW_SQL = f"""
{_GRID_CTE.replace("WITH m AS", "WITH RECURSIVE m AS", 1)},
q AS (
  SELECT path, slot_s, ROUND(ROUND(stat, 8), 4) AS stat FROM grid
),
idx AS (
  SELECT path, slot_s, stat,
         CAST(ROW_NUMBER() OVER (PARTITION BY path ORDER BY slot_s) - 1
              AS INTEGER) AS i
  FROM q
),
hw AS (
  SELECT path, -1 AS i,
         CAST(NULL AS DOUBLE) AS lv, CAST(0.0 AS DOUBLE) AS tr,
         LIST_TRANSFORM(GENERATE_SERIES(1, 24), x -> CAST(0.0 AS DOUBLE)) AS seas,
         CAST(NULL AS DOUBLE) AS fc
  FROM (SELECT DISTINCT path FROM idx)
  UNION ALL
  SELECT g.path, g.i,
         CASE WHEN hw.lv IS NULL
                THEN (CASE WHEN g.stat IS NOT NULL THEN g.stat END)
              WHEN g.stat IS NULL THEN hw.lv + hw.tr
              ELSE 0.1 * (g.stat - hw.seas[(g.i % 24) + 1])
                   + (1 - 0.1) * (hw.lv + hw.tr)
         END AS nlv,
         CASE WHEN hw.lv IS NULL OR g.stat IS NULL THEN hw.tr
              ELSE 0.0035 * (nlv - hw.lv) + (1 - 0.0035) * hw.tr
         END AS ntr,
         CASE WHEN hw.lv IS NULL OR g.stat IS NULL THEN hw.seas
              ELSE hw.seas[1:(g.i % 24)]
                   || [0.1 * (g.stat - nlv) + (1 - 0.1) * hw.seas[(g.i % 24) + 1]]
                   || hw.seas[(g.i % 24) + 2:24]
         END AS nseas,
         CASE WHEN hw.lv IS NULL
                THEN (CASE WHEN g.stat IS NOT NULL THEN g.stat END)
              ELSE hw.lv + hw.tr + hw.seas[(g.i % 24) + 1]
         END AS nfc
  FROM hw JOIN idx g ON g.path = hw.path AND g.i = hw.i + 1
)
SELECT hw.path AS path, g.slot_s AS slot_s, ROUND(ROUND(hw.fc, 8), 4) AS hw_fc
FROM hw JOIN idx g ON g.path = hw.path AND g.i = hw.i
ORDER BY hw.path, g.slot_s
"""


@register(
    "carbon_series_holtwinters",
    _HW_SQL,
    "Graphite holtWintersForecast(): additive triple exponential smoothing "
    "per series (applyInPandas numpy loop, parallel across series), "
    "exact-oracled against a DuckDB recursive CTE replaying the recurrence",
)
def carbon_holtwinters(spark, sf_dir):
    prep(spark)
    from cassabon_spark.functions.series import holt_winters_forecast
    from cassabon_spark.queries import R

    quantized = _grid_df(spark, sf_dir).withColumn(
        "stat", F.round(F.round("stat", 8), 4)
    )
    return (
        holt_winters_forecast(quantized, season_slots=24)
        .select("path", "slot_s", R(F.col("stat"), 4).alias("hw_fc"))
        .orderBy("path", "slot_s")
    )


# ----------------------------------------- dashboard functions, round 4 (b2)


_COMBINE_SQL = f"""
{_GRID_CTE}
SELECT * FROM (
  SELECT 'sumSeries' AS path, slot_s, ROUND(ROUND(SUM(stat), 8), 4) AS stat
  FROM grid GROUP BY slot_s
  UNION ALL
  SELECT 'averageSeries', slot_s, ROUND(ROUND(AVG(stat), 8), 4) FROM grid GROUP BY slot_s
  UNION ALL
  SELECT 'maxSeries', slot_s, ROUND(ROUND(MAX(stat), 8), 4) FROM grid GROUP BY slot_s
  UNION ALL
  SELECT 'minSeries', slot_s, ROUND(ROUND(MIN(stat), 8), 4) FROM grid GROUP BY slot_s
  UNION ALL
  SELECT 'countSeries', slot_s, ROUND(ROUND(CAST(COUNT(stat) AS DOUBLE), 8), 4)
  FROM grid GROUP BY slot_s
  UNION ALL
  SELECT 'rangeOfSeries', slot_s, ROUND(ROUND(MAX(stat) - MIN(stat), 8), 4)
  FROM grid GROUP BY slot_s
)
ORDER BY path, slot_s
"""


@register(
    "carbon_series_combine",
    _COMBINE_SQL,
    "Graphite across-series combine family in one gate: sumSeries / "
    "averageSeries / maxSeries / minSeries / countSeries / rangeOfSeries — "
    "each one groupBy(slot) aggregation with map-side partials",
)
def carbon_combine(spark, sf_dir):
    prep(spark)
    from cassabon_spark.functions.series import (
        average_series,
        count_series,
        max_series,
        min_series,
        range_series,
        sum_series,
    )
    from cassabon_spark.queries import R

    grid = _grid_df(spark, sf_dir)
    parts = [
        sum_series(grid),
        average_series(grid),
        max_series(grid),
        min_series(grid),
        count_series(grid),
        range_series(grid),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "path", "slot_s", R(F.col("stat"), 4).alias("stat")
    ).orderBy("path", "slot_s")


_DIVDIFF_SQL = f"""
{_GRID_CTE},
div AS (
  SELECT slot_s, MAX(CASE WHEN path = 'evt.view' THEN stat END) AS d FROM grid
  GROUP BY slot_s
),
mult AS (
  SELECT slot_s,
         CASE WHEN MAX(CASE WHEN stat IS NULL THEN 1 ELSE 0 END) = 0
              THEN PRODUCT(stat) END AS m
  FROM grid GROUP BY slot_s
),
diff AS (
  SELECT slot_s,
         MAX(CASE WHEN path = 'evt.click' THEN stat END)
         - COALESCE(SUM(CASE WHEN path <> 'evt.click' THEN stat END), 0) AS f
  FROM grid GROUP BY slot_s
)
SELECT g.path, g.slot_s,
       ROUND(ROUND(CASE WHEN div.d <> 0 THEN g.stat / div.d END, 8), 4) AS divided,
       ROUND(ROUND(diff.f, 8), 4) AS diffed,
       ROUND(ROUND(mult.m, 8), 4) AS product
FROM grid g
JOIN div USING (slot_s) JOIN mult USING (slot_s) JOIN diff USING (slot_s)
WHERE g.path = 'evt.click'
ORDER BY g.slot_s
"""


@register(
    "carbon_series_divide_diff_multiply",
    _DIVDIFF_SQL,
    "Graphite divideSeries(click, view) / diffSeries(click, *rest) / "
    "multiplySeries in one gate — conditional per-slot aggregation, no "
    "self-joins; product slots with any null are null (graphite None "
    "poisoning), division by 0/null -> null",
)
def carbon_divide_diff_multiply(spark, sf_dir):
    prep(spark)
    from cassabon_spark.functions.series import (
        diff_series,
        divide_series,
        multiply_series,
    )
    from cassabon_spark.queries import R

    grid = _grid_df(spark, sf_dir)
    div = divide_series(grid, "evt.view").select(
        "slot_s", F.col("stat").alias("__dv")
    )
    dif = diff_series(grid, "evt.click").select(
        F.col("slot_s").alias("__ds"), F.col("stat").alias("__df")
    )
    mul = multiply_series(grid).select(
        F.col("slot_s").alias("__ms"), F.col("stat").alias("__mp")
    )
    return (
        div.withColumn("path", F.lit("evt.click"))
        .join(F.broadcast(dif), F.col("slot_s") == F.col("__ds"))
        .join(F.broadcast(mul), F.col("slot_s") == F.col("__ms"))
        .select(
            "path",
            "slot_s",
            R(F.col("__dv"), 4).alias("divided"),
            R(F.col("__df"), 4).alias("diffed"),
            R(F.col("__mp"), 4).alias("product"),
        )
        .orderBy("slot_s")
    )


_OFFSETLOG_SQL = f"""
{_GRID_CTE}
SELECT path, slot_s,
       ROUND(ROUND(stat - MIN(stat) OVER (PARTITION BY path), 8), 4) AS zeroed,
       ROUND(ROUND(CASE WHEN stat > 0 THEN LOG(10, stat) END, 8), 4) AS log10v
FROM grid
ORDER BY path, slot_s
"""


@register(
    "carbon_series_offsetzero_log",
    _OFFSETLOG_SQL,
    "Graphite offsetToZero() (shift each series so its min is 0) and "
    "logarithm(10) (log of positives, else null) in one gate",
)
def carbon_offsetzero_log(spark, sf_dir):
    prep(spark)
    from cassabon_spark.functions.series import logarithm, offset_to_zero
    from cassabon_spark.queries import R

    grid = _grid_df(spark, sf_dir)
    z = offset_to_zero(grid).select("path", "slot_s", F.col("stat").alias("__z"))
    lg = logarithm(grid, 10.0).select(
        F.col("path").alias("__lp"),
        F.col("slot_s").alias("__ls"),
        F.col("stat").alias("__lg"),
    )
    return (
        z.join(
            lg,
            (F.col("path") == F.col("__lp")) & (F.col("slot_s") == F.col("__ls")),
        )
        .select(
            "path",
            "slot_s",
            R(F.col("__z"), 4).alias("zeroed"),
            R(F.col("__lg"), 4).alias("log10v"),
        )
        .orderBy("path", "slot_s")
    )


_HITCOUNT_SQL = f"""
{_GRID_CTE}
SELECT path,
       CAST(FLOOR((slot_s + 21600 - 1) / 21600) * 21600 AS BIGINT) AS slot_s,
       ROUND(ROUND(SUM(stat * 3600), 8), 4) AS hits
FROM grid
GROUP BY 1, 2
ORDER BY path, slot_s
"""


@register(
    "carbon_series_hitcount",
    _HITCOUNT_SQL,
    "Graphite hitcount('6h'): rate series -> total hits per bucket "
    "(sum of value x step), close-labelled buckets (A7 convention)",
)
def carbon_hitcount(spark, sf_dir):
    prep(spark)
    from cassabon_spark.functions.series import hitcount
    from cassabon_spark.queries import R

    return (
        hitcount(_grid_df(spark, sf_dir), 21600)
        .select("path", "slot_s", R(F.col("stat"), 4).alias("hits"))
        .orderBy("path", "slot_s")
    )


_LINREG_SQL = f"""
{_GRID_CTE},
fit AS (
  SELECT path,
         COVAR_POP(stat, CASE WHEN stat IS NOT NULL THEN CAST(slot_s AS DOUBLE) END)
         / VAR_POP(CASE WHEN stat IS NOT NULL THEN CAST(slot_s AS DOUBLE) END) AS slope,
         AVG(stat) AS ybar,
         AVG(CASE WHEN stat IS NOT NULL THEN CAST(slot_s AS DOUBLE) END) AS xbar
  FROM grid GROUP BY path
)
SELECT g.path, g.slot_s,
       ROUND(ROUND((fit.ybar - fit.slope * fit.xbar) + fit.slope * g.slot_s, 8), 4)
           AS fitted
FROM grid g JOIN fit USING (path)
ORDER BY g.path, g.slot_s
"""


@register(
    "carbon_series_linreg",
    _LINREG_SQL,
    "Graphite linearRegression(): least-squares fitted line per series via "
    "covariance aggregates (no collect, no second scan)",
)
def carbon_linreg(spark, sf_dir):
    prep(spark)
    from cassabon_spark.functions.series import linear_regression
    from cassabon_spark.queries import R

    return (
        linear_regression(_grid_df(spark, sf_dir))
        .select("path", "slot_s", R(F.col("stat"), 4).alias("fitted"))
        .orderBy("path", "slot_s")
    )


# transforms run on the LATTICE-QUANTIZED grid (SURVEY §10 rule 3): the
# raw grid stat is vsum/cnt whose SUM association order is engine-specific
# (one last-ulp difference surfaced at sf0.1 exactly on persec's 4-decimal
# rounding boundary, 0.52965); quantizing the input first makes every
# downstream transform the same double op on the same double in both
# engines.
_TRANSFORM_FAMILY_SQL = f"""
{_GRID_CTE},
q AS (SELECT path, slot_s, ROUND(ROUND(stat, 8), 4) AS stat FROM grid)
SELECT path, slot_s,
       ROUND(ROUND(ABS(stat), 8), 4) AS abs_v,
       ROUND(ROUND(CASE WHEN stat <> 0 THEN 1.0 / stat END, 8), 4) AS inv_v,
       ROUND(ROUND(POW(stat, 2), 8), 4) AS pow2_v,
       ROUND(ROUND(CASE WHEN stat >= 0 THEN SQRT(stat) END, 8), 4) AS sqrt_v,
       ROUND(ROUND(stat * 10, 8), 4) AS scale_v,
       ROUND(ROUND(stat + 5, 8), 4) AS offset_v,
       ROUND(ROUND(COALESCE(stat, 0), 8), 4) AS tnull_v,
       ROUND(ROUND(LAG(stat, 2) OVER (PARTITION BY path ORDER BY slot_s), 8), 4)
           AS delay_v,
       -- stat/60 on the 4-decimal lattice terminates at the 5th decimal,
       -- so EXACT .xxxx5 halves are systematic here — and the two engines
       -- round them differently (DuckDB rounds the true binary double,
       -- which sits a hair BELOW the half; Spark rounds the shortest
       -- decimal repr HALF_UP). Mirror Spark by rounding in decimal:
       CAST(ROUND(CAST(ROUND(stat * 60 / 3600, 8) AS DECIMAL(18, 8)), 4)
            AS DOUBLE) AS persec_min_v
FROM q
ORDER BY path, slot_s
"""


@register(
    "carbon_series_transform_family",
    _TRANSFORM_FAMILY_SQL,
    "Graphite per-value transform family in one gate: absolute, invert "
    "(0 -> null), pow(2), squareRoot (NaN-scrubbed), scale(10), offset(5), "
    "transformNull(0), delay(2), scaleToSeconds(60)",
)
def carbon_transform_family(spark, sf_dir):
    prep(spark)
    from cassabon_spark.functions.series import (
        absolute,
        delay,
        invert,
        offset,
        power,
        scale,
        scale_to_seconds,
        square_root,
        transform_null,
    )
    from cassabon_spark.queries import R

    # lattice-quantized input (see the oracle comment): the raw grid's
    # SUM association order is engine-specific
    grid = _grid_df(spark, sf_dir).withColumn(
        "stat", F.round(F.round("stat", 8), 4)
    )
    fams = {
        "abs_v": absolute(grid),
        "inv_v": invert(grid),
        "pow2_v": power(grid, 2.0),
        "sqrt_v": square_root(grid),
        "scale_v": scale(grid, 10.0),
        "offset_v": offset(grid, 5.0),
        "tnull_v": transform_null(grid, 0.0),
        "delay_v": delay(grid, 2),
        "persec_min_v": scale_to_seconds(grid, 60),
    }
    out = grid.select("path", "slot_s")
    for name, g in fams.items():
        out = out.join(
            g.select(
                F.col("path").alias("__p"),
                F.col("slot_s").alias("__s"),
                R(F.col("stat"), 4).alias(name),
            ),
            (F.col("path") == F.col("__p")) & (F.col("slot_s") == F.col("__s")),
        ).drop("__p", "__s")
    return out.orderBy("path", "slot_s")


_SERIES_STATS_FAMILY_SQL = f"""
{_GRID_CTE},
npct AS (
  SELECT path, QUANTILE_CONT(stat, 0.9) AS p90 FROM grid GROUP BY path
),
med AS (
  SELECT slot_s, QUANTILE_CONT(stat, 0.5) AS med_v, STDDEV_POP(stat) AS sd_v
  FROM grid GROUP BY slot_s
),
pc AS (
  SELECT path, QUANTILE_CONT(stat, 0.8) AS p80 FROM grid GROUP BY path
)
SELECT g.path, g.slot_s,
       ROUND(ROUND(CASE WHEN g.stat IS NOT NULL THEN npct.p90 END, 8), 4) AS npct90,
       ROUND(ROUND(med.med_v, 8), 4) AS median_series,
       ROUND(ROUND(med.sd_v, 8), 4) AS stddev_series,
       ROUND(ROUND(CASE WHEN g.stat <= pc.p80 THEN g.stat END, 8), 4) AS below_p80,
       ROUND(ROUND(CASE WHEN g.slot_s BETWEEN {JAN_5 + 36 * 3600} AND {JAN_5 + 60 * 3600}
                        THEN g.stat END, 8), 4) AS sliced,
       ROUND(ROUND(SUM(CASE WHEN g.stat IS NOT NULL THEN g.stat END) OVER (
           PARTITION BY g.path, CAST(FLOOR((g.slot_s - 1) / 86400) AS BIGINT)
           ORDER BY g.slot_s
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 8), 4)
         * CASE WHEN g.stat IS NOT NULL THEN 1 END AS integral_daily
FROM grid g
JOIN npct USING (path) JOIN med USING (slot_s) JOIN pc USING (path)
ORDER BY g.path, g.slot_s
"""


@register(
    "carbon_series_stats_family",
    _SERIES_STATS_FAMILY_SQL,
    "Graphite series-statistics family in one gate: nPercentile(90), "
    "medianSeries, stddevSeries, removeAbovePercentile(80), "
    "timeSlice(36h..60h), integralByInterval('1d')",
)
def carbon_series_stats_family(spark, sf_dir):
    prep(spark)
    from cassabon_spark.functions.series import (
        integral_by_interval,
        median_series,
        n_percentile,
        remove_above_percentile,
        stddev_series,
        time_slice,
    )
    from cassabon_spark.queries import R

    grid = _grid_df(spark, sf_dir)

    def keyed(g, name):
        return g.select(
            F.col("path").alias(f"__p_{name}"),
            F.col("slot_s").alias(f"__s_{name}"),
            F.col("stat").alias(name),
        )

    out = grid.select("path", "slot_s")
    per_series = {
        "npct90": n_percentile(grid, 90.0),
        "below_p80": remove_above_percentile(grid, 80.0),
        "sliced": time_slice(grid, JAN_5 + 36 * 3600, JAN_5 + 60 * 3600),
        "integral_daily": integral_by_interval(grid, 86400),
    }
    for name, g in per_series.items():
        k = keyed(g, name)
        out = out.join(
            k,
            (F.col("path") == F.col(f"__p_{name}"))
            & (F.col("slot_s") == F.col(f"__s_{name}")),
        ).drop(f"__p_{name}", f"__s_{name}")
    med = median_series(grid).select(
        F.col("slot_s").alias("__ms"), F.col("stat").alias("median_series")
    )
    sd = stddev_series(grid).select(
        F.col("slot_s").alias("__ss"), F.col("stat").alias("stddev_series")
    )
    out = (
        out.join(F.broadcast(med), F.col("slot_s") == F.col("__ms"))
        .join(F.broadcast(sd), F.col("slot_s") == F.col("__ss"))
        .drop("__ms", "__ss")
    )
    return out.select(
        "path",
        "slot_s",
        R(F.col("npct90"), 4).alias("npct90"),
        R(F.col("median_series"), 4).alias("median_series"),
        R(F.col("stddev_series"), 4).alias("stddev_series"),
        R(F.col("below_p80"), 4).alias("below_p80"),
        R(F.col("sliced"), 4).alias("sliced"),
        R(F.col("integral_daily"), 4).alias("integral_daily"),
    ).orderBy("path", "slot_s")


_SELECT_FAMILY_SQL = f"""
{_GRID_CTE},
stats AS (
  SELECT path,
         VAR_POP(stat) AS vp,
         ARG_MAX(stat, CASE WHEN stat IS NOT NULL THEN slot_s END) AS last_v
  FROM grid GROUP BY path
),
mdev AS (SELECT path FROM stats ORDER BY vp DESC NULLS LAST, path LIMIT 1),
lim1 AS (SELECT MIN(path) AS path FROM grid)
SELECT g.path, g.slot_s,
       g.path IN (SELECT path FROM mdev) AS in_mostdeviant,
       g.path = (SELECT path FROM lim1) AS in_limit1,
       s.last_v > 50.0 AS in_currentabove
FROM grid g JOIN stats s USING (path)
ORDER BY g.path, g.slot_s
"""


@register(
    "carbon_series_select_family",
    _SELECT_FAMILY_SQL,
    "Graphite series-selection family in one gate: mostDeviant(1) "
    "(highest population variance, ties by name), limit(1) (first series "
    "in path order), currentAbove(50) (last non-null value above "
    "threshold) — emitted as per-row membership flags",
)
def carbon_select_family(spark, sf_dir):
    prep(spark)
    from cassabon_spark.functions.series import (
        current_above,
        limit_series,
        most_deviant,
    )
    from cassabon_spark.queries import R  # noqa: F401 (grid values untouched)

    grid = _grid_df(spark, sf_dir)
    flags = {
        "in_mostdeviant": most_deviant(grid, 1),
        "in_limit1": limit_series(grid, 1),
        "in_currentabove": current_above(grid, 50.0),
    }
    out = grid.select("path", "slot_s")
    for name, g in flags.items():
        mem = g.select("path").distinct().withColumn(name, F.lit(True))
        out = out.join(mem, "path", "left").withColumn(
            name, F.coalesce(F.col(name), F.lit(False))
        )
    return out.select(
        "path", "slot_s", "in_mostdeviant", "in_limit1", "in_currentabove"
    ).orderBy("path", "slot_s")


_NAMING_FAMILY_SQL = f"""
{_GRID_CTE}
SELECT path, slot_s,
       REGEXP_REPLACE(path, '^evt\\.', 'event_') AS renamed,
       SPLIT_PART(path, '.', 2) AS node1,
       ROUND(ROUND(CASE WHEN stat IS NOT NULL THEN 1.0 ELSE 0.0 END, 8), 4)
           AS present,
       NOT REGEXP_MATCHES(path, 'evt\\.err.*') AS kept_after_exclude
FROM grid
ORDER BY path, slot_s
"""


@register(
    "carbon_series_naming_family",
    _NAMING_FAMILY_SQL,
    "Graphite naming/presence family in one gate: aliasSub('^evt\\\\.', "
    "'event_'), aliasByNode(1), isNonNull, exclude('evt\\\\.err.*') as a "
    "kept-flag",
)
def carbon_naming_family(spark, sf_dir):
    prep(spark)
    from cassabon_spark.functions.series import (
        alias_by_node,
        alias_sub,
        exclude,
        is_non_null,
    )
    from cassabon_spark.queries import R

    grid = _grid_df(spark, sf_dir)
    # the rename functions rewrite `path` in place, so carry the original
    # name through as the join key
    keyed = grid.withColumn("orig", F.col("path"))
    ren = alias_sub(keyed, r"^evt\.", "event_").select(
        F.col("orig").alias("__rp"),
        F.col("slot_s").alias("__rs"),
        F.col("path").alias("renamed"),
    )
    abn = alias_by_node(keyed, 1).select(
        F.col("orig").alias("__ap"),
        F.col("slot_s").alias("__as"),
        F.col("path").alias("node1"),
    )
    nn = is_non_null(grid).select(
        F.col("path").alias("__np"),
        F.col("slot_s").alias("__ns"),
        F.col("stat").alias("present"),
    )
    kept = exclude(grid, r"evt\.err.*").select("path").distinct().withColumn(
        "kept_after_exclude", F.lit(True)
    )
    out = (
        grid.select("path", "slot_s")
        .join(ren, (F.col("path") == F.col("__rp")) & (F.col("slot_s") == F.col("__rs")))
        .drop("__rp", "__rs")
        .join(abn, (F.col("path") == F.col("__ap")) & (F.col("slot_s") == F.col("__as")))
        .drop("__ap", "__as")
        .join(nn, (F.col("path") == F.col("__np")) & (F.col("slot_s") == F.col("__ns")))
        .drop("__np", "__ns")
        .join(kept, "path", "left")
        .withColumn(
            "kept_after_exclude", F.coalesce("kept_after_exclude", F.lit(False))
        )
    )
    return out.select(
        "path",
        "slot_s",
        "renamed",
        "node1",
        R(F.col("present"), 4).alias("present"),
        "kept_after_exclude",
    ).orderBy("path", "slot_s")


# ---------------------------------------- graphite long tail, round 5 (b1)

# movingWindow generic form + the wildcard/tag combine pair — the last
# computational names without an exact gate (VERDICT r4 #6). The combines
# reduce to per-slot aggregates in the oracle; the Spark side goes through
# the REAL path machinery (segment filtering in combine_with_wildcards,
# `;tag=value` parsing in group_by_tags) so naming + grouping semantics are
# value-gated, not just unit-tested.
_MOVWIN_FAMILY_SQL = f"""
{_GRID_CTE},
mw AS (
  SELECT path, slot_s,
         SUM(stat) OVER (PARTITION BY path ORDER BY slot_s
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS mw_sum3,
         STDDEV_POP(stat) OVER (PARTITION BY path ORDER BY slot_s
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS mw_stddev4,
         COUNT(stat) OVER (PARTITION BY path ORDER BY slot_s
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS mw_count5
  FROM grid
),
awc AS (SELECT slot_s, SUM(stat) AS awc_sum FROM grid GROUP BY slot_s),
gbt AS (SELECT slot_s, AVG(stat) AS gbt_avg FROM grid GROUP BY slot_s)
SELECT m.path, m.slot_s,
       ROUND(ROUND(mw_sum3, 8), 4) AS mw_sum3,
       ROUND(ROUND(mw_stddev4, 8), 4) AS mw_stddev4,
       CAST(mw_count5 AS BIGINT) AS mw_count5,
       ROUND(ROUND(awc.awc_sum, 8), 4) AS awc_sum,
       ROUND(ROUND(gbt.gbt_avg, 8), 4) AS gbt_avg,
       'east' AS gbt_name
FROM mw m JOIN awc USING (slot_s) JOIN gbt USING (slot_s)
ORDER BY m.path, m.slot_s
"""


@register(
    "carbon_series_movingwindow_family",
    _MOVWIN_FAMILY_SQL,
    "Graphite movingWindow/aggregateWithWildcards/groupByTags family in "
    "one gate: movingWindow(3,'sum'), movingWindow(4,'stddev'), "
    "movingWindow(5,'count'), sumSeriesWithWildcards(1) via "
    "aggregateWithWildcards, groupByTags('avg','dc') over ;dc=east-tagged "
    "paths (result series named by the tag value)",
)
def carbon_movingwindow_family(spark, sf_dir):
    prep(spark)
    from cassabon_spark.functions.series import (
        combine_with_wildcards,
        group_by_tags,
        moving_window,
    )
    from cassabon_spark.queries import R

    grid = _grid_df(spark, sf_dir)
    mw_s = moving_window(grid, 3, "sum")
    mw_d = moving_window(grid, 4, "stddev")
    mw_c = moving_window(grid, 5, "count")
    # localCheckpoint, not cache(): the single-series guard below COUNTS
    # each frame and the joins then re-read it — without a barrier every
    # invocation paid the wildcard/tag aggregations twice (r6 review).
    # cache() leaked: CacheManager entries outlive the returned DataFrame
    # (nothing ever unpersisted them, one pair per invocation — ADVICE
    # r6); checkpoint blocks are dropped when the frame is GC'd. The
    # frames are one-series grids (~grid-slot count rows), so the
    # materialization is tiny.
    awc_full = combine_with_wildcards(grid, "sum", 1).localCheckpoint(eager=True)
    tagged = grid.withColumn("path", F.concat(F.col("path"), F.lit(";dc=east")))
    gbt_full = group_by_tags(tagged, "avg", "dc").localCheckpoint(eager=True)
    # fixture-drift guard (ADVICE r5): the slot_s-only joins below are
    # fan-out-free ONLY because dropping path segment 1 (and grouping on
    # the dc tag) collapses ALL fixture paths into exactly one series —
    # fail loudly if a future fixture breaks that, instead of silently
    # multiplying rows into an oracle diff
    for nm, fr in (("aggregateWithWildcards", awc_full), ("groupByTags", gbt_full)):
        n_series = fr.select("path").distinct().count()
        if n_series != 1:
            raise ValueError(
                f"carbon_series_movingwindow_family: {nm} yielded {n_series} "
                "series (expected 1) — fixture paths no longer fully "
                "collapse; join on the combined path as well as slot_s"
            )
    awc = awc_full.select(
        F.col("slot_s").alias("__ws"), F.col("stat").alias("awc_sum")
    )
    gbt = gbt_full.select(
        F.col("slot_s").alias("__gs"),
        F.col("stat").alias("gbt_avg"),
        F.col("path").alias("gbt_name"),
    )

    def keyed(g, name):
        return g.select(
            F.col("path").alias(f"__p_{name}"),
            F.col("slot_s").alias(f"__s_{name}"),
            F.col("stat").alias(name),
        )

    out = grid.select("path", "slot_s")
    for name, g in (("mw_sum3", mw_s), ("mw_stddev4", mw_d), ("mw_count5", mw_c)):
        out = out.join(
            keyed(g, name),
            (F.col("path") == F.col(f"__p_{name}"))
            & (F.col("slot_s") == F.col(f"__s_{name}")),
        ).drop(f"__p_{name}", f"__s_{name}")
    return (
        out.join(F.broadcast(awc), F.col("slot_s") == F.col("__ws"))
        .drop("__ws")
        .join(F.broadcast(gbt), F.col("slot_s") == F.col("__gs"))
        .drop("__gs")
        .select(
            "path",
            "slot_s",
            R(F.col("mw_sum3"), 4).alias("mw_sum3"),
            R(F.col("mw_stddev4"), 4).alias("mw_stddev4"),
            F.col("mw_count5").cast("bigint").alias("mw_count5"),
            R(F.col("awc_sum"), 4).alias("awc_sum"),
            R(F.col("gbt_avg"), 4).alias("gbt_avg"),
            "gbt_name",
        )
        .orderBy("path", "slot_s")
    )


# Holt-Winters confidence bands + aberration, EXACT-oracled: the forecast
# comes from the same RECURSIVE CTE replay as carbon_series_holtwinters
# (bit-identical on the 4-decimal-quantized grid), the deviation is a
# trailing 24-slot mean of |residual| quantized to the same lattice before
# the window (the r4 oracle-float lesson: DuckDB's windowed aggregates are
# segment trees, so feed them lattice values and absorb last-ulp jitter in
# the double-round), and the aberration is pure CASE algebra on top.
_HW_BANDS_SQL = f"""
{_HW_SQL.rsplit("SELECT hw.path", 1)[0]},
fc AS (
  SELECT hw.path AS path, g.slot_s AS slot_s, g.stat AS stat, hw.fc AS fc
  FROM hw JOIN idx g ON g.path = hw.path AND g.i = hw.i
),
dev AS (
  SELECT path, slot_s, stat, fc,
         AVG(ROUND(ROUND(ABS(stat - fc), 8), 4)) OVER (
             PARTITION BY path ORDER BY slot_s
             ROWS BETWEEN 23 PRECEDING AND CURRENT ROW) AS dv
  FROM fc
)
SELECT path, slot_s,
       ROUND(ROUND(fc + 3.0 * dv, 8), 4) AS hw_upper,
       ROUND(ROUND(fc - 3.0 * dv, 8), 4) AS hw_lower,
       ROUND(ROUND(CASE WHEN stat > fc + 3.0 * dv THEN stat - (fc + 3.0 * dv)
                        WHEN stat < fc - 3.0 * dv THEN stat - (fc - 3.0 * dv)
                        ELSE CASE WHEN stat IS NOT NULL THEN 0.0 END
                   END, 8), 4) AS hw_aberration
FROM dev
ORDER BY path, slot_s
"""


@register(
    "carbon_series_hw_bands",
    _HW_BANDS_SQL,
    "Graphite holtWintersConfidenceBands(3) + holtWintersAberration(): "
    "bands = recursive-CTE-replayed forecast +- 3 x trailing-24 mean "
    "|residual| (lattice-quantized), aberration = excess outside the band",
)
def carbon_hw_bands(spark, sf_dir):
    prep(spark)
    from pyspark.sql import Window

    from cassabon_spark.functions.series import holt_winters_forecast
    from cassabon_spark.queries import R

    quantized = _grid_df(spark, sf_dir).withColumn(
        "stat", F.round(F.round("stat", 8), 4)
    )
    fc = holt_winters_forecast(quantized, season_slots=24).withColumnRenamed(
        "stat", "fc"
    )
    joined = quantized.join(fc, ["path", "slot_s"])
    w = Window.partitionBy("path").orderBy("slot_s").rowsBetween(-23, 0)
    resid = F.round(F.round(F.abs(F.col("stat") - F.col("fc")), 8), 4)
    dv = F.avg(resid).over(w)
    upper = F.col("fc") + 3.0 * dv
    lower = F.col("fc") - 3.0 * dv
    ab = (
        F.when(F.col("stat") > upper, F.col("stat") - upper)
        .when(F.col("stat") < lower, F.col("stat") - lower)
        .otherwise(F.when(F.col("stat").isNotNull(), F.lit(0.0)))
    )
    return joined.select(
        "path",
        "slot_s",
        R(upper, 4).alias("hw_upper"),
        R(lower, 4).alias("hw_lower"),
        R(ab, 4).alias("hw_aberration"),
    ).orderBy("path", "slot_s")
