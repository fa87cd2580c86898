"""Hierarchical path index: ancestor expansion + glob search (A17/A18/A20).

Replaces the reference's Elasticsearch index (datastore/indexmanager.go) with
a small DataFrame/table of (path, depth, tenant, leaf):
  - ancestor expansion: a.b.c -> a.b.c(leaf), a.b, a
    (indexmanager.go:225-278; trailing '%' stripped at 233-236)
  - glob -> regex: '.'->'\\.', '*'->'.*', match where depth == segments(query)
    (indexmanager.go:303-347)
  - results sorted path asc (indexmanager.go:325-331)
  - DELETE /paths is routed but unimplemented in the reference
    (indexmanager.go:294-296) — implemented here.

Spark-first: expansion is posexplode over split — no Python row loop; the
index table is tiny relative to the data (distinct paths), so glob queries
are a filter + orderBy over a broadcastable table.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def expand_ancestors(paths_df: DataFrame, path_col: str = "path") -> DataFrame:
    """paths(path) -> index(path, depth, tenant, leaf), one row per prefix.

    FIXTURES.md §1.5: from a.b.c expect (a.b.c,3,'',true), (a.b,2,'',false),
    (a,1,'',false). Trailing '%' on the input path is stripped first.
    """
    cleaned = paths_df.select(
        F.regexp_replace(F.col(path_col), r"%+$", "").alias("full_path")
    ).filter(F.length("full_path") > 0)
    parts = F.split("full_path", r"\.")
    return (
        cleaned.withColumn("_parts", parts)
        .withColumn("_n", F.size("_parts"))
        .select(
            "full_path",
            "_parts",
            "_n",
            F.explode(F.sequence(F.lit(1), F.col("_n"))).alias("depth"),
        )
        .select(
            F.array_join(F.slice("_parts", 1, F.col("depth")), ".").alias("path"),
            F.col("depth").cast("int").alias("depth"),
            F.lit("").alias("tenant"),
            (F.col("depth") == F.col("_n")).alias("leaf"),
        )
        .groupBy("path", "depth", "tenant")
        .agg(F.max("leaf").alias("leaf"))  # a prefix that is also a metric stays leaf
    )


def build_index(metrics: DataFrame, path_col: str = "path") -> DataFrame:
    """Distinct metric paths -> expanded index table (A18).

    In the streaming pipeline this runs inside foreachBatch as an anti-join
    against the existing index (only new paths expand), mirroring the
    reference's new-path detection (datastore/metricstore.go:67-74).
    """
    return expand_ancestors(metrics.select(path_col).distinct(), path_col)


def glob_to_regex(glob: str) -> str:
    """Metric glob -> anchored regex.

    Reference parity: '.'->'\\.', '*'->'.*' (indexmanager.go:313-314; '.*'
    crossing segment boundaries is harmless because search is always
    depth-scoped). Extension beyond the reference, matching the glob
    surface graphite-web finders accept: '?' (one char), '{a,b}'
    (alternation), '[0-9]' (char class, passed through). Everything else is
    regex-escaped."""
    import re as _re

    out, i, n = [], 0, len(glob)
    while i < n:
        c = glob[i]
        if c == "*":
            out.append(".*")
        elif c == "?":
            out.append(".")
        elif c == "{":
            end = glob.find("}", i)
            if end < 0:
                out.append(_re.escape(c))
            else:
                alts = glob[i + 1 : end].split(",")
                out.append("(" + "|".join(_re.escape(a) for a in alts) + ")")
                i = end
        elif c == "[":
            end = glob.find("]", i)
            if end < 0:
                out.append(_re.escape(c))
            else:
                out.append(glob[i : end + 1])
                i = end
        else:
            out.append(_re.escape(c))
        i += 1
    return "^" + "".join(out) + "$"


def glob_depth(glob: str) -> int:
    return len(glob.split("."))


def search_glob(index: DataFrame, glob: str) -> DataFrame:
    """A17: depth-matched regex search, sorted by path asc."""
    return (
        index.filter(F.col("depth") == glob_depth(glob))
        .filter(F.col("path").rlike(glob_to_regex(glob)))
        .orderBy("path")
    )


def delete_paths(index: DataFrame, glob: str) -> DataFrame:
    """A20 (unimplemented in the reference — we implement it): remove every
    index row matching the glob at its depth; returns the surviving index."""
    cond = (F.col("depth") == glob_depth(glob)) & F.col("path").rlike(glob_to_regex(glob))
    return index.filter(~cond)


def route_pure(paths: list[str], patterns: list[str]) -> list[str]:
    """Driver-side first-match-wins routing for small path lists (A5), used by
    query planning; the distributed version is RollupConfig.routing_when_chain."""
    compiled = [(p, re.compile(p)) for p in patterns if p != "default"]
    out = []
    for path in paths:
        hit = "default"
        for src, pat in compiled:
            if pat.search(path):
                hit = src
                break
        out.append(hit)
    return out


def update_index_incremental(spark, metrics: DataFrame, index_dir: str) -> None:
    """A18 incremental maintenance: expand ancestors of NEW paths only
    (anti-join against the stored index) and append. Mirrors the reference's
    new-path detection during ingest (datastore/metricstore.go:67-74 ->
    indexmanager.go:225-278) with one durable parquet table instead of ES.
    Used by both the Engine facade and the streaming foreachBatch writer.
    """
    import os

    paths = metrics.select("path").distinct()
    has_index = os.path.isdir(index_dir) and any(os.scandir(index_dir))
    if has_index:
        existing = spark.read.parquet(index_dir)
        paths = paths.join(existing.filter(F.col("leaf")).select("path"), "path", "left_anti")
        new_rows = expand_ancestors(paths).join(
            existing.select("path"), "path", "left_anti"
        )
    else:
        new_rows = expand_ancestors(paths)
    new_rows.write.mode("append").parquet(index_dir)
