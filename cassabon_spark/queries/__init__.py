"""Declared query surface for the duckdb-oracle harness (SURVEY §2).

Every operator the engine claims is registered here as a QueryDef:
  fn  — (spark, sf_dir) -> DataFrame   (the Spark-first implementation)
  sql — equivalent ANSI SQL for DuckDB on the same parquet views, or None
        for genuinely non-SQL-expressible ops (driver records rows-only)

Parity rules (the driver hash-compares values after sorting columns by name):
  * identical output column names on both sides
  * DOUBLE outputs rounded the same on both sides (fp sum order differs
    across engines; rounding absorbs the ulps)
  * counts CAST to BIGINT on both sides (DuckDB sum(int) is HUGEINT)
  * timestamps surfaced as epoch BIGINT or formatted strings, never raw
    (collection-layer tz handling differs)
  * integer division/floor spelled out (DuckDB cast(double as int) ROUNDS,
    Spark truncates)
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QueryDef:
    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None
    doc: str = ""


REGISTRY: dict[str, QueryDef] = {}


def register(name: str, sql: str | None, doc: str = ""):
    def deco(fn):
        REGISTRY[name] = QueryDef(fn=fn, sql=sql, doc=doc)
        return fn

    return deco


def T(spark: SparkSession, sf_dir: str, name: str, wide: bool = False) -> DataFrame:
    """Load a testdata table. wide=True round-robin repartitions to the
    session's full parallelism — for compute-heavy per-row work (tokenize /
    shingle / hash) over inputs small enough to arrive as one split. At
    cluster scale the file count already provides the parallelism and the
    repartition collapses to a cheap rebalance of already-distributed splits.
    """
    if name == "events":
        df = EV(spark, sf_dir)
    else:
        df = _tz_normalize(spark.read.parquet(f"{sf_dir}/{name}.parquet"))
    if wide and df.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism:
        df = df.repartition(spark.sparkContext.defaultParallelism)
    return df


def _tz_normalize(df: DataFrame) -> DataFrame:
    from cassabon_spark.sources.tables import tz_normalize

    return tz_normalize(df)


def R(col, n: int = 4):
    """Oracle-safe rounding for averages/ratios: round twice (n+4, then n).

    The first round re-quantizes both engines' ulp-different doubles onto the
    same decimal grid, so the second round's half-way decision is made on an
    identical binary value in Spark and DuckDB. (A single round(x, 4) of an
    average that lands exactly on .00005 flips per engine — observed on real
    data.) SQL mirror: ROUND(ROUND(x, n+4), n).
    """
    from pyspark.sql import functions as F

    return F.round(F.round(col, n + 4), n)


def EV(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet carries TIMESTAMP(NANOS), which Spark 4 refuses by
    default. Read nanos as long, then integer-DIV to microseconds (DIV, not
    float division — 1.7e18 ns overflows double precision) — this matches
    DuckDB's truncate-to-micros read of the same file exactly.
    """
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(df.dtypes)["ts"] == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return _tz_normalize(df)


def load_registry() -> dict[str, QueryDef]:
    """Import all query modules (side effect: fills REGISTRY)."""
    from cassabon_spark.queries import carbon, extensions, relational, tpch_rest  # noqa: F401

    return REGISTRY
