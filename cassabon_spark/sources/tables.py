"""Loaders for the driver-provided parquet tables (TESTDATA.md).

Plain `spark.read.parquet` so Catalyst gets native vectorized scans with
predicate pushdown and column pruning. Dimension tables small enough to
broadcast are listed in BROADCAST_TABLES; join helpers use that hint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dims that stay tiny at every scale factor (bounded cardinality) — always
# broadcast-joinable. customer/supplier/part grow with SF but stay well under
# the default 10 MB autoBroadcastJoinThreshold through sf0.1; at 100 TB they
# would be shuffle-join sides, which Catalyst decides from stats — we only
# force-broadcast the bounded ones.
BROADCAST_TABLES = ("region", "nation")


def tz_normalize(df: DataFrame) -> DataFrame:
    """Cast TIMESTAMP_NTZ columns to session-tz TIMESTAMP (session pinned
    UTC). The testdata generator writes isAdjustedToUTC=false timestamps;
    DuckDB reads those naive and EPOCH()s them as-if-UTC, so this cast is
    the identical interpretation — and it restores double-cast/epoch
    arithmetic that TIMESTAMP_NTZ refuses."""
    from pyspark.sql import functions as F

    for f in df.schema.fields:
        if f.dataType.simpleString() == "timestamp_ntz":
            df = df.withColumn(f.name, F.col(f.name).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.parquet has carried TIMESTAMP(NANOS) in some generator
        # versions — route through the nanos-aware loader.
        from cassabon_spark.queries import EV

        return EV(spark, sf_dir)
    return tz_normalize(spark.read.parquet(f"{sf_dir}/{name}.parquet"))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql() use."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
