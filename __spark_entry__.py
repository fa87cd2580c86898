"""Driver contract for the cassabon_spark engine (PySpark target).

entry(spark)    — flagship query: the full carbon read path (tier rollup ->
                  normalize -> merge -> gap-fill -> NaN scrub) on sf0.001.
queries()       — every implemented operator from SURVEY.md §2
                  (Part A carbon surface, Part B relational surface,
                  Part C training-data extensions).
oracle_sql()    — matching DuckDB SQL for EVERY entry (since r4, zero
                  rows-only entries: approx_count_distinct emits exact
                  counts plus a Spark-checked <=5%-error boolean, and
                  similarity_ivf_kmeans emits the exact brute-force top-5
                  plus a recall@5 >= 0.6 boolean, so the engine-specific
                  sketch/learned-quantizer quality is gated rather than
                  waved through).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: GET /metrics-equivalent gap-filled series over sf0.001."""
    from cassabon_spark.queries import load_registry

    registry = load_registry()
    return registry["carbon_read_gapfill"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from cassabon_spark.queries import load_registry

    return {name: qd.fn for name, qd in load_registry().items()}


def oracle_sql() -> dict[str, str]:
    from cassabon_spark.queries import load_registry

    return {name: qd.sql for name, qd in load_registry().items() if qd.sql is not None}
