"""cassabon_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of jeffpierce/cassabon (a Carbon/Graphite-compatible
time-series metrics daemon), re-architected Spark-first.

Not a port: the reference's goroutine/channel/Cassandra architecture is replaced
by DataFrame/Catalyst plans, Structured Streaming state, and partitioned Parquet
storage. See SURVEY.md for the full mapping.

Layout:
    engine      — Engine facade: the reference's full API surface (ingest,
                  GET /metrics, GET /paths, DELETE /metrics, DELETE /paths)
                  over one durable store
    config      — rollup configuration model + validation (reference: config/)
    sources     — carbon line-protocol parsing, testdata table loaders
    operators   — rollup aggregation, read path (gap-fill), path index,
                  deletes, as-of join, dedup, similarity search
    functions   — scalar helpers (pearson hash, text, vector math)
    streaming   — Structured Streaming ingest pipeline
    queries     — declared query surface for the duckdb-oracle harness
"""

from cassabon_spark.session import get_spark


def __getattr__(name):
    # lazy: Engine pulls in the operator modules, keep bare import cheap
    if name == "Engine":
        from cassabon_spark.engine import Engine

        return Engine
    raise AttributeError(name)


__all__ = ["get_spark", "Engine"]
__version__ = "0.1.0"
