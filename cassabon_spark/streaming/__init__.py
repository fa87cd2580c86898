from cassabon_spark.streaming.ingest import ingest_stream, compact_store

__all__ = ["ingest_stream", "compact_store"]
