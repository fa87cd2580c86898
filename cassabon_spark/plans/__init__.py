from cassabon_spark.plans.observability import ingest_observation, MetricsListener, plan_report

__all__ = ["ingest_observation", "MetricsListener", "plan_report"]
