from horaedb_spark.metric.engine import Matcher, MetricEngine

__all__ = ["MetricEngine", "Matcher"]
