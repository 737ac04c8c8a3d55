from horaedb_spark.core.schema import StorageSchema, UpdateMode
from horaedb_spark.core.timeutil import TimeRange, truncate_by

__all__ = ["StorageSchema", "UpdateMode", "TimeRange", "truncate_by"]
