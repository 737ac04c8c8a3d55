"""Interval (range) joins that scale — point-in-interval matching without a
nested-loop join.

Spark plans `fact.ts BETWEEN iv.start AND iv.end` as a
BroadcastNestedLoopJoin (or worse, a cartesian + filter): every fact row is
tested against every interval — O(N×M), the classic range-join trap. The
scalable form is bucketization: pick a bucket width, explode each interval
into the buckets it covers, map each fact row to its single bucket, hash
equi-join on the bucket key, and re-check the exact bounds as a residual
filter. Cost becomes O(N + M×(len/bucket)) rows through ONE hash shuffle,
and skew follows bucket population (AQE-splittable), not interval count.
Within one interval a fact matches exactly one of its buckets, so no
dedup step is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_equi_join(
    facts: DataFrame,
    ts_col: str,
    intervals: DataFrame,
    start_col: str,
    end_col: str,
    bucket_ms: int,
) -> DataFrame:
    """Join fact rows to every interval containing their timestamp
    (``start <= ts < end``) via bucketized hash equi-join. Pick
    ``bucket_ms`` near the typical interval length: each interval then
    explodes into O(1) bucket rows."""
    f = facts.withColumn(
        "__bucket__", F.col(ts_col) - F.pmod(F.col(ts_col), F.lit(bucket_ms))
    )
    iv = intervals.withColumn(
        "__bucket__",
        F.explode(
            F.sequence(
                F.col(start_col) - F.pmod(F.col(start_col), F.lit(bucket_ms)),
                (F.col(end_col) - 1) - F.pmod(F.col(end_col) - 1, F.lit(bucket_ms)),
                F.lit(bucket_ms),
            )
        ),
    )
    return (
        f.join(iv, "__bucket__")
        .filter((F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col)))
        .drop("__bucket__")
    )
