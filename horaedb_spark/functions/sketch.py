"""Deterministic count-min sketch — mergeable approximate heavy-hitter
counting (SURVEY.md §2 extension; complements the engine-native HLL /
KLL sketches exercised by ``approx_sketches``).

Why build one when Spark has approx aggregates: (a) count-min is the
sketch Spark does NOT ship (frequency estimation, not cardinality or
quantiles); (b) hashing with md5 makes the whole sketch a pure function
of the data — bit-identical on any engine and any partitioning — so the
DuckDB oracle replays it EXACTLY instead of settling for tolerance bands;
(c) the build is one hash aggregate over d×N rows whose output is d×w
counters — map-side partial aggregation IS the sketch merge, so the
mergeability that matters at 1000 executors falls out of Catalyst for
free, and the finished sketch (a few KB) broadcasts to the estimate join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX = "0123456789abcdef"
DEPTH = 4
WIDTH = 256


def cm_bucket(item: Column, j: int) -> Column:
    """Row-j bucket of an item: first two hex digits of md5('j:'||item) as
    a 0..255 integer — engine-portable (strpos/position arithmetic, no
    hex-parse builtins needed)."""
    h = F.md5(F.concat(F.lit(f"{j}:"), item))
    hexs = F.lit(_HEX)
    return (F.position(F.substring(h, 1, 1), hexs) - 1) * 16 + (
        F.position(F.substring(h, 2, 1), hexs) - 1
    )


def cm_build(df: DataFrame, item: Column) -> DataFrame:
    """Build the (j, bucket, c) sketch: d buckets per input row, one hash
    aggregate. Partial (map-side) combine merges per-partition sketches
    before the shuffle — the output is at most DEPTH×WIDTH rows."""
    pairs = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"), cm_bucket(item, j).alias("bucket")
                    )
                    for j in range(DEPTH)
                ]
            )
        ).alias("p")
    )
    return pairs.groupBy(F.col("p.j").alias("j"), F.col("p.bucket").alias("bucket")).agg(
        F.count("*").alias("c")
    )


def cm_estimate(candidates: DataFrame, sketch: DataFrame, item_col: str) -> DataFrame:
    """Point-estimate each candidate item: min over the d rows of its
    bucket counters. The sketch broadcasts (d×w rows); candidates keep
    their partitioning."""
    hashed = candidates.select(
        item_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        cm_bucket(F.col(item_col), j).alias("bucket"),
                    )
                    for j in range(DEPTH)
                ]
            )
        ).alias("p"),
    ).select(item_col, "p.j", "p.bucket")
    return (
        hashed.join(F.broadcast(sketch), ["j", "bucket"])
        .groupBy(item_col)
        .agg(F.min("c").alias("est"))
    )
