"""Skew mitigation helpers (SURVEY.md §7.3(c): hot-series dedup/agg skew).

AQE's skew-join splitting handles join skew automatically (enabled in the
session factory); these helpers cover the *aggregation* case AQE doesn't:
a groupBy where one key holds a disproportionate share of rows. The classic
two-phase salted aggregate splits each hot key into N salt buckets, partially
aggregates per (key, salt), then merges the partials — turning one straggler
task into N parallel ones at the cost of a second (tiny) shuffle.

Use for algebraic aggregates (sum/count/min/max — anything with a merge
step). Spark's built-in partial aggregation already does this *within* a
partition; salting matters when a single key's rows span many partitions and
the final merge of that key becomes the straggler.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    partial_aggs: dict[str, Column],
    merge_aggs: Callable[[str], Column],
    num_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``partial_aggs``: output-name -> aggregate over the raw rows (runs per
    (key, salt)). ``merge_aggs``: output-name -> aggregate merging the
    partials (runs per key). Example::

        salted_agg(df, ["k"],
                   {"s": F.sum("v"), "n": F.count("*")},
                   lambda name: F.sum(name))
    """
    salted = df.withColumn("__salt__", F.pmod(F.spark_partition_id(), F.lit(num_salts)))
    partial = salted.groupBy(*key_cols, "__salt__").agg(
        *[c.alias(name) for name, c in partial_aggs.items()]
    )
    merged = partial.groupBy(*key_cols).agg(
        *[merge_aggs(name).alias(name) for name in partial_aggs]
    )
    return merged


def salted_sum(
    df: DataFrame, key_cols: list[str], value: Column | str, out: str = "sum", num_salts: int = 16
) -> DataFrame:
    """Salted decimal-routed sum (order-independent AND straggler-free)."""
    v = F.col(value) if isinstance(value, str) else value
    return salted_agg(
        df,
        key_cols,
        {out: F.sum(v.cast("decimal(30,10)"))},
        lambda name: F.sum(name).cast("double"),
        num_salts,
    )
