"""Distributed ordered prefix sum — the kernel behind "greedy fill a token
budget by priority" corpus sampling (and any cumulative-quota cut).

The naive Spark form — ``sum(x) OVER (ORDER BY key)`` with no PARTITION BY —
collapses the whole dataset into ONE partition (Exchange SinglePartition):
the canonical scale-killer. This module implements the textbook two-phase
distributed scan instead:

1. range-shuffle the rows by the order key (``repartitionByRange``), so
   partition *p* holds a contiguous key range and partitions are ordered;
2. aggregate one partial sum per partition (a metadata-sized result — one
   row per partition — collected to the driver);
3. turn those into exclusive per-partition offsets, and
4. stream each partition once through an Arrow ``mapInPandas`` that adds
   ``offset + running_sum`` — a narrow pass that carries the running total
   across record batches within the partition.

Total data movement: ONE range shuffle. No single-partition stage exists in
the plan (asserted in tests/test_plans.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_PID = "__pid__"


def ordered_prefix_sum(
    df: DataFrame,
    order_cols: list[Column],
    value_col: str,
    out_col: str = "cum_sum",
    num_partitions: int = 32,
) -> DataFrame:
    """Inclusive prefix sum of ``value_col`` (integral) over the total order
    given by ``order_cols`` (which must be a UNIQUE key — ties would make
    the cumulative value order-dependent). Returns ``df`` + ``out_col``.

    The range-partitioned intermediate is persisted: ``repartitionByRange``
    samples its boundaries, so the offsets job and the main pass MUST see
    the same physical partitioning — the cache pins it. The caller may
    ``unpersist`` the result's lineage after its action completes."""
    pre = (
        df.repartitionByRange(num_partitions, *order_cols)
        .sortWithinPartitions(*order_cols)
        .persist()
    )
    totals = {
        r["pid"]: r["s"]
        for r in pre.select(
            F.spark_partition_id().alias("pid"), F.col(value_col)
        )
        .groupBy("pid")
        .agg(F.sum(value_col).alias("s"))
        .collect()
    }
    offsets: list[int] = []
    acc = 0
    for pid in range(num_partitions):
        offsets.append(acc)
        acc += int(totals.get(pid, 0) or 0)

    with_pid = pre.withColumn(_PID, F.spark_partition_id())
    out_schema = T.StructType(
        [f for f in with_pid.schema.fields if f.name != _PID]
        + [T.StructField(out_col, T.LongType())]
    )

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        run = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if run is None:
                run = offsets[int(pdf[_PID].iloc[0])]
            cs = pdf[value_col].astype("int64").cumsum() + run
            run = int(cs.iloc[-1])
            pdf = pdf.drop(columns=[_PID])
            pdf[out_col] = cs.values
            yield pdf

    return with_pid.mapInPandas(scan, out_schema)
