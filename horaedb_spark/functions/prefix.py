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

import numpy as np
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


def _exact_rank_with_total(
    df: DataFrame,
    order_cols: list[Column],
    out_col: str,
    num_partitions: int,
    pins: list[DataFrame] | None = None,
) -> tuple[DataFrame, int]:
    """Exact global 1-based rank over a UNIQUE total order — without the
    single-partition sort that ``row_number() OVER (ORDER BY ...)`` costs.

    Same two-phase shape as :func:`ordered_prefix_sum`: range-shuffle on
    the order key + sort within partitions, per-partition row counts
    collected to the driver (``num_partitions`` longs — metadata, not
    data) folded into exclusive offsets, then ONE Arrow ``mapInPandas``
    pass that stamps ``offset + position`` as the rank. One range shuffle
    total — the rank pass is narrow (no window, so no second hash
    exchange on the partition id).

    The range-partitioned frame is persisted so the counts job and the
    rank job see the same sampled boundaries (repartitionByRange resamples
    per job otherwise). If ``pins`` is given, the persisted handle is
    appended so the caller can ``unpersist()`` after its action completes
    (same caller-owned contract as :func:`ordered_prefix_sum`); lazy
    callers that never act (query builders) simply leave it cached.
    Returns (ranked frame, total row count)."""
    pre = (
        df.repartitionByRange(num_partitions, *order_cols)
        .sortWithinPartitions(*order_cols)
        .persist()
    )
    if pins is not None:
        pins.append(pre)
    counts = {
        r["pid"]: r["c"]
        for r in pre.groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    offsets: list[int] = []
    acc = 0
    for pid in range(num_partitions):
        offsets.append(acc)
        acc += int(counts.get(pid, 0))

    with_pid = pre.withColumn(_PID, F.spark_partition_id())
    out_schema = T.StructType(
        [f for f in with_pid.schema.fields if f.name != _PID]
        + [T.StructField(out_col, T.LongType())]
    )

    def stamp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        run = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if run is None:
                run = offsets[int(pdf[_PID].iloc[0])]
            n = len(pdf)
            pdf = pdf.drop(columns=[_PID])
            pdf[out_col] = np.arange(run + 1, run + n + 1, dtype="int64")
            run += n
            yield pdf

    return with_pid.mapInPandas(stamp, out_schema), acc


def exact_rank(
    df: DataFrame,
    order_cols: list[Column],
    out_col: str = "rank",
    num_partitions: int = 32,
    pins: list[DataFrame] | None = None,
) -> DataFrame:
    """See :func:`_exact_rank_with_total` — public form without the count."""
    return _exact_rank_with_total(df, order_cols, out_col, num_partitions, pins)[0]


def exact_ntile(
    df: DataFrame,
    order_cols: list[Column],
    n: int,
    out_col: str,
    num_partitions: int = 32,
    pins: list[DataFrame] | None = None,
) -> DataFrame:
    """Exact ``ntile(n) OVER (ORDER BY ...)`` semantics — bucket q gets
    ``N // n`` rows plus one extra for the first ``N % n`` buckets — built
    on :func:`exact_rank`, so the plan has ONE range shuffle and no
    single-partition stage (the global-ntile window is the classic serial
    bottleneck at high cardinality; r4 verdict #3). The bucket boundaries
    are rank literals folded into a CASE chain — no second pass.

    ``order_cols`` must be a unique total order (tie-break on a key
    column) so bucket membership is deterministic and oracle-portable."""
    ranked, n_rows = _exact_rank_with_total(
        df, order_cols, "__rank__", num_partitions, pins
    )
    base, rem = n_rows // n, n_rows % n
    bounds, acc = [], 0
    for q in range(1, n + 1):
        acc += base + (1 if q <= rem else 0)
        bounds.append((q, acc))
    expr = F.lit(n)
    for q, b in reversed(bounds[:-1]):
        expr = F.when(F.col("__rank__") <= b, q).otherwise(expr)
    return ranked.withColumn(out_col, expr.cast("int")).drop("__rank__")


def ntile_boundaries(
    df: DataFrame,
    dim_col: str,
    key_col: str,
    n: int,
    num_partitions: int = 32,
) -> list[tuple]:
    """The (dim, key) rows sitting at the exact ntile(n) bucket boundaries
    of ``ORDER BY dim DESC, key ASC`` — n-1 driver-side literals.

    Discovery shuffles only the SLIM (dim, key) pair frame (range shuffle +
    per-partition counts, the exact_rank machinery); the boundary rows are
    then read out of the cached partitions by local position — output is
    n-1 rows however large ``df`` is. ``(dim, key)`` must be a unique total
    order with non-null dims. Returns fewer than n-1 entries when the
    frame has fewer rows than buckets (Spark ntile then gives one row per
    bucket, which the shorter boundary chain reproduces)."""
    order_cols = [F.desc(dim_col), F.asc(key_col)]
    pre = (
        df.select(dim_col, key_col)
        .repartitionByRange(num_partitions, *order_cols)
        .sortWithinPartitions(*order_cols)
        .persist()
    )
    try:
        counts = {
            r["pid"]: r["c"]
            for r in pre.groupBy(F.spark_partition_id().alias("pid"))
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        }
        offsets: list[int] = []
        acc = 0
        for pid in range(num_partitions):
            offsets.append(acc)
            acc += int(counts.get(pid, 0))
        n_rows = acc
        if n_rows == 0:
            return []
        base, rem = n_rows // n, n_rows % n
        ranks: list[int] = []
        r = 0
        for q in range(1, n):  # boundary rank of buckets 1..n-1
            r += base + (1 if q <= rem else 0)
            # the last bucket needs no upper boundary; zero-size buckets
            # (fewer rows than buckets) would repeat a rank — skip them
            if 0 < r < n_rows and (not ranks or r > ranks[-1]):
                ranks.append(r)
        # rank -> (pid, local position)
        wanted: dict[int, list[tuple[int, int]]] = {}
        for i, rk in enumerate(ranks):
            pid = max(p for p in range(num_partitions) if offsets[p] < rk)
            wanted.setdefault(pid, []).append((rk - offsets[pid], i))
        out_schema = T.StructType(
            [
                T.StructField("__b_idx__", T.LongType()),
                *[f for f in pre.schema.fields],
            ]
        )

        def pick(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            pos = 0
            todo = None
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                if todo is None:
                    todo = dict(
                        wanted.get(int(pdf["__pid__"].iloc[0]), [])
                    )
                if not todo:
                    return
                take = [
                    (lp - pos - 1, bi)
                    for lp, bi in todo.items()
                    if pos < lp <= pos + len(pdf)
                ]
                for row_i, b_idx in take:
                    row = pdf.drop(columns=["__pid__"]).iloc[[row_i]].copy()
                    row.insert(0, "__b_idx__", b_idx)
                    yield row
                pos += len(pdf)

        picked = (
            pre.withColumn("__pid__", F.spark_partition_id())
            .mapInPandas(pick, out_schema)
            .collect()
        )
        rows = sorted(picked, key=lambda r: r["__b_idx__"])
        return [(r[dim_col], r[key_col]) for r in rows]
    finally:
        pre.unpersist()


def exact_ntile_lit(
    df: DataFrame,
    dim_col: str,
    key_col: str,
    n: int,
    out_col: str,
    num_partitions: int = 32,
) -> DataFrame:
    """Exact ``ntile(n) OVER (ORDER BY dim DESC, key ASC)`` assigned by
    comparing against the n-1 collected boundary literals — the MAIN frame
    is never shuffled, ranked, or sent through Python: the score lands as
    a JVM CASE chain, so multiple ntile columns over the same frame (the
    RFM pattern) stay narrow on it. Discovery cost rides on the slim
    (dim, key) projection only (see :func:`ntile_boundaries`); exactness
    holds because ranks are unique under the (dim DESC, key ASC) total
    order, so "row <= boundary-row" selects exactly the boundary rank's
    worth of rows.

    PRECONDITIONS (like the non-null dim requirement): ``df`` must be
    DETERMINISTIC across jobs — discovery and scoring are two independent
    passes over it, so a frame containing unseeded ``rand()``/``sample``
    (or reading mutating input) can yield boundary literals that disagree
    with the rows later scored, silently breaking exact-ntile semantics.
    Persist (or localCheckpoint) such frames first — the RFM/pareto
    callers eagerly localCheckpoint theirs, which pins determinism
    structurally (both passes read one materialization)."""
    bounds = ntile_boundaries(df, dim_col, key_col, n, num_partitions)
    return df.withColumn(out_col, ntile_case(dim_col, key_col, bounds))


def ntile_case(
    dim_col: str, key_col: str, bounds: list[tuple]
) -> Column:
    """The bucket CASE chain over pre-collected :func:`ntile_boundaries`
    literals. Split out so callers scoring several dimensions of one frame
    (the RFM shape) can run the discoveries CONCURRENTLY — they are
    independent jobs over slim projections, so the scheduler overlaps
    them — and then apply all scores in one narrow projection."""
    if not bounds:
        # no interior boundary: every row (0 or 1 of them) is bucket 1
        return F.lit(1).cast("int")
    d, k = F.col(dim_col), F.col(key_col)
    expr = None
    for q, (bd, bk) in enumerate(bounds, start=1):
        cond = (d > F.lit(bd)) | ((d == F.lit(bd)) & (k <= F.lit(bk)))
        expr = F.when(cond, q) if expr is None else expr.when(cond, q)
    return expr.otherwise(len(bounds) + 1).cast("int")
