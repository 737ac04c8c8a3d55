"""Multi-dimensional data layout: Z-order (Morton) clustering.

Time-partitioned SSTs prune perfectly on time but not on value columns: a
query filtering ``user_id BETWEEN a AND b`` still opens every SST of the
matching segments. Z-ordering slices each segment's rows along an
interleaved-bit curve over the chosen columns, so each written SST covers a
small hyper-rectangle of the value space — its footer min/max stats become
tight, and the manifest's column-stats pruning (`table._sst_may_match`)
skips whole files for value predicates on ANY of the clustered columns.
This is the published Delta/Iceberg OPTIMIZE ZORDER technique re-expressed
on this engine's primitives; at 100 TB it is the difference between reading
a segment and reading a slice of it.

All arithmetic is plain JVM column expressions (normalize -> quantize ->
bit-interleave); no UDFs, no shuffle beyond the clustered write itself.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_key(
    cols: list[Column],
    mins: list[float],
    maxs: list[float],
    bits: int = 16,
) -> Column:
    """Morton key interleaving ``bits`` quantized bits per column.

    Each column is normalized to [0, 2^bits) against the provided min/max
    (driver-side metadata from one aggregate), then bit i of column j lands
    at position i*ncols + j. Total key width = bits * ncols <= 63.
    Normalization is double-precision: layout quality only — correctness
    never depends on the key, so float rounding here is harmless.
    """
    n = len(cols)
    if not (1 <= n and bits * n <= 63):
        raise ValueError(f"bits*ncols must fit a long: {bits}*{n}")
    top = (1 << bits) - 1
    key = F.lit(0).cast("long")
    for j, (c, mn, mx) in enumerate(zip(cols, mins, maxs)):
        span = float(mx) - float(mn)
        if span <= 0:  # constant column contributes nothing to the curve
            continue
        q = F.least(
            F.greatest(
                F.floor((c.cast("double") - F.lit(float(mn))) / F.lit(span) * top)
                .cast("long"),
                F.lit(0).cast("long"),
            ),
            F.lit(top).cast("long"),
        )
        for i in range(bits):
            bit = F.shiftright(q, i).bitwiseAND(F.lit(1).cast("long"))
            key = key + F.shiftleft(bit, i * n + j)
    return key


def zorder_slice(
    key: Column, boundaries: list[float]
) -> Column:
    """Assign a slice index 0..len(boundaries) from pre-computed key
    quantile boundaries — a sum of comparisons, no when-chain, no shuffle."""
    idx = F.lit(0)
    for b in boundaries:
        idx = idx + (key > F.lit(int(b))).cast("int")
    return idx
