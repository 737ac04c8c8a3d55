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

# ------------------------------------------------------------- HyperLogLog

HLL_M = 64  # registers (2^6); standard error ~ 1.04/sqrt(64) = 13%


def hll_register_rank(item: Column) -> tuple[Column, Column]:
    """(register, rank) of an item for a deterministic 64-register HLL:
    register = first md5 byte mod 64; rank = 1 + leading zeros of the next
    48 hash bits. The rank uses INTEGER arithmetic only — ``bin(v)`` strips
    leading zeros, so ``49 - length(bin(v))`` is the leading-zero count +1,
    identical in Spark and DuckDB (no float log2 boundary ambiguity)."""
    h = F.md5(item.cast("string"))
    reg = F.conv(F.substring(h, 1, 2), 16, 10).cast("long") % HLL_M
    v = F.conv(F.substring(h, 3, 12), 16, 10).cast("long")  # 48 bits
    rank = F.when(v == 0, F.lit(49)).otherwise(49 - F.length(F.bin(v)))
    return reg, rank


def hll_distinct(df: DataFrame, group_cols: list[str], item: Column) -> DataFrame:
    """Mergeable approximate distinct count per group — the cardinality
    sketch a 1000-executor deployment keeps per partition and ORs together:
    one hash aggregate (max rank per (group, register); map-side partial max
    IS the register merge) + one per-group fold. Deterministic md5 hashing
    makes the estimate a pure function of the data set, so the SQL oracle
    replays it bit-for-bit instead of settling for an error band. Returns
    (group_cols, n_registers, rank_checksum, hll_estimate)."""
    reg, rank = hll_register_rank(item)
    regs = (
        df.select(*group_cols, reg.alias("reg"), rank.alias("rank"))
        .groupBy(*group_cols, "reg")
        .agg(F.max("rank").alias("mx"))
    )
    # alpha_64 * m^2 / (sum 2^-M_j + zeros), with the standard small-range
    # linear-counting correction. The harmonic denominator is computed as
    # the EXACT integer sum of 2^(49-rank) (max rank 49, 64 terms < 2^55
    # — fits a long with no rounding), so the estimate is one double
    # division of exact integers: bit-identical on any engine and any
    # aggregation order, unlike a float sum of 2^-rank terms.
    alpha_m2 = F.lit(0.709 * HLL_M * HLL_M)
    scale = F.lit(float(1 << 49))
    raw = alpha_m2 * scale / F.col("scaled_denom").cast("double")
    return (
        regs.groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_used"),
            F.sum("mx").cast("long").alias("rank_checksum"),
            # pow(2, k) is exact for k in 0..49; cast long loses nothing
            F.sum(
                F.pow(F.lit(2.0), (49 - F.col("mx")).cast("double")).cast("long")
            )
            .cast("long")
            .alias("used_denom"),
        )
        .withColumn(
            "scaled_denom",
            F.col("used_denom")
            + (HLL_M - F.col("n_used")).cast("long") * F.lit(1 << 49).cast("long"),
        )
        .select(
            *group_cols,
            F.lit(HLL_M).alias("n_registers"),
            "rank_checksum",
            F.round(
                F.when(
                    # small-range correction: zero registers present
                    (F.col("n_used") < HLL_M) & (raw <= 2.5 * HLL_M),
                    F.lit(float(HLL_M))
                    * F.log(F.lit(float(HLL_M)) / (HLL_M - F.col("n_used"))),
                ).otherwise(raw),
                6,
            ).alias("hll_estimate"),
        )
    )

# ---------------------------------------------------------------- KMV sketch

KMV_K = 64


def kmv_hash(item: Column) -> Column:
    """Deterministic 48-bit item hash normalized to (0, 1]: the KMV order
    statistic base — exact integer parse of the md5 prefix, one double
    division, identical on any engine."""
    return (
        F.conv(F.substring(F.md5(item.cast("string")), 1, 12), 16, 10)
        .cast("long")
        .cast("double")
        / F.lit(float(1 << 48))
    )


def kmv_sketch(df: DataFrame, group_cols: list[str], item: Column) -> DataFrame:
    """K-minimum-values sketch per group: the KMV_K smallest distinct item
    hashes. Distinct-count estimate = (k-1)/h_k (the classic order-statistic
    estimator); unlike HLL the sketches also support SET OPERATIONS — the
    union sketch is the k smallest of the merged hash sets, and Jaccard is
    estimated by counting shared members inside the union's k-set. One
    distinct + one windowed top-k per group, both map-side combinable.
    Returns (group_cols, pos, h) rows — pos 1..k ascending."""
    from pyspark.sql.window import Window

    hashes = df.select(*group_cols, kmv_hash(item).alias("h")).distinct()
    w = Window.partitionBy(*group_cols).orderBy("h")
    return (
        hashes.withColumn("pos", F.row_number().over(w))
        .filter(F.col("pos") <= KMV_K)
        .select(*group_cols, "pos", "h")
    )


def kmv_estimate(sketch: DataFrame, group_cols: list[str]) -> DataFrame:
    """(k-1)/h_k distinct estimate per group (exact count when the group
    holds fewer than k distinct items)."""
    return (
        sketch.groupBy(*group_cols)
        .agg(F.count(F.lit(1)).alias("n"), F.max("h").alias("hk"))
        .select(
            *group_cols,
            F.round(
                F.when(F.col("n") < KMV_K, F.col("n").cast("double")).otherwise(
                    (F.lit(KMV_K - 1)) / F.col("hk")
                ),
                6,
            ).alias("kmv_estimate"),
        )
    )

