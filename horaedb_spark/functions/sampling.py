"""Deterministic corpus splitting and sampling (LLM-data-pipeline surface).

Training pipelines need splits and samples that are (a) stable across runs
and engines — no RNG state, no partition-order dependence — and (b) pure
row-local expressions so they cost a scan, not a shuffle. Both operators
key off ``md5(salt || id)``: the first two hex digits are a uniform
0..255 bucket, so a rate of k/256 is an exact lexicographic threshold on
the digest prefix. md5 is bit-identical in Spark and DuckDB, which makes
every split assignment oracle-verifiable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(id_col: Column | str, salt: str) -> Column:
    """First two hex digits of md5(salt:id) — a deterministic, engine-
    portable uniform bucket in '00'..'ff'."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.substring(F.md5(F.concat(F.lit(f"{salt}:"), c.cast("string"))), 1, 2)


def train_test_split(
    df: DataFrame, id_col: str, test_buckets: int = 26, salt: str = "split"
) -> DataFrame:
    """Assign each row to 'train' or 'test': rows whose hash bucket falls
    below ``test_buckets``/256 go to test (26/256 ≈ 10.2%). Row-local, no
    shuffle; the same id always lands in the same split, on any engine,
    at any scale."""
    threshold = f"{test_buckets:02x}"
    split = F.when(hash_bucket(id_col, salt) < threshold, F.lit("test")).otherwise(
        F.lit("train")
    )
    return df.withColumn("split", split)


def stratified_sample(
    df: DataFrame, id_col: str, stratum_col: str, rates: dict[str, int],
    salt: str = "sample",
) -> DataFrame:
    """Deterministic per-stratum downsampling: ``rates`` maps stratum value →
    keep-buckets out of 256 (e.g. {"en": 128, "de": 64} keeps ~50% / ~25%).
    Strata not listed are dropped. One scan, zero shuffle — the standard
    language-rebalancing pass over a web corpus, reproducible to the row."""
    keep = F.lit(None).cast("string")
    col = F.col(stratum_col)
    for value, buckets in rates.items():
        keep = F.when(col == value, F.lit(f"{buckets:02x}")).otherwise(keep)
    return df.withColumn("__keep__", keep).filter(
        hash_bucket(id_col, salt) < F.col("__keep__")
    ).drop("__keep__")


def domain_cap(
    df: DataFrame, domain_col: str, id_col: str, cap: int,
    order_col: str | None = None,
) -> DataFrame:
    """Per-domain document cap (the C4/RefinedWeb "no domain dominates"
    pass): keep at most ``cap`` rows per domain, preferring the highest
    ``order_col`` (ties broken by ``id_col`` for determinism).

    One shuffle on the domain key; Spark 4 rewrites the rank<=k filter into
    a map-side WindowGroupLimit, so each input partition forwards at most
    ``cap`` rows per domain into the exchange — at 100 TB the shuffle
    carries ~cap x n_domains rows, not the corpus."""
    from pyspark.sql import Window

    order = [F.col(order_col).desc()] if order_col else []
    w = Window.partitionBy(domain_col).orderBy(*order, F.col(id_col).asc())
    return (
        df.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") <= cap)
        .drop("__rn__")
    )


def temperature_resample(
    df: DataFrame, id_col: str, domain_col: str, alpha: float = 0.5,
    salt: str = "temp",
) -> DataFrame:
    """Temperature-based domain rebalancing (the multilingual-pretraining
    sampler, XLM-R §3.1): target share per domain ~ n_d^alpha, realized as a
    deterministic keep-rate r_d = (n_min / n_d)^(1-alpha) — the smallest
    domain keeps everything, larger domains are downsampled toward the
    flattened distribution (alpha=1 keeps all, alpha=0 equalizes).

    Membership is row-local and engine-portable: keep row iff the first 8
    hex digits of md5(salt:id) sort below lpad(hex(floor(r_d * 2^32))) —
    a lexicographic compare on fixed-width lowercase hex, the same trick as
    ``hash_bucket`` with 2^32 resolution. Rates are rounded with the
    portable floor(x*1e6+0.5)/1e6 so pow() libm ulps can't flip a row.
    Domain counts are one tiny aggregate broadcast back onto the corpus —
    no second shuffle of the data."""
    from pyspark.sql import functions as _F

    counts = df.groupBy(domain_col).agg(_F.count(_F.lit(1)).alias("__n__"))
    min_n = counts.agg(_F.min("__n__").alias("__min_n__"))
    rates = counts.crossJoin(_F.broadcast(min_n)).select(
        domain_col,
        (
            _F.floor(
                _F.pow(_F.col("__min_n__") / _F.col("__n__"), _F.lit(1.0 - alpha))
                * 1e6
                + _F.lit(0.5)
            )
            / 1e6
        ).alias("__rate__"),
    )
    threshold = _F.when(_F.col("__rate__") >= 1.0, _F.lit("g")).otherwise(
        _F.lpad(
            _F.lower(_F.hex(_F.floor(_F.col("__rate__") * _F.lit(4294967296.0)))),
            8,
            "0",
        )
    )
    digest = _F.substring(
        _F.md5(_F.concat(_F.lit(f"{salt}:"), _F.col(id_col).cast("string"))), 1, 8
    )
    return (
        df.join(_F.broadcast(rates), on=domain_col)
        .filter(digest < threshold)
        .drop("__rate__")
    )


def packed_bins(
    df: DataFrame, id_col: str, token_col: str, budget: int,
    block_size: int = 1024,
) -> DataFrame:
    """Sequence packing (GPT-style concat-and-chunk): documents are laid out
    in ``id_col`` order, concatenated, and cut every ``budget`` tokens; each
    document learns which training sequences (bins) it lands in.

    The global running token total is a prefix sum, which naive
    ``Window.orderBy(id)`` computes on ONE partition — a non-starter at
    100 TB. Here it runs as the classic two-phase scan: (1) cumsum inside
    ``id div block_size`` blocks (parallel across blocks), (2) per-block
    totals — a metadata-sized table — get their own tiny cumsum and
    broadcast back as each block's starting offset. The corpus shuffles
    once, on the block key."""
    from pyspark.sql import Window

    blk = (F.col(id_col) / F.lit(block_size)).cast("long")
    with_blk = df.withColumn("__blk__", blk)
    intra = F.sum(token_col).over(
        Window.partitionBy("__blk__").orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    block_totals = with_blk.groupBy("__blk__").agg(
        F.sum(token_col).alias("__btot__")
    )
    offsets = block_totals.withColumn(
        "__offset__",
        F.coalesce(
            F.sum("__btot__").over(
                Window.orderBy("__blk__")
                .rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).select("__blk__", "__offset__")
    out = (
        with_blk.join(F.broadcast(offsets), "__blk__")
        .withColumn("cum_tokens", (F.col("__offset__") + intra).cast("long"))
    )
    tokens = F.col(token_col).cast("long")
    b = F.lit(budget)
    return out.select(
        *df.columns,
        F.col("cum_tokens"),
        F.floor((F.col("cum_tokens") - tokens) / b).alias("first_bin"),
        F.floor((F.col("cum_tokens") - 1) / b).alias("last_bin"),
    )


def export_shards(
    df: DataFrame,
    id_col: str,
    num_shards: int,
    weight_col: Column | None = None,
    salt: str = "shard",
) -> DataFrame:
    """Deterministic training-export sharding: every row gets a shard id and
    a rank inside its shard under a pseudo-random global shuffle — the
    "shuffle the corpus and write N shards" step that precedes training.

    Shard = md5-derived uniform bucket (engine-portable, no RNG state);
    within-shard order = md5('shuffle:'||id) with the id as tie-break, so
    the PERMUTATION itself is reproducible to the row on any engine. The
    rank window partitions by shard — per-shard work, never a global sort.
    Returns df + (shard, shard_rank)."""
    from pyspark.sql.window import Window

    c = F.col(id_col).cast("string")
    digit = F.expr(
        f"instr('0123456789abcdef', substr(md5(concat('{salt}:', cast({id_col} as string))), 1, 1)) - 1"
    )
    key = F.md5(F.concat(F.lit("shuffle:"), c))
    out = df.withColumn("shard", (digit % num_shards).cast("long")).withColumn(
        "__skey__", key
    )
    w = Window.partitionBy("shard").orderBy("__skey__", id_col)
    return (
        out.withColumn("shard_rank", F.row_number().over(w).cast("long"))
        .drop("__skey__")
    )

def weighted_systematic_sample(
    df: DataFrame,
    order_col: str,
    weight_col: str,
    n_picks: int,
) -> DataFrame:
    """Weighted systematic resampling: ``n_picks`` evenly spaced thresholds
    over the cumulative (integer) weight line; each row is drawn once per
    threshold landing inside its weight interval — the classic resampling
    step of mixture re-weighting, INTEGER-EXACT end to end (no float pow/
    log order keys, so the selection hash-matches any engine's replay).

    Thresholds: t_i = floor((2i+1) * W / (2n)) for i in 0..n-1 (midpoint
    rule). A row with cumulative HALF-OPEN interval [c_prev, c) is drawn
    ``picks(c) - picks(c_prev)`` times where ``picks(x) = #{i : t_i < x}
    = clamp((2n*x + W - 1) div 2W, 0, n)`` — pure INTEGER division on
    the distributed ordered prefix sum (functions/prefix.py: one range
    partitioning, no SinglePartition stage), valid while n*W < 2^62.
    Returns df + ``n_draws`` (rows with zero draws are dropped)."""
    from horaedb_spark.functions.prefix import ordered_prefix_sum

    cum = ordered_prefix_sum(df, [F.col(order_col)], weight_col, "c")
    total = cum.agg(F.max("c").alias("w")).first()["w"]
    n, W = int(n_picks), int(total)
    assert n * W < (1 << 62), "n_picks * total_weight overflows the long math"

    def picks(col_sql: str) -> Column:
        raw = F.expr(
            f"CAST((2 * {n} * ({col_sql}) + {W} - 1) div (2 * {W}) AS BIGINT)"
        )
        return F.least(
            F.greatest(raw, F.lit(0).cast("long")), F.lit(n).cast("long")
        )

    return (
        cum.withColumn("n_draws", picks("c") - picks(f"c - {weight_col}"))
        .filter(F.col("n_draws") > 0)
    )

