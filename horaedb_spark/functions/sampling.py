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
