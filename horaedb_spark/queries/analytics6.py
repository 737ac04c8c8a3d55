"""Analytics batch 6: M4 visual time-series downsampling, rolling
7-day distinct-user counts, and vocabulary OOV-rate scoring. All
DuckDB-oracle-gated.

Reference parity: the reference engine serves dashboard/monitoring reads
over its scan+merge surface (SURVEY.md §0); M4 is the canonical
bandwidth-bounded downsample a dashboard issues against such a store, and
the rolling-distinct / OOV queries are the engagement and corpus-health
reports a pipeline user composes downstream. Scale notes inline — every
query is one or two hash shuffles with bounded fan-out; nothing is
quadratic and nothing sorts globally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from horaedb_spark.queries.registry import register
from horaedb_spark.queries.tables import events_ms, load_table

DAY_MS = 86_400_000
HOUR_MS = 3_600_000

# ---------------------------------------------------------------------------
# M4 downsampling (min/max/first/last per pixel bucket).

_M4_BUCKET_MS = 6 * HOUR_MS


@register(
    "events_m4_downsample",
    oracle=f"""
    WITH keyed AS (
      SELECT event_type,
             epoch_ms(ts) - epoch_ms(ts) % {_M4_BUCKET_MS} AS bucket_ms,
             value,
             printf('%013d|%06d', epoch_ms(ts), event_id) AS k
      FROM events
    )
    SELECT event_type, bucket_ms,
           min(value) AS v_min, max(value) AS v_max,
           arg_min(value, k) AS v_first, arg_max(value, k) AS v_last,
           count(*) AS n
    FROM keyed GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def events_m4_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 downsampling (Jugel et al., VLDB 2014): per series and pixel
    bucket emit min, max, first, and last — the four samples that make a
    line chart render pixel-identically to the full-resolution data.

    One map-side-combined hash aggregate over the scan; first/last resolve
    through ``min_by``/``max_by`` on a zero-padded ``ts|event_id`` string
    key, so ties inside a millisecond are deterministic on both engines.
    Values pass through untouched (no arithmetic) — the output is
    hash-exact at any scale, and the result is O(series × pixels) no
    matter how many samples the range holds."""
    ev = events_ms(spark, sf_dir)
    bucket = F.col("ts_ms") - F.col("ts_ms") % _M4_BUCKET_MS
    k = F.format_string("%013d|%06d", F.col("ts_ms"), F.col("event_id"))
    return (
        ev.select(
            "event_type",
            bucket.alias("bucket_ms"),
            "value",
            k.alias("__k__"),
        )
        .groupBy("event_type", "bucket_ms")
        .agg(
            F.min("value").alias("v_min"),
            F.max("value").alias("v_max"),
            F.min_by("value", F.col("__k__")).alias("v_first"),
            F.max_by("value", F.col("__k__")).alias("v_last"),
            F.count("*").alias("n"),
        )
        .orderBy("event_type", "bucket_ms")
    )


# ---------------------------------------------------------------------------
# Rolling 7-day distinct users (the canonical WAU engagement query).


@register(
    "events_rolling_distinct_users",
    oracle=f"""
    SELECT event_type,
           (epoch_ms(ts) // {DAY_MS} + i) * {DAY_MS} AS day_end_ms,
           count(DISTINCT user_id) AS wau
    FROM events, (SELECT unnest(generate_series(0, 6)) AS i)
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def events_rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct users per event type (weekly-active-users on
    a daily grid). A sliding EXACT distinct cannot reuse per-day partials
    (distinct doesn't subtract), so each event fans out into the 7 day-ends
    whose window contains it — bounded 7× explode, then one two-phase
    distinct aggregate. No self-joins, no window over the corpus; at 100 TB
    the fan-out is still linear and the aggregate key space is
    O(series × days)."""
    ev = events_ms(spark, sf_dir)
    day = (F.col("ts_ms") / F.lit(DAY_MS)).cast("long")
    exploded = ev.select(
        "event_type",
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("i"),
        day.alias("__day__"),
    ).select(
        "event_type",
        "user_id",
        ((F.col("__day__") + F.col("i")) * DAY_MS).alias("day_end_ms"),
    )
    return (
        exploded.groupBy("event_type", "day_end_ms")
        .agg(F.count_distinct("user_id").alias("wau"))
        .orderBy("event_type", "day_end_ms")
    )


# ---------------------------------------------------------------------------
# Vocabulary OOV rate (corpus-health scoring against a frequency vocab).

_VOCAB_SIZE = 16


@register(
    "text_oov_rate",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ), nonempty AS (
      SELECT doc_id, w FROM toks WHERE w != ''
    ), vocab AS (
      SELECT w FROM (
        SELECT w, count(*) AS c FROM nonempty GROUP BY w
        ORDER BY c DESC, w ASC LIMIT {_VOCAB_SIZE}
      )
    )
    SELECT t.doc_id,
           count(*) AS n_tokens,
           CAST(count(*) FILTER (WHERE v.w IS NULL) AS BIGINT) AS n_oov,
           round(count(*) FILTER (WHERE v.w IS NULL)
                 / CAST(count(*) AS DOUBLE), 6) AS oov_rate
    FROM nonempty t LEFT JOIN vocab v ON t.w = v.w
    GROUP BY t.doc_id ORDER BY t.doc_id
    """,
)
def text_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate per document against a corpus-derived
    frequency vocabulary (the tokenizer-coverage health check run before
    training). Stage 1 builds the top-V vocab with one map-side-combined
    word count (deterministic count-desc/word-asc tie-break); stage 2
    re-explodes the corpus and broadcast-left-joins the V-row vocab — the
    corpus never shuffles for the join, and the per-doc aggregate is the
    only full shuffle. V is a constant; at 100 TB both passes stay linear
    scans."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    ).filter(F.col("w") != "")
    vocab = (
        toks.groupBy("w")
        .count()
        .orderBy(F.col("count").desc(), F.col("w").asc())
        .limit(_VOCAB_SIZE)
        .select("w", F.lit(1).alias("__in_vocab__"))
    )
    joined = toks.join(F.broadcast(vocab), "w", "left")
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.when(F.col("__in_vocab__").isNull(), 1).otherwise(0)).alias(
                "n_oov"
            ),
            F.round(
                F.sum(F.when(F.col("__in_vocab__").isNull(), 1).otherwise(0))
                / F.count("*").cast("double"),
                6,
            ).alias("oov_rate"),
        )
        .orderBy("doc_id")
    )
