"""Analytics batch 6: M4 visual time-series downsampling, rolling
7-day distinct-user counts, vocabulary OOV-rate scoring, and PSI
distribution-drift detection. All DuckDB-oracle-gated.

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


# ---------------------------------------------------------------------------
# PSI distribution-drift detection (the training-serving skew monitor).

_T0 = 1_704_067_200_000  # dataset epoch (2024-01-01)
_W1_END = _T0 + 7 * DAY_MS
_W4_START = _T0 + 21 * DAY_MS
_W4_END = _T0 + 28 * DAY_MS
_PSI_BINS = 10


@register(
    "events_psi_drift",
    oracle=f"""
    WITH ev AS (
      SELECT event_type, epoch_ms(ts) AS ts_ms, value FROM events
    ), ref AS (
      SELECT event_type, value FROM ev
      WHERE ts_ms >= {_T0} AND ts_ms < {_W1_END}
    ), cur AS (
      SELECT event_type, value FROM ev
      WHERE ts_ms >= {_W4_START} AND ts_ms < {_W4_END}
    ), edges AS (
      SELECT event_type,
             [{", ".join(f"quantile_cont(value, {i / 10.0})" for i in range(1, _PSI_BINS))}] AS es
      FROM ref GROUP BY event_type
    ), binned AS (
      SELECT r.event_type, 'ref' AS side,
             len(list_filter(e.es, x -> r.value > x)) AS bin
      FROM ref r JOIN edges e ON r.event_type = e.event_type
      UNION ALL
      SELECT c.event_type, 'cur',
             len(list_filter(e.es, x -> c.value > x))
      FROM cur c JOIN edges e ON c.event_type = e.event_type
    ), counts AS (
      SELECT event_type, bin,
             count(*) FILTER (WHERE side = 'ref') AS n1,
             count(*) FILTER (WHERE side = 'cur') AS n2
      FROM binned GROUP BY event_type, bin
    ), shares AS (
      SELECT event_type, bin,
             (n1 + 0.5) / (sum(n1) OVER (PARTITION BY event_type) + {_PSI_BINS * 0.5}) AS p1,
             (n2 + 0.5) / (sum(n2) OVER (PARTITION BY event_type) + {_PSI_BINS * 0.5}) AS p2
      FROM counts
    )
    SELECT event_type,
           floor(sum((p2 - p1) * ln(p2 / p1)) * 1000000 + 0.5) / 1000000 AS psi
    FROM shares GROUP BY event_type ORDER BY event_type
    """,
)
def events_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between week 1 (reference) and week 4
    (current) of the value distribution per event type — the drift monitor
    run between training and serving windows. Decile edges come from exact
    interpolated quantiles of the reference window (a bins-1-element array
    per type, broadcast back onto both windows); bin shares are
    Laplace-smoothed so empty bins stay finite. Two scans + three
    metadata-sized aggregates; the fact stream never self-joins. PSI > 0.2
    is the conventional "retrain" alarm."""
    ev = events_ms(spark, sf_dir).select("event_type", "ts_ms", "value")
    ref = ev.filter((F.col("ts_ms") >= _T0) & (F.col("ts_ms") < _W1_END))
    cur = ev.filter((F.col("ts_ms") >= _W4_START) & (F.col("ts_ms") < _W4_END))
    edges = ref.groupBy("event_type").agg(
        F.array(
            *[F.percentile("value", F.lit(i / 10.0)) for i in range(1, _PSI_BINS)]
        ).alias("es")
    )
    def binned(df, side):
        return df.join(F.broadcast(edges), "event_type").select(
            "event_type",
            F.lit(side).alias("side"),
            F.size(F.filter("es", lambda x: F.col("value") > x)).alias("bin"),
        )
    counts = (
        binned(ref, "ref")
        .unionByName(binned(cur, "cur"))
        .groupBy("event_type", "bin")
        .agg(
            F.count(F.when(F.col("side") == "ref", 1)).alias("n1"),
            F.count(F.when(F.col("side") == "cur", 1)).alias("n2"),
        )
    )
    from pyspark.sql import Window as W

    wt = W.partitionBy("event_type")
    smooth = _PSI_BINS * 0.5
    shares = counts.select(
        "event_type",
        ((F.col("n1") + 0.5) / (F.sum("n1").over(wt) + smooth)).alias("p1"),
        ((F.col("n2") + 0.5) / (F.sum("n2").over(wt) + smooth)).alias("p2"),
    )
    psi = (F.col("p2") - F.col("p1")) * F.log(F.col("p2") / F.col("p1"))
    return (
        shares.groupBy("event_type")
        .agg((F.floor(F.sum(psi) * 1000000 + 0.5) / 1000000).alias("psi"))
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Weekly seasonality profile (hour-of-week periodic aggregate).


@register(
    "events_weekly_seasonality",
    oracle=f"""
    SELECT event_type,
           (epoch_ms(ts) // {HOUR_MS}) % 168 AS hour_of_week,
           count(*) AS n,
           floor(CAST(sum(CAST(value AS DECIMAL(30,10))) AS DOUBLE)
                 / count(*) * 1000000 + 0.5) / 1000000 AS avg_value
    FROM events
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def events_weekly_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-week seasonality profile per event type — the periodic
    template dashboards overlay on live traffic (and the input to
    seasonal-adjusted anomaly thresholds). One map-side-combined aggregate
    into a fixed 168-row grid per series; decimal-routed sums keep the
    average order-independent. O(series × 168) output at any scale."""
    ev = events_ms(spark, sf_dir)
    how = (F.col("ts_ms") / F.lit(HOUR_MS)).cast("long") % 168
    dec_sum = F.sum(F.col("value").cast("decimal(30,10)")).cast("double")
    return (
        ev.groupBy("event_type", how.alias("hour_of_week"))
        .agg(
            F.count("*").alias("n"),
            (F.floor(dec_sum / F.count("*") * 1000000 + 0.5) / 1000000).alias(
                "avg_value"
            ),
        )
        .orderBy("event_type", "hour_of_week")
    )


# ---------------------------------------------------------------------------
# Order-backlog time series (running net flow).


@register(
    "orders_backlog_series",
    oracle=f"""
    WITH placed AS (
      SELECT epoch_ms(o_orderdate) // {DAY_MS} AS day, count(*) AS n_in
      FROM orders GROUP BY 1
    ), shipped AS (
      SELECT epoch_ms(l.l_shipdate) // {DAY_MS} AS day,
             count(DISTINCT l.l_orderkey) AS n_out
      FROM lineitem l GROUP BY 1
    ), flow AS (
      SELECT coalesce(p.day, s.day) AS day,
             coalesce(n_in, 0) AS n_in, coalesce(n_out, 0) AS n_out
      FROM placed p FULL OUTER JOIN shipped s ON p.day = s.day
    )
    SELECT day * {DAY_MS} AS day_ms, n_in, n_out,
           CAST(sum(n_in - n_out) OVER (ORDER BY day) AS BIGINT) AS backlog
    FROM flow ORDER BY day_ms
    """,
)
def orders_backlog_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order backlog over time: daily order placements minus daily
    first-ship completions, cumulated. The heavy side is two fact
    aggregates (orders, lineitem) down to day grain; the running sum then
    operates on the METADATA-SIZED day series — the only unpartitioned
    window in the plan runs over O(days) rows, never the facts (same
    argument as the PromQL step spines)."""
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    placed = orders.groupBy(
        (F.unix_millis(F.col("o_orderdate").cast("timestamp")) / DAY_MS)
        .cast("long")
        .alias("day")
    ).agg(F.count("*").alias("n_in"))
    shipped = li.groupBy(
        (F.unix_millis(F.col("l_shipdate").cast("timestamp")) / DAY_MS)
        .cast("long")
        .alias("day")
    ).agg(F.count_distinct("l_orderkey").alias("n_out"))
    flow = (
        placed.join(shipped, "day", "full_outer")
        .select(
            "day",
            F.coalesce("n_in", F.lit(0)).alias("n_in"),
            F.coalesce("n_out", F.lit(0)).alias("n_out"),
        )
    )
    w = W.orderBy("day")
    return flow.select(
        (F.col("day") * DAY_MS).alias("day_ms"),
        "n_in",
        "n_out",
        F.sum(F.col("n_in") - F.col("n_out")).over(w).cast("long").alias("backlog"),
    ).orderBy("day_ms")


# ---------------------------------------------------------------------------
# Seasonal-adjusted anomaly detection (residual z-score vs the weekly profile).


@register(
    "events_seasonal_anomalies",
    oracle=f"""
    WITH keyed AS (
      SELECT event_id, event_type, epoch_ms(ts) AS ts_ms, value,
             (epoch_ms(ts) // {HOUR_MS}) % 168 AS how,
             CAST(floor(value * 1000 + 0.5) AS BIGINT) AS vq
      FROM events
    ), prof AS (
      SELECT event_type, how,
             count(*) AS n, sum(vq) AS sq, sum(vq * vq) AS sq2
      FROM keyed GROUP BY 1, 2
    ), scored AS (
      SELECT k.event_id, k.event_type, k.ts_ms, k.value,
             (k.value - CAST(p.sq AS DOUBLE) / p.n / 1000.0)
               / sqrt((p.n * p.sq2 - p.sq * p.sq) / CAST(p.n AS DOUBLE)
                      / p.n / 1e6) AS z
      FROM keyed k JOIN prof p
        ON k.event_type = p.event_type AND k.how = p.how
      WHERE p.n >= 2 AND p.n * p.sq2 > p.sq * p.sq
    )
    SELECT event_id, event_type, ts_ms, value,
           floor(z * 1000000 + 0.5) / 1000000 AS z
    FROM scored WHERE abs(z) > 3 ORDER BY event_id
    """,
)
def events_seasonal_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-ADJUSTED anomaly detection: each event scores against the
    mean/stddev of ITS OWN hour-of-week slot (the weekly profile), so a
    Saturday-night spike isn't flagged just for being Saturday night —
    the upgrade over the plain z-score detector. The profile is an exact
    quantized-integer aggregate into ≤ series×168 rows, broadcast back
    onto the stream (the fact side never shuffles); |z| > 3 flags. Exact
    integer sums make the thresholds bit-deterministic across engines."""
    ev = events_ms(spark, sf_dir).select(
        "event_id", "event_type", "ts_ms", "value"
    )
    keyed = ev.withColumn(
        "how", (F.col("ts_ms") / F.lit(HOUR_MS)).cast("long") % 168
    ).withColumn("vq", F.floor(F.col("value") * 1000 + 0.5).cast("long"))
    prof = keyed.groupBy("event_type", "how").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("vq").alias("sq"),
        F.sum(F.col("vq") * F.col("vq")).alias("sq2"),
    )
    joined = keyed.join(F.broadcast(prof), ["event_type", "how"]).filter(
        (F.col("n") >= 2) & (F.col("n") * F.col("sq2") > F.col("sq") * F.col("sq"))
    )
    mean = F.col("sq").cast("double") / F.col("n") / 1000.0
    var = (
        (F.col("n") * F.col("sq2") - F.col("sq") * F.col("sq")).cast("double")
        / F.col("n")
        / F.col("n")
        / F.lit(1e6)
    )
    z = (F.col("value") - mean) / F.sqrt(var)
    return (
        joined.withColumn("z", z)
        .filter(F.abs("z") > 3)
        .select(
            "event_id",
            "event_type",
            "ts_ms",
            "value",
            (F.floor(F.col("z") * 1000000 + 0.5) / 1000000).alias("z"),
        )
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# Cohort lifetime value (cumulative revenue by acquisition year).


@register(
    "orders_cohort_ltv",
    oracle="""
    WITH firsts AS (
      SELECT o_custkey, min(year(o_orderdate)) AS cohort_year FROM orders
      GROUP BY o_custkey
    ), rev AS (
      SELECT f.cohort_year,
             year(o.o_orderdate) - f.cohort_year AS offset_years,
             count(DISTINCT o.o_custkey) AS active_customers,
             round(CAST(sum(CAST(o.o_totalprice AS DECIMAL(30,10))) AS DOUBLE), 2)
               AS revenue
      FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
      GROUP BY 1, 2
    )
    SELECT cohort_year, offset_years, active_customers, revenue,
           round(sum(revenue) OVER (PARTITION BY cohort_year
                                    ORDER BY offset_years), 2) AS cum_revenue
    FROM rev ORDER BY cohort_year, offset_years
    """,
)
def orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime value: customers grouped by acquisition year, revenue
    accumulated by years-since-acquisition — the LTV curve. Two fact
    aggregates joined co-partitioned on custkey; the cumulative window runs
    over the METADATA-SIZED (cohort, offset) grid only. Decimal-routed
    sums; cum_revenue sums the already-rounded per-cell revenue so both
    engines accumulate identical doubles."""
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders")
    o = orders.select(
        "o_custkey",
        F.year(F.col("o_orderdate").cast("timestamp")).alias("yr"),
        "o_totalprice",
    )
    firsts = o.groupBy("o_custkey").agg(F.min("yr").alias("cohort_year"))
    rev = (
        o.join(firsts, "o_custkey")
        .groupBy(
            "cohort_year", (F.col("yr") - F.col("cohort_year")).alias("offset_years")
        )
        .agg(
            F.count_distinct("o_custkey").alias("active_customers"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(30,10)")).cast("double"),
                2,
            ).alias("revenue"),
        )
    )
    w = W.partitionBy("cohort_year").orderBy("offset_years")
    return rev.select(
        "cohort_year",
        "offset_years",
        "active_customers",
        "revenue",
        F.round(F.sum("revenue").over(w), 2).alias("cum_revenue"),
    ).orderBy("cohort_year", "offset_years")


# ---------------------------------------------------------------------------
# Window-function suite (rank family over customer spend).


@register(
    "window_function_suite",
    oracle="""
    WITH spend AS (
      SELECT c.c_nationkey AS nation, o.o_custkey,
             round(CAST(sum(CAST(o.o_totalprice AS DECIMAL(30,10))) AS DOUBLE), 2)
               AS total
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    )
    SELECT nation, o_custkey, total,
           row_number()  OVER w AS rn,
           rank()        OVER w AS rnk,
           dense_rank()  OVER w AS drnk,
           ntile(4)      OVER w AS quartile,
           floor(percent_rank() OVER w * 1000000 + 0.5) / 1000000 AS pct_rank,
           floor(cume_dist()    OVER w * 1000000 + 0.5) / 1000000 AS cume,
           round(coalesce(lag(total)  OVER w, 0) + 0, 2) AS prev_total,
           round(coalesce(lead(total) OVER w, 0) + 0, 2) AS next_total,
           round(first_value(total) OVER w, 2) AS top_total
    FROM spend
    WINDOW w AS (PARTITION BY nation ORDER BY total DESC, o_custkey)
    ORDER BY nation, rn
    """,
)
def window_function_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full rank-family window surface in one plan — row_number, rank,
    dense_rank, ntile, percent_rank, cume_dist, lag/lead, first_value —
    over per-nation customer spend with a total-order tie-break (required
    for cross-engine determinism). ONE window spec means one sort within
    the partition; all nine functions evaluate in a single pass."""
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    spend = (
        orders.join(
            F.broadcast(cust.select("c_custkey", "c_nationkey")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .groupBy(F.col("c_nationkey").alias("nation"), "o_custkey")
        .agg(
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(30,10)")).cast("double"),
                2,
            ).alias("total")
        )
    )
    w = W.partitionBy("nation").orderBy(F.desc("total"), F.asc("o_custkey"))
    return spend.select(
        "nation",
        "o_custkey",
        "total",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        (F.floor(F.percent_rank().over(w) * 1000000 + 0.5) / 1000000).alias(
            "pct_rank"
        ),
        (F.floor(F.cume_dist().over(w) * 1000000 + 0.5) / 1000000).alias("cume"),
        F.round(F.coalesce(F.lag("total").over(w), F.lit(0)) + 0, 2).alias(
            "prev_total"
        ),
        F.round(F.coalesce(F.lead("total").over(w), F.lit(0)) + 0, 2).alias(
            "next_total"
        ),
        F.round(F.first("total").over(w), 2).alias("top_total"),
    ).orderBy("nation", "rn")


# ---------------------------------------------------------------------------
# Event-type affinity (co-occurrence lift per user).


@register(
    "events_type_affinity",
    oracle="""
    WITH ut AS (
      SELECT DISTINCT user_id, event_type FROM events
    ), n_users AS (
      SELECT count(DISTINCT user_id) AS n FROM events
    ), singles AS (
      SELECT event_type, count(*) AS cnt FROM ut GROUP BY event_type
    ), pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b, count(*) AS both_cnt
      FROM ut a JOIN ut b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT p.type_a, p.type_b, p.both_cnt,
           floor(CAST(p.both_cnt AS DOUBLE) * n.n
                 / (sa.cnt * CAST(sb.cnt AS DOUBLE)) * 1000000 + 0.5)
             / 1000000 AS lift
    FROM pairs p
    JOIN singles sa ON sa.event_type = p.type_a
    JOIN singles sb ON sb.event_type = p.type_b
    CROSS JOIN n_users n
    ORDER BY type_a, type_b
    """,
)
def events_type_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type affinity: lift = P(a,b) / (P(a)·P(b)) over per-user
    type sets — which behaviors co-occur beyond chance (the association
    complement of order-level market-basket mining). The self-join runs on
    the DISTINCT (user, type) table — at most |types| rows per user, so
    the pair blow-up is alphabet-bounded, never corpus-quadratic; the
    type-count tables broadcast back."""
    ev = events_ms(spark, sf_dir)
    ut = ev.select("user_id", "event_type").distinct()
    n_users = ut.select("user_id").distinct().count()
    singles = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt"))
    a, b = ut.alias("a"), ut.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("both_cnt"))
    )
    sa = singles.select(F.col("event_type").alias("type_a"), F.col("cnt").alias("cnt_a"))
    sb = singles.select(F.col("event_type").alias("type_b"), F.col("cnt").alias("cnt_b"))
    lift = (
        F.col("both_cnt").cast("double")
        * F.lit(n_users)
        / (F.col("cnt_a") * F.col("cnt_b").cast("double"))
    )
    return (
        pairs.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            "both_cnt",
            (F.floor(lift * 1000000 + 0.5) / 1000000).alias("lift"),
        )
        .orderBy("type_a", "type_b")
    )


# ---------------------------------------------------------------------------
# Scrape-gap detection (missing-sample monitoring).

_GAP_MS = 2 * DAY_MS


@register(
    "events_gap_detection",
    oracle=f"""
    WITH s AS (
      SELECT user_id, event_type, epoch_ms(ts) AS ts_ms,
             lag(epoch_ms(ts)) OVER (PARTITION BY user_id, event_type
                                     ORDER BY epoch_ms(ts), event_id) AS prev_ms
      FROM events
    )
    SELECT user_id, event_type, prev_ms AS gap_start_ms, ts_ms AS gap_end_ms,
           ts_ms - prev_ms AS gap_ms
    FROM s WHERE prev_ms IS NOT NULL AND ts_ms - prev_ms > {_GAP_MS}
    ORDER BY user_id, event_type, gap_start_ms
    """,
)
def events_gap_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scrape-gap detection: per series, report every inter-sample gap
    exceeding 2 days — the "target stopped reporting" monitor every TSDB
    deployment runs. One lag window per series partition (event-id
    tie-break for equal timestamps keeps both engines deterministic),
    integer millisecond arithmetic, no joins."""
    from pyspark.sql import Window as W

    ev = events_ms(spark, sf_dir)
    w = W.partitionBy("user_id", "event_type").orderBy("ts_ms", "event_id")
    s = ev.withColumn("prev_ms", F.lag("ts_ms").over(w))
    return (
        s.filter(
            F.col("prev_ms").isNotNull()
            & (F.col("ts_ms") - F.col("prev_ms") > _GAP_MS)
        )
        .select(
            "user_id",
            "event_type",
            F.col("prev_ms").alias("gap_start_ms"),
            F.col("ts_ms").alias("gap_end_ms"),
            (F.col("ts_ms") - F.col("prev_ms")).alias("gap_ms"),
        )
        .orderBy("user_id", "event_type", "gap_start_ms")
    )
