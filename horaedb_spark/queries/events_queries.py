"""Behavioral analytics over the events stream: funnel progression and
cohort retention — the two canonical product-analytics shapes a timeseries
engine's users run after the PromQL surface.

Both are UDF-free. The funnel runs as ONE shuffle: per-user events
collect into a sorted array and a JVM-side fold walks the stage machine
(signup -> click -> purchase, strictly increasing timestamps) — the same
order-dependent-fold pattern as ``promql.holt_winters``. The oracle replays
the strict semantics with correlated mins, proving the fold equals the
relational formulation. Retention is two hash aggregates and one
co-partitioned join on user_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from horaedb_spark.queries.precision import dsum
from horaedb_spark.queries.registry import register
from horaedb_spark.queries.tables import events_ms

DAY_MS = 86_400_000

_STAGES = ("signup", "click", "purchase")

# Funnel over the launch window (first ~26h of the stream): with the full
# 30-day stream every user eventually converts and the histogram collapses
# to one row; the time-boxed funnel is both the realistic product question
# ("who converted during launch?") and a distribution-rich fixture.
_FUNNEL_CUTOFF_MS = 1_704_160_800_000  # 2024-01-02T02:00Z


def funnel_stages(
    events: DataFrame,
    stages: tuple[str, ...] = _STAGES,
    window_ms: int | None = None,
) -> DataFrame:
    """Per-user funnel progression: walk the user's event stream in time
    order, advancing one stage each time the next stage's event type occurs
    at a STRICTLY later timestamp than the previous stage hit. Returns
    (user_id, stage_reached).

    One shuffle on user_id; the walk is an ``aggregate`` fold over a sorted
    array — whole-stage-codegen JVM expressions, no Python. Per-user event
    counts bound the array (document-scale state, same contract as
    holt_winters); a 100 TB deployment with pathological per-user volumes
    would pre-filter to the stage event types, which this does first —
    the array holds only funnel-relevant events."""
    relevant = events.filter(F.col("event_type").isin(*stages))
    arr = relevant.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("ts_ms"), F.col("event_type")))
        ).alias("__evs__")
    )

    init = F.struct(
        F.lit(0).alias("stage"), F.lit(-1).cast("long").alias("t_prev")
    )

    def step(acc, ev):
        conds = acc["stage"] < len(stages)
        advance = F.lit(False)
        for idx, s in enumerate(stages):
            advance = advance | (
                (acc["stage"] == idx) & (ev["event_type"] == s)
            )
        advance = conds & advance & (ev["ts_ms"] > acc["t_prev"])
        if window_ms is not None:
            # conversion window: a step only counts within window_ms of the
            # previous stage hit (stage 1 entry is unconstrained)
            advance = advance & (
                (acc["stage"] == 0) | (ev["ts_ms"] <= acc["t_prev"] + window_ms)
            )
        return F.struct(
            F.when(advance, acc["stage"] + 1).otherwise(acc["stage"]).alias(
                "stage"
            ),
            F.when(advance, ev["ts_ms"]).otherwise(acc["t_prev"]).alias("t_prev"),
        )

    folded = F.aggregate("__evs__", init, step, lambda acc: acc["stage"])
    return arr.select("user_id", folded.alias("stage_reached"))


@register(
    "funnel_conversion",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, event_type, epoch_ms(ts) AS ts_ms FROM events
      WHERE epoch_ms(ts) < {_FUNNEL_CUTOFF_MS}
    ), s1 AS (
      SELECT user_id, min(ts_ms) AS t1 FROM ev
      WHERE event_type = 'signup' GROUP BY user_id
    ), s2 AS (
      SELECT e.user_id, min(e.ts_ms) AS t2
      FROM ev e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND e.ts_ms > s1.t1 GROUP BY e.user_id
    ), s3 AS (
      SELECT e.user_id, min(e.ts_ms) AS t3
      FROM ev e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND e.ts_ms > s2.t2 GROUP BY e.user_id
    ), staged AS (
      SELECT u.user_id,
             CASE WHEN s3.user_id IS NOT NULL THEN 3
                  WHEN s2.user_id IS NOT NULL THEN 2
                  WHEN s1.user_id IS NOT NULL THEN 1
                  ELSE 0 END AS stage_reached
      FROM (SELECT DISTINCT user_id FROM ev
            WHERE event_type IN ('signup', 'click', 'purchase')) u
      LEFT JOIN s1 ON u.user_id = s1.user_id
      LEFT JOIN s2 ON u.user_id = s2.user_id
      LEFT JOIN s3 ON u.user_id = s3.user_id
    )
    SELECT stage_reached, count(*) AS n_users,
           CAST(sum(user_id) AS BIGINT) AS user_checksum
    FROM staged GROUP BY stage_reached ORDER BY stage_reached
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup -> click -> purchase funnel: how far each user progresses,
    requiring strictly increasing timestamps between stages. The engine
    folds each user's sorted event array in one shuffle; the oracle builds
    the same stages with three correlated-min joins — the checksum pins
    per-user agreement, not just the histogram."""
    ev = events_ms(spark, sf_dir).filter(F.col("ts_ms") < _FUNNEL_CUTOFF_MS)
    staged = funnel_stages(ev.select("user_id", "event_type", "ts_ms"))
    return (
        staged.groupBy("stage_reached")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("user_id").alias("user_checksum"),
        )
        .orderBy("stage_reached")
    )


@register(
    "retention_cohorts",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, epoch_ms(ts) // {DAY_MS} AS day FROM events
    ), first_day AS (
      SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY user_id
    ), active AS (
      SELECT DISTINCT e.user_id, f.cohort_day, e.day - f.cohort_day AS day_offset
      FROM ev e JOIN first_day f ON e.user_id = f.user_id
      WHERE e.day - f.cohort_day BETWEEN 0 AND 7
    )
    SELECT cohort_day, day_offset, count(*) AS n_users
    FROM active GROUP BY 1, 2 ORDER BY cohort_day, day_offset
    """,
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic cohort retention: users grouped by first-seen day; for each
    cohort, how many return on each of the next 7 days. Two hash aggregates
    plus one join that co-partitions on user_id (no extra exchange — AQE
    reuses the shuffle), then a distinct + count. Day arithmetic is pure
    integer epoch-day math on both engines."""
    ev = events_ms(spark, sf_dir).select(
        "user_id", F.floor(F.col("ts_ms") / F.lit(DAY_MS)).alias("day")
    )
    first_day = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    active = (
        ev.join(first_day, "user_id")
        .select(
            "user_id",
            "cohort_day",
            (F.col("day") - F.col("cohort_day")).alias("day_offset"),
        )
        .filter(F.col("day_offset").between(0, 7))
        .distinct()
    )
    return (
        active.groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_day", "day_offset")
    )


_T0_MS = 1_704_067_200_000  # 2024-01-01T00:00Z — the testdata epoch
_CAMPAIGN_STEP = 3 * DAY_MS
_CAMPAIGN_LEN = 36 * 3_600_000  # 36h — deliberately not bucket-aligned
_N_CAMPAIGNS = 20


@register(
    "campaign_interval_join",
    oracle=f"""
    WITH campaigns AS (
      SELECT i AS campaign_id,
             {_T0_MS} + i * {_CAMPAIGN_STEP} AS start_ms,
             {_T0_MS} + i * {_CAMPAIGN_STEP} + {_CAMPAIGN_LEN} AS end_ms
      FROM (SELECT unnest(generate_series(0, {_N_CAMPAIGNS - 1})) AS i)
    ), hits AS (
      SELECT c.campaign_id, e.user_id, e.value
      FROM events e JOIN campaigns c
        ON epoch_ms(e.ts) >= c.start_ms AND epoch_ms(e.ts) < c.end_ms
    )
    SELECT campaign_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           round(CAST(sum(CAST(value AS DECIMAL(30,10))) AS DOUBLE), 2) AS total_value
    FROM hits GROUP BY campaign_id ORDER BY campaign_id
    """,
)
def campaign_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval join at scale: attribute events to the (possibly
    overlapping) campaign windows containing them. Spark plans the naive
    BETWEEN join as a nested loop — O(events x campaigns); here each
    campaign explodes into its covered day buckets and the match is ONE
    hash equi-join on the bucket key plus a residual bounds filter
    (functions/intervals.py; plan-asserted nested-loop-free). The 36h
    windows deliberately straddle bucket boundaries to exercise the
    residual filter."""
    from horaedb_spark.functions.intervals import interval_equi_join

    ev = events_ms(spark, sf_dir)
    campaigns = spark.range(_N_CAMPAIGNS).select(
        F.col("id").alias("campaign_id"),
        (F.lit(_T0_MS) + F.col("id") * _CAMPAIGN_STEP).alias("start_ms"),
        (F.lit(_T0_MS) + F.col("id") * _CAMPAIGN_STEP + _CAMPAIGN_LEN).alias("end_ms"),
    )
    hits = interval_equi_join(ev, "ts_ms", campaigns, "start_ms", "end_ms", DAY_MS)
    return (
        hits.groupBy("campaign_id")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
            dsum("value", 2).alias("total_value"),
        )
        .orderBy("campaign_id")
    )


@register(
    "user_journey_paths",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE OR
                       lag(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id, event_id, event_type, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    ), seqs AS (
      SELECT user_id, session_id,
             list(event_type ORDER BY ts, event_id) AS seq
      FROM sessions GROUP BY user_id, session_id
    ), paths AS (
      SELECT unnest([seq[i] || '>' || seq[i + 1] || '>' || seq[i + 2]
                     FOR i IN generate_series(1, len(seq) - 2)]) AS path
      FROM seqs WHERE len(seq) >= 3
    )
    SELECT path, CAST(count(*) AS BIGINT) AS n
    FROM paths GROUP BY path ORDER BY n DESC, path LIMIT 10
    """,
)
def user_journey_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top user journeys: sessionize (30-min gap), then count every 3-step
    event-type sub-path across all sessions — the product-analytics "what
    do users actually do" query. One shuffle to sessionize (lag + running
    sum per user), one per-session collect (sessions are short by
    construction — the gap bounds them), path n-grams as a row-local array
    transform, and a final count aggregate. Ties in event order break on
    event_id so the paths are deterministic."""
    ev = events_ms(spark, sf_dir)
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    flagged = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 30 * 60), F.lit(1)).otherwise(F.lit(0)),
    )
    ws = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sessions = flagged.withColumn("session_id", F.sum("new_session").over(ws))
    seqs = (
        sessions.groupBy("user_id", "session_id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                lambda s: s["event_type"],
            ).alias("seq")
        )
        .filter(F.size("seq") >= 3)
    )
    paths = seqs.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(seq) - 2),"
                " i -> concat(seq[i - 1], '>', seq[i], '>', seq[i + 1]))"
            )
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy(F.desc("n"), "path")
        .limit(10)
    )


_FUNNEL_WINDOW_MS = 3 * DAY_MS


@register(
    "funnel_time_bounded",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, event_type, epoch_ms(ts) AS ts_ms FROM events
      WHERE epoch_ms(ts) < {_FUNNEL_CUTOFF_MS}
    ), s1 AS (
      SELECT user_id, min(ts_ms) AS t1 FROM ev
      WHERE event_type = 'signup' GROUP BY user_id
    ), s2 AS (
      SELECT e.user_id, min(e.ts_ms) AS t2
      FROM ev e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND e.ts_ms > s1.t1
        AND e.ts_ms <= s1.t1 + {_FUNNEL_WINDOW_MS}
      GROUP BY e.user_id
    ), s3 AS (
      SELECT e.user_id, min(e.ts_ms) AS t3
      FROM ev e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND e.ts_ms > s2.t2
        AND e.ts_ms <= s2.t2 + {_FUNNEL_WINDOW_MS}
      GROUP BY e.user_id
    ), staged AS (
      SELECT u.user_id,
             CASE WHEN s3.t3 IS NOT NULL THEN 3
                  WHEN s2.t2 IS NOT NULL THEN 2
                  WHEN s1.t1 IS NOT NULL THEN 1
                  ELSE 0 END AS stage_reached
      FROM (SELECT DISTINCT user_id FROM ev
            WHERE event_type IN ('signup', 'click', 'purchase')) u
      LEFT JOIN s1 ON u.user_id = s1.user_id
      LEFT JOIN s2 ON u.user_id = s2.user_id
      LEFT JOIN s3 ON u.user_id = s3.user_id
    )
    SELECT stage_reached, count(*) AS n_users,
           CAST(sum(user_id) AS BIGINT) AS user_checksum
    FROM staged GROUP BY stage_reached ORDER BY stage_reached
    """,
)
def funnel_time_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel with a CONVERSION WINDOW: each step must land within 3 days
    of the previous stage hit (the form product analytics actually runs —
    un-windowed funnels overcount). Same single-shuffle array fold as
    funnel_conversion with one extra row-local bound; greedy
    earliest-qualifying semantics make it equivalent to the oracle's
    windowed correlated-min chain (the earliest next-stage event either
    falls inside the window or none does — later ones are later)."""
    ev = events_ms(spark, sf_dir).filter(F.col("ts_ms") < _FUNNEL_CUTOFF_MS)
    staged = funnel_stages(
        ev.select("user_id", "event_type", "ts_ms"), window_ms=_FUNNEL_WINDOW_MS
    )
    return (
        staged.groupBy("stage_reached")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("user_id").alias("user_checksum"),
        )
        .orderBy("stage_reached")
    )


@register(
    "events_churn_flow",
    oracle=f"""
    WITH w1 AS (
      SELECT DISTINCT user_id FROM events
      WHERE epoch_ms(ts) >= {1_704_067_200_000}
        AND epoch_ms(ts) < {1_704_067_200_000 + 7 * DAY_MS}
    ), w4 AS (
      SELECT DISTINCT user_id FROM events
      WHERE epoch_ms(ts) >= {1_704_067_200_000 + 21 * DAY_MS}
        AND epoch_ms(ts) < {1_704_067_200_000 + 28 * DAY_MS}
    ), flow AS (
      SELECT coalesce(w1.user_id, w4.user_id) AS user_id,
             CASE WHEN w1.user_id IS NOT NULL AND w4.user_id IS NOT NULL
                    THEN 'retained'
                  WHEN w1.user_id IS NOT NULL THEN 'churned'
                  ELSE 'new' END AS status
      FROM w1 FULL OUTER JOIN w4 ON w1.user_id = w4.user_id
    )
    SELECT user_id % 10 AS cohort, status, count(*) AS n_users,
           CAST(sum(user_id) AS BIGINT) AS user_checksum
    FROM flow GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def events_churn_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-1 → week-4 user flow per cohort: retained (active both),
    churned (active then gone), new (appeared late). Two distinct
    aggregates down to user grain, one co-partitioned full-outer join on
    user_id, one metadata-sized rollup — the user dimension is the only
    shuffle key, so the plan is two fact scans + one user-sized join at
    any scale. Checksums pin per-user membership, not just counts."""
    ev = events_ms(spark, sf_dir)
    t0 = 1_704_067_200_000
    w1 = (
        ev.filter((F.col("ts_ms") >= t0) & (F.col("ts_ms") < t0 + 7 * DAY_MS))
        .select("user_id")
        .distinct()
        .withColumn("__w1__", F.lit(1))
    )
    w4 = (
        ev.filter(
            (F.col("ts_ms") >= t0 + 21 * DAY_MS)
            & (F.col("ts_ms") < t0 + 28 * DAY_MS)
        )
        .select("user_id")
        .distinct()
        .withColumn("__w4__", F.lit(1))
    )
    flow = w1.join(w4, "user_id", "full_outer").select(
        "user_id",
        F.when(F.col("__w1__").isNotNull() & F.col("__w4__").isNotNull(), "retained")
        .when(F.col("__w1__").isNotNull(), "churned")
        .otherwise("new")
        .alias("status"),
    )
    return (
        flow.groupBy((F.col("user_id") % 10).alias("cohort"), "status")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("user_id").alias("user_checksum"),
        )
        .orderBy("cohort", "status")
    )


@register(
    "events_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS cur,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY epoch_ms(ts), event_id) AS nxt
      FROM events
    ), pairs AS (
      SELECT cur, nxt, count(*) AS cnt FROM seq WHERE nxt IS NOT NULL
      GROUP BY cur, nxt
    )
    SELECT cur, nxt, cnt,
           floor(CAST(cnt AS DOUBLE)
                 / sum(cnt) OVER (PARTITION BY cur) * 1000000 + 0.5)
             / 1000000 AS p
    FROM pairs ORDER BY cur, nxt
    """,
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over user event streams:
    P(next = b | current = a), the behavioral model behind journey
    prediction and anomaly scoring. One lead() window per user partition
    (event-id tie-break), one alphabet²-bounded aggregate, and the row
    normalization runs over the |types|² matrix — never the facts."""
    from pyspark.sql import Window as W

    ev = events_ms(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts_ms", "event_id")
    seq = ev.select(
        "user_id",
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    pairs = seq.groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("cnt"))
    wnorm = W.partitionBy("cur")
    return pairs.select(
        "cur",
        "nxt",
        "cnt",
        (
            F.floor(
                F.col("cnt").cast("double") / F.sum("cnt").over(wnorm) * 1000000
                + 0.5
            )
            / 1000000
        ).alias("p"),
    ).orderBy("cur", "nxt")

@register(
    "sketch_hll_distinct",
    oracle="""
    WITH items AS (
      SELECT event_type, user_id, md5(CAST(user_id AS VARCHAR)) AS h
      FROM events
    ), rr AS (
      SELECT event_type,
             CAST(('0x' || substring(h, 1, 2)) AS BIGINT) % 64 AS reg,
             CASE WHEN v = 0 THEN 49 ELSE 49 - length(bin(v)) END AS rank
      FROM (
        SELECT event_type, h,
               CAST(('0x' || substring(h, 3, 12)) AS BIGINT) AS v
        FROM items
      )
    ), regs AS (
      SELECT event_type, reg, max(rank) AS mx FROM rr GROUP BY 1, 2
    ), folded AS (
      SELECT event_type, count(*) AS n_used,
             CAST(sum(mx) AS BIGINT) AS rank_checksum,
             CAST(sum(CAST(2 ** (49 - mx) AS BIGINT)) AS BIGINT) AS used_denom
      FROM regs GROUP BY 1
    ), est AS (
      SELECT event_type, n_used, rank_checksum,
             used_denom + (64 - n_used) * CAST(2 ** 49 AS BIGINT)
               AS scaled_denom
      FROM folded
    ), exact AS (
      SELECT event_type, count(DISTINCT user_id) AS exact_distinct
      FROM events GROUP BY 1
    )
    SELECT e.event_type, CAST(64 AS INT) AS n_registers, rank_checksum,
           round(CASE WHEN n_used < 64
                       AND (0.709 * 64 * 64) * CAST(2 ** 49 AS DOUBLE)
                           / scaled_denom <= 2.5 * 64
                      THEN 64.0 * ln(64.0 / (64 - n_used))
                      ELSE (0.709 * 64 * 64) * CAST(2 ** 49 AS DOUBLE)
                           / scaled_denom END, 6) AS hll_estimate,
           CAST(x.exact_distinct AS BIGINT) AS exact_distinct
    FROM est e JOIN exact x USING (event_type)
    ORDER BY event_type
    """,
)
def sketch_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic HyperLogLog distinct-user estimate per event type,
    next to the exact count: 64 md5-derived registers, ranks from INTEGER
    bin-length arithmetic and the harmonic denominator as an exact integer
    sum of 2^(49-rank) — the whole sketch is a pure function of the data
    set, so the oracle replays the ESTIMATE bit-for-bit (no tolerance
    band). One hash aggregate per (group, register); map-side partial max
    IS the register merge — the shape that unions sketches from 1000
    executors for free."""
    from horaedb_spark.functions.sketch import hll_distinct

    ev = events_ms(spark, sf_dir)
    est = hll_distinct(ev, ["event_type"], F.col("user_id"))
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("exact_distinct")
    )
    return est.join(exact, "event_type").orderBy("event_type")

@register(
    "sketch_kmv_overlap",
    oracle="""
    WITH hashes AS (
      SELECT DISTINCT event_type,
             CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 12))
                  AS BIGINT) / CAST(281474976710656 AS DOUBLE) AS h
      FROM events
    ), sk AS (
      SELECT event_type, h,
             row_number() OVER (PARTITION BY event_type ORDER BY h) AS pos
      FROM hashes QUALIFY pos <= 64
    ), tp AS (
      SELECT a.event_type AS ta, b.event_type AS tb
      FROM (SELECT DISTINCT event_type FROM events) a
      JOIN (SELECT DISTINCT event_type FROM events) b
        ON a.event_type < b.event_type
    ), u AS (
      SELECT ta, tb, h, max(ia) AS ia, max(ib) AS ib FROM (
        SELECT tp.ta, tp.tb, sk.h, 1 AS ia, 0 AS ib
        FROM tp JOIN sk ON sk.event_type = tp.ta
        UNION ALL
        SELECT tp.ta, tp.tb, sk.h, 0, 1
        FROM tp JOIN sk ON sk.event_type = tp.tb
      ) GROUP BY 1, 2, 3
    ), uk AS (
      SELECT ta, tb, h, ia, ib,
             row_number() OVER (PARTITION BY ta, tb ORDER BY h) AS pos
      FROM u QUALIFY pos <= 64
    ), est AS (
      SELECT ta, tb, count(*) AS union_k,
             sum(ia * ib) AS shared
      FROM uk GROUP BY 1, 2
    ), sets AS (
      SELECT DISTINCT event_type, user_id FROM events
    ), exact AS (
      SELECT tp.ta, tp.tb,
             count(DISTINCT CASE WHEN sa.user_id IS NOT NULL
                                  AND sb.user_id IS NOT NULL
                                 THEN coalesce(sa.user_id, sb.user_id) END)
               AS inter,
             count(DISTINCT coalesce(sa.user_id, sb.user_id)) AS uni
      FROM tp
      LEFT JOIN sets sa ON sa.event_type = tp.ta
      FULL JOIN sets sb
        ON sb.event_type = tp.tb AND sb.user_id = sa.user_id
       AND sa.event_type = tp.ta
      WHERE sa.event_type = tp.ta OR sb.event_type = tp.tb
      GROUP BY 1, 2
    )
    SELECT e.ta AS type_a, e.tb AS type_b,
           CAST(e.union_k AS BIGINT) AS union_k,
           round(e.shared * 1.0 / e.union_k, 6) AS jaccard_est,
           round(x.inter * 1.0 / x.uni, 6) AS jaccard_exact
    FROM est e JOIN exact x ON x.ta = e.ta AND x.tb = e.tb
    ORDER BY type_a, type_b
    """,
)
def sketch_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV set-operation sketch: pairwise audience overlap (Jaccard)
    between event types from 64-minimum-value sketches — the estimate HLL
    cannot give (set INTERSECTIONS need member identity, which KMV keeps).
    Union sketch = k smallest of the merged hash sets; Jaccard = shared
    members inside the union k-set. Deterministic md5 order statistics, so
    the ESTIMATES hash-match the SQL replay; the exact Jaccard rides along
    for calibration. Sketches are a few KB per group — at 100 TB they are
    the only thing that crosses executors."""
    from horaedb_spark.functions.sketch import KMV_K, kmv_sketch
    from pyspark.sql.window import Window

    ev = events_ms(spark, sf_dir)
    sk = kmv_sketch(ev, ["event_type"], F.col("user_id"))
    types = ev.select("event_type").distinct()
    tp = (
        types.select(F.col("event_type").alias("ta"))
        .crossJoin(types.select(F.col("event_type").alias("tb")))
        .filter(F.col("ta") < F.col("tb"))
    )
    ua = tp.join(sk, sk["event_type"] == tp["ta"]).select(
        "ta", "tb", "h", F.lit(1).alias("ia"), F.lit(0).alias("ib")
    )
    ub = tp.join(sk, sk["event_type"] == tp["tb"]).select(
        "ta", "tb", "h", F.lit(0).alias("ia"), F.lit(1).alias("ib")
    )
    u = (
        ua.unionByName(ub)
        .groupBy("ta", "tb", "h")
        .agg(F.max("ia").alias("ia"), F.max("ib").alias("ib"))
    )
    w = Window.partitionBy("ta", "tb").orderBy("h")
    uk = u.withColumn("pos", F.row_number().over(w)).filter(
        F.col("pos") <= KMV_K
    )
    est = uk.groupBy("ta", "tb").agg(
        F.count(F.lit(1)).alias("union_k"),
        F.sum(F.col("ia") * F.col("ib")).alias("shared"),
    )
    sets = ev.select("event_type", "user_id").distinct()
    sa = sets.select(F.col("event_type").alias("ta"), F.col("user_id").alias("u"))
    sb = sets.select(F.col("event_type").alias("tb"), F.col("user_id").alias("u"))
    inter = sa.join(sb, "u").groupBy("ta", "tb").agg(
        F.countDistinct("u").alias("inter")
    )
    counts = sets.groupBy("event_type").agg(F.countDistinct("user_id").alias("n"))
    exact = (
        tp.join(inter, ["ta", "tb"], "left")
        .join(counts.select(F.col("event_type").alias("ta"), F.col("n").alias("na")), "ta")
        .join(counts.select(F.col("event_type").alias("tb"), F.col("n").alias("nb")), "tb")
        .select(
            "ta", "tb",
            F.coalesce("inter", F.lit(0)).alias("inter"),
            (F.col("na") + F.col("nb") - F.coalesce("inter", F.lit(0))).alias("uni"),
        )
    )
    return (
        est.join(exact, ["ta", "tb"])
        .select(
            F.col("ta").alias("type_a"),
            F.col("tb").alias("type_b"),
            F.col("union_k").cast("long"),
            F.round(F.col("shared") / F.col("union_k"), 6).alias("jaccard_est"),
            F.round(F.col("inter") / F.col("uni"), 6).alias("jaccard_exact"),
        )
        .orderBy("type_a", "type_b")
    )

