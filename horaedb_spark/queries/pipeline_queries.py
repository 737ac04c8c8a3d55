"""Corpus split/sample queries (LLM-pipeline surface): deterministic
hash-based train/test assignment and stratified downsampling, verified to
the row via id checksums (count + sum of ids per group) against a DuckDB
oracle computing the identical md5 thresholds."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from horaedb_spark.functions.dedup import cross_set_contamination
from horaedb_spark.functions.sampling import stratified_sample, train_test_split
from horaedb_spark.queries.registry import register
from horaedb_spark.queries.text_queries import _DE, _EN, _ES, _FR
from horaedb_spark.queries.tables import load_table

_SAMPLE_RATES = {"en": 128, "de": 64, "es": 26}


@register(
    "pipeline_train_test_split",
    oracle=r"""
    SELECT lang,
           CASE WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 2) < '1a'
                THEN 'test' ELSE 'train' END AS split,
           count(*) AS n, CAST(sum(doc_id) AS BIGINT) AS id_checksum
    FROM documents
    GROUP BY 1, 2 ORDER BY lang, split
    """,
)
def pipeline_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/test split (26/256 ≈ 10.2% test) keyed on
    md5(salt:id) — row-local, shuffle-free, stable across engines and runs.
    The id_checksum pins the exact membership of each split, not just its
    size."""
    docs = train_test_split(load_table(spark, sf_dir, "documents"), "doc_id")
    return (
        docs.groupBy("lang", "split")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("doc_id").alias("id_checksum"))
        .orderBy("lang", "split")
    )


@register(
    "pipeline_stratified_sample",
    oracle=r"""
    WITH kept AS (
      SELECT doc_id, lang FROM documents
      WHERE substr(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 2) <
            CASE lang WHEN 'en' THEN '80' WHEN 'de' THEN '40'
                      WHEN 'es' THEN '1a' END
    )
    SELECT lang, count(*) AS n, CAST(sum(doc_id) AS BIGINT) AS id_checksum
    FROM kept GROUP BY lang ORDER BY lang
    """,
)
def pipeline_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified language rebalancing: keep ~50% of en, ~25% of de, ~10% of
    es, drop the rest — one md5-threshold scan, no shuffle, reproducible to
    the row (id_checksum pins membership)."""
    docs = load_table(spark, sf_dir, "documents")
    kept = stratified_sample(docs, "doc_id", "lang", _SAMPLE_RATES)
    return (
        kept.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("doc_id").alias("id_checksum"))
        .orderBy("lang")
    )


@register(
    "pipeline_decontamination",
    oracle=r"""
    WITH w AS (
      SELECT doc_id,
             substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 2) < '1a'
               AS is_probe,
             string_split_regex(text, '\s+') AS w
      FROM documents
    ), sh AS (
      SELECT doc_id, is_probe,
             CASE WHEN len(w) >= 5
                  THEN list_distinct([array_to_string(w[i:i+4], ' ')
                                      FOR i IN generate_series(1, len(w)-4)])
                  ELSE [array_to_string(w, ' ')] END AS sh
      FROM w
    ), flat AS (
      SELECT doc_id, is_probe, unnest(sh) AS s FROM sh
    ), hashed AS (
      SELECT doc_id, is_probe, md5(s) AS h FROM flat
    )
    SELECT a.doc_id,
           CAST(count(DISTINCT a.h) AS BIGINT) AS n_shared_shingles,
           CAST(count(DISTINCT b.doc_id) AS BIGINT) AS n_probe_docs
    FROM hashed a JOIN hashed b ON a.h = b.h AND NOT a.is_probe AND b.is_probe
    GROUP BY a.doc_id ORDER BY a.doc_id
    """,
)
def pipeline_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination: train docs (the md5 split's 'train' side)
    that share >=1 word-5-gram with any test doc, with shared-shingle and
    probe-doc counts. Anti-joining the corpus on this result is the
    decontamination pass every pretraining pipeline runs before training.
    One shuffle keyed on fixed-width md5(shingle) digests."""
    docs = train_test_split(load_table(spark, sf_dir, "documents"), "doc_id")
    return cross_set_contamination(
        docs, "doc_id", "text", "split", probe_value="test", k=5
    ).orderBy("doc_id")


@register(
    "pipeline_contamination_rate",
    oracle=r"""
    WITH w AS (
      SELECT doc_id, source,
             substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 2) < '1a'
               AS is_probe,
             string_split_regex(text, '\s+') AS w
      FROM documents
    ), sh AS (
      SELECT doc_id, source, is_probe,
             CASE WHEN len(w) >= 5
                  THEN list_distinct([array_to_string(w[i:i+4], ' ')
                                      FOR i IN generate_series(1, len(w)-4)])
                  ELSE [array_to_string(w, ' ')] END AS sh
      FROM w
    ), flat AS (
      SELECT DISTINCT doc_id, source, is_probe, md5(unnest(sh)) AS h FROM sh
    ), probe AS (SELECT DISTINCT h FROM flat WHERE is_probe),
    per_doc AS (
      SELECT f.doc_id, f.source, count(*) AS n_shingles,
             count(*) FILTER (WHERE p.h IS NOT NULL) AS n_shared
      FROM flat f LEFT JOIN probe p ON p.h = f.h
      WHERE NOT f.is_probe GROUP BY 1, 2
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(count(*) FILTER (WHERE n_shared * 10 >= n_shingles)
                AS BIGINT) AS n_flagged,
           CAST(sum(n_shared) AS BIGINT) AS shared_shingles,
           CAST(sum(n_shingles) AS BIGINT) AS total_shingles,
           floor(CAST(sum(n_shared) AS DOUBLE) / sum(n_shingles)
                 * 1000000 + 0.5) / 1000000 AS corpus_rate,
           max(floor(CAST(n_shared AS DOUBLE) / n_shingles
                     * 1000000 + 0.5) / 1000000) AS max_doc_rate
    FROM per_doc GROUP BY source ORDER BY source
    """,
)
def pipeline_contamination_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contamination RATE report per source (the GPT-3/PaLM appendix
    shape, one step past the binary decontamination hit list): per train
    doc, the fraction of its distinct word-5-gram digests found anywhere
    in the test split — zero-overlap docs included so the rates average
    over the whole corpus. Flagging (rate >= 10%) compares via integer
    cross-multiplication (n_shared*10 >= n_shingles) and the summed rates
    divide once at the end, so every value is engine-exact. Same scale
    shape as pipeline_decontamination: one digest-keyed shuffle."""
    from horaedb_spark.functions.dedup import contamination_overlap

    docs = train_test_split(load_table(spark, sf_dir, "documents"), "doc_id")
    per_doc = contamination_overlap(
        docs, "doc_id", "text", "split", probe_value="test", k=5
    ).join(docs.select("doc_id", "source"), "doc_id")
    rate = F.col("n_shared").cast("double") / F.col("n_shingles")
    rounded = F.floor(rate * 1_000_000 + F.lit(0.5)) / 1_000_000
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count(
                F.when(F.col("n_shared") * 10 >= F.col("n_shingles"), 1)
            ).alias("n_flagged"),
            F.sum("n_shared").alias("shared_shingles"),
            F.sum("n_shingles").alias("total_shingles"),
            # per-row rounded rate maxes inside the SAME aggregate — a
            # second per_doc pass would re-run the digest pipeline
            F.max(rounded).alias("max_doc_rate"),
        )
        .select(
            "source",
            "n_docs",
            "n_flagged",
            "shared_shingles",
            "total_shingles",
            (
                F.floor(
                    F.col("shared_shingles").cast("double")
                    / F.col("total_shingles")
                    * 1_000_000
                    + F.lit(0.5)
                )
                / 1_000_000
            ).alias("corpus_rate"),
            "max_doc_rate",
        )
        .orderBy("source")
    )


@register(
    "pipeline_domain_cap",
    oracle=r"""
    WITH ranked AS (
      SELECT source, doc_id, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id ASC) AS rn
      FROM documents
    )
    SELECT source, count(*) AS n, CAST(sum(doc_id) AS BIGINT) AS id_checksum,
           CAST(min(n_chars) AS BIGINT) AS min_chars
    FROM ranked WHERE rn <= 15 GROUP BY source ORDER BY source
    """,
)
def pipeline_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain cap (C4/RefinedWeb "no domain dominates"): keep the 15
    longest docs per source, ties by doc_id. The rank<=k filter compiles to
    a map-side WindowGroupLimit, so the shuffle carries at most
    cap x n_domains rows regardless of corpus size (plan-asserted in
    tests/test_plans.py)."""
    from horaedb_spark.functions.sampling import domain_cap

    docs = load_table(spark, sf_dir, "documents")
    kept = domain_cap(docs, "source", "doc_id", cap=15, order_col="n_chars")
    return (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("doc_id").alias("id_checksum"),
            F.min("n_chars").alias("min_chars"),
        )
        .orderBy("source")
    )


@register(
    "pipeline_temperature_resample",
    oracle=r"""
    WITH counts AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
    mn AS (SELECT min(n) AS min_n FROM counts),
    rates AS (
      SELECT lang,
             floor(pow(CAST(min_n AS DOUBLE) / n, CAST(0.5 AS DOUBLE)) * 1e6
                   + 0.5) / 1e6
               AS rate
      FROM counts, mn
    ),
    thr AS (
      SELECT lang,
             CASE WHEN rate >= 1.0 THEN 'g'
                  ELSE lpad(lower(hex(CAST(floor(rate * 4294967296.0)
                                           AS BIGINT))), 8, '0') END AS t
      FROM rates
    )
    SELECT d.lang, count(*) AS n_kept,
           CAST(sum(d.doc_id) AS BIGINT) AS id_checksum
    FROM documents d JOIN thr ON d.lang = thr.lang
    WHERE substr(md5('temp:' || CAST(d.doc_id AS VARCHAR)), 1, 8) < t
    GROUP BY d.lang ORDER BY d.lang
    """,
)
def pipeline_temperature_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature rebalancing at alpha=0.5 over the language distribution:
    en (3.4x the smallest lang) is downsampled toward sqrt-flattened shares,
    the smallest language keeps every row. Membership is pinned to the row
    by the id_checksum: the md5-threshold keep decision must agree with the
    oracle exactly, not just in expectation."""
    from horaedb_spark.functions.sampling import temperature_resample

    docs = load_table(spark, sf_dir, "documents")
    kept = temperature_resample(docs, "doc_id", "lang", alpha=0.5)
    return (
        kept.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_kept"), F.sum("doc_id").alias("id_checksum"))
        .orderBy("lang")
    )


@register(
    "pipeline_chunk_windows",
    oracle=r"""
    WITH w AS (
      SELECT doc_id, string_split_regex(text, '\s+') AS w FROM documents
    ), c AS (
      SELECT doc_id, w, len(w) AS n,
             1 + CASE WHEN len(w) > 64 THEN (len(w) - 64 + 47) // 48
                      ELSE 0 END AS n_chunks
      FROM w
    )
    SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
           CAST(least(64, n - i * 48) AS BIGINT) AS n_tokens,
           md5(array_to_string(w[i * 48 + 1 : i * 48 + 64], ' ')) AS chunk_md5
    FROM c, unnest(generate_series(0, n_chunks - 1)) AS t(i)
    ORDER BY doc_id, chunk_idx
    """,
)
def pipeline_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: 64-token windows every 48 tokens (16-token
    overlap) — documents become model-sized training sequences in one
    row-local pass; the md5 of each chunk pins the exact token layout
    against the oracle's 1-based list slices."""
    from horaedb_spark.functions.text import chunk_windows

    docs = load_table(spark, sf_dir, "documents")
    c = docs.select(
        "doc_id", F.explode(chunk_windows("text", window=64, stride=48)).alias("c")
    )
    return c.select(
        "doc_id",
        F.col("c.chunk_idx").cast("long").alias("chunk_idx"),
        F.col("c.n_tokens").cast("long").alias("n_tokens"),
        F.md5(F.col("c.chunk")).alias("chunk_md5"),
    ).orderBy("doc_id", "chunk_idx")


@register(
    "pipeline_sequence_packing",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, len(string_split_regex(text, '\s+')) AS n_tokens
      FROM documents
    ), c AS (
      SELECT doc_id, n_tokens,
             sum(n_tokens) OVER (ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum
      FROM t
    )
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(cum AS BIGINT) AS cum_tokens,
           CAST((cum - n_tokens) // 256 AS BIGINT) AS first_bin,
           CAST((cum - 1) // 256 AS BIGINT) AS last_bin
    FROM c ORDER BY doc_id
    """,
)
def pipeline_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence packing: docs concatenate in doc_id order and cut
    every 256 tokens; each doc reports its bin span. The oracle computes the
    prefix sum with a single global window; the engine runs the scalable
    two-phase scan (block-local cumsum + broadcast block offsets) — same
    numbers, but the corpus-sized pass stays parallel (see
    sampling.packed_bins)."""
    from horaedb_spark.functions.sampling import packed_bins
    from horaedb_spark.functions.text import token_count

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", token_count("text").cast("long").alias("n_tokens"))
    packed = packed_bins(t, "doc_id", "n_tokens", budget=256, block_size=64)
    return packed.select(
        "doc_id", "n_tokens", "cum_tokens", "first_bin", "last_bin"
    ).orderBy("doc_id")


@register(
    "pipeline_corpus_clean",
    oracle=rf"""
    WITH w AS (
      SELECT doc_id, source, text, string_split_regex(text, '\s+') AS words
      FROM documents
    ), scored AS (
      SELECT doc_id, source, text, words,
             len(list_filter(words, x -> x IN ({_EN}))) AS s_en,
             len(list_filter(words, x -> x IN ({_DE}))) AS s_de,
             len(list_filter(words, x -> x IN ({_ES}))) AS s_es,
             len(list_filter(words, x -> x IN ({_FR}))) AS s_fr,
             len(words) AS n_tokens,
             length(text) AS n_chars,
             length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g'))
               AS punct
      FROM w
    ), pred AS (
      SELECT *,
             CASE WHEN greatest(s_en, s_de, s_es, s_fr) <= 0 THEN 'und'
                  WHEN s_en = greatest(s_en, s_de, s_es, s_fr) THEN 'en'
                  WHEN s_de = greatest(s_en, s_de, s_es, s_fr) THEN 'de'
                  WHEN s_es = greatest(s_en, s_de, s_es, s_fr) THEN 'es'
                  ELSE 'fr' END AS lang_pred,
             round(least(n_tokens / 64.0, 1.0) * 0.4
                   + least(CAST(s_en AS DOUBLE) / n_tokens * 4.0, 1.0) * 0.3
                   + (1.0 - least(CAST(punct AS DOUBLE) / n_chars * 10.0, 1.0))
                     * 0.3, 6) AS score
      FROM scored
    ), kept AS (
      SELECT * FROM pred WHERE lang_pred <> 'und' AND score >= 0.5
    ), survivors AS (
      SELECT min(doc_id) AS doc_id FROM kept
      GROUP BY md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
    )
    SELECT source, count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           CAST(sum(k.doc_id) AS BIGINT) AS id_checksum
    FROM kept k JOIN survivors USING (doc_id)
    GROUP BY source ORDER BY source
    """,
)
def pipeline_corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The C4-style cleaning chain as ONE composed pipeline: language-ID
    filter (drop 'und') -> quality-score threshold (>= 0.5) -> exact dedup on
    the normalized fingerprint (min-id survivor) -> per-source corpus report.
    Every stage is the already-verified operator; the composition is what a
    training-data run actually executes. All row-local except one shuffle
    (dedup: WindowGroupLimit min-id survivor per fingerprint — partial
    top-1 map-side) and one final aggregate — at 100 TB this is scan + two
    shuffles, no joins against anything corpus-sized, and the expensive
    text featurization runs in ONE scan (the previous survivors
    groupBy+self-join featurized the corpus twice). The id_checksum pins
    exact survivor membership."""
    from pyspark.sql.window import Window

    from horaedb_spark.functions import text as TX

    docs = load_table(spark, sf_dir, "documents")
    feats = TX.quality_features(F.col("text"))
    scored = docs.select(
        "doc_id",
        "source",
        TX.predict_lang(TX.words("text")).alias("lang_pred"),
        F.round(feats["quality_score"], 6).alias("score"),
        feats["n_tokens"].alias("n_tokens"),
        TX.normalized_fingerprint("text").alias("fp"),
    )
    kept = scored.filter((F.col("lang_pred") != "und") & (F.col("score") >= 0.5))
    w = Window.partitionBy("fp").orderBy("doc_id")
    return (
        kept.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.sum("doc_id").cast("long").alias("id_checksum"),
        )
        .orderBy("source")
    )


@register(
    "pipeline_length_histogram",
    oracle=r"""
    WITH t AS (
      SELECT lang, len(string_split_regex(text, '\s+')) AS n_tokens
      FROM documents
    )
    SELECT lang, length(bin(n_tokens)) AS bucket, count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
           min(n_tokens) AS min_tokens, max(n_tokens) AS max_tokens
    FROM t GROUP BY 1, 2 ORDER BY lang, bucket
    """,
)
def pipeline_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-length distribution per language in power-of-two buckets
    (bucket = bit-length of the token count — integer-exact, no float log2
    boundary ambiguity). The sequence-length histogram that sizes packing
    budgets and batch shapes for training runs; one map + one hash aggregate
    at any scale."""
    from horaedb_spark.functions.text import token_count

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("lang", token_count("text").cast("long").alias("n_tokens"))
    return (
        t.groupBy("lang", F.length(F.bin("n_tokens")).cast("long").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("sum_tokens"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
        )
        .orderBy("lang", "bucket")
    )


@register(
    "pipeline_token_budget",
    oracle=rf"""
    WITH w AS (
      SELECT doc_id, text, string_split_regex(text, '\s+') AS words FROM documents
    ), feats AS (
      SELECT doc_id,
             len(words) AS n_tokens,
             length(text) AS n_chars,
             len(list_filter(words, x -> x IN ({_EN}))) AS sw_hits,
             length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')) AS punct
      FROM w
    ), scored AS (
      SELECT doc_id, n_tokens,
             round(least(n_tokens / 64.0, 1.0) * 0.4
                   + least(CAST(sw_hits AS DOUBLE) / n_tokens * 4.0, 1.0) * 0.3
                   + (1.0 - least(CAST(punct AS DOUBLE) / n_chars * 10.0, 1.0)) * 0.3,
                   6) AS quality_score
      FROM feats
    ), budget AS (
      SELECT CAST(floor(0.4 * sum(n_tokens)) AS BIGINT) AS b FROM scored
    ), ranked AS (
      SELECT doc_id, n_tokens, quality_score,
             CAST(sum(n_tokens) OVER (ORDER BY quality_score DESC, doc_id) AS BIGINT)
               AS cum_tokens
      FROM scored
    )
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, quality_score, cum_tokens
    FROM ranked, budget WHERE cum_tokens <= b
    ORDER BY cum_tokens
    """,
)
def pipeline_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy token-budget fill: take documents in quality order (best
    first) until 40% of the corpus token count is spent — the "assemble a
    training mix under a budget" cut. The cumulative sum is the distributed
    two-phase scan (``functions/prefix.py``): one range shuffle + per-
    partition offsets + an Arrow carry pass — NO single-partition window
    anywhere (plan-asserted), which is what makes the cut possible on a
    100 TB corpus where ``sum() OVER (ORDER BY ...)`` would serialize."""
    from horaedb_spark.functions import text as TX
    from horaedb_spark.functions.prefix import ordered_prefix_sum

    docs = load_table(spark, sf_dir, "documents")
    feats = TX.quality_features(F.col("text"))
    scored = docs.select(
        "doc_id",
        feats["n_tokens"].cast("long").alias("n_tokens"),
        F.round(feats["quality_score"], 6).alias("quality_score"),
    )
    budget = int(scored.agg(F.floor(0.4 * F.sum("n_tokens"))).first()[0])
    cum = ordered_prefix_sum(
        scored,
        [F.col("quality_score").desc(), F.col("doc_id").asc()],
        "n_tokens",
        out_col="cum_tokens",
        num_partitions=8,
    )
    return cum.filter(F.col("cum_tokens") <= budget).orderBy("cum_tokens")


@register(
    "pipeline_export_shards",
    oracle=r"""
    WITH s AS (
      SELECT doc_id,
             len(string_split_regex(text, '\s+')) AS n_tokens,
             (strpos('0123456789abcdef',
                     substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) % 8
               AS shard,
             md5('shuffle:' || CAST(doc_id AS VARCHAR)) AS skey
      FROM documents
    ), ranked AS (
      SELECT doc_id, n_tokens, shard,
             row_number() OVER (PARTITION BY shard ORDER BY skey, doc_id) AS rk
      FROM s
    )
    SELECT CAST(shard AS BIGINT) AS shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           CAST(sum(doc_id) AS BIGINT) AS id_checksum,
           CAST(sum(rk * doc_id) AS BIGINT) AS order_checksum
    FROM ranked GROUP BY shard ORDER BY shard
    """,
)
def pipeline_export_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The export step that precedes training: deterministic pseudo-random
    global shuffle + 8-way sharding. ``order_checksum`` = sum(rank x id)
    pins the exact within-shard permutation, so the shuffle itself is
    hash-verified against the oracle — not just shard membership. All work
    is per-shard (window partitioned by shard); no global sort exists."""
    from horaedb_spark.functions import text as TX
    from horaedb_spark.functions.sampling import export_shards

    docs = load_table(spark, sf_dir, "documents")
    sh = export_shards(
        docs.select("doc_id", TX.token_count("text").cast("long").alias("n_tokens")),
        "doc_id",
        num_shards=8,
    )
    return (
        sh.groupBy("shard")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.sum("doc_id").cast("long").alias("id_checksum"),
            F.sum(F.col("shard_rank") * F.col("doc_id")).cast("long").alias("order_checksum"),
        )
        .orderBy("shard")
    )

@register(
    "pipeline_weighted_resample",
    oracle="""
    WITH w AS (
      SELECT doc_id, source,
             greatest(1, length(text) // 50) AS wt
      FROM documents
    ), cum AS (
      SELECT doc_id, source, wt,
             sum(wt) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS c
      FROM w
    ), tot AS (SELECT max(c) AS W FROM cum),
    draws AS (
      SELECT doc_id, source,
             least(greatest((2 * 200 * c + W - 1) // (2 * W), 0), 200)
             - least(greatest((2 * 200 * (c - wt) + W - 1) // (2 * W), 0), 200)
               AS n_draws
      FROM cum, tot
    )
    SELECT source,
           CAST(sum(n_draws) AS BIGINT) AS n_drawn,
           CAST(sum(doc_id * n_draws) AS BIGINT) AS id_checksum
    FROM draws WHERE n_draws > 0
    GROUP BY source ORDER BY source
    """,
)
def pipeline_weighted_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted systematic resampling (the mixture re-weighting draw step):
    200 evenly spaced thresholds over the cumulative token-weight line,
    each document drawn once per threshold inside its interval —
    integer-exact selection over the DISTRIBUTED ordered prefix sum (no
    float order keys, no SinglePartition stage), so the exact draw
    multiset hash-matches the SQL replay. Per-source draw counts and id
    checksums pin membership, not just totals."""
    from horaedb_spark.functions.sampling import weighted_systematic_sample

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.greatest(F.lit(1), (F.length("text") / 50).cast("long")).alias("wt"),
    )
    out = weighted_systematic_sample(docs, "doc_id", "wt", n_picks=200)
    return (
        out.groupBy("source")
        .agg(
            F.sum("n_draws").cast("long").alias("n_drawn"),
            F.sum(F.col("doc_id") * F.col("n_draws")).cast("long").alias("id_checksum"),
        )
        .orderBy("source")
    )

