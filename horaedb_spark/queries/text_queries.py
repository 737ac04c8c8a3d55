"""Text-analysis queries over ``documents`` (LLM-pipeline surface), each
oracle-gated: token counting (whitespace + BPE-ish), quality scoring,
language-ID heuristic, document fingerprinting."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from horaedb_spark.functions import text as TX
from horaedb_spark.queries.registry import register
from horaedb_spark.queries.tables import load_table

# the stopword literals, SQL-rendered once so both sides share one source
def _sql_list(words: tuple[str, ...]) -> str:
    return ", ".join(f"'{w}'" for w in words)


_EN = _sql_list(TX.LANG_STOPWORDS["en"])
_DE = _sql_list(TX.LANG_STOPWORDS["de"])
_ES = _sql_list(TX.LANG_STOPWORDS["es"])
_FR = _sql_list(TX.LANG_STOPWORDS["fr"])


@register(
    "text_token_stats",
    oracle=r"""
    WITH w AS (SELECT doc_id, n_chars, string_split_regex(text, '\s+') AS words, text
               FROM documents)
    SELECT doc_id, n_chars,
           len(words) AS n_tokens,
           CAST(list_sum([CAST(ceil(len(x) / 4.0) AS INT) FOR x IN words])
             + (length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')))
             AS BIGINT) AS bpe_ish_tokens
    FROM w ORDER BY doc_id
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish sub-word estimate
    (ceil(len/4) pieces per word + punctuation marks)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        "n_chars",
        TX.token_count("text").alias("n_tokens"),
        TX.bpe_ish_token_count("text").alias("bpe_ish_tokens"),
    ).orderBy("doc_id")


@register(
    "text_quality_score",
    oracle=rf"""
    WITH w AS (
      SELECT doc_id, text, string_split_regex(text, '\s+') AS words FROM documents
    ), feats AS (
      SELECT doc_id,
             length(text) AS n_chars,
             len(words) AS n_tokens,
             len(list_filter(words, x -> x IN ({_EN}))) AS sw_hits,
             length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')) AS punct
      FROM w
    )
    SELECT doc_id, n_tokens,
           round(CAST(sw_hits AS DOUBLE) / n_tokens, 6) AS stopword_ratio,
           round(least(n_tokens / 64.0, 1.0) * 0.4
                 + least(CAST(sw_hits AS DOUBLE) / n_tokens * 4.0, 1.0) * 0.3
                 + (1.0 - least(CAST(punct AS DOUBLE) / n_chars * 10.0, 1.0)) * 0.3,
                 6) AS quality_score
    FROM feats ORDER BY doc_id
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: blended length / stopword-ratio / punctuation-density
    score in [0,1]."""
    docs = load_table(spark, sf_dir, "documents")
    feats = TX.quality_features(F.col("text"))
    return docs.select(
        "doc_id",
        feats["n_tokens"].alias("n_tokens"),
        F.round(feats["stopword_ratio"], 6).alias("stopword_ratio"),
        F.round(feats["quality_score"], 6).alias("quality_score"),
    ).orderBy("doc_id")


@register(
    "text_lang_id",
    oracle=rf"""
    WITH w AS (
      SELECT doc_id, string_split_regex(text, '\s+') AS words FROM documents
    ), scores AS (
      SELECT doc_id,
             len(list_filter(words, x -> x IN ({_EN}))) AS s_en,
             len(list_filter(words, x -> x IN ({_DE}))) AS s_de,
             len(list_filter(words, x -> x IN ({_ES}))) AS s_es,
             len(list_filter(words, x -> x IN ({_FR}))) AS s_fr
      FROM w
    ), pred AS (
      SELECT doc_id,
             CASE WHEN greatest(s_en, s_de, s_es, s_fr) <= 0 THEN 'und'
                  WHEN s_en = greatest(s_en, s_de, s_es, s_fr) THEN 'en'
                  WHEN s_de = greatest(s_en, s_de, s_es, s_fr) THEN 'de'
                  WHEN s_es = greatest(s_en, s_de, s_es, s_fr) THEN 'es'
                  ELSE 'fr' END AS lang_pred
      FROM scores
    )
    SELECT lang_pred, count(*) AS n_docs FROM pred GROUP BY lang_pred
    ORDER BY lang_pred
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID n-gram/stopword heuristic: per-language function-word hit
    counts, argmax with fixed tie order."""
    docs = load_table(spark, sf_dir, "documents")
    pred = docs.select(TX.predict_lang(TX.words("text")).alias("lang_pred"))
    return pred.groupBy("lang_pred").agg(F.count("*").alias("n_docs")).orderBy("lang_pred")


@register(
    "text_fingerprint",
    oracle=r"""
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint
    FROM documents ORDER BY doc_id
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: md5 over casefolded, whitespace-collapsed text."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", TX.normalized_fingerprint("text").alias("fingerprint")
    ).orderBy("doc_id")


@register(
    "text_redact_pii",
    oracle=r"""
    WITH planted AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.com or https://ex.com/d/' || CAST(doc_id AS VARCHAR)
                  || ' call 555-123-4567' AS text
      FROM documents
    ), red AS (
      SELECT doc_id,
             regexp_replace(
               regexp_replace(
                 regexp_replace(text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[REDACTED]', 'g'),
                 'https?://[^\s]+', '[REDACTED]', 'g'),
               '\+?\d{3}[-. ]\d{3,4}[-. ]\d{4}', '[REDACTED]', 'g') AS redacted,
             text
      FROM planted
    )
    SELECT doc_id, md5(redacted) AS redacted_md5,
           length(text) - length(redacted) AS chars_removed,
           (length(redacted) - length(replace(redacted, '[REDACTED]', '')))
             // length('[REDACTED]') AS n_redactions
    FROM red ORDER BY doc_id
    """,
)
def text_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction pass: documents get deterministic planted emails / URLs /
    phone numbers (the synthetic corpus has none), then ``redact_pii`` scrubs
    them with chained replace-all regexes. Verified by md5 of the redacted
    text plus removed-char and redaction counts — byte-exact across engines."""
    docs = load_table(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or https://ex.com/d/"),
            F.col("doc_id").cast("string"),
            F.lit(" call 555-123-4567"),
        ).alias("text"),
    )
    red = planted.select(
        "doc_id",
        "text",
        TX.redact_pii("text").alias("redacted"),
    )
    marker_len = len("[REDACTED]")
    return red.select(
        "doc_id",
        F.md5("redacted").alias("redacted_md5"),
        (F.length("text") - F.length("redacted")).alias("chars_removed"),
        (
            (F.length("redacted") - F.length(F.replace(F.col("redacted"), F.lit("[REDACTED]"), F.lit(""))))
            / F.lit(marker_len)
        ).cast("long").alias("n_redactions"),
    ).orderBy("doc_id")


@register(
    "text_repetition_filter",
    oracle=r"""
    WITH w AS (
      SELECT doc_id, string_split_regex(text, '\s+') AS w FROM documents
    ), g AS (
      SELECT doc_id, w,
             CASE WHEN len(w) >= 2
                  THEN [array_to_string(w[i:i+1], ' ')
                        FOR i IN generate_series(1, len(w)-1)]
                  ELSE [array_to_string(w, ' ')] END AS g
      FROM w
    ), feats AS (
      SELECT doc_id,
             len(w) AS n_words,
             floor((CAST(1.0 AS DOUBLE)
                    - len(list_distinct(w)) * 1.0 / len(w)) * 1e6 + 0.5) / 1e6
               AS dup_word_frac,
             floor((list_max([len(list_filter(g, y -> y = x))
                              FOR x IN list_distinct(g)])
                    * 1.0 / len(g)) * 1e6 + 0.5) / 1e6
               AS top_gram_frac
      FROM g
    )
    SELECT doc_id, n_words, dup_word_frac, top_gram_frac,
           dup_word_frac <= 0.6 AND top_gram_frac <= 0.05 AS keep
    FROM feats ORDER BY doc_id
    """,
)
def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality filter: duplicate-word fraction and
    top-bigram fraction per document, plus the keep/reject decision. Fully
    row-local column expressions — the whole filter is a scan with zero
    exchanges, which is exactly what you want for a 100 TB quality pass.

    The keep decision is derived in a SECOND projection from the already-
    computed fraction columns: reusing the `feats` expression objects would
    re-evaluate the whole split/sort/fold pipeline per reference (Spark
    CSEs cheap expressions only), measured 2x on the full query."""
    docs = load_table(spark, sf_dir, "documents")
    feats = TX.repetition_features("text", k=2)
    scored = docs.select(
        "doc_id",
        feats["n_words"].alias("n_words"),
        feats["dup_word_frac"].alias("dup_word_frac"),
        feats["top_gram_frac"].alias("top_gram_frac"),
    )
    return scored.withColumn(
        "keep",
        (F.col("dup_word_frac") <= 0.6) & (F.col("top_gram_frac") <= 0.05),
    ).orderBy("doc_id")


@register(
    "text_boilerplate_ngrams",
    oracle=r"""
    WITH w AS (
      SELECT doc_id, string_split_regex(text, '\s+') AS w FROM documents
    ), g AS (
      SELECT doc_id,
             unnest(CASE WHEN len(w) >= 3
                    THEN list_distinct([array_to_string(w[i:i+2], ' ')
                                        FOR i IN generate_series(1, len(w)-2)])
                    ELSE [array_to_string(w, ' ')] END) AS gram
      FROM w
    ), hv AS (
      SELECT gram FROM (SELECT gram, count(*) AS df FROM g GROUP BY gram)
      WHERE df >= 4
    ), tot AS (
      SELECT doc_id, count(*) AS n_grams FROM g GROUP BY doc_id
    ), bl AS (
      SELECT g.doc_id, count(*) AS n_boilerplate
      FROM g JOIN hv USING (gram) GROUP BY g.doc_id
    )
    SELECT t.doc_id, CAST(t.n_grams AS BIGINT) AS n_grams,
           CAST(coalesce(b.n_boilerplate, 0) AS BIGINT) AS n_boilerplate,
           floor(coalesce(b.n_boilerplate, 0) / t.n_grams * 1e6 + 0.5) / 1e6
             AS boiler_frac
    FROM tot t LEFT JOIN bl b USING (doc_id) ORDER BY t.doc_id
    """,
)
def text_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-boilerplate pass: trigrams shared by >= 4 documents are
    boilerplate; per-doc boilerplate gram counts and fraction. The heavy
    set broadcasts back as a semi-join, so the corpus-sized gram stream
    shuffles once (on md5 digests)."""
    from horaedb_spark.functions.text import boilerplate_ngram_stats

    docs = load_table(spark, sf_dir, "documents")
    return boilerplate_ngram_stats(docs, "doc_id", "text", k=3, min_docs=4).orderBy(
        "doc_id"
    )


@register(
    "text_bpe_pairs",
    oracle=r"""
    WITH w AS (
      SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS w FROM documents
    ), wf AS (
      SELECT w, count(*) AS wn FROM w WHERE length(w) >= 2 GROUP BY w
    ), p AS (
      SELECT unnest([substr(w, i, 2) FOR i IN generate_series(1, length(w) - 1)]) AS pair,
             wn
      FROM wf
    )
    SELECT pair, CAST(sum(wn) AS BIGINT) AS cnt
    FROM p GROUP BY pair ORDER BY cnt DESC, pair LIMIT 20
    """,
)
def text_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer induction, stage 1: the top-20 adjacent character pairs by
    corpus frequency — the first BPE merge candidates. The corpus collapses
    to a word-frequency table before pair explosion, so the expensive
    aggregate runs over vocabulary-sized input (the real-world BPE training
    layout)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        TX.bpe_pair_counts(docs, "text")
        .orderBy(F.desc("cnt"), "pair")
        .limit(20)
    )


@register(
    "text_char_entropy",
    oracle=r"""
    WITH ch AS (
      SELECT doc_id,
             unnest([substr(text, i, 1) FOR i IN generate_series(1, length(text))]) AS ch
      FROM documents WHERE length(text) > 0
    ), pc AS (
      SELECT doc_id, ch, count(*) AS c FROM ch GROUP BY doc_id, ch
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_distinct_chars,
           round(log2(sum(c)) - sum(c * log2(c)) / sum(c), 4) + 0 AS char_entropy
    FROM pc GROUP BY doc_id ORDER BY doc_id
    """,
)
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-distribution Shannon entropy per document — the gibberish /
    compression-artifact quality gate. Integer count aggregates everywhere;
    the single float combination happens once per document at the end."""
    docs = load_table(spark, sf_dir, "documents")
    return TX.char_entropy(docs, "doc_id", "text").orderBy("doc_id")


@register(
    "text_bigram_lm",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, lower(text) AS t FROM documents WHERE length(text) >= 2
    ), bg AS (
      SELECT doc_id,
             unnest([substr(t, i, 2) FOR i IN generate_series(1, length(t) - 1)]) AS bg
      FROM t
    ), model AS (
      SELECT bg, count(*) AS c FROM bg GROUP BY bg
    ), starts AS (
      SELECT substr(bg, 1, 1) AS c1, sum(c) AS tot FROM model GROUP BY c1
    ), uni AS (
      SELECT DISTINCT unnest([substr(t, i, 1) FOR i IN generate_series(1, length(t))]) AS ch
      FROM t
    ), v AS (SELECT count(*) AS v FROM uni),
    bgd AS (
      -- per-(doc, bigram) counts: the model probe and log2 run once per
      -- DISTINCT bigram per doc, mirroring the kernel
      SELECT doc_id, bg, count(*) AS dc FROM bg GROUP BY doc_id, bg
    )
    SELECT b.doc_id,
           CAST(sum(b.dc) AS BIGINT) AS n_bigrams,
           round(-sum(b.dc * log2((m.c + 1.0) / (s.tot + v.v))) / sum(b.dc), 4)
             + 0 AS avg_nll
    FROM bgd b
    JOIN model m USING (bg)
    JOIN starts s ON s.c1 = substr(b.bg, 1, 1)
    CROSS JOIN v
    GROUP BY b.doc_id ORDER BY b.doc_id
    """,
)
def text_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-style quality filter: score every document by its average
    negative log2-likelihood under a char-bigram LM trained on the corpus
    itself (add-1 smoothing over the observed alphabet). The model table is
    alphabet²-bounded so it broadcasts into the scoring join — training and
    scoring are each one corpus pass regardless of scale."""
    docs = load_table(spark, sf_dir, "documents")
    return TX.bigram_lm_scores(docs, "doc_id", "text").orderBy("doc_id")


@register(
    "text_tfidf_keywords",
    oracle=r"""
    WITH w AS (
      SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS term
      FROM documents
    ), tf AS (
      SELECT doc_id, term, count(*) AS tf FROM w GROUP BY 1, 2
    ), df AS (
      SELECT term, count(*) AS df FROM tf GROUP BY term
    ), n AS (
      SELECT count(*) AS n_docs FROM documents
    ), scored AS (
      SELECT tf.doc_id, tf.term,
             tf.tf * ln(n.n_docs * 1.0 / df.df) AS score
      FROM tf JOIN df USING (term), n
    ), ranked AS (
      SELECT doc_id, term, score,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, term) AS rk
      FROM scored
    )
    SELECT doc_id, rk, term, round(score, 6) AS tfidf
    FROM ranked WHERE rk <= 3 AND doc_id < 50
    ORDER BY doc_id, rk
    """,
)
def text_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document TF-IDF keyword extraction (top-3 terms, docs < 50 for a
    bounded result): the classic relevance weighting behind search and
    corpus labeling. Plan: one explode → (doc, term) hash aggregate, the
    document-frequency table derived from it (terms-domain sized) joins
    back on the fixed-width term key, and the per-doc top-3 runs as a
    map-side WindowGroupLimit. The idf ratio is one IEEE expression over
    exact counts, identical on both engines; ties break lexically."""
    docs = load_table(spark, sf_dir, "documents")
    w = docs.select("doc_id", F.explode(TX.words("text")).alias("term"))
    tf = w.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            (F.col("tf") * F.log(F.col("n_docs") / F.col("df"))).alias("score"),
        )
    )
    from pyspark.sql.window import Window as _W

    rk = F.row_number().over(
        _W.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    )
    return (
        scored.withColumn("rk", rk)
        .filter((F.col("rk") <= 3) & (F.col("doc_id") < 50))
        .select("doc_id", "rk", "term", F.round("score", 6).alias("tfidf"))
        .orderBy("doc_id", "rk")
    )


def _bpe_oracle(n_merges: int = 4) -> str:
    """Unrolled DuckDB replica of the iterative merge loop: each step is an
    argmax CTE (count desc, pair asc) + a replace CTE over the spaced
    vocabulary — identical ranking and left-to-right non-overlapping replace
    semantics as the Spark side."""
    pair_src = (
        "SELECT wn, unnest(list_transform("
        "generate_series(1, len(str_split(sp, ' ')) - 1), "
        "i -> str_split(sp, ' ')[i] || '|' || str_split(sp, ' ')[i + 1])) AS pair "
        "FROM v{k} WHERE len(str_split(sp, ' ')) > 1"
    )
    steps = []
    for k in range(n_merges):
        steps.append(
            f", p{k} AS (SELECT pair, sum(wn) AS cnt FROM ({pair_src.format(k=k)}) GROUP BY pair)"
            f", m{k} AS (SELECT pair FROM p{k} ORDER BY cnt DESC, pair LIMIT 1)"
            f", v{k + 1} AS ("
            f"  SELECT w, wn, trim(replace(' ' || sp || ' ',"
            f"    ' ' || replace(m{k}.pair, '|', ' ') || ' ',"
            f"    ' ' || replace(m{k}.pair, '|', '') || ' ')) AS sp"
            f"  FROM v{k}, m{k})"
        )
    return (
        """
    WITH words AS (
      SELECT doc_id, w FROM (
        SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
        FROM documents
      ) WHERE w != ''
    ), v0 AS (
      SELECT w, count(*) AS wn,
             trim(regexp_replace(w, '(.)', '\\1 ', 'g')) AS sp
      FROM words GROUP BY w
    )
    """
        + "\n".join(steps)
        + f"""
    , final AS (SELECT w, len(str_split(sp, ' ')) AS ntok FROM v{n_merges})
    SELECT words.doc_id,
           CAST(sum(length(words.w)) AS BIGINT) AS chars_before,
           CAST(sum(final.ntok) AS BIGINT) AS tokens_after
    FROM words JOIN final ON words.w = final.w
    GROUP BY words.doc_id ORDER BY words.doc_id
    """
    )


def _bpe_batched_oracle(n_merges: int = 8, batch: int = 4, candidates: int = 40) -> str:
    """Unrolled replica of the BATCHED merge loop: per round, a recursive-CTE
    greedy walk over the ranked pair list takes up to ``batch`` pairs that
    share no symbol with an earlier taken pair, then one chained-replace CTE
    applies them in taken order — identical trajectory to
    ``bpe_learn_and_apply_batched``."""
    pair_src = (
        "SELECT wn, unnest(list_transform("
        "generate_series(1, len(str_split(sp, ' ')) - 1), "
        "i -> str_split(sp, ' ')[i] || '|' || str_split(sp, ' ')[i + 1])) AS pair "
        "FROM v{k} WHERE len(str_split(sp, ' ')) > 1"
    )
    steps = []
    rounds = []
    done = 0
    r = 0
    while done < n_merges:
        rounds.append(min(batch, n_merges - done))
        done += rounds[-1]
        r += 1
    for k, kk in enumerate(rounds):
        take = (
            f"(NOT list_has_any(g.used, str_split(r.pair, '|')) "
            f"AND len(g.taken) < {kk})"
        )
        rep = "' ' || sp || ' '"
        for j in range(1, kk + 1):
            pat = (
                f"coalesce(' ' || replace(sel{k}.taken[{j}], '|', ' ') || ' ',"
                f" chr(1))"
            )
            rpl = (
                f"coalesce(' ' || replace(sel{k}.taken[{j}], '|', '') || ' ',"
                f" chr(2))"
            )
            rep = f"replace({rep}, {pat}, {rpl})"
        steps.append(
            f", p{k} AS MATERIALIZED (SELECT pair, sum(wn) AS cnt FROM ({pair_src.format(k=k)}) GROUP BY pair)"
            f", r{k} AS MATERIALIZED (SELECT pair, cnt, row_number() OVER (ORDER BY cnt DESC, pair) AS rnk"
            f"           FROM p{k} ORDER BY rnk LIMIT {candidates})"
            f", g{k}(rnk, used, taken) AS ("
            f"    SELECT 0, CAST([] AS VARCHAR[]), CAST([] AS VARCHAR[])"
            f"    UNION ALL"
            f"    SELECT r.rnk,"
            f"           CASE WHEN {take} THEN g.used || str_split(r.pair, '|') ELSE g.used END,"
            f"           CASE WHEN {take} THEN g.taken || [r.pair] ELSE g.taken END"
            f"    FROM g{k} g JOIN r{k} r ON r.rnk = g.rnk + 1)"
            f", sel{k} AS MATERIALIZED (SELECT taken FROM g{k} ORDER BY rnk DESC LIMIT 1)"
            f", v{k + 1} AS MATERIALIZED (SELECT w, wn, trim({rep}) AS sp FROM v{k}, sel{k})"
        )
    return (
        """
    WITH RECURSIVE words AS (
      SELECT doc_id, w FROM (
        SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
        FROM documents
      ) WHERE w != ''
    ), v0 AS (
      SELECT w, count(*) AS wn,
             trim(regexp_replace(w, '(.)', '\\1 ', 'g')) AS sp
      FROM words GROUP BY w
    )
    """
        + "\n".join(steps)
        + f"""
    , final AS (SELECT w, len(str_split(sp, ' ')) AS ntok FROM v{len(rounds)})
    SELECT words.doc_id,
           CAST(sum(length(words.w)) AS BIGINT) AS chars_before,
           CAST(sum(final.ntok) AS BIGINT) AS tokens_after
    FROM words JOIN final ON words.w = final.w
    GROUP BY words.doc_id ORDER BY words.doc_id
    """
    )


@register("text_bpe_batched", oracle=_bpe_batched_oracle())
def text_bpe_batched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched BPE (8 merges in rounds of 4 non-conflicting merges): the
    production answer to Sennrich's one-merge-per-round sequentiality — a
    32k-vocab train drops from 32k driver rounds to ~32k/batch. The greedy
    conflict-free selection and chained application are deterministic, so
    the recursive-CTE oracle replays the identical trajectory."""
    docs = load_table(spark, sf_dir, "documents")
    return TX.bpe_learn_and_apply_batched(
        docs, "doc_id", "text", n_merges=8, batch=4
    ).orderBy("doc_id")


@register("text_bpe_apply", oracle=_bpe_oracle())
def text_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative BPE: learn 4 merges on the corpus (Sennrich alg — pair
    counts and merge application run over the VOCABULARY table, so each
    iteration is O(|vocab|) whatever the corpus size; only the single
    winning pair crosses to the driver per round), then tokenize every
    document with the learned merges via one broadcast join. Completes the
    tokenizer-training story started by text_bpe_pairs (stats only)."""
    docs = load_table(spark, sf_dir, "documents")
    return TX.bpe_learn_and_apply(docs, "doc_id", "text", n_merges=4).orderBy(
        "doc_id"
    )
