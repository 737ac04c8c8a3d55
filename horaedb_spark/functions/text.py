"""Text-analysis operators for the LLM-data-pipeline surface (BASELINE.json
north star; not in the reference — SURVEY.md §2 extension table).

Everything here is a *column expression builder* over JVM-side built-ins
(split/transform/aggregate/md5) — no Python UDFs, so the operators ride
whole-stage codegen and scale with the cluster. Hash-bearing operators use
``md5`` (present and bit-identical in Spark and DuckDB) so every one of them
is verifiable against the SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Function-word lists for the language-ID heuristic (tiny on purpose: the
# heuristic is the operator; the lists are config).
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "von"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "por", "con", "para"),
    "fr": ("le", "la", "de", "et", "un", "être", "que", "pour", "dans", "ce"),
}

QUALITY_STOPWORDS = LANG_STOPWORDS["en"]


def words(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, r"\s+")


def token_count(text: Column | str) -> Column:
    """Whitespace token count (the cheap tokenizer); see also
    ``bpe_ish_token_count`` for the regex sub-word variant."""
    return F.size(words(text))


def bpe_ish_token_count(text: Column | str) -> Column:
    """BPE-flavored proxy: count word-piece-ish units — alphanumeric runs
    split every 4 chars plus punctuation marks, the standard ~4-chars/token
    heuristic made deterministic: ceil(len(word)/4) per word + punct count."""
    c = F.col(text) if isinstance(text, str) else text
    word_pieces = F.aggregate(
        words(c),
        F.lit(0),
        lambda acc, w: acc + F.ceil(F.length(w) / F.lit(4.0)).cast("int"),
    )
    punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return (word_pieces + punct).alias("bpe_ish_tokens")


def word_grams(text: Column | str, k: int = 3) -> Column:
    """Word k-grams in document order (NOT deduplicated); short docs fall
    back to the whole text as a single gram.

    Built with slice + zip_with rather than an index-lambda: element_at
    inside a transform() lambda re-evaluates the outer split() per *element*
    (no CSE across the lambda boundary), which made shingling ~10x slower
    than the hashing it feeds."""
    w = words(text)
    n = F.size(w)
    shifted = [F.slice(w, 1 + j, n - (k - 1)) for j in range(k)]
    grams = shifted[0]
    for nxt in shifted[1:]:
        grams = F.zip_with(grams, nxt, lambda a, b: F.concat_ws(" ", a, b))
    return F.when(n >= k, grams).otherwise(F.array(F.array_join(w, " ")))


def shingles(text: Column | str, k: int = 3) -> Column:
    """Distinct word k-gram shingles (see ``word_grams`` for construction)."""
    return F.array_distinct(word_grams(text, k))


def repetition_features(text: Column | str, k: int = 2) -> dict[str, Column]:
    """Gopher-style repetition signals, fully row-local (zero shuffle):

    - ``dup_word_frac``: 1 - distinct(words)/len(words) — how much of the doc
      is repeated vocabulary;
    - ``top_gram_frac``: occurrences of the most frequent word k-gram over
      all k-grams — the "stuck in a loop" boilerplate detector.

    The top-gram count is computed as the longest equal-run in the SORTED
    gram array — one array_sort plus one linear fold per row. (The naive
    ``transform(distinct(g), x -> size(filter(g, ...)))`` form is not just
    quadratic: Spark does no CSE across lambda boundaries, so the whole
    split/slice/zip_with pipeline behind ``g`` re-evaluates per element —
    measured 20x slower at sf0.1.) Everything stays a pure map over the
    corpus — at 100 TB the filter runs as a scan with no exchange, unlike
    the explode + groupBy formulation whose shuffle would dominate.
    Fractions use engine-portable rounding: floor(x*1e6 + 0.5)/1e6."""
    c = F.col(text) if isinstance(text, str) else text
    w = words(c)
    g = word_grams(c, k)

    def _run_step(acc: Column, x: Column) -> Column:
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    top = F.aggregate(
        F.array_sort(g),
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        _run_step,
        lambda acc: acc["best"],
    )

    def _round6(col: Column) -> Column:
        return F.floor(col * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)

    return {
        "n_words": F.size(w),
        "dup_word_frac": _round6(
            F.lit(1.0) - F.size(F.array_distinct(w)) / F.size(w)
        ),
        "top_gram_frac": _round6(top / F.size(g)),
    }


def minhash_signature(shingle_col: Column, num_hashes: int = 16) -> Column:
    """MinHash signature: for hash seed k, ``min(md5(k || ':' || shingle))``
    — the lexicographic min over hex digests is a valid permutation-min and is
    reproducible in any engine with md5."""
    # NB: a plain `lambda s, k=k:` must NOT be used here — PySpark reads the
    # lambda arity, and a defaulted second arg turns it into an (element,
    # index) lambda, silently binding k to the array index.
    def hash_k(k: int):
        return lambda s: F.md5(F.concat(F.lit(f"{k}:"), s))

    return F.array(
        *[F.array_min(F.transform(shingle_col, hash_k(k))) for k in range(num_hashes)]
    )


def lsh_band_signatures(sig_col: Column, bands: int, rows: int) -> Column:
    """Slice a minhash signature into ``bands`` concatenated band keys:
    array of (band_index, band_sig) structs ready for explode + bucket join."""
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws("", F.slice(sig_col, b * rows + 1, rows)).alias("sig"),
            )
            for b in range(bands)
        ]
    )


def simhash_bits(token_col: Column, num_bits: int = 16) -> Column:
    """SimHash fingerprint as a bit string: bit i is the sign of
    ``sum over tokens of (+1 if md5(i:token) starts < '8' else -1)`` —
    near-identical token multisets flip few bits. md5-derived pseudo-random
    projections keep it engine-portable."""
    def fold_bit(i: int):
        return lambda acc, t: acc + F.when(
            F.substring(F.md5(F.concat(F.lit(f"{i}:"), t)), 1, 1) < "8", F.lit(1)
        ).otherwise(F.lit(-1))

    def bit(i: int) -> Column:
        contrib = F.aggregate(token_col, F.lit(0), fold_bit(i))
        return F.when(contrib >= 0, F.lit("1")).otherwise(F.lit("0"))

    return F.concat(*[bit(i) for i in range(num_bits)])


def normalized_fingerprint(text: Column | str) -> Column:
    """Document fingerprint: md5 of casefolded, whitespace-collapsed text."""
    c = F.col(text) if isinstance(text, str) else text
    return F.md5(F.trim(F.regexp_replace(F.lower(c), r"\s+", " ")))


def stopword_hits(word_col: Column, stopwords: tuple[str, ...]) -> Column:
    """Occurrences (with repeats) of any stopword."""
    sw = F.array(*[F.lit(s) for s in stopwords])
    return F.size(F.filter(word_col, lambda w: F.array_contains(sw, w)))


def quality_features(text: Column | str) -> dict[str, Column]:
    """Deterministic quality-scoring features: length, token stats, punct and
    stopword ratios, plus a single blended score in [0, 1]."""
    c = F.col(text) if isinstance(text, str) else text
    w = words(c)
    n_tokens = F.size(w)
    n_chars = F.length(c)
    punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    sw_ratio = stopword_hits(w, QUALITY_STOPWORDS) / n_tokens
    mean_tok = (
        F.aggregate(w, F.lit(0), lambda acc, x: acc + F.length(x)) / n_tokens
    )
    punct_ratio = punct / n_chars
    score = (
        F.least(n_tokens / F.lit(64.0), F.lit(1.0)) * 0.4
        + F.least(sw_ratio * 4.0, F.lit(1.0)) * 0.3
        + (1.0 - F.least(punct_ratio * 10.0, F.lit(1.0))) * 0.3
    )
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "mean_token_len": mean_tok,
        "punct_ratio": punct_ratio,
        "stopword_ratio": sw_ratio,
        "quality_score": score,
    }


def lang_scores(word_col: Column) -> dict[str, Column]:
    return {lang: stopword_hits(word_col, sws) for lang, sws in LANG_STOPWORDS.items()}


def predict_lang(word_col: Column) -> Column:
    """Language-ID heuristic: argmax of stopword hits with a fixed preference
    order (en > de > es > fr) on ties; 'und' (undetermined) when nothing hits."""
    s = lang_scores(word_col)
    best = F.greatest(*s.values())
    out = F.when(best <= 0, F.lit("und"))
    for lang in ("en", "de", "es", "fr"):
        out = out.when(s[lang] == best, F.lit(lang))
    return out


# Redaction patterns: each must mean the same thing to Spark (Java regex) and
# DuckDB (RE2) — keep to the common subset (no backrefs, no lookaround).
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "url": r"https?://[^\s]+",
    "phone": r"\+?\d{3}[-. ]\d{3,4}[-. ]\d{4}",
}


def redact_pii(
    text: Column | str,
    replacement: str = "[REDACTED]",
    patterns: dict[str, str] | None = None,
) -> Column:
    """Scrub PII-shaped substrings (emails, URLs, phone numbers) from a text
    column — a standard training-data hygiene pass. Chained ``regexp_replace``
    built-ins (replace-all semantics), so the operator is pure codegen'd
    JVM work: no UDF, no shuffle, linear scan per row."""
    c = F.col(text) if isinstance(text, str) else text
    for pat in (patterns or PII_PATTERNS).values():
        c = F.regexp_replace(c, pat, replacement)
    return c


def chunk_windows(
    text: Column | str, window: int = 64, stride: int = 48
) -> Column:
    """Context-window chunking: split a document into word windows of
    ``window`` tokens every ``stride`` tokens (overlap = window - stride),
    the pass that turns variable-length documents into model-sized training
    sequences. Returns array<struct<chunk_idx, start, n_tokens, chunk>>.

    Pure row-local array arithmetic — at 100 TB the chunker is a scan whose
    output the caller explodes; no shuffle is introduced. Chunk count is
    integer math (1 + ceil(max(0, n-window)/stride)) so the layout is
    bit-identical on any engine."""
    w = words(text)
    n = F.size(w)
    extra = F.greatest(n - F.lit(window), F.lit(0))
    n_chunks = (
        F.lit(1)
        + F.floor((extra + F.lit(stride - 1)) / F.lit(stride)).cast("int")
    )
    return F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.alias("chunk_idx"),
            (i * stride + 1).alias("start"),
            F.least(F.lit(window), n - i * stride).alias("n_tokens"),
            F.array_join(F.slice(w, i * stride + 1, window), " ").alias("chunk"),
        ),
    )


def boilerplate_ngram_stats(
    df, id_col: str, text_col: str, k: int = 3, min_docs: int = 4
):
    """Corpus-level boilerplate detection (the C4/RefinedWeb repeated-
    passage pass): a word k-gram appearing in >= ``min_docs`` distinct
    documents is boilerplate; each document reports how much of it is made
    of such grams.

    Shape at scale: per-doc distinct shingles explode once and aggregate to
    document frequencies (map-side combined); the heavy set (df >= T) is
    orders of magnitude smaller than the gram table and BROADCASTS back as
    a semi-join — the corpus-sized gram stream shuffles exactly once, on
    the fixed-width md5 digest. Returns per-doc (n_grams, n_boilerplate,
    boiler_frac)."""
    from pyspark.sql import DataFrame as _DF  # noqa: F401

    g = df.select(
        F.col(id_col), F.explode(shingles(text_col, k)).alias("__g__")
    ).select(F.col(id_col), F.md5("__g__").alias("__h__"))
    heavy = (
        g.groupBy("__h__")
        .agg(F.count(F.lit(1)).alias("__df__"))
        .filter(F.col("__df__") >= min_docs)
        .select("__h__")
    )
    totals = g.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_grams"))
    boiler = (
        g.join(F.broadcast(heavy), "__h__", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_boilerplate"))
    )
    joined = totals.join(boiler, id_col, "left").na.fill({"n_boilerplate": 0})
    frac = F.floor(
        F.col("n_boilerplate") / F.col("n_grams") * F.lit(1e6) + F.lit(0.5)
    ) / F.lit(1e6)
    return joined.select(
        id_col, "n_grams", "n_boilerplate", frac.alias("boiler_frac")
    )


def bpe_pair_counts(docs: DataFrame, text_col: str, min_word_len: int = 2) -> DataFrame:
    """Byte-pair statistics — the first merge-candidate table of BPE
    tokenizer training. Exactly the distributed shape real BPE training
    uses: collapse the corpus to a word-frequency table FIRST (the heavy
    shuffle happens on words, whose cardinality is vocabulary-sized, not
    corpus-sized), then explode each distinct word into its adjacent
    character pairs weighted by the word's frequency. Two hash aggregates,
    no UDF; at 100 TB the pair aggregation input is |vocab| x avg_len rows
    regardless of corpus size. Returns (pair, cnt)."""
    wf = (
        docs.select(
            F.explode(F.split(F.lower(F.col(text_col)), "[^a-z]+")).alias("w")
        )
        .filter(F.length("w") >= min_word_len)
        .groupBy("w")
        .agg(F.count("*").alias("wn"))
    )
    return (
        wf.select(
            F.explode(
                F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
            ).alias("pair"),
            "wn",
        )
        .groupBy("pair")
        .agg(F.sum("wn").cast("long").alias("cnt"))
    )


def char_entropy(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document Shannon entropy of the character distribution (bits) —
    the classic gibberish / low-diversity quality gate. Computed from
    integer counts as log2(n) - sum(c*log2(c))/n, so the only float ops are
    the final per-doc combination (order-independent aggregates in between).
    Two key-partitioned hash aggregates on (doc, char); no UDF. Returns
    (id_col, n_distinct_chars, char_entropy rounded to 4)."""
    chars = docs.filter(F.length(text_col) > 0).select(
        F.col(id_col),
        # zero-width split: native per-char explode, no per-element lambda
        F.explode(F.split(F.col(text_col), "(?!^)")).alias("ch"),
    ).filter(F.col("ch") != "")  # Pattern.split keeps a trailing empty
    per = chars.groupBy(id_col, "ch").agg(F.count("*").alias("c"))
    return (
        per.groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_distinct_chars"),
            F.sum("c").alias("__n__"),
            F.sum(F.expr("c * log2(c)")).alias("__clog__"),
        )
        .select(
            id_col,
            "n_distinct_chars",
            F.round(F.expr("log2(__n__) - __clog__ / __n__"), 4).alias("char_entropy"),
        )
    )


def bigram_lm_scores(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Char-bigram language-model scoring — the perplexity-style quality
    filter (score docs by how "language-like" they are under a model trained
    on the corpus itself). Train: one corpus pass aggregates bigram counts —
    the model is alphabet²-bounded (a few KB) no matter the corpus size, so
    it BROADCASTS to the scoring join. Score: per-doc average negative
    log2-likelihood with add-1 smoothing over the observed alphabet. Two
    corpus passes total (model train, scoring) — the trained model is
    eagerly localCheckpointed so the scoring job broadcasts its blocks
    instead of re-aggregating the corpus, and the alphabet derives from
    the MODEL (every char of a len>=2 doc occupies some bigram position,
    so distinct bigram chars == distinct corpus chars) rather than a third
    per-character corpus explode — measured 7.0 -> 3.3 s at sf0.1. No
    UDF. Returns (id_col, n_bigrams, avg_nll)."""
    t = docs.filter(F.length(text_col) >= 2).select(
        F.col(id_col), F.lower(F.col(text_col)).alias("t")
    )
    # overlapping bigrams via a lookahead capture: one native regexp call per
    # row instead of an interpreted per-character substr lambda (~5x on the
    # sf0.1 corpus). [\s\S] because Java '.' skips newlines.
    bg = t.select(
        id_col,
        F.explode(F.expr(r"regexp_extract_all(t, '(?=([\\s\\S]{2}))', 1)")).alias("bg"),
    )
    model = bg.groupBy("bg").agg(F.count("*").alias("c")).localCheckpoint(
        eager=True
    )
    starts = model.groupBy(F.substring("bg", 1, 1).alias("c1")).agg(
        F.sum("c").alias("tot")
    )
    # observed alphabet size from the alphabet²-bounded model — a
    # blocks-resident aggregate, never a corpus pass
    v = (
        model.select(
            F.explode(
                F.array(F.substring("bg", 1, 1), F.substring("bg", 2, 1))
            ).alias("ch")
        )
        .distinct()
        .count()
    )
    # score per DISTINCT (doc, bigram) weighted by its occurrence count:
    # the model probes and log2 run once per distinct bigram per doc
    # (alphabet²-bounded) instead of once per character of the corpus
    bg_doc = bg.groupBy(id_col, "bg").agg(F.count("*").alias("dc"))
    scored = bg_doc.join(F.broadcast(model), "bg").join(
        F.broadcast(starts), F.substring("bg", 1, 1) == F.col("c1")
    )
    nll = -F.log2((F.col("c") + F.lit(1.0)) / (F.col("tot") + F.lit(float(v))))
    return scored.groupBy(id_col).agg(
        F.sum("dc").cast("long").alias("n_bigrams"),
        F.round(F.sum(F.col("dc") * nll) / F.sum("dc"), 4).alias("avg_nll"),
    )


def bpe_learn_and_apply(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n_merges: int = 4,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges on the corpus and tokenize with them —
    the real (Sennrich) algorithm in its distributed shape.

    The corpus collapses to a word-frequency table ONCE (the only
    corpus-sized shuffle); every merge iteration then runs two
    vocabulary-sized steps: (1) adjacent-pair counts weighted by word
    frequency, (2) argmax merge applied to the spaced representation via one
    string replace. Only the single winning pair row crosses to the driver
    per iteration (the codebook-to-driver pattern, same as k-means
    centroids). Ties break deterministically: count desc, pair asc.

    Returns one row per document: (id_col, chars_before, tokens_after) —
    character-token count vs post-merge token count. At 100 TB the per-
    iteration cost is O(|vocab|), independent of corpus size."""
    words = docs.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), "[^a-z]+")).alias("w"),
    ).filter(F.col("w") != "")
    vocab = words.groupBy("w").agg(F.count("*").alias("wn"))
    # 'hello' -> 'h e l l o' (spaced token sequence, boundary-free)
    spaced = vocab.withColumn(
        "sp", F.trim(F.regexp_replace("w", "(.)", "$1 "))
    ).persist()
    pair_expr = F.expr(
        """
        CASE WHEN size(split(sp, ' ')) > 1 THEN
          transform(sequence(1, size(split(sp, ' ')) - 1),
                    i -> concat(element_at(split(sp, ' '), i), '|',
                                element_at(split(sp, ' '), i + 1)))
        ELSE array() END
        """
    )
    for _ in range(n_merges):
        top = (
            spaced.select(F.explode(pair_expr).alias("pair"), "wn")
            .groupBy("pair")
            .agg(F.sum("wn").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("pair").asc())
            .first()
        )
        if top is None:
            break
        a, b = top["pair"].split("|")
        nxt = spaced.withColumn(
            "sp",
            F.trim(
                F.replace(
                    F.concat(F.lit(" "), F.col("sp"), F.lit(" ")),
                    F.lit(f" {a} {b} "),
                    F.lit(f" {a}{b} "),
                )
            ),
        ).persist()
        spaced.unpersist()
        spaced = nxt
    final = spaced.select(
        "w", F.size(F.split("sp", " ")).alias("__ntok__")
    )
    return (
        words.join(F.broadcast(final), "w")
        .groupBy(id_col)
        .agg(
            F.sum(F.length("w")).cast("long").alias("chars_before"),
            F.sum("__ntok__").cast("long").alias("tokens_after"),
        )
    )


def bpe_learn_and_apply_batched(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n_merges: int = 8,
    batch: int = 4,
    candidates: int = 40,
) -> DataFrame:
    """Batched BPE training: per driver round, take up to ``batch``
    NON-CONFLICTING merges (greedy over the top-``candidates`` pairs by
    (count desc, pair asc), skipping any pair sharing a symbol with one
    already taken this round) and apply them in one projection.

    This is the answer to Sennrich's inherent sequentiality at production
    vocab sizes: a 32k-merge train drops from 32k driver round-trips to
    ~32k/batch (VERDICT r3 "what's wrong" #3). The conflict rule keeps each
    round internally consistent (a taken merge never invalidates another
    taken pair's count); the divergence from strict one-at-a-time Sennrich
    is that a newly CREATED pair cannot win until the next round — with
    batch=1 the output is exactly ``bpe_learn_and_apply``. Selection and
    application are deterministic, so the SQL oracle replays the identical
    trajectory (recursive-CTE greedy selection, chained replaces).

    Same output contract as ``bpe_learn_and_apply``:
    (id_col, chars_before, tokens_after)."""
    words = docs.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), "[^a-z]+")).alias("w"),
    ).filter(F.col("w") != "")
    vocab = words.groupBy("w").agg(F.count("*").alias("wn"))
    spaced = vocab.withColumn(
        "sp", F.trim(F.regexp_replace("w", "(.)", "$1 "))
    ).persist()
    pair_expr = F.expr(
        """
        CASE WHEN size(split(sp, ' ')) > 1 THEN
          transform(sequence(1, size(split(sp, ' ')) - 1),
                    i -> concat(element_at(split(sp, ' '), i), '|',
                                element_at(split(sp, ' '), i + 1)))
        ELSE array() END
        """
    )
    merges_done = 0
    while merges_done < n_merges:
        k = min(batch, n_merges - merges_done)
        rows = (
            spaced.select(F.explode(pair_expr).alias("pair"), "wn")
            .groupBy("pair")
            .agg(F.sum("wn").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("pair").asc())
            .limit(candidates)
            .collect()
        )
        used: set[str] = set()
        taken: list[tuple[str, str]] = []
        for r in rows:
            a, b = r["pair"].split("|")
            if a in used or b in used:
                continue
            taken.append((a, b))
            used.update((a, b))
            if len(taken) == k:
                break
        if not taken:
            break
        expr = F.concat(F.lit(" "), F.col("sp"), F.lit(" "))
        for a, b in taken:
            expr = F.replace(expr, F.lit(f" {a} {b} "), F.lit(f" {a}{b} "))
        nxt = spaced.withColumn("sp", F.trim(expr)).persist()
        spaced.unpersist()
        spaced = nxt
        merges_done += len(taken)
    final = spaced.select("w", F.size(F.split("sp", " ")).alias("__ntok__"))
    return (
        words.join(F.broadcast(final), "w")
        .groupBy(id_col)
        .agg(
            F.sum(F.length("w")).cast("long").alias("chars_before"),
            F.sum("__ntok__").cast("long").alias("tokens_after"),
        )
    )
