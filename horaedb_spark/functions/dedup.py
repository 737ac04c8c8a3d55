"""Deduplication operator family (LLM-pipeline surface, SURVEY.md §2
extension table): exact, MinHash+LSH, SimHash, n-gram Jaccard, and
embedding-cosine near-dup.

Scale design: every near-dup path is *candidate-generation first* — LSH band
buckets (or another blocking key) bound the pair space, so the quadratic
verification only runs inside buckets. At 100 TB the band-bucket join is a
single shuffle on (band, sig); bucket skew (a viral duplicate cluster) is
AQE-split, and the verify stage is Jaccard on already-shingled arrays.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from horaedb_spark.functions.text import shingles


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup: keep the lowest id per identical text. ``min`` per group —
    NOT ``dropDuplicates`` (arbitrary row) — so the survivor is deterministic.

    Shuffle-width design: grouping on the raw text column would push the
    corpus' full bytes through the exchange; instead the group key is a
    ``(xxhash64(text), length(text))`` fingerprint — ~16 bytes/doc with
    map-side partial ``min`` — and only SUSPECT groups (fingerprint held by
    more than one row) are re-verified on the actual text, so at 100 TB the
    text column crosses the wire only for the duplicate-candidate sliver of
    the corpus. A fingerprint collision between different texts is caught by
    the verify stage, never collapsed silently."""
    fp, ln, n = "__fp__", "__ln__", "__n__"
    keyed = df.withColumn(fp, F.xxhash64(F.col(text_col))).withColumn(
        ln, F.length(F.col(text_col))
    )
    grp = (
        keyed.select(fp, ln, id_col)
        .groupBy(fp, ln)
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias(n))
    )
    solo_ids = grp.filter(F.col(n) == 1).select(id_col)
    multi_keys = grp.filter(F.col(n) > 1).select(fp, ln)
    multi_ids = (
        keyed.join(multi_keys, [fp, ln], "left_semi")
        .groupBy(fp, ln, text_col)
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return df.join(solo_ids.unionByName(multi_ids), id_col, "left_semi")


def minhash_band_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """(id, band, sig) LSH band-signature table for a corpus — the
    persistable dedup INDEX: production materializes this once for the
    existing corpus and joins each new batch against it."""
    rows = num_hashes // bands
    # Exploded/aggregate form rather than nested array expressions: a
    # 16-way array-expression minhash re-inlines the shingle construction per
    # hash (Catalyst collapses the projections), blowing up codegen and
    # recomputing shingles 16x. Exploding to (id, shingle) x (k) rows keeps
    # the plan linear and the shuffles are tiny (id, k) aggregates.
    # Spread the hash fan-out across cores: a small text corpus often arrives
    # as one input partition, which would serialize the md5 work. The
    # repartition shuffles only (id, text) rows — cheap relative to the
    # 16x-per-shingle hashing it parallelizes.
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        df = df.repartition(par, id_col)
    sh = df.select(F.col(id_col), F.explode(shingles(F.col(text_col))).alias("s"))
    # One shuffle on id with 16 map-side-combined min aggregates — the md5s
    # are computed map-side per (shingle, seed) but never shuffled as rows.
    mh = sh.groupBy(id_col).agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"{k}:"), F.col("s")))).alias(f"h{k}")
            for k in range(num_hashes)
        ]
    )
    def _sig(b: int) -> Column:
        return F.concat(*[F.col(f"h{b * rows + r}") for r in range(rows)])

    # `refine` = the NEXT band's signature, carried pre-explode (zero extra
    # joins): minhash_lsh_pairs sub-keys over-sized band buckets by it so a
    # viral near-dup cluster degrades to requiring two band matches
    # (high-recall) instead of producing m^2 candidate pairs
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                _sig(b).alias("sig"),
                _sig((b + 1) % bands).alias("refine"),
            )
            for b in range(bands)
        ]
    )
    return mh.select(id_col, F.explode(band_structs).alias("b")).select(
        id_col,
        F.col("b.band").alias("band"),
        F.col("b.sig").alias("sig"),
        F.col("b.refine").alias("refine"),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    max_bucket_rows: int | None = 100_000,
) -> DataFrame:
    """Candidate near-duplicate pairs: docs sharing at least one LSH band.

    shingle -> 16-way md5 minhash -> `bands` band keys -> self-join on
    (band, sig). Returns distinct (id_a < id_b) pairs.

    Scale guard (same pattern as ``ngram_jaccard_pairs``): the pair space
    is quadratic WITHIN a band bucket, so a viral near-dup cluster of m
    docs (site boilerplate at 100 TB) would emit m^2 candidates before any
    verification. Buckets larger than ``max_bucket_rows`` are therefore
    sub-keyed by the doc's NEXT band signature (carried in the signature
    table — no extra join): inside an over-sized bucket a pair must match
    TWO consecutive bands instead of one, which splits the bucket by
    signature diversity while keeping recall high exactly where it matters
    (J≈1 docs match all bands with high probability). Byte-identical docs
    share every signature and still collide — run exact dedup upstream,
    which removes them outright. Buckets under the cap keep exact
    one-band-match semantics, so results are unchanged on non-pathological
    corpora.

    The sub-key is the NEXT band's signature, so the cap requires
    ``bands >= 2`` — with one band "next" is the bucket key itself and the
    cap would silently do nothing; that combination raises. Pass
    ``max_bucket_rows=None`` (or ``float("inf")``) for explicitly-uncapped
    semantics.

    NOT a pure lazy plan builder: the signature table is eagerly
    localCheckpointed (materialized) at CALL time, and a capped call also
    runs one bounded probe job (``big.limit(1).count()``) to decide whether
    any bucket exceeds the cap — the big/small branch is frozen here, not
    at first action on the result. Uncapped calls skip the probe."""
    uncapped = max_bucket_rows is None or max_bucket_rows == float("inf")
    if bands < 2 and not uncapped:
        raise ValueError(
            "max_bucket_rows needs bands >= 2 (the over-sized-bucket sub-key "
            "is the NEXT band's signature; with bands=1 it equals the bucket "
            "key and the cap is inert) — raise bands or pass "
            "max_bucket_rows=None"
        )
    flat = minhash_band_signatures(df, text_col, id_col, num_hashes, bands)
    # The self-join would otherwise recompute the whole shingle+hash pipeline
    # for both sides; the signature table is tiny relative to the corpus
    # (4 rows x ~70 bytes per doc). localCheckpoint (eager) materializes it
    # once and truncates the lineage — unlike persist(), the blocks are
    # released by the ContextCleaner as soon as the returned plan is
    # garbage-collected, so repeated invocations (bench.py, the query
    # registry) don't accumulate session-lifetime cached blocks.
    flat = flat.localCheckpoint(eager=True)
    # over-sized buckets are FEW by construction (<= corpus/cap keys):
    # aggregate with map-side combine, broadcast the key set back
    big = (
        flat.groupBy("band", "sig")
        .agg(F.count(F.lit(1)).alias("__n__"))
        .filter(F.col("__n__") > max_bucket_rows)
        .select("band", "sig", F.lit(True).alias("__big__"))
    ) if not uncapped else None
    # adaptive short-circuit (AQE-style, one bounded job over the
    # checkpointed blocks): the healthy-corpus case has ZERO over-sized
    # buckets, and skipping the refinement join there saves its whole
    # plan-analysis + broadcast cost (~1.3 s first-call at sf0.1) while
    # the result is identical (__sub__ would be '' everywhere). An
    # explicitly-uncapped call skips the probe job entirely.
    if uncapped or big.limit(1).count() == 0:
        keyed = flat
        sub_match = F.lit(True)
    else:
        keyed = flat.join(F.broadcast(big), ["band", "sig"], "left").select(
            id_col,
            "band",
            "sig",
            F.when(F.col("__big__"), F.col("refine"))
            .otherwise(F.lit(""))
            .alias("__sub__"),
        )
        sub_match = F.col("a.__sub__") == F.col("b.__sub__")
    a, b = keyed.alias("a"), keyed.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & sub_match
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def incremental_dedup_keepset(
    batch: DataFrame,
    corpus: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """New-batch docs that survive dedup against the EXISTING corpus — the
    production scenario ("dedup today's crawl against the 100 TB corpus")
    where the corpus side is a persisted signature index, never re-scanned
    pairwise. Drops a batch doc if (a) its normalized fingerprint already
    exists in the corpus (exact dup), or (b) it shares any LSH band with a
    corpus doc (near-dup candidate). Both checks are semi-joins against
    index-shaped tables (fingerprints, band sigs); the batch never joins
    the corpus text itself."""
    from horaedb_spark.functions.text import normalized_fingerprint

    near_hits = (
        minhash_band_signatures(batch, text_col, id_col, num_hashes, bands)
        .join(
            minhash_band_signatures(corpus, text_col, id_col, num_hashes, bands)
            .select("band", "sig"),
            ["band", "sig"],
            "left_semi",
        )
        .select(id_col)
        .distinct()
    )
    exact_hits = (
        batch.select(id_col, normalized_fingerprint(text_col).alias("__fp__"))
        .join(
            corpus.select(normalized_fingerprint(text_col).alias("__fp__")),
            "__fp__",
            "left_semi",
        )
        .select(id_col)
    )
    drops = near_hits.unionByName(exact_hits).distinct()
    return batch.join(drops, id_col, "left_anti")


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    block_col: str,
    threshold: float,
    k: int = 3,
    max_block_rows: int = 100_000,
) -> DataFrame:
    """n-gram Jaccard similarity within a blocking key: pairs (id_a < id_b)
    in the same block with ``|A∩B| / |A∪B| >= threshold`` over distinct word
    k-grams. Exact rational arithmetic — engine-portable to the bit.

    Scale guard: the pair space is quadratic WITHIN a block, so a pathological
    block (one dominant source at 100 TB) would explode. Blocks larger than
    ``max_block_rows`` are refined with the document's min-shingle md5 as a
    sub-key — near-identical docs share their minimum shingle with
    probability ≈ their Jaccard, so the refinement is a 1-hash MinHash-LSH
    stage: candidate generation degrades from exact to high-recall instead of
    going quadratic. Blocks under the cap keep exact semantics."""
    sh = df.select(
        F.col(id_col), F.col(block_col), shingles(F.col(text_col), k).alias("sh")
    )
    bn = Window.partitionBy(block_col)
    sub_key = F.when(
        F.count(F.lit(1)).over(bn) > max_block_rows,
        F.coalesce(
            F.array_min(F.transform("sh", lambda s: F.md5(s))), F.lit("")
        ),
    ).otherwise(F.lit(""))
    sh = sh.withColumn("__sub__", sub_key)
    a, b = sh.alias("a"), sh.alias("b")
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size(F.array_union(F.col("a.sh"), F.col("b.sh")))
    jac = inter / union
    return (
        a.join(
            b,
            (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
            & (F.col("a.__sub__") == F.col("b.__sub__"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine over two double arrays — fold-left dot product and norms, all
    inside codegen (no UDF)."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda s, x: s + x * x))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda s, x: s + x * x))
    return dot / (na * nb)


def embedding_near_dup_pairs(
    df: DataFrame, vec_col: str, id_col: str, threshold: float
) -> DataFrame:
    """Embedding-cosine near-dup: all pairs with cosine >= threshold.

    This is the *verification* operator: run it inside LSH buckets (see
    ``similarity.lsh_ann``) at scale; all-pairs only for bounded candidate
    sets."""
    v = df.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
    a, b = v.alias("a"), v.alias("b")
    return (
        a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            cosine(F.col("a.v"), F.col("b.v")).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components over a near-dup pair graph: returns
    ``(id, component)`` where ``component`` is the minimum id reachable from
    ``id`` — the canonical cluster label for transitive dedup (A~B, B~C ⇒
    A,B,C collapse even though A~C was never emitted as a pair).

    Min-label propagation: each round every node takes the min of its own
    label and its neighbors' labels — one join + one map-side-combined min
    aggregate per round, converging in O(graph diameter) rounds. Near-dup
    graphs are star-like (planted copies + LSH collisions around a hub), so
    the diameter is small; each round is fully distributed and the driver
    only sees the scalar changed-count. ``localCheckpoint`` truncates the
    lineage each round so the plan doesn't grow with iterations. For
    adversarial long-chain graphs at 100 TB, the alternating large-star /
    small-star algorithm (Kiveris et al., "Connected Components in
    MapReduce and Beyond") drops rounds to O(log²n) with the same
    join+min building blocks.
    """
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = edges.select(F.col("src").alias("id")).distinct().withColumn(
        "component", F.col("id")
    )
    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels, edges["dst"] == labels["id"])
            .groupBy("src")
            .agg(F.min("component").alias("nbr"))
        )
        # the convergence flag rides INSIDE the update row (a label
        # shrinks iff a neighbor's label beats it), so the changed-count
        # is a filter+count over the just-materialized checkpoint blocks
        # instead of a fresh updated ⋈ labels join — two shuffles fewer
        # per round, same fixpoint test (new != old ⟺ nbr < old).
        updated = (
            labels.join(nbr_min, labels["id"] == nbr_min["src"], "left")
            .select(
                F.col("id"),
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr"), F.col("component"))
                ).alias("component"),
                F.coalesce(
                    F.col("nbr") < F.col("component"), F.lit(False)
                ).alias("__chg__"),
            )
            .localCheckpoint(eager=True)
        )
        changed = updated.filter(F.col("__chg__")).count()
        labels = updated.select("id", "component")
        if changed == 0:
            break
    return labels


def keep_minhash_representatives(pairs: DataFrame, df: DataFrame, id_col: str) -> DataFrame:
    """Collapse candidate pairs to a keep-set: drop every id that appears as
    the larger member of a pair (transitive-lite survivorship: min id per
    connected component under one LSH hop)."""
    drop = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(drop, id_col, "left_anti")


def cross_set_contamination(
    df: DataFrame,
    id_col: str,
    text_col: str,
    set_col: str,
    probe_value: str,
    k: int = 5,
) -> DataFrame:
    """Train-set decontamination: for every row NOT in the probe set, count
    the word-k-gram shingles it shares with the probe set (e.g. a held-out
    eval split) and how many distinct probe documents it collides with.
    Rows with zero overlap are absent from the result — anti-joining the
    corpus against it yields the decontaminated corpus.

    Scale design: both sides reduce to distinct ``(id, md5(shingle))``
    pairs, joined on the digest — a single shuffle keyed on a fixed-width
    32-char key instead of arbitrarily long k-gram strings. md5 keeps the
    key engine-portable (oracle-verifiable) and uniform, so the join
    neither skews on hot grams nor ships document text. At 100 TB the
    standard mitigations apply unchanged: raise k (rarer grams shrink the
    collision space) and let AQE split residual hot digests.
    """
    sh = df.select(
        F.col(id_col),
        (F.col(set_col) == probe_value).alias("__probe__"),
        F.explode(shingles(F.col(text_col), k)).alias("__s__"),
    ).select(id_col, "__probe__", F.md5("__s__").alias("__h__"))
    probe = (
        sh.filter(F.col("__probe__"))
        .select(F.col(id_col).alias("__probe_id__"), "__h__")
        .distinct()
    )
    corpus = sh.filter(~F.col("__probe__")).select(id_col, "__h__")
    return (
        corpus.join(probe, "__h__")
        .groupBy(id_col)
        .agg(
            F.countDistinct("__h__").alias("n_shared_shingles"),
            F.countDistinct("__probe_id__").alias("n_probe_docs"),
        )
    )


def contamination_overlap(
    df: DataFrame,
    id_col: str,
    text_col: str,
    set_col: str,
    probe_value: str,
    k: int = 5,
) -> DataFrame:
    """Per-non-probe-doc contamination FRACTION (the GPT-3/PaLM-style
    overlap report, one step past :func:`cross_set_contamination`'s binary
    hit list): ``n_shared`` distinct k-gram digests found in the probe set
    over ``n_shingles`` distinct digests in the doc — INCLUDING
    zero-overlap docs, so downstream rates average over the whole corpus.
    Same scale shape as cross_set_contamination: one digest-keyed shuffle,
    no text shipped; integer counts only (callers derive rates with their
    own deterministic rounding)."""
    sh = df.select(
        F.col(id_col),
        (F.col(set_col) == probe_value).alias("__probe__"),
        F.explode(shingles(F.col(text_col), k)).alias("__s__"),
    ).select(id_col, "__probe__", F.md5("__s__").alias("__h__"))
    probe_digests = sh.filter(F.col("__probe__")).select("__h__").distinct()
    corpus = sh.filter(~F.col("__probe__")).select(id_col, "__h__").distinct()
    tot = corpus.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))
    shared = (
        corpus.join(probe_digests, "__h__", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return tot.join(shared, id_col, "left").select(
        id_col,
        "n_shingles",
        F.coalesce("n_shared", F.lit(0)).alias("n_shared"),
    )


def duplicated_span_stats(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 20,
    stride: int = 10,
) -> DataFrame:
    """Span-level (paragraph) dedup stats — ExactSubstr-lite (Lee et al.,
    "Deduplicating Training Data Makes Language Models Better"): slide a
    ``window``-token fingerprint with ``stride`` over every document, find
    fingerprints shared by ≥2 documents, and report each document's
    duplicated-span fraction (the retain/trim signal span-level dedup acts
    on).

    Shapes: the window explode is row-local with ~tokens/stride fan-out;
    duplicated fingerprints reduce by ONE hash aggregate keyed on the md5
    (16-byte keys, not text); membership flows back through a broadcast-able
    semi-join of the duplicated-hash set when small, an ordinary hash join
    otherwise — Catalyst/AQE picks. Nothing quadratic, no text shuffles."""
    toks = F.split(F.lower(F.col(text_col)), "[^a-z0-9]+")
    toks = F.filter(toks, lambda w: w != "")
    n = F.size(toks)
    n_win = F.when(n <= window, F.lit(1)).otherwise(
        F.floor((n - window) / stride).cast("int") + 1
    )
    hashes = F.transform(
        F.sequence(F.lit(0), n_win - 1),
        lambda i: F.md5(
            F.concat_ws(" ", F.slice(toks, i * stride + 1, window))
        ),
    )
    wins = docs.select(F.col(id_col), F.explode(hashes).alias("h"))
    dup_h = (
        wins.groupBy("h")
        .agg(F.count_distinct(id_col).alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h")
    )
    flagged = wins.join(dup_h, "h", "left_semi").groupBy(id_col).agg(
        F.count("*").alias("n_dup_windows")
    )
    totals = wins.groupBy(id_col).agg(F.count("*").alias("n_windows"))
    return totals.join(flagged, id_col, "left").select(
        id_col,
        "n_windows",
        F.coalesce("n_dup_windows", F.lit(0)).alias("n_dup_windows"),
        F.round(
            F.coalesce("n_dup_windows", F.lit(0)) / F.col("n_windows").cast("double"),
            6,
        ).alias("dup_fraction"),
    )


def _substr_tokens(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Shared tokenizer of both ExactSubstr operators: lowercase-alnum
    split, empties dropped. Returns (doc_id, t: array<string>) — the token
    array in its OWN projection so every consumer references it as a bound
    column, never as the raw split expression."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
                    lambda w: w != "")
    return docs.select(F.col(id_col).alias("doc_id"), toks.alias("t"))


def _explode_shingles(tok_docs: DataFrame, k: int) -> DataFrame:
    """(doc_id, pos, h) stride-1 ``k``-token shingle-hash rows from a
    _substr_tokens frame; pos is 1-based; docs shorter than ``k`` tokens
    emit nothing.

    PLAN-SHAPE CONTRACT (the round-12 regression): the posexplode MUST sit
    in the SAME select as the per-position hash transform, so the analyzer
    lifts the transform into a Generate node whose child is the token
    projection. A bare Project holding the transform instead gets merged by
    CollapseProject with the tokenizer projection below it, inlining the
    split/filter into the per-position lambda — codegen then re-tokenizes
    the document for EVERY position (O(positions × tokens) per doc;
    measured 5-7× slower at sf0.1). Generate does not collapse into its
    child Project, so this shape keeps the tokenizer at once-per-row."""
    n = F.size(F.col("t"))
    hashes = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - k + 1),
            lambda i: F.md5(F.concat_ws(" ", F.slice(F.col("t"), i, k))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return tok_docs.select(
        "doc_id", F.posexplode(hashes).alias("pos0", "h")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "h")


def exact_substr_spans(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    min_span: int = 10,
    max_docs_per_shingle: int = 50,
    reuse_filtered: bool = False,
) -> DataFrame:
    """Full-strength ExactSubstr (Lee et al., "Deduplicating Training Data
    Makes Language Models Better"): every maximal token span of length
    ≥ ``min_span`` shared verbatim between two documents, reported as
    per-pair stats (longest span, span count, total shared tokens). This is
    the suffix-array operator re-expressed for Spark: instead of one global
    suffix array, sort the corpus's stride-1 ``min_span``-token shingles and
    EXTEND consecutive matches — two docs sharing an L-token span produce
    L-min_span+1 shingle matches on one (pos_a - pos_b) diagonal with
    consecutive pos_a, so a gaps-and-islands pass over (pair, diagonal)
    recovers the maximal span exactly (length = run + min_span - 1). Unlike
    duplicated_span_stats (the windowed ExactSubstr-lite, stride>1), spans
    here are exact to the token: no granularity floor, no stride aliasing.

    Scale shape: the shuffle is SHINGLE-sized, never pairwise-doc-sized —
    one md5-keyed aggregate finds duplicated shingles, and the pair join
    runs only inside duplicated-shingle groups, each capped at
    ``max_docs_per_shingle`` distinct docs AND 4× that many total
    OCCURRENCES (boilerplate shingles shared by more docs than the cap
    carry no pair-level signal and would alone produce O(docs²) anchors —
    the same blocking-cap discipline as the LSH band buckets; the
    occurrence term additionally bounds degenerate IN-DOCUMENT repetition,
    where two docs full of one repeated run would otherwise emit
    O(positions²) anchors from a single two-doc group). Anchors per group
    are therefore bounded by (4·cap)², the island window partitions by
    (pair, diagonal) — small, naturally parallel keys. Docs shorter than
    ``min_span`` tokens emit nothing: sub-threshold spans are not
    ExactSubstr matches by definition. For corpora where the capped
    boilerplate/repetition content still needs pruning, the no-join
    ``exact_substr_prune_stats`` handles it at any multiplicity.

    Reference parity: the reference has no span-level dedup (it is a
    metrics/OLAP engine); this implements the training-pipeline operator
    the brief's extension table names, with semantics pinned to the paper.
    Output: (id_a, id_b, longest_shared_span, n_shared_spans,
    shared_span_tokens), one row per unordered doc pair with id_a < id_b.
    """
    k = min_span
    sh = _explode_shingles(_substr_tokens(docs, id_col, text_col), k)
    dup_h = (
        sh.groupBy("h")
        .agg(
            F.count_distinct("doc_id").alias("nd"),
            F.count("*").alias("nocc"),
        )
        .filter(
            (F.col("nd") >= 2)
            & (F.col("nd") <= max_docs_per_shingle)
            & (F.col("nocc") <= 4 * max_docs_per_shingle)
        )
        .select("h")
    )
    # reuse_filtered=True materializes the FILTERED shingle stream once
    # (lazy localCheckpoint — no job until the first action, then both
    # pair-join sides read the same persisted RDD). Without it Spark
    # re-derives the whole scan→tokenize→explode→aggregate→semi-join
    # subtree for EACH join side (4 parquet scans / 4 Generates measured;
    # exchange reuse does not fire across the differently-projected
    # sides). Interleaved paired A/B on the 100× probe fixture: 3-11%
    # faster checkpointed (e.g. 38.3/38.7/52.6 s plain vs 36.6/35.2/46.6 s
    # across pairs); checkpointing the RAW pre-filter shingle frame
    # instead measured SLOWER (48.4 vs 45.6 s) — the corpus-sized end of
    # the pipeline costs more to persist than to recompute.
    #
    # The DEFAULT stays declarative: localCheckpoint is NOT fault-tolerant
    # (truncated lineage — on a 1000-executor cluster, losing ANY executor
    # holding checkpointed blocks fails the whole query, where the
    # declarative plan just recomputes the lost partitions), and persist()
    # would instead leak session-lifetime cache blocks with no unpersist
    # seam in a function that returns a DataFrame. A single-digit win does
    # not buy that at 100 TB; flip it on for stable, small deployments
    # where the filtered stream is hot. This is the library-operator side
    # of the localCheckpoint policy boundary (SCALING.md "The
    # localCheckpoint policy boundary"): corpus-sized frames keep
    # declarative defaults; bounded serving-suite frames
    # (promql_eval_many) may checkpoint by default.
    shf = sh.join(dup_h, "h", "left_semi")
    if reuse_filtered:
        shf = shf.localCheckpoint(eager=False)
    a = shf.select(F.col("doc_id").alias("id_a"), F.col("pos").alias("pos_a"), "h")
    b = shf.select(F.col("doc_id").alias("id_b"), F.col("pos").alias("pos_b"), "h")
    anch = a.join(b, "h").filter(F.col("id_a") < F.col("id_b")).select(
        "id_a", "id_b", "pos_a", (F.col("pos_a") - F.col("pos_b")).alias("diag")
    )
    w = Window.partitionBy("id_a", "id_b", "diag").orderBy("pos_a")
    runs = anch.withColumn("grp", F.col("pos_a") - F.row_number().over(w))
    spans = runs.groupBy("id_a", "id_b", "diag", "grp").agg(
        (F.count("*") + k - 1).alias("span_len")
    )
    return spans.groupBy("id_a", "id_b").agg(
        F.max("span_len").alias("longest_shared_span"),
        F.count("*").alias("n_shared_spans"),
        F.sum("span_len").alias("shared_span_tokens"),
    )


def exact_substr_prune_stats(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    min_span: int = 10,
) -> DataFrame:
    """The REMOVAL half of ExactSubstr (Lee et al.): per document, the
    token spans that would be pruned under the keep-first-occurrence
    discipline — every stride-1 ``min_span``-token shingle that has an
    EARLIER occurrence anywhere in the corpus (order: (doc_id, pos)) marks
    its span for removal; overlapping marked spans merge (interval union
    via a running-max gaps-and-islands pass per doc). Output per doc:
    total/removed/kept token counts, merged removal-span count, longest
    removed span. ``exact_substr_spans`` answers "who shares what";
    this answers "what do I delete" — the operator that actually shrinks
    a training corpus.

    Scale shape: NO pair join anywhere — one map-side-combinable aggregate
    keyed on the 16-byte shingle hash finds each hash's FIRST occurrence
    (``min(struct(doc_id, pos))``), a semi-style join back marks every
    other occurrence, and one shuffle on doc_id does the interval union.
    The first-occurrence pass deliberately avoids a per-hash window
    (``row_number() over (partition by h)``): a planet-scale boilerplate
    shingle would funnel all its occurrences through one task's sort (AQE
    cannot split a single window key), whereas the min-struct aggregate is
    partial-aggregated map-side and the h-keyed join is AQE-skew-splittable.
    Cost is linear in shingles even for boilerplate shared by millions of
    docs (marking is per-occurrence, so no frequency cap is needed, unlike
    the pair operator). Docs shorter than ``min_span`` tokens emit no
    shingles and are reported unpruned.

    Precondition (ADVICE r13): ``id_col`` must be UNIQUE and NON-NULL —
    the corpus contract every caller in this repo satisfies (doc_id is a
    key). With duplicate doc_id rows, identical (doc_id, pos, h) shingles
    all equal the min-struct first occurrence and none are marked (the
    old per-hash window marked all but one); a NULL doc_id makes the
    null-unsafe ``!=`` filter drop its rows entirely. Dedup or re-key
    upstream if your ids can repeat.
    """
    k = min_span
    tok = _substr_tokens(docs, id_col, text_col)
    base = tok.select("doc_id", F.size("t").alias("n_tokens"))
    sh = _explode_shingles(tok, k)
    firsts = sh.groupBy("h").agg(
        F.min(F.struct("doc_id", "pos")).alias("first_occ")
    )
    marked = (
        sh.join(firsts, "h")
        .filter(
            (F.col("doc_id") != F.col("first_occ.doc_id"))
            | (F.col("pos") != F.col("first_occ.pos"))
        )
        .select("doc_id", "pos", (F.col("pos") + k - 1).alias("end"))
    )
    wd = Window.partitionBy("doc_id").orderBy("pos")
    prev_max = F.max("end").over(wd.rowsBetween(Window.unboundedPreceding, -1))
    isl = marked.withColumn(
        "new_isl", (prev_max.isNull() | (F.col("pos") > prev_max)).cast("int")
    ).withColumn(
        "isl", F.sum("new_isl").over(wd.rowsBetween(Window.unboundedPreceding, 0))
    )
    spans = isl.groupBy("doc_id", "isl").agg(
        (F.max("end") - F.min("pos") + 1).alias("span_len")
    )
    per_doc = spans.groupBy("doc_id").agg(
        F.sum("span_len").alias("removed_tokens"),
        F.count("*").alias("n_removed_spans"),
        F.max("span_len").alias("longest_removed_span"),
    )
    return (
        base.select("doc_id", "n_tokens")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("removed_tokens", F.lit(0)).alias("removed_tokens"),
            (F.col("n_tokens") - F.coalesce("removed_tokens", F.lit(0))).alias(
                "kept_tokens"
            ),
            F.coalesce("n_removed_spans", F.lit(0)).alias("n_removed_spans"),
            F.coalesce("longest_removed_span", F.lit(0)).alias(
                "longest_removed_span"
            ),
        )
    )
