"""Deduplication queries (LLM-pipeline surface), each oracle-gated.

The testdata documents are unique, so near-dup operators would trivially
return empty sets; to exercise them for real, each query augments the corpus
with *deterministic* perturbed copies (id + 1,000,000, text lightly edited) —
the same augmentation is applied in the oracle SQL, so detection quality is
actually verified: the operator must find exactly the planted duplicates plus
whatever true near-dups exist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from horaedb_spark.functions import dedup as DD
from horaedb_spark.functions import text as TX
from horaedb_spark.functions.similarity import (
    _plane_weight,
    embedding_lsh_near_dup_pairs,
    quantize,
)
from horaedb_spark.queries.registry import register
from horaedb_spark.queries.tables import load_table

_COPY_OFFSET = 1_000_000

# shared corpus CTE: documents plus exact copies
_EXACT_CORPUS = f"""
    WITH corpus AS (
      SELECT doc_id, text, source FROM documents
      UNION ALL
      SELECT doc_id + {_COPY_OFFSET}, text, source FROM documents
    )
"""

# near-dup corpus: copies with one appended token
_NEAR_CORPUS = f"""
    WITH corpus AS (
      SELECT doc_id, text, source FROM documents
      UNION ALL
      SELECT doc_id + {_COPY_OFFSET}, text || ' zz', source FROM documents
    )
"""


# half-copy corpus (ExactSubstr family): each 5th document's FIRST HALF
# verbatim plus a divergent tail — a duplicated leading span whole-doc
# dedup misses. The slice is over the FILTERED token list on BOTH sides
# (Spark's F.filter(...) and DuckDB's list_filter), so a document with
# leading/trailing punctuation (empty split tokens) yields the same half
# in both corpora — slicing the unfiltered DuckDB split would shift the
# half by the empty tokens and silently diverge (review r12).
_FILTERED_TOKS_SQL = (
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), w -> w != '')"
)
_HALF_COPY_CORPUS = f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + {_COPY_OFFSET},
             array_to_string(
               ({_FILTERED_TOKS_SQL})
                 [1:greatest(len({_FILTERED_TOKS_SQL}) // 2, 1)],
               ' ') || ' divergent tail entirely new words'
      FROM documents WHERE doc_id % 5 = 0
    )
"""

# stride-1 10-token shingles per position over the half-copy corpus —
# the shared front half of both ExactSubstr oracles (mirrors
# functions.dedup._substr_tokens + _explode_shingles)
_SUBSTR_SHINGLE_CTES = """
    , toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         w -> w != '') AS t
      FROM corpus
    ), sh AS (
      SELECT doc_id, u.pos AS pos, u.h AS h
      FROM (
        SELECT doc_id,
               unnest(CASE WHEN len(t) >= 10
                      THEN [{'pos': i, 'h': md5(array_to_string(t[i:i+9], ' '))}
                            FOR i IN generate_series(1, len(t) - 9)]
                      ELSE [] END) AS u
        FROM toks
      )
    )
"""


def _with_half_copies(docs: DataFrame) -> DataFrame:
    toks = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda w: w != ""
    )
    half = F.concat_ws(
        " ",
        F.slice(toks, 1, F.greatest((F.size(toks) / 2).cast("int"), F.lit(1))),
    )
    copies = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + _COPY_OFFSET).alias("doc_id"),
        F.concat(half, F.lit(" divergent tail entirely new words")).alias("text"),
    )
    return docs.unionByName(copies)


def _with_exact_copies(docs: DataFrame) -> DataFrame:
    copies = docs.select(
        (F.col("doc_id") + _COPY_OFFSET).alias("doc_id"), "text", "source"
    )
    return docs.select("doc_id", "text", "source").unionByName(copies)


def _with_near_copies(docs: DataFrame) -> DataFrame:
    copies = docs.select(
        (F.col("doc_id") + _COPY_OFFSET).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz")).alias("text"),
        "source",
    )
    return docs.select("doc_id", "text", "source").unionByName(copies)


@register(
    "dedup_exact",
    oracle=_EXACT_CORPUS
    + """
    SELECT min(doc_id) AS doc_id, count(*) AS n_copies
    FROM corpus GROUP BY text ORDER BY doc_id
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup (hash groupBy): survivors are the min id per identical
    text; every planted copy must collapse onto its original.

    Fingerprint-keyed: the aggregate shuffles (xxhash64, length, id) —
    ~16 B/doc — never the text bytes; only fingerprint groups holding more
    than one row are re-verified on the actual text (collision safety).
    Same answer as the oracle's group-by-raw-text, ~100x narrower exchange
    at corpus scale."""
    docs = _with_exact_copies(load_table(spark, sf_dir, "documents"))
    keyed = docs.select(
        "doc_id",
        "text",
        F.xxhash64("text").alias("fp"),
        F.length("text").alias("ln"),
    )
    grp = (
        keyed.select("fp", "ln", "doc_id")
        .groupBy("fp", "ln")
        .agg(F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )
    solo = grp.filter(F.col("n_copies") == 1).select("doc_id", "n_copies")
    multi_keys = grp.filter(F.col("n_copies") > 1).select("fp", "ln")
    multi = (
        keyed.join(multi_keys, ["fp", "ln"], "left_semi")
        .groupBy("fp", "ln", "text")
        .agg(F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("n_copies"))
        .select("doc_id", "n_copies")
    )
    return solo.unionByName(multi).orderBy("doc_id")


@register(
    "dedup_minhash_lsh",
    oracle=_NEAR_CORPUS
    + r"""
    , shingled AS (
      SELECT doc_id,
             CASE WHEN len(w) >= 3
                  THEN list_distinct([array_to_string(w[i:i+2], ' ')
                                      FOR i IN generate_series(1, len(w)-2)])
                  ELSE [array_to_string(w, ' ')] END AS sh
      FROM (SELECT doc_id, string_split_regex(text, '\s+') AS w FROM corpus)
    ), flat AS (
      SELECT doc_id, unnest(sh) AS s FROM shingled
    ), mh AS (
      SELECT doc_id, k, min(md5(k || ':' || s)) AS h
      FROM flat CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS k) ks
      GROUP BY doc_id, k
    ), bands AS (
      SELECT doc_id, k // 4 AS band, string_agg(h, '' ORDER BY k) AS sig
      FROM mh GROUP BY doc_id, k // 4
    )
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
    ORDER BY id_a, id_b
    """,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidates: word-3-shingles → 16 md5 minhashes →
    4 bands × 4 rows → band-bucket self-join. One-token-appended copies must
    collide in ≥1 band (3-word shingles overlap almost entirely)."""
    corpus = _with_near_copies(load_table(spark, sf_dir, "documents"))
    pairs = DD.minhash_lsh_pairs(corpus, "text", "doc_id", num_hashes=16, bands=4)
    return pairs.orderBy("id_a", "id_b")


# signature-replication CTE shared by the capped query: identical to
# dedup_minhash_lsh's pipeline but parameterized over a `corpus` CTE the
# caller prepends
_SIG_CTES = r"""
    , shingled AS (
      SELECT doc_id,
             CASE WHEN len(w) >= 3
                  THEN list_distinct([array_to_string(w[i:i+2], ' ')
                                      FOR i IN generate_series(1, len(w)-2)])
                  ELSE [array_to_string(w, ' ')] END AS sh
      FROM (SELECT doc_id, string_split_regex(text, '\s+') AS w FROM corpus)
    ), flat AS (
      SELECT doc_id, unnest(sh) AS s FROM shingled
    ), mh AS (
      SELECT doc_id, k, min(md5(k || ':' || s)) AS h
      FROM flat CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS k) ks
      GROUP BY doc_id, k
    ), bands AS (
      SELECT doc_id, k // 4 AS band, string_agg(h, '' ORDER BY k) AS sig
      FROM mh GROUP BY doc_id, k // 4
    )
"""


@register(
    "dedup_minhash_capped",
    oracle=r"""
    WITH base AS (
      SELECT string_split_regex(text, '\s+') AS w FROM documents
      WHERE doc_id < 200 ORDER BY n_chars DESC, doc_id LIMIT 1
    ), idx AS (SELECT unnest(generate_series(0, 35)) AS i),
    copies AS (
      SELECT 9000000 + i AS doc_id,
             array_to_string([
               CASE WHEN (j - 1) = (i * 7) % len(w) THEN 'm' || i || '_0'
                    WHEN (j - 1) = (i * 7 + 11) % len(w) THEN 'm' || i || '_1'
                    WHEN (j - 1) = (i * 7 + 22) % len(w) THEN 'm' || i || '_2'
                    ELSE w[j] END
               FOR j IN generate_series(1, len(w))], ' ') AS text
      FROM idx CROSS JOIN base
    ), corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 200
      UNION ALL SELECT doc_id, text FROM copies
    )
    """
    + _SIG_CTES
    + r"""
    , counts AS (
      SELECT band, sig, count(*) AS n FROM bands GROUP BY 1, 2
    ), keyed AS (
      SELECT b.doc_id, b.band, b.sig,
             CASE WHEN c.n > 8 THEN nb.sig ELSE '' END AS sub
      FROM bands b
      JOIN counts c ON c.band = b.band AND c.sig = b.sig
      JOIN bands nb ON nb.doc_id = b.doc_id AND nb.band = (b.band + 1) % 4
    )
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM keyed a JOIN keyed b
      ON a.band = b.band AND a.sig = b.sig AND a.sub = b.sub
      AND a.doc_id < b.doc_id
    ORDER BY id_a, id_b
    """,
)
def dedup_minhash_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The band-bucket CAP semantics under the hash gate: a planted viral
    near-dup cluster (36 mutated copies of the longest small-id document —
    3 of ~98 words replaced per copy, the boilerplate shape) overflows the
    max_bucket_rows=8 cap, so over-sized buckets sub-key by the NEXT
    band's signature and a pair inside them must match two consecutive
    bands. The oracle replicates the refinement exactly (counts + next-
    band join over the same md5 signature pipeline as dedup_minhash_lsh),
    so the degraded-recall semantics themselves — not just the uncapped
    fixture behavior — are hash-pinned at every SF."""
    docs = load_table(spark, sf_dir, "documents")
    pool = docs.filter(F.col("doc_id") < 200).select("doc_id", "text")
    base = (
        docs.filter(F.col("doc_id") < 200)
        .orderBy(F.desc("n_chars"), F.asc("doc_id"))
        .limit(1)
        .select(F.split("text", r"\s+").alias("w"))
    )
    idx = spark.range(36).select(F.col("id").alias("i"))

    def _mut(x, j):
        i = F.col("i")
        L = F.size("w")
        tag = lambda s: F.concat(F.lit("m"), i.cast("string"), F.lit(s))
        return (
            F.when(j == (i * 7) % L, tag("_0"))
            .when(j == (i * 7 + 11) % L, tag("_1"))
            .when(j == (i * 7 + 22) % L, tag("_2"))
            .otherwise(x)
        )

    copies = idx.crossJoin(F.broadcast(base)).select(
        (F.lit(9_000_000) + F.col("i")).alias("doc_id"),
        F.array_join(F.transform("w", _mut), " ").alias("text"),
    )
    corpus = pool.unionByName(copies)
    pairs = DD.minhash_lsh_pairs(
        corpus, "text", "doc_id", num_hashes=16, bands=4, max_bucket_rows=8
    )
    return pairs.orderBy("id_a", "id_b")


@register(
    "dedup_simhash",
    oracle=r"""
    WITH w AS (SELECT doc_id, string_split_regex(text, '\s+') AS words FROM documents)
    SELECT doc_id,
           concat(
    """
    + ",\n".join(
        f"CASE WHEN list_sum([CASE WHEN substr(md5({i} || ':' || x), 1, 1) < '8' "
        f"THEN 1 ELSE -1 END FOR x IN words]) >= 0 THEN '1' ELSE '0' END"
        for i in range(16)
    )
    + r"""
           ) AS simhash
    FROM w ORDER BY doc_id
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprints (16-bit, md5-projected): token-multiset sketches
    whose Hamming distance tracks edit distance."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", TX.simhash_bits(TX.words("text"), 16).alias("simhash")
    ).orderBy("doc_id")


@register(
    "dedup_ngram_jaccard",
    oracle=_NEAR_CORPUS
    + r"""
    , shingled AS (
      SELECT doc_id, source,
             CASE WHEN len(w) >= 3
                  THEN list_distinct([array_to_string(w[i:i+2], ' ')
                                      FOR i IN generate_series(1, len(w)-2)])
                  ELSE [array_to_string(w, ' ')] END AS sh
      FROM (SELECT doc_id, source, string_split_regex(text, '\s+') AS w FROM corpus)
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
    FROM shingled a JOIN shingled b
      ON a.source = b.source AND a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
          / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5
    ORDER BY id_a, id_b
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram Jaccard verification within a blocking key (source): exact
    rational similarity over distinct 3-shingles, threshold 0.5."""
    corpus = _with_near_copies(load_table(spark, sf_dir, "documents"))
    pairs = DD.ngram_jaccard_pairs(corpus, "text", "doc_id", "source", 0.5, k=3)
    return pairs.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard")).orderBy(
        "id_a", "id_b"
    )


# LSH blocking parameters for the embedding near-dup query: 4 independent
# 8-plane hash tables over the 64-dim quantized vectors. The oracle SQL
# reproduces the buckets bit-for-bit from the same md5-derived ±1 weights.
_LSH_DIM, _LSH_PLANES, _LSH_TABLES = 64, 8, 4


def _bucket_sql(tbl: int) -> str:
    bits = []
    for p in range(tbl * _LSH_PLANES, (tbl + 1) * _LSH_PLANES):
        w = "[" + ",".join(str(_plane_weight(p, d)) for d in range(_LSH_DIM)) + "]"
        bits.append(
            f"CASE WHEN list_sum([qv[i] * ({w})[i] "
            f"FOR i IN generate_series(1, {_LSH_DIM})]) >= 0 "
            "THEN '1' ELSE '0' END"
        )
    return "concat(" + ",\n             ".join(bits) + ")"


_COS_SQL = """
    list_sum([a.qv[i] * b.qv[i] FOR i IN generate_series(1, 64)])
    / (sqrt(list_sum([a.qv[i] * a.qv[i] FOR i IN generate_series(1, 64)]))
       * sqrt(list_sum([b.qv[i] * b.qv[i] FOR i IN generate_series(1, 64)])))
"""

_BUCKETS_SQL = "\n      UNION ALL\n".join(
    f"      SELECT vec_id, qv, {t} AS tbl, {_bucket_sql(t)} AS bkt FROM corpus"
    for t in range(_LSH_TABLES)
)


@register(
    "dedup_embedding_cosine",
    oracle=f"""
    WITH corpus AS (
      SELECT vec_id, [CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT) FOR x IN embedding] AS qv
      FROM embeddings
      UNION ALL
      SELECT vec_id + {_COPY_OFFSET},
             [CAST(round(CAST(x AS DOUBLE) * 1000 + 20) AS BIGINT) FOR x IN embedding]
      FROM embeddings
    ), buckets AS (
{_BUCKETS_SQL}
    )
    SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
           round({_COS_SQL}, 6) AS cos_sim
    FROM buckets a JOIN buckets b
      ON a.tbl = b.tbl AND a.bkt = b.bkt AND a.vec_id < b.vec_id
    WHERE {_COS_SQL} >= 0.9
    ORDER BY id_a, id_b
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup, candidate-generation first: 4 independent
    8-plane LSH bucket tables block the corpus; the exact quantized-integer
    cosine (engine-portable arithmetic) verifies only same-bucket pairs — no
    cartesian join anywhere in the plan (asserted in tests/test_plans.py).
    Planted shifted copies collide with their original in ≥1 table with high
    probability; the oracle reproduces the identical bucketing, so recall is
    verified, not assumed."""
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select("vec_id", quantize(F.col("embedding")).alias("qv"))
    shifted = emb.select(
        (F.col("vec_id") + _COPY_OFFSET).alias("vec_id"),
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x: F.round(x * 1000 + 20).cast("long"),
        ).alias("qv"),
    )
    corpus = base.unionByName(shifted)
    pairs = embedding_lsh_near_dup_pairs(
        corpus,
        "qv",
        "vec_id",
        0.9,
        dim=_LSH_DIM,
        num_planes=_LSH_PLANES,
        num_tables=_LSH_TABLES,
    )
    return pairs.select(
        F.col("id_a"), F.col("id_b"), F.round("cos_sim", 6).alias("cos_sim")
    ).orderBy("id_a", "id_b")


# Shared CTE chain: near-copy corpus → word-3-shingles → 16 md5 minhashes →
# 4 LSH bands → distinct candidate pairs. Kept verbatim-identical to the
# dedup_minhash_lsh oracle so the two queries verify the same pair set.
_PAIRS_CTES = r"""
    shingled AS (
      SELECT doc_id,
             CASE WHEN len(w) >= 3
                  THEN list_distinct([array_to_string(w[i:i+2], ' ')
                                      FOR i IN generate_series(1, len(w)-2)])
                  ELSE [array_to_string(w, ' ')] END AS sh
      FROM (SELECT doc_id, string_split_regex(text, '\s+') AS w FROM corpus)
    ), flat AS (
      SELECT doc_id, unnest(sh) AS s FROM shingled
    ), mh AS (
      SELECT doc_id, k, min(md5(k || ':' || s)) AS h
      FROM flat CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS k) ks
      GROUP BY doc_id, k
    ), bands AS (
      SELECT doc_id, k // 4 AS band, string_agg(h, '' ORDER BY k) AS sig
      FROM mh GROUP BY doc_id, k // 4
    ), pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
    )
"""


@register(
    "dedup_connected_components",
    oracle="WITH RECURSIVE "
    + _NEAR_CORPUS.strip()[len("WITH ") :]
    + ",\n"
    + _PAIRS_CTES.strip()
    + r"""
    , edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs
    ), reach(id, lbl) AS (
      SELECT DISTINCT src, src FROM edges
      UNION
      SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id
    )
    SELECT id AS doc_id, min(lbl) AS component
    FROM reach GROUP BY id ORDER BY doc_id
    """,
)
def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive dup clustering: LSH candidate pairs → connected components
    by distributed min-label propagation (join + min-agg per round, lineage
    checkpointed). Each node maps to the min id reachable through the pair
    graph — so A~B, B~C collapse into one cluster even though (A,C) was
    never emitted. The oracle recomputes the same closure with a recursive
    CTE, verifying the fixpoint, not just one propagation round."""
    corpus = _with_near_copies(load_table(spark, sf_dir, "documents"))
    pairs = DD.minhash_lsh_pairs(corpus, "text", "doc_id", num_hashes=16, bands=4)
    cc = DD.connected_components(pairs)
    return cc.select(F.col("id").alias("doc_id"), "component").orderBy("doc_id")


@register(
    "dedup_minhash_keepset",
    oracle=_NEAR_CORPUS
    + r"""
    , shingled AS (
      SELECT doc_id,
             CASE WHEN len(w) >= 3
                  THEN list_distinct([array_to_string(w[i:i+2], ' ')
                                      FOR i IN generate_series(1, len(w)-2)])
                  ELSE [array_to_string(w, ' ')] END AS sh
      FROM (SELECT doc_id, string_split_regex(text, '\s+') AS w FROM corpus)
    ), flat AS (
      SELECT doc_id, unnest(sh) AS s FROM shingled
    ), mh AS (
      SELECT doc_id, k, min(md5(k || ':' || s)) AS h
      FROM flat CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS k) ks
      GROUP BY doc_id, k
    ), bands AS (
      SELECT doc_id, k // 4 AS band, string_agg(h, '' ORDER BY k) AS sig
      FROM mh GROUP BY doc_id, k // 4
    ), drops AS (
      SELECT DISTINCT b.doc_id
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
    )
    SELECT c.doc_id FROM corpus c
    WHERE c.doc_id NOT IN (SELECT doc_id FROM drops)
    ORDER BY c.doc_id
    """,
)
def dedup_minhash_keepset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup survivorship: collapse LSH candidate pairs to a keep-set
    (drop every id that appears as the larger member of a pair) — the
    full document-dedup pipeline output rather than the pair list."""
    corpus = _with_near_copies(load_table(spark, sf_dir, "documents"))
    pairs = DD.minhash_lsh_pairs(corpus, "text", "doc_id", num_hashes=16, bands=4)
    kept = DD.keep_minhash_representatives(pairs, corpus, "doc_id")
    return kept.select("doc_id").orderBy("doc_id")


@register(
    "dedup_prefix_cluster",
    oracle=r"""
    WITH n AS (
      SELECT doc_id,
             md5(substring(trim(regexp_replace(lower(text), '\s+', ' ', 'g')),
                           1, 64)) AS prefix_fp
      FROM documents
    )
    SELECT prefix_fp, count(*) AS n_docs,
           min(doc_id) AS survivor_id,
           CAST(sum(doc_id) AS BIGINT) AS id_checksum
    FROM n GROUP BY prefix_fp HAVING count(*) > 1
    ORDER BY prefix_fp
    """,
)
def dedup_prefix_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-fingerprint containment dedup (RefinedWeb-style exact-substring
    pass, restricted to the leading window): docs sharing the md5 of their
    first 64 normalized chars cluster together; min doc_id survives. A pure
    hash groupBy — row-local map, one shuffle on a fixed-width digest, no
    pairwise joins, so it scales identically at 100 TB. Catches
    boilerplate-prefixed and truncated-copy duplicates that full-document
    hashing misses."""
    docs = load_table(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    clustered = docs.select(
        "doc_id", F.md5(F.substring(norm, 1, 64)).alias("prefix_fp")
    )
    return (
        clustered.groupBy("prefix_fp")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("survivor_id"),
            F.sum("doc_id").cast("long").alias("id_checksum"),
        )
        .filter(F.col("n_docs") > 1)
        .orderBy("prefix_fp")
    )


@register(
    "dedup_minhash_estimate_check",
    oracle=_NEAR_CORPUS
    + rf"""
    , shingled AS (
      SELECT doc_id,
             CASE WHEN len(w) >= 3
                  THEN list_distinct([array_to_string(w[i:i+2], ' ')
                                      FOR i IN generate_series(1, len(w)-2)])
                  ELSE [array_to_string(w, ' ')] END AS sh
      FROM (SELECT doc_id, string_split_regex(text, '\s+') AS w FROM corpus)
    ), flat AS (
      SELECT doc_id, unnest(sh) AS s FROM shingled
    ), mh AS (
      SELECT doc_id, k, min(md5(k || ':' || s)) AS h
      FROM flat CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS k) ks
      GROUP BY doc_id, k
    ), pairs AS (
      SELECT doc_id AS id_a, doc_id + {_COPY_OFFSET} AS id_b FROM documents
    ), est AS (
      SELECT p.id_a, sum(CASE WHEN ma.h = mb.h THEN 1 ELSE 0 END) AS agree
      FROM pairs p
      JOIN mh ma ON ma.doc_id = p.id_a
      JOIN mh mb ON mb.doc_id = p.id_b AND mb.k = ma.k
      GROUP BY p.id_a
    ), ex AS (
      SELECT p.id_a,
             len(list_intersect(sa.sh, sb.sh)) AS inter,
             len(list_distinct(list_concat(sa.sh, sb.sh))) AS uni
      FROM pairs p
      JOIN shingled sa ON sa.doc_id = p.id_a
      JOIN shingled sb ON sb.doc_id = p.id_b
    )
    SELECT e.id_a AS doc_id,
           round(CAST(x.inter AS DOUBLE) / x.uni, 6) AS exact_jaccard,
           round(CAST(e.agree AS DOUBLE) / 16, 6) AS minhash_estimate,
           abs(CAST(e.agree AS DOUBLE) / 16
               - CAST(x.inter AS DOUBLE) / x.uni) <= 0.35 AS within_band
    FROM est e JOIN ex x USING (id_a) ORDER BY doc_id
    """,
)
def dedup_minhash_estimate_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash accuracy gate: on every planted near-dup pair, the
    16-hash signature agreement must estimate the exact shingle Jaccard
    within a 3-sigma band (sqrt(J(1-J)/16) ~ 0.12). Both the estimate and
    the exact value are deterministic (md5-derived mins, distinct-shingle
    sets), so the comparison hash-matches the oracle — the dedup
    machinery's statistical behavior is itself under test, the
    quality-gate pattern a production dedup pipeline monitors."""
    corpus = _with_near_copies(load_table(spark, sf_dir, "documents"))
    sh = corpus.select(
        "doc_id",
        TX.shingles("text", 3).alias("sh"),
    ).withColumn("sig", TX.minhash_signature(F.col("sh"), 16))
    a = sh.filter(F.col("doc_id") < _COPY_OFFSET).alias("a")
    b = sh.filter(F.col("doc_id") >= _COPY_OFFSET).alias("b")
    joined = a.join(
        b, F.col("b.doc_id") == F.col("a.doc_id") + _COPY_OFFSET
    ).select(
        F.col("a.doc_id").alias("doc_id"),
        F.col("a.sh").alias("sha"),
        F.col("b.sh").alias("shb"),
        F.col("a.sig").alias("siga"),
        F.col("b.sig").alias("sigb"),
    )
    agree = F.size(
        F.filter(
            F.zip_with("siga", "sigb", lambda x, y: x == y), lambda m: m
        )
    )
    inter = F.size(F.array_intersect("sha", "shb"))
    uni = F.size(F.array_union("sha", "shb"))
    est = agree.cast("double") / 16
    exact = inter.cast("double") / uni
    return joined.select(
        "doc_id",
        F.round(exact, 6).alias("exact_jaccard"),
        F.round(est, 6).alias("minhash_estimate"),
        (F.abs(est - exact) <= 0.35).alias("within_band"),
    ).orderBy("doc_id")


@register(
    "dedup_quality_survivors",
    oracle="WITH RECURSIVE "
    + _NEAR_CORPUS.strip()[len("WITH ") :]
    + ",\n"
    + _PAIRS_CTES.strip()
    + r"""
    , edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs
    ), reach(id, lbl) AS (
      SELECT DISTINCT src, src FROM edges
      UNION
      SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id
    ), cc AS (
      SELECT id AS doc_id, min(lbl) AS component FROM reach GROUP BY id
    ), labeled AS (
      SELECT c.doc_id, c.source, length(c.text) AS n_chars,
             coalesce(cc.component, c.doc_id) AS comp
      FROM corpus c LEFT JOIN cc ON cc.doc_id = c.doc_id
    ), surv AS (
      SELECT comp,
             arg_max(doc_id, n_chars * 10000000 - doc_id) AS doc_id,
             max(n_chars * 10000000 - doc_id) AS k
      FROM labeled GROUP BY comp
    )
    SELECT l.source, count(*) AS n_survivors,
           CAST(sum(l.doc_id) AS BIGINT) AS id_checksum,
           CAST(sum(l.n_chars) AS BIGINT) AS kept_chars
    FROM surv s JOIN labeled l ON l.doc_id = s.doc_id
    GROUP BY l.source ORDER BY l.source
    """,
)
def dedup_quality_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware near-dup survivorship: cluster candidates into
    connected components, then keep the BEST doc per cluster (longest
    text, tie-broken by smaller id via an exact integer composite key) —
    the production policy ("keep the richest copy"), vs the min-id
    convenience elsewhere. Composition of two verified operators plus one
    max_by aggregate; singletons survive as their own component."""
    corpus = _with_near_copies(load_table(spark, sf_dir, "documents"))
    pairs = DD.minhash_lsh_pairs(corpus, "text", "doc_id", num_hashes=16, bands=4)
    cc = DD.connected_components(pairs)
    labeled = (
        corpus.select("doc_id", "source", F.length("text").alias("n_chars"))
        .join(cc.withColumnRenamed("id", "doc_id"), "doc_id", "left")
        .withColumn("comp", F.coalesce("component", "doc_id"))
    )
    key = F.col("n_chars").cast("long") * 10_000_000 - F.col("doc_id")
    surv = labeled.groupBy("comp").agg(F.max_by("doc_id", key).alias("doc_id"))
    return (
        labeled.join(surv.select("doc_id"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_survivors"),
            F.sum("doc_id").cast("long").alias("id_checksum"),
            F.sum("n_chars").cast("long").alias("kept_chars"),
        )
        .orderBy("source")
    )


_SHINGLE_BANDS_SQL = r"""
  __P__sh AS (
    SELECT doc_id,
           CASE WHEN len(w) >= 3
                THEN list_distinct([array_to_string(w[i:i+2], ' ')
                                    FOR i IN generate_series(1, len(w)-2)])
                ELSE [array_to_string(w, ' ')] END AS sh
    FROM (SELECT doc_id, string_split_regex(text, '\s+') AS w FROM __T__)
  ), __P__mh AS (
    SELECT doc_id, k, min(md5(k || ':' || s)) AS h
    FROM (SELECT doc_id, unnest(sh) AS s FROM __P__sh)
    CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS k) ks
    GROUP BY doc_id, k
  ), __P__bands AS (
    SELECT doc_id, k // 4 AS band, string_agg(h, '' ORDER BY k) AS sig
    FROM __P__mh GROUP BY doc_id, k // 4
  )
"""


def _bands_cte(prefix: str, table: str) -> str:
    return _SHINGLE_BANDS_SQL.replace("__P__", prefix).replace("__T__", table)


_FRESH_TEXT_SQL = " || ' ' || ".join(
    f"md5('f{i}:' || CAST(doc_id AS VARCHAR))" for i in range(8)
)


@register(
    "dedup_incremental_batch",
    oracle=f"""
    WITH batch AS (
      SELECT doc_id + {_COPY_OFFSET} AS doc_id, text || ' zz' AS text,
             'near' AS kind
      FROM documents WHERE doc_id % 3 = 0
      UNION ALL
      SELECT doc_id + {2 * _COPY_OFFSET}, text, 'exact'
      FROM documents WHERE doc_id % 3 = 1
      UNION ALL
      SELECT doc_id + {3 * _COPY_OFFSET}, {_FRESH_TEXT_SQL}, 'fresh'
      FROM documents WHERE doc_id % 3 = 2
    ),
    {_bands_cte('c', 'documents')},
    {_bands_cte('b', 'batch')},
    nearhits AS (
      SELECT DISTINCT b.doc_id FROM bbands b
      JOIN cbands c ON b.band = c.band AND b.sig = c.sig
    ),
    cfp AS (
      SELECT DISTINCT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
        AS fp FROM documents
    ),
    exacthits AS (
      SELECT doc_id FROM (
        SELECT doc_id,
               md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
        FROM batch
      ) WHERE fp IN (SELECT fp FROM cfp)
    ),
    keep AS (
      SELECT * FROM batch
      WHERE doc_id NOT IN (SELECT doc_id FROM nearhits
                           UNION SELECT doc_id FROM exacthits)
    )
    SELECT kind, count(*) AS n_kept, CAST(sum(doc_id) AS BIGINT) AS id_checksum
    FROM keep GROUP BY kind ORDER BY kind
    """,
)
def dedup_incremental_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup of a NEW batch against the EXISTING corpus — the
    production shape ('dedup today's crawl against the persisted index'):
    exact drops via fingerprint semi-join, near drops via LSH band
    semi-join against the corpus signature index; the batch never joins
    corpus text. The planted batch mixes near-copies (must drop),
    exact copies (must drop), and md5-synthesized fresh docs (must
    survive); membership is pinned by id checksums."""
    docs = load_table(spark, sf_dir, "documents")
    near = docs.filter(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + _COPY_OFFSET).alias("doc_id"),
        F.concat("text", F.lit(" zz")).alias("text"),
        F.lit("near").alias("kind"),
    )
    exact = docs.filter(F.col("doc_id") % 3 == 1).select(
        (F.col("doc_id") + 2 * _COPY_OFFSET).alias("doc_id"),
        "text",
        F.lit("exact").alias("kind"),
    )
    fresh_text = F.concat_ws(
        " ",
        *[
            F.md5(F.concat(F.lit(f"f{i}:"), F.col("doc_id").cast("string")))
            for i in range(8)
        ],
    )
    fresh = docs.filter(F.col("doc_id") % 3 == 2).select(
        (F.col("doc_id") + 3 * _COPY_OFFSET).alias("doc_id"),
        fresh_text.alias("text"),
        F.lit("fresh").alias("kind"),
    )
    batch = near.unionByName(exact).unionByName(fresh)
    kept = DD.incremental_dedup_keepset(
        batch, docs.select("doc_id", "text"), "text", "doc_id"
    )
    return (
        kept.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("doc_id").cast("long").alias("id_checksum"),
        )
        .orderBy("kind")
    )


def _semantic_clusters_oracle() -> str:
    # the kmeans CTE chain lives next to the other similarity oracles;
    # the import is safe at module-register time (similarity_queries only
    # registers more queries — registration is name-keyed and idempotent
    # per process because modules import once)
    from horaedb_spark.queries.similarity_queries import kmeans_oracle_ctes

    qv = "[CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT) FOR x IN embedding]"
    corpus_select = f"""SELECT vec_id, {qv} AS qv FROM embeddings
      UNION ALL
      SELECT vec_id + {_COPY_OFFSET},
             [CAST(round(CAST(x AS DOUBLE) * 1000 + 20) AS BIGINT) FOR x IN embedding]
      FROM embeddings"""
    return f"""
    WITH {kmeans_oracle_ctes(8, 1, corpus_select)},
    dropped AS (
      SELECT DISTINCT fb.cid AS cell, b.vec_id AS vec_id
      FROM afinal fa JOIN q a ON a.vec_id = fa.vec_id
      JOIN afinal fb ON fb.cid = fa.cid AND fb.vec_id > fa.vec_id
      JOIN q b ON b.vec_id = fb.vec_id
      WHERE {_COS_SQL} >= 0.9
    )
    SELECT CAST(f.cid AS BIGINT) AS cid,
           CAST(count(*) AS BIGINT) AS n_members,
           CAST(count(d.vec_id) AS BIGINT) AS n_dropped,
           CAST(sum(CASE WHEN d.vec_id IS NULL THEN f.vec_id END) AS BIGINT) AS survivors_sum
    FROM afinal f LEFT JOIN dropped d ON d.vec_id = f.vec_id AND d.cell = f.cid
    GROUP BY f.cid ORDER BY cid
    """


@register("dedup_semantic_clusters", oracle=_semantic_clusters_oracle())
def dedup_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDedup-style semantic dedup: deterministic k-means (k=8, 1
    iteration) blocks the corpus into clusters; the exact quantized cosine
    runs ONLY on same-cluster pairs, and any doc with a higher-similarity
    (>= 0.9) smaller-id neighbour in its cluster is dropped. Planted
    shifted copies must land in their original's cluster and be caught.
    At scale, k grows with the corpus (k ~ N / target_cluster_size) so
    in-cluster candidate sets stay bounded — clustering IS the candidate
    generation; no corpus-wide pair join exists in the plan."""
    from horaedb_spark.functions.dedup import cosine
    from horaedb_spark.functions.similarity import kmeans_lloyd

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select("vec_id", quantize(F.col("embedding")).alias("qv"))
    shifted = emb.select(
        (F.col("vec_id") + _COPY_OFFSET).alias("vec_id"),
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x: F.round(x * 1000 + 20).cast("long"),
        ).alias("qv"),
    )
    corpus = base.unionByName(shifted)
    _, assign = kmeans_lloyd(corpus, "vec_id", "qv", k=8, iters=1)
    m = assign.select("cell", "vec_id", "qv")
    a, b = m.alias("a"), m.alias("b")
    cos = cosine(F.col("a.qv").cast("array<double>"), F.col("b.qv").cast("array<double>"))
    dropped = (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .filter(cos >= 0.9)
        .select(F.col("b.cell").alias("cell"), F.col("b.vec_id").alias("vec_id"))
        .distinct()
        .withColumn("is_dup", F.lit(1))
    )
    return (
        m.select("cell", "vec_id")
        .join(dropped, ["cell", "vec_id"], "left")
        .groupBy(F.col("cell").cast("long").alias("cid"))
        .agg(
            F.count("*").cast("long").alias("n_members"),
            F.sum(F.coalesce(F.col("is_dup"), F.lit(0))).cast("long").alias("n_dropped"),
            F.sum(F.when(F.col("is_dup").isNull(), F.col("vec_id"))).cast("long").alias("survivors_sum"),
        )
        .orderBy("cid")
    )




@register(
    "dedup_cluster_histogram",
    oracle="WITH RECURSIVE "
    + _NEAR_CORPUS.strip()[len("WITH ") :]
    + ",\n"
    + _PAIRS_CTES.strip()
    + r"""
    , edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs
    ), reach(id, lbl) AS (
      SELECT DISTINCT src, src FROM edges
      UNION
      SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id
    ), comp AS (
      SELECT id, min(lbl) AS component FROM reach GROUP BY id
    ), sizes AS (
      SELECT component, count(*) AS csize FROM comp GROUP BY component
    )
    SELECT csize, count(*) AS n_clusters,
           CAST(sum(component) AS BIGINT) AS comp_checksum
    FROM sizes GROUP BY csize ORDER BY csize
    """,
)
def dedup_cluster_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster size distribution — the report that tells a corpus
    curator whether duplication is pairwise noise or giant boilerplate
    families (the curation decision differs!). Same LSH pair graph and
    min-label-propagation fixpoint as dedup_connected_components, then two
    tiny aggregates (per-component size, size histogram); singleton docs
    never enter the pair graph and are out of scope by construction."""
    corpus = _with_near_copies(load_table(spark, sf_dir, "documents"))
    pairs = DD.minhash_lsh_pairs(corpus, "text", "doc_id", num_hashes=16, bands=4)
    cc = DD.connected_components(pairs)
    sizes = cc.groupBy("component").agg(F.count(F.lit(1)).alias("csize"))
    return (
        sizes.groupBy("csize")
        .agg(
            F.count(F.lit(1)).alias("n_clusters"),
            F.sum("component").alias("comp_checksum"),
        )
        .orderBy("csize")
    )


_SWEEP_THRESHOLDS = (0.5, 0.8, 0.9, 0.95, 0.99)


@register(
    "dedup_threshold_sweep",
    oracle=f"""
    WITH corpus AS (
      SELECT vec_id, [CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT) FOR x IN embedding] AS qv
      FROM embeddings
      UNION ALL
      SELECT vec_id + {_COPY_OFFSET},
             [CAST(round(CAST(x AS DOUBLE) * 1000 + 20) AS BIGINT) FOR x IN embedding]
      FROM embeddings
    ), buckets AS (
{_BUCKETS_SQL}
    ), pairs AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
             {_COS_SQL} AS cos_sim
      FROM buckets a JOIN buckets b
        ON a.tbl = b.tbl AND a.bkt = b.bkt AND a.vec_id < b.vec_id
      WHERE {_COS_SQL} >= {_SWEEP_THRESHOLDS[0]}
    ), thresholds AS (
      SELECT unnest([{", ".join(str(t) for t in _SWEEP_THRESHOLDS)}]) AS threshold
    )
    SELECT t.threshold,
           CAST(count(p.cos_sim) AS BIGINT) AS n_pairs,
           CAST(coalesce(sum(p.id_a + p.id_b), 0) AS BIGINT) AS pair_checksum
    FROM thresholds t LEFT JOIN pairs p ON p.cos_sim >= t.threshold
    GROUP BY t.threshold ORDER BY t.threshold
    """,
)
def dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup THRESHOLD SWEEP — the "choose your cutoff" report run
    before committing a dedup policy: candidate pairs come from the same
    4-table LSH blocking as dedup_embedding_cosine, the exact cosine is
    computed ONCE per candidate pair, and every sweep threshold counts
    from that one pass (a 5-row threshold table joins the pair set — no
    re-scan per cutoff). Checksums pin the exact pair membership at every
    threshold."""
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select("vec_id", quantize(F.col("embedding")).alias("qv"))
    shifted = emb.select(
        (F.col("vec_id") + _COPY_OFFSET).alias("vec_id"),
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x: F.round(x * 1000 + 20).cast("long"),
        ).alias("qv"),
    )
    corpus = base.unionByName(shifted)
    pairs = embedding_lsh_near_dup_pairs(
        corpus, "qv", "vec_id", _SWEEP_THRESHOLDS[0],
        dim=_LSH_DIM, num_planes=_LSH_PLANES, num_tables=_LSH_TABLES,
    )
    thresholds = spark.createDataFrame(
        [(t,) for t in _SWEEP_THRESHOLDS], "threshold double"
    )
    joined = F.broadcast(thresholds).join(
        pairs, pairs.cos_sim >= thresholds.threshold, "left"
    )
    return (
        joined.groupBy("threshold")
        .agg(
            F.count("cos_sim").alias("n_pairs"),
            F.coalesce(F.sum(F.col("id_a") + F.col("id_b")), F.lit(0))
            .cast("long")
            .alias("pair_checksum"),
        )
        .orderBy("threshold")
    )


@register(
    "dedup_span_stats",
    # corpus: documents + planted near-copies that share the FIRST half of
    # an original (a duplicated leading span with a divergent tail) — the
    # exact case span-level dedup exists for and whole-doc dedup misses
    oracle=_HALF_COPY_CORPUS
    + """
    , toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         w -> w != '') AS t
      FROM corpus
    ), wins AS (
      SELECT doc_id,
             unnest(CASE WHEN len(t) <= 20
                    THEN [md5(array_to_string(t[1:20], ' '))]
                    ELSE [md5(array_to_string(t[(i-1)*10+1:(i-1)*10+20], ' '))
                          FOR i IN generate_series(1, (len(t)-20)//10 + 1)]
                    END) AS h
      FROM toks
    ), dup_h AS (
      SELECT h FROM wins GROUP BY h HAVING count(DISTINCT doc_id) >= 2
    ), flagged AS (
      SELECT w.doc_id, count(*) AS n_dup
      FROM wins w JOIN dup_h USING (h) GROUP BY w.doc_id
    )
    SELECT t.doc_id,
           count(*) AS n_windows,
           CAST(coalesce(max(f.n_dup), 0) AS BIGINT) AS n_dup_windows,
           round(coalesce(max(f.n_dup), 0) / CAST(count(*) AS DOUBLE), 6)
             AS dup_fraction
    FROM wins t LEFT JOIN flagged f ON t.doc_id = f.doc_id
    GROUP BY t.doc_id ORDER BY t.doc_id
    """,
)
def dedup_span_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level dedup (ExactSubstr-lite): 20-token/stride-10 fingerprint
    windows; windows shared by ≥2 docs mark duplicated spans; per-doc
    duplicated fraction is the trim/retain signal. The planted corpus
    copies each 5th document's FIRST HALF with a divergent tail — whole-doc
    dedup (exact/minhash at tight thresholds) misses these, the span
    fraction exposes them (docs shorter than ~2 windows are below the
    method's granularity floor — their half merges with the divergent tail
    inside a single fingerprint; that is inherent to windowed span dedup,
    not a defect). Row-local explode + one md5-keyed aggregate +
    semi-join back: no text ever shuffles."""
    corpus = _with_half_copies(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    from horaedb_spark.functions.dedup import duplicated_span_stats

    return duplicated_span_stats(corpus, "doc_id", "text").orderBy("doc_id")


@register(
    "dedup_split_decontaminate",
    # pairs come from the SHARED _PAIRS_CTES chain (same candidate set as
    # dedup_minhash_lsh / dedup_connected_components), not another copy
    oracle=_NEAR_CORPUS
    + ", "
    + _PAIRS_CTES.strip()
    + r"""
    , sp AS (
      SELECT doc_id,
             CASE WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 2)
                       < '1a'
                  THEN 'test' ELSE 'train' END AS split
      FROM corpus
    ), leaks AS (
      SELECT CASE WHEN sa.split = 'train' THEN p.id_a ELSE p.id_b END
               AS doc_id,
             CASE WHEN sa.split = 'train' THEN p.id_b ELSE p.id_a END
               AS test_id
      FROM pairs p
      JOIN sp sa ON sa.doc_id = p.id_a
      JOIN sp sb ON sb.doc_id = p.id_b
      WHERE sa.split <> sb.split
    )
    SELECT doc_id, count(DISTINCT test_id) AS n_test_neighbors
    FROM leaks GROUP BY doc_id ORDER BY doc_id
    """,
)
def dedup_split_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/test split: near-dup pairs (the same word-3-
    shingle → 16-minhash → 4-band LSH pipeline as dedup_minhash_lsh) that
    CROSS the deterministic md5 split boundary identify train documents
    whose near-copy sits in the test set — the docs a leakage-safe
    pipeline must drop from train before training (exact-match
    decontamination alone misses them; pipeline_decontamination is the
    exact-overlap complement). Output: each leaked train doc with its
    distinct test-neighbor count.

    100 TB shape: the split is row-local (no shuffle), candidate pairs
    come from the banded (and at scale band-bucket-capped) LSH join —
    never a cross join — and the split lookup is a hash join on doc_id;
    per-doc neighbor counts are bounded by the LSH cluster cap."""
    from horaedb_spark.functions.sampling import train_test_split

    corpus = _with_near_copies(load_table(spark, sf_dir, "documents"))
    sp = train_test_split(corpus, "doc_id").select("doc_id", "split")
    pairs = DD.minhash_lsh_pairs(corpus, "text", "doc_id", num_hashes=16, bands=4)
    e = (
        pairs.join(
            sp.withColumnsRenamed({"doc_id": "id_a", "split": "split_a"}),
            "id_a",
        )
        .join(
            sp.withColumnsRenamed({"doc_id": "id_b", "split": "split_b"}),
            "id_b",
        )
        .filter(F.col("split_a") != F.col("split_b"))
    )
    leaks = e.select(
        F.when(F.col("split_a") == "train", F.col("id_a"))
        .otherwise(F.col("id_b"))
        .alias("doc_id"),
        F.when(F.col("split_a") == "train", F.col("id_b"))
        .otherwise(F.col("id_a"))
        .alias("test_id"),
    )
    return (
        leaks.groupBy("doc_id")
        .agg(F.countDistinct("test_id").alias("n_test_neighbors"))
        .orderBy("doc_id")
    )


@register(
    "dedup_quality_representatives",
    oracle="WITH RECURSIVE "
    + _NEAR_CORPUS.strip()[len("WITH ") :]
    + ",\n"
    + _PAIRS_CTES.strip()
    + r"""
    , edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs
    ), reach(id, lbl) AS (
      SELECT DISTINCT src, src FROM edges
      UNION
      SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id
    ), comp AS (
      SELECT id, min(lbl) AS component FROM reach GROUP BY id
    ), lab AS (
      SELECT s.doc_id,
             coalesce(c.component, s.doc_id) AS component,
             len(string_split_regex(s.text, '\s+')) AS n_words
      FROM corpus s LEFT JOIN comp c ON c.id = s.doc_id
    ), ranked AS (
      SELECT *,
             row_number() OVER (PARTITION BY component
                                ORDER BY n_words DESC, doc_id) AS rn,
             count(*) OVER (PARTITION BY component) AS cluster_size
      FROM lab
    )
    SELECT component, doc_id AS kept_doc, n_words AS kept_words,
           cluster_size
    FROM ranked WHERE rn = 1 ORDER BY component
    """,
)
def dedup_quality_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware survivor selection per near-dup cluster: LSH pairs →
    transitive components (min-label propagation) → keep the HIGHEST-
    quality member of every cluster (longest by whitespace token count,
    doc_id tie-break) instead of the arbitrary min-id — how production
    dedup actually picks survivors (keep the richest copy, drop the
    truncated ones). Docs with no near-dup are their own singleton
    cluster. The oracle recomputes the closure with a recursive CTE and
    the same argmax.

    100 TB shape: pairs are banded LSH (never cross-join), the closure is
    per-round join + min-agg on the PAIR GRAPH only (near-dup nodes, a
    tiny fraction of the corpus), and the representative choice is one
    window over cluster-partitioned rows."""
    from pyspark.sql.window import Window

    corpus = _with_near_copies(load_table(spark, sf_dir, "documents"))
    pairs = DD.minhash_lsh_pairs(corpus, "text", "doc_id", num_hashes=16, bands=4)
    cc = DD.connected_components(pairs)
    scored = corpus.select(
        "doc_id", F.size(F.split(F.col("text"), r"\s+")).alias("n_words")
    )
    lab = (
        scored.join(cc, scored.doc_id == cc.id, "left")
        .withColumn("component", F.coalesce("component", "doc_id"))
        .select("doc_id", "component", "n_words")
    )
    w = Window.partitionBy("component").orderBy(
        F.desc("n_words"), F.asc("doc_id")
    )
    ranked = lab.withColumn("rn", F.row_number().over(w)).withColumn(
        "cluster_size", F.count(F.lit(1)).over(Window.partitionBy("component"))
    )
    return (
        ranked.filter(F.col("rn") == 1)
        .select(
            "component",
            F.col("doc_id").alias("kept_doc"),
            F.col("n_words").alias("kept_words"),
            "cluster_size",
        )
        .orderBy("component")
    )


@register(
    "dedup_exact_substr",
    # corpus: documents + half-copies (shared leading span, divergent tail)
    # — the planted spans full-strength ExactSubstr must recover EXACTLY
    # (token-precise lengths, unlike the windowed dedup_span_stats)
    oracle=_HALF_COPY_CORPUS
    + _SUBSTR_SHINGLE_CTES
    + """
    , freq AS (
      SELECT h FROM sh GROUP BY h
      HAVING count(DISTINCT doc_id) BETWEEN 2 AND 50 AND count(*) <= 200
    ), shf AS (
      SELECT sh.doc_id, sh.pos, sh.h FROM sh JOIN freq USING (h)
    ), anch AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.pos AS pos_a,
             a.pos - b.pos AS diag
      FROM shf a JOIN shf b USING (h)
      WHERE a.doc_id < b.doc_id
    ), runs AS (
      SELECT id_a, id_b, diag, pos_a,
             pos_a - row_number()
               OVER (PARTITION BY id_a, id_b, diag ORDER BY pos_a) AS grp
      FROM anch
    ), spans AS (
      SELECT id_a, id_b, count(*) + 9 AS span_len
      FROM runs GROUP BY id_a, id_b, diag, grp
    )
    SELECT id_a, id_b,
           CAST(max(span_len) AS BIGINT) AS longest_shared_span,
           count(*) AS n_shared_spans,
           CAST(sum(span_len) AS BIGINT) AS shared_span_tokens
    FROM spans GROUP BY id_a, id_b ORDER BY id_a, id_b
    """,
)
def dedup_exact_substr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-strength ExactSubstr: token-exact maximal shared spans per doc
    pair via sorted stride-1 shingles + diagonal run extension (the Spark
    suffix-array equivalent — see functions.dedup.exact_substr_spans). The
    planted corpus copies each 5th document's first half verbatim with a
    divergent tail; the operator must report the shared span at its EXACT
    token length (half the doc), where the windowed dedup_span_stats can
    only localize it to a stride-10 window. Also surfaces the generator's
    own verbatim cross-doc repeats (spans up to ~95 tokens at sf0.001).

    100 TB shape: shuffle is shingle-sized (one md5 aggregate + a join
    inside duplicated-shingle groups capped at 50 docs); no doc-pair
    cross join anywhere; the island window partitions on (pair, diagonal)
    — many small keys, no global window."""
    corpus = _with_half_copies(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    # reuse_filtered=True (round 15, VERDICT r14 #4): caller-level opt-in
    # to checkpointing the FILTERED shingle stream once instead of
    # re-deriving scan→tokenize→explode→aggregate→semi-join for each pair
    # join side. The checkpointed frame is the duplicated-shingle stream —
    # already capped per shingle (nd<=50, nocc<=200) and a small fraction
    # of the corpus, i.e. the bounded side of the SCALING.md
    # localCheckpoint boundary, not the raw corpus. Interleaved A/B at
    # sf0.1 (this round's host, best-of-4 alternating): 3.3-4.7 s
    # checkpointed vs 4.5-8.7 s declarative — the checkpointed side won
    # every pair. The LIBRARY default stays declarative (fault-tolerance
    # argument in functions/dedup.py stands for arbitrary callers).
    return DD.exact_substr_spans(
        corpus, "doc_id", "text", min_span=10, max_docs_per_shingle=50,
        reuse_filtered=True,
    ).orderBy("id_a", "id_b")


@register(
    "dedup_exact_substr_prune",
    # same half-copy corpus as dedup_exact_substr: the planted copies'
    # leading halves are LATER occurrences (doc_id + offset sorts after
    # the original) and must be pruned; originals keep their tokens
    oracle=_HALF_COPY_CORPUS
    + _SUBSTR_SHINGLE_CTES
    + """
    , marked AS (
      SELECT doc_id, pos, pos + 9 AS e
      FROM (SELECT doc_id, pos, h,
                   row_number() OVER (PARTITION BY h ORDER BY doc_id, pos)
                     AS rn
            FROM sh)
      WHERE rn >= 2
    ), isl AS (
      SELECT doc_id, pos, e,
             CASE WHEN max(e) OVER (PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
                  OR pos > max(e) OVER (PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  THEN 1 ELSE 0 END AS new_isl
      FROM marked
    ), isl2 AS (
      SELECT doc_id, pos, e,
             sum(new_isl) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
      FROM isl
    ), spans AS (
      SELECT doc_id, max(e) - min(pos) + 1 AS span_len
      FROM isl2 GROUP BY doc_id, g
    ), per_doc AS (
      SELECT doc_id, CAST(sum(span_len) AS BIGINT) AS removed_tokens,
             count(*) AS n_removed_spans,
             CAST(max(span_len) AS BIGINT) AS longest_removed_span
      FROM spans GROUP BY doc_id
    )
    SELECT t.doc_id, len(t.t) AS n_tokens,
           coalesce(p.removed_tokens, 0) AS removed_tokens,
           len(t.t) - coalesce(p.removed_tokens, 0) AS kept_tokens,
           coalesce(p.n_removed_spans, 0) AS n_removed_spans,
           coalesce(p.longest_removed_span, 0) AS longest_removed_span
    FROM toks t LEFT JOIN per_doc p USING (doc_id)
    ORDER BY doc_id
    """,
)
def dedup_exact_substr_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REMOVAL half of ExactSubstr: per-document pruned-span stats
    under keep-first-occurrence — every 10-token shingle with an earlier
    occurrence anywhere in the corpus marks its span; overlapping marks
    merge (interval union). The planted half-copies sort AFTER their
    originals, so the copies lose their duplicated leading halves while
    originals keep every token — the asymmetric outcome that
    distinguishes pruning from the symmetric pair view
    (dedup_exact_substr). Also prunes the generator's own verbatim
    repeats and in-document repetition.

    100 TB shape: NO pair join — one row_number window keyed on the
    16-byte shingle hash (first occurrence wins) and one per-doc interval
    union; cost stays linear in shingles even for boilerplate shared by
    millions of docs, which is why the pair operator's frequency cap is
    unnecessary here."""
    corpus = _with_half_copies(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    return DD.exact_substr_prune_stats(
        corpus, "doc_id", "text", min_span=10
    ).orderBy("doc_id")
