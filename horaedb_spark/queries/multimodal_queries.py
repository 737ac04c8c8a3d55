"""Multimodal-column queries: binary payloads + typed metadata + the
mapInPandas feature-extraction plumbing (decode stubbed — no codec libs in
this container; the Spark-side schema/batching/partitioning is real)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from horaedb_spark.functions.multimodal import attach_media_meta, extract_features
from horaedb_spark.queries.registry import register
from horaedb_spark.queries.tables import load_table


def _media_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text UTF-8 bytes standing in for opaque media payloads."""
    docs = load_table(spark, sf_dir, "documents")
    payloads = docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    return attach_media_meta(payloads, "payload", "text", "text/plain")


@register(
    "multimodal_metadata",
    oracle="""
    SELECT doc_id AS media_id, 'text' AS modality,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS digest
    FROM documents ORDER BY media_id
    """,
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload + metadata struct: byte length and content digest
    computed on the opaque bytes."""
    media = _media_frame(spark, sf_dir)
    return media.select(
        F.col("doc_id").alias("media_id"),
        F.col("media_meta.modality").alias("modality"),
        F.octet_length("payload").alias("n_bytes"),
        F.md5("payload").alias("digest"),
    ).orderBy("media_id")


@register(
    "multimodal_feature_extract",
    # The stub extractor is deterministic (stride-8 byte-histogram moments),
    # so the mapInPandas stage is hard-verifiable: documents.text is ASCII
    # (checked: octet_length(encode(text)) == length(text) at every SF), so
    # ord(substring) enumerates the same bytes Python sees.
    oracle="""
    SELECT doc_id AS media_id, 'text' AS modality,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS digest,
           round(coalesce(list_aggregate(
             [ord(substring(text, CAST(p AS INT), 1))
              FOR p IN generate_series(1, length(text)) IF (p - 1) % 8 = 0],
             'avg'), 0.0) / 255.0, 6) AS f0,
           CAST(8 AS INT) AS feature_dim
    FROM documents ORDER BY media_id
    """,
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads (stubbed
    byte-histogram extractor standing in for a decode+embed model): exercises
    the mapInPandas operator shape — schema, batch iteration, executor-side
    byte handling. The stub is deterministic, so the whole Arrow round-trip
    is oracle-gated, not rows-only."""
    media = _media_frame(spark, sf_dir)
    feats = extract_features(media, "doc_id", "payload")
    return feats.select(
        "media_id",
        "modality",
        "n_bytes",
        "digest",
        F.round(F.element_at("features", 1), 6).alias("f0"),
        F.size("features").alias("feature_dim"),
    ).orderBy("media_id")


@register(
    "multimodal_frame_sample",
    oracle="""
    WITH docs AS (
      SELECT doc_id, text, length(text) // 256 AS n_frames FROM documents
    ), idx AS (
      SELECT unnest(generate_series(0, 3)) AS j
    ), frames AS (
      SELECT DISTINCT doc_id, (j * n_frames) // 4 AS frame_idx
      FROM docs CROSS JOIN idx WHERE n_frames > 0
    )
    SELECT f.doc_id AS media_id, f.frame_idx,
           md5(substring(d.text, CAST(f.frame_idx * 256 + 1 AS BIGINT), 256))
               AS frame_digest,
           256 AS frame_bytes
    FROM frames f JOIN docs d USING (doc_id)
    ORDER BY media_id, frame_idx
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over opaque payloads (mapInPandas): up to 4 evenly
    spaced 256-byte frames per document payload, digest per frame. The
    byte-window slicer stands in for a demuxer; batching/schema are the real
    operator. (Text is ASCII, so the oracle's char slicing == byte slicing.)"""
    from horaedb_spark.functions.multimodal import sample_frames

    media = _media_frame(spark, sf_dir)
    out = sample_frames(media, "doc_id", "payload", frame_size=256, k=4)
    return out.select(
        "media_id", "frame_idx", "frame_digest", F.col("frame_bytes").cast("int").alias("frame_bytes")
    ).orderBy("media_id", "frame_idx")


@register(
    "multimodal_dedup",
    oracle="""
    WITH media AS (
      SELECT doc_id AS media_id, md5(text) AS digest FROM documents
      UNION ALL
      SELECT doc_id + 500000, md5(text) FROM documents WHERE doc_id % 5 = 0
    ), cl AS (
      SELECT digest, count(*) AS n_copies, min(media_id) AS survivor,
             CAST(sum(media_id) AS BIGINT) AS id_checksum
      FROM media GROUP BY digest
    )
    SELECT digest, CAST(n_copies AS BIGINT) AS n_copies, survivor, id_checksum
    FROM cl WHERE n_copies > 1 ORDER BY digest
    """,
)
def multimodal_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload dedup by content digest — the first pass of any
    image/audio dedup stack (byte-identical copies collapse BEFORE any
    decode or perceptual hashing spends a cycle). One hash aggregate over
    md5(payload); survivor = smallest id; the id checksum pins exact
    cluster membership. Planted byte-identical copies (every 5th payload)
    must be caught."""
    media = _media_frame(spark, sf_dir)
    copies = media.filter(F.col("doc_id") % 5 == 0).withColumn(
        "doc_id", F.col("doc_id") + 500000
    )
    allm = media.unionByName(copies)
    return (
        allm.groupBy(F.md5("payload").alias("digest"))
        .agg(
            F.count("*").cast("long").alias("n_copies"),
            F.min("doc_id").alias("survivor"),
            F.sum("doc_id").cast("long").alias("id_checksum"),
        )
        .filter(F.col("n_copies") > 1)
        .select("digest", "n_copies", "survivor", "id_checksum")
        .orderBy("digest")
    )

@register(
    "multimodal_phash_near_dup",
    # documents.text is ASCII (checked in multimodal_feature_extract), so
    # ord(substring) enumerates the same bytes the engine hashes.
    oracle="""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, text || ' zz' FROM documents
    ), cellcodes AS (
      SELECT doc_id,
             unnest([(p - 1) % 16 FOR p IN generate_series(1, length(text))])
               AS cell,
             unnest([ord(substring(text, CAST(p AS INT), 1))
                     FOR p IN generate_series(1, length(text))]) AS code
      FROM corpus
    ), per_cell AS (
      SELECT doc_id, cell, sum(code) AS s, count(*) AS n
      FROM cellcodes GROUP BY 1, 2
    ), hashes AS (
      SELECT doc_id,
             list(CASE WHEN m > gm THEN 1 ELSE 0 END ORDER BY cell) AS bits
      FROM (
        SELECT doc_id, cell, s * 1.0 / n AS m,
               sum(s) OVER (PARTITION BY doc_id) * 1.0
                 / sum(n) OVER (PARTITION BY doc_id) AS gm
        FROM per_cell
      ) GROUP BY doc_id
    ), banded AS (
      SELECT doc_id, bits, b,
             array_to_string(bits[b * 4 + 1 : b * 4 + 4], '') AS bkey
      FROM hashes, (SELECT unnest(generate_series(0, 3)) AS b)
    ), pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b,
             a.bits AS ba, c.bits AS bb
      FROM banded a JOIN banded c
        ON a.b = c.b AND a.bkey = c.bkey AND a.doc_id < c.doc_id
    ), ham AS (
      SELECT id_a, id_b,
             list_sum([abs(ba[i] - bb[i])
                       FOR i IN generate_series(1, 16)]) AS distance
      FROM pairs
    )
    SELECT CAST(distance AS BIGINT) AS distance,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(id_a + id_b) AS BIGINT) AS id_checksum
    FROM ham WHERE distance <= 3
    GROUP BY 1 ORDER BY distance
    """,
)
def multimodal_phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-duplicate detection for media payloads: aHash
    bits over the deterministic fake decode (byte stride cells standing in
    for a resized grayscale thumbnail), 4-bit LSH bands bound the candidate
    space, exact Hamming distance (<= 3) verifies — the image-dedup
    pipeline stage with the codec swapped for the container-safe stub. A
    perturbed copy of every document is planted; the banded join must
    recover the low-distance pairs without any all-pairs comparison.
    Output: pair count + id checksum per Hamming distance."""
    from horaedb_spark.functions.multimodal import perceptual_hash_bits

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    copies = docs.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat("text", F.lit(" zz")).alias("text"),
    )
    corpus = docs.unionByName(copies)
    hashes = perceptual_hash_bits(corpus, "doc_id", "text", 16)
    banded = hashes.select(
        "doc_id",
        "bits",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(3)),
                lambda b: F.struct(
                    b.alias("b"),
                    F.concat_ws(
                        "", F.slice("bits", b * 4 + 1, 4)
                    ).alias("bkey"),
                ),
            )
        ).alias("bd"),
    ).select("doc_id", "bits", F.col("bd.b").alias("b"), F.col("bd.bkey").alias("bkey"))
    a, c = banded.alias("a"), banded.alias("c")
    pairs = (
        a.join(
            c,
            (F.col("a.b") == F.col("c.b"))
            & (F.col("a.bkey") == F.col("c.bkey"))
            & (F.col("a.doc_id") < F.col("c.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("c.doc_id").alias("id_b"),
            F.col("a.bits").alias("ba"),
            F.col("c.bits").alias("bb"),
        )
        .distinct()
    )
    ham = pairs.select(
        "id_a",
        "id_b",
        F.aggregate(
            F.zip_with("ba", "bb", lambda x, y: F.abs(x - y)),
            F.lit(0),
            lambda acc, x: acc + x,
        ).alias("distance"),
    )
    return (
        ham.filter(F.col("distance") <= 3)
        .groupBy("distance")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum(F.col("id_a") + F.col("id_b")).cast("long").alias("id_checksum"),
        )
        .select(F.col("distance").cast("long"), "n_pairs", "id_checksum")
        .orderBy("distance")
    )

