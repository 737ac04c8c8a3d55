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
