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
