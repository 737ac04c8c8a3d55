"""Full-text retrieval queries (LLM-pipeline surface): inverted-index term
statistics and BM25 ranking, each verified against a DuckDB oracle that
recomputes the same statistics and scores from scratch."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from horaedb_spark.functions.search import bm25_topk, term_stats
from horaedb_spark.queries.registry import register
from horaedb_spark.queries.tables import load_table

_QUERY_TERMS = ["merge", "window", "spark"]
_K1, _B, _TOPK = 1.2, 0.75, 10


@register(
    "text_bm25_topk",
    oracle=rf"""
    WITH d AS (
      SELECT doc_id, string_split_regex(lower(text), '\s+') AS w,
             len(string_split_regex(lower(text), '\s+')) AS dl
      FROM documents
    ), stats AS (
      SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM d
    ), hits AS (
      SELECT doc_id, dl,
             unnest(list_filter(w, t -> list_contains({_QUERY_TERMS!r}, t))) AS term
      FROM d
    ), tf AS (
      SELECT doc_id, term, count(*) AS tf, min(dl) AS dl
      FROM hits GROUP BY doc_id, term
    ), dft AS (
      SELECT term, count(*) AS df FROM tf GROUP BY term
    ), scored AS (
      SELECT tf.doc_id,
             round(sum(ln(1 + (n_docs - df + 0.5) / (df + 0.5))
                   * (tf * ({_K1} + 1))
                   / (tf + {_K1} * (1 - {_B} + {_B} * dl / avgdl))), 6) AS score
      FROM tf JOIN dft USING (term) CROSS JOIN stats
      GROUP BY tf.doc_id
    )
    SELECT doc_id, score,
           CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS rank
    FROM scored QUALIFY rank <= {_TOPK} ORDER BY rank
    """,
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 for a fixed bag-of-terms query. The corpus-wide pass is
    length-only (no explode); only query-term hits are exploded, so shuffle
    volume is O(hit set). Term df stats and corpus scalars ride broadcast
    joins; the rounded-score + id tie-break makes the cut deterministic."""
    docs = load_table(spark, sf_dir, "documents")
    return bm25_topk(docs, _QUERY_TERMS, k1=_K1, b=_B, top_k=_TOPK)


@register(
    "text_term_stats",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS term
      FROM documents
    ), per_doc AS (
      SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY term, doc_id
    )
    SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS total_tf
    FROM per_doc GROUP BY term HAVING count(*) >= 2
    ORDER BY term
    """,
)
def text_term_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index dictionary: per-term document frequency and corpus
    term frequency (min_df=2) — explode + two hash aggregates, the shape a
    vocabulary build runs at corpus scale."""
    docs = load_table(spark, sf_dir, "documents")
    return term_stats(docs, min_df=2).orderBy("term")
