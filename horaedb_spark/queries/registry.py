"""Query registry — the judge-facing inventory.

Every implemented operator from SURVEY.md §2 registers here as a
``(spark, sf_dir) -> DataFrame`` callable plus (where SQL-expressible) a
DuckDB oracle SQL string over the same parquet tables. ``__spark_entry__``
re-exports the two maps verbatim.

Conventions that make the driver's hash comparison deterministic:
- every computed column is aliased identically in the Spark plan and the SQL;
- double aggregates are rounded (2 digits for monetary sums, 6 for ratios)
  on BOTH sides — partial/final aggregation order in Spark vs sequential
  DuckDB can differ in the last ulp;
- timestamps in outputs are rendered as epoch-ms longs or formatted strings,
  never raw timestamp values;
- rounded columns that can go negative get ``+ 0`` in the ORACLE SQL:
  DuckDB's round keeps IEEE -0.0 while Spark's BigDecimal round returns
  +0.0, so a tiny negative value would hash as "-0.0" vs "0.0" (observed
  at sf0.1 in the rate family; adding zero collapses the sign bit).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str


QUERIES: dict[str, Query] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: register a query (and its DuckDB oracle) in the inventory."""

    def wrap(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = Query(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return wrap


_QUERY_MODULES = (
    "promql_parse_queries",
    "promql_fn_queries",
    "search_queries",
    "pipeline_queries",
    "dedup_queries",
    "similarity_queries",
    "text_queries",
    "multimodal_queries",
    "events_queries",
    "analytics4",
    "streaming_queries",
    "metric_queries",
    "metric_store_queries",
    "storage_queries",
    "sources_queries",
    "setops_queries",
    "analytics",
    "analytics2",
    "analytics3",
    "analytics5",
    "analytics6",
)

# The driver's correctness run walks queries in map order and covers only
# ~44-50 per round (time-capped). Queries that still lack ANY green driver
# row across all rounds surface FIRST (a query that never had hard signal is
# the most valuable row to produce) — round 10 rotated out the 50 names the
# r08/r09 samples already confirmed and promoted the 96 never-drawn ones,
# led by the round-9 additions (multi-field catalog, bucketed scan) and the
# shared-fixture promql tail. The 12 queries that were drawn early but
# errored on since-fixed issues (TIMESTAMP_NTZ shift, oracle typing) come
# next; everything already driver-green follows in registration order. Keep
# this list in sync with the latest CORRECTNESS_r{N}.json: drop names once
# green, promote any regression.
_RUN_FIRST = (
    "metric_mirror_select",
    "metric_mirror_promql",
    "metric_mirror_multi_field",
    "metric_mirror_time_range",
    "streaming_mirror_serve",
    "dedup_split_decontaminate",
    "dedup_quality_representatives",
    "ann_filtered_topk",
    "ann_ivf_filtered_topk",
    "metric_multi_field_select",
    "metric_field_catalog",
    "remote_write_multi_field",
    "promql_field_matcher",
    "storage_bucketed_scan",
    "metric_packed_scan",
    "metric_packed_promql",
    "metric_packed_multi_field",
    "promql_parse_eval",
    "remote_write_ingest",
    "remote_write_exemplars",
    "promql_irate",
    "promql_delta_idelta",
    "promql_over_time",
    "promql_topk",
    "promql_bottomk",
    "promql_histogram_quantile",
    "promql_instant_vector",
    "promql_resets_changes",
    "promql_quantile_stddev",
    "metric_label_replace_join",
    "promql_vector_ratio",
    "metric_label_names",
    "metric_series_list",
    "promql_gap_fill",
    "promql_deriv_predict",
    "promql_clamp",
    "promql_count_values",
    "promql_absent",
    "promql_holt_winters",
    "promql_math_functions",
    "promql_time_functions",
    "promql_offset_dod",
    "promql_subquery_max_rate",
    "metric_agg_stddev_quantile",
    "promql_limitk_ratio",
    "promql_moving_avg",
    "promql_zscore_anomalies",
    "promql_edge_over_time",
    "promql_sliding_rate",
    "promql_sliding_increase",
    "promql_sliding_over_time",
    "promql_sliding_histogram_quantile",
    "streaming_promql_eval",
    "promql_alert_states",
    "promql_recording_rules",
    "promql_alerting_rules",
    "promql_power_div_guard",
    "promql_atan2_at_end",
    "promql_fn_eval",
    "promql_slo_burn_rate",
    "streaming_late_data",
    "streaming_session_window",
    "streaming_stream_join",
    "streaming_dedup",
    "streaming_enrich_join",
    "streaming_continuous_rollup",
    "streaming_ann_retrieval",
    "streaming_heavy_hitters",
    "storage_incremental_rollup",
    "storage_retention_downsample",
    "storage_zorder_scan",
    "storage_snapshot_diff",
    "analyze_table_profile",
    "ann_recall_check",
    "ann_rerank_pipeline",
    "ann_pq_topk",
    "ann_bruteforce_topk_arrow",
    "ann_ivf_topk_large_queryset",
    "ann_ivf_topk_arrow",
    "pipeline_corpus_clean",
    "pipeline_length_histogram",
    "pipeline_token_budget",
    "pipeline_export_shards",
    "pipeline_contamination_rate",
    "pipeline_weighted_resample",
    "dedup_prefix_cluster",
    "dedup_minhash_estimate_check",
    "dedup_quality_survivors",
    "dedup_incremental_batch",
    "dedup_semantic_clusters",
    "dedup_minhash_capped",
    "multimodal_dedup",
    "multimodal_phash_near_dup",
    "sketch_heavy_hitters",
    "sketch_hll_distinct",
    "sketch_kmv_overlap",
    "text_bigram_lm",
    "text_bpe_pairs",
    "text_char_entropy",
    "text_bpe_batched",
    "embedding_kmeans",
    "embedding_label_outliers",
    "campaign_interval_join",
    "user_journey_paths",
    "dq_referential_check",
    "returned_item_losses_q10",
    # --- drawn in r1/r2 but errored on since-fixed issues: re-confirm
    "streaming_ingest_scan",
    "streaming_stateful_increase",
    "streaming_window_agg",
    "storage_stats_pruned_scan",
    "storage_continuous_rollup",
    "funnel_conversion",
    "retention_cohorts",
    "approx_sketches",
    "multimodal_feature_extract",
    "pipeline_sequence_packing",
    "text_token_stats",
    "shipmode_priority_q12",
)


def _ordered() -> dict[str, Query]:
    first = [n for n in _RUN_FIRST if n in QUERIES]
    rest = [n for n in QUERIES if n not in set(_RUN_FIRST)]
    return {n: QUERIES[n] for n in (*first, *rest)}


def _load_modules() -> None:
    # Import for registration side effects. Modules not yet written are
    # skipped; anything else (syntax/runtime error) propagates loudly.
    import importlib

    for mod in _QUERY_MODULES:
        name = f"horaedb_spark.queries.{mod}"
        try:
            importlib.import_module(name)
        except ModuleNotFoundError as e:
            if e.name != name:
                raise


def queries_map() -> dict[str, QueryFn]:
    _load_modules()
    return {name: q.fn for name, q in _ordered().items()}


def oracle_sql_map() -> dict[str, str]:
    _load_modules()
    return {name: q.oracle for name, q in _ordered().items() if q.oracle is not None}
