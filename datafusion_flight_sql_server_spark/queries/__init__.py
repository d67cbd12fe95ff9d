"""Declared operator/query catalog (SURVEY.md §2).

Importing this package populates :data:`REGISTRY`; ``__spark_entry__.py``
derives ``queries()`` and ``oracle_sql()`` from it.

The registry is re-ordered after population: the driver's round-1
correctness run covered exactly the first 50 registered queries, so entries
are sorted by verification priority — extension/new operators that have
never received a driver CORRECTNESS row come first, the relational long tail
(every row already fully green in CORRECTNESS_r01.json) last.
"""

from datafusion_flight_sql_server_spark.queries.catalog import REGISTRY, QuerySpec, query

# Register all query modules (import side effects populate REGISTRY).
from datafusion_flight_sql_server_spark.queries import relational  # noqa: F401
from datafusion_flight_sql_server_spark.queries import functions_q  # noqa: F401
from datafusion_flight_sql_server_spark.queries import windows_q  # noqa: F401
from datafusion_flight_sql_server_spark.queries import extensions  # noqa: F401
from datafusion_flight_sql_server_spark.queries import sources_q  # noqa: F401
from datafusion_flight_sql_server_spark.queries import pipeline_q  # noqa: F401
from datafusion_flight_sql_server_spark.queries import mining_q  # noqa: F401
from datafusion_flight_sql_server_spark.queries import streaming_q  # noqa: F401
from datafusion_flight_sql_server_spark.queries import analytics_q  # noqa: F401

#: Verification-priority prefix: the driver produces CORRECTNESS rows for
#: the FIRST 50 registered queries each round, so ordering decides which
#: operators get a row. Standing policy: tier 1 = prior-round
#: registrations that have never received a driver row, tier 2 = this
#: round's registrations (appended as they land, trimming the tier-3 tail
#: to keep the prefix at exactly 50), tier 3 = a rotation of the oldest
#: r1-green rows as regression insurance. Green on the prefix → every
#: registered query driver-verified at least once (the r1 long tail's
#: rows stand from round 1 and re-verify locally in every pytest run).
#: Round-5 end state: tier 1 holds the two round-4 stragglers (now at
#: positions 1-2 per VERDICT round-5 item 1), tier 2 the 27 round-5
#: registrations; with 29 never-driver-checked names the prefix keeps 21
#: tier-3 rotation slots — the r6 driver run closes every open row.
_PRIORITY = (
    # tier 1: registered round 4 after the driver run — never checked.
    "dedup_containment",
    "text_compression_ratio",  # rows-only by design (zlib has no SQL oracle)
    # tier 2: round-5 registrations (appended here as each one lands —
    # test_priority_names_all_registered enforces no aspirational names).
    "stream_sessionize_batch",
    "stream_scd2_batch",
    "stream_dedup_batch",
    "stream_tumbling_batch",
    "event_asof_nearest",
    "event_running_distinct",
    "dedup_incremental_minhash",
    "stream_interval_join_batch",
    "fn_posexplode",
    "embed_cluster_quality",
    "text_prefix_dup",
    "sim_range_search",
    "graph_components_star",
    "orders_cohort_ltv",
    "text_zipf_fit",
    "text_keyword_extract",
    "window_percent_change",
    "doc_balanced_sample",
    "part_price_elasticity",
    "event_peak_detect",
    "embed_pca_power",
    "embed_ivf_recall",
    "text_bm25",
    "embed_knn_graph",
    "doc_budget_select",
    "dedup_threshold_curve",
    "embed_coreset_sample",
    # tier 3: rotation of r1/r2-green rows as regression insurance
    # (trimmed so the prefix is exactly 50 once tier 2 is final).
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier",
    "tpch_q10_returned_items",
    "window_rank",
    "window_running",
    "dedup_exact",
    "join_inner",
    "window_analytic",
    "window_topk_per_group",
    "join_left",
    "join_right",
    "join_full",
    "join_semi",
    "join_anti",
    "join_theta",
    "join_derived",
    "agg_group_multi",
    "agg_having",
    "agg_distinct",
    "agg_stats",
    "agg_rollup",
    "agg_cube",
    "agg_grouping_sets",
    "agg_approx_distinct",
    "topk",
    "subquery_scalar",
    "subquery_in",
    "subquery_exists",
    "subquery_correlated_scalar",
    "fn_string",
    "fn_regex",
    "fn_datetime",
    "fn_math",
    "fn_conditional",
    "fn_cast",
    "fn_array",
    "fn_explode",
    "fn_json",
    "fn_struct",
    "scan_star",
    "scan_projection",
    "filter_compare",
    "filter_predicates",
    "join_cross",
    "agg_count_star",
    "set_union_all",
    "set_union_distinct",
    "set_intersect",
    "set_except",
)


def _reorder() -> None:
    ordered = {}
    for name in _PRIORITY:
        if name in REGISTRY:
            ordered[name] = REGISTRY[name]
    for name, spec in REGISTRY.items():
        ordered.setdefault(name, spec)
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder()

__all__ = ["REGISTRY", "QuerySpec", "query"]
