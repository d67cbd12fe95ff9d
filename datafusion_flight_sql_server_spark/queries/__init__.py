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

#: Verification-priority prefix: never-checked and newly-added operators,
#: then the flagship TPC-H set, then one representative per family. Everything
#: not listed follows in registration order (all green in round 1).
_PRIORITY = (
    # new this round — no CORRECTNESS row yet
    "tpch_q2_min_cost_supplier",
    "tpch_q4_order_priority",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q11_important_stock",
    "tpch_q12_shipping_priority_class",
    "tpch_q13_customer_distribution",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_part_counts",
    "tpch_q17_small_quantity",
    "tpch_q20_potential_promotion",
    "tpch_q21_suppliers_waiting",
    "tpch_q22_global_sales",
    "fn_map",
    "event_asof_join",
    "event_band_join",
    "event_time_rollup",
    "agg_percentile",
    "fn_date_bin",
    "dedup_near_clusters",
    "window_range_frame",
    "text_topk_tokens",
    "agg_bool",
    "agg_pivot",
    "doc_split",
    "sink_partitioned",
    "embed_centroids",
    "text_histogram",
    "fn_string_distance",
    "sim_topk_ivf",
    "sim_topk",
    "sim_topk_lsh",
    "dedup_near_minhash",
    "dedup_embed_cosine",
    "multimodal_decode",
    "dedup_exact_keeprow",
    "event_sliding_window",
    "scan_csv",
    "scan_json",
    "scan_memtable",
    "param_bind_positional",
    "param_bind_named",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "text_rolling_hash",
    "tpch_q6_forecast_revenue",
    "tpch_q14_promo_effect",
    "tpch_q18_large_volume",
    "tpch_q19_discounted",
    "window_distribution",
    # registered in round 1 but absent from CORRECTNESS_r01.json
    "text_stats",
    "text_quality",
    "text_tokens",
    "text_fingerprint",
    "text_langid",
    "multimodal_meta",
    "event_tumbling_window",
    "event_sessionize",
    # flagship + previously-green representatives
    "dedup_exact",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier",
    "tpch_q10_returned_items",
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
