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

#: Verification-priority prefix: the driver produces CORRECTNESS rows for
#: the FIRST 50 registered queries each round, so ordering decides which
#: operators get a row. Round-3 order (per the round-2 review's explicit
#: instruction): positions 1-50 are EXACTLY the 49 queries that have never
#: received a driver row (absent from CORRECTNESS_r01.json and
#: CORRECTNESS_r02.json) plus ``agg_approx_distinct`` (err: no_oracle since
#: round 1; its contract is now the error-bound boolean both engines can
#: reproduce) — green rows here bring driver verification to 149/149.
#: Position 51+ holds queries first registered in round 3 (they ride the
#: local pytest oracle until round 4), then every r1/r2-green name in its
#: old order.
_PRIORITY = (
    # tier 1: the one erroring row — approx_count_distinct with its new
    # oracle-checkable error-bound contract
    "agg_approx_distinct",
    # tier 2: extension/pipeline operators never driver-checked (r1+r2 cap)
    "multimodal_frames",
    "event_session_window_native",
    "fn_bitwise",
    "agg_bitwise",
    "fn_url",
    "fn_hash_encode",
    "sink_partitioned",
    "embed_centroids",
    "text_histogram",
    "text_topk_tokens",
    "text_rolling_hash",
    "fn_string_distance",
    "agg_pivot",
    "agg_bool",
    "agg_percentile",
    "fn_date_bin",
    "fn_map",
    "event_asof_join",
    "event_band_join",
    "event_time_rollup",
    "event_sliding_window",
    "join_skew_salted",
    # tier 3: source/param registrations — the reference's own exercised
    # surface (integration_test.rs:148-171, examples/flight-sql.rs:25-27)
    "scan_csv",
    "scan_json",
    "scan_memtable",
    "scan_orc",
    "scan_binary",
    "param_bind_positional",
    "param_bind_named",
    # tier 4: remaining windows
    "window_range_frame",
    "window_distribution",
    # tier 5: TPC-H long tail (bench-headline members first)
    "tpch_q6_forecast_revenue",
    "tpch_q14_promo_effect",
    "tpch_q18_large_volume",
    "tpch_q19_discounted",
    "tpch_q2_min_cost_supplier",
    "tpch_q9_product_profit",
    "tpch_q21_suppliers_waiting",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q4_order_priority",
    "tpch_q11_important_stock",
    "tpch_q12_shipping_priority_class",
    "tpch_q13_customer_distribution",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_part_counts",
    "tpch_q17_small_quantity",
    "tpch_q20_potential_promotion",
    "tpch_q22_global_sales",
    # ---- position 51+: new-in-round-3 registrations (local oracle until
    # the round-4 driver window), then the r1/r2-green set in legacy order.
    # ROUND-4 TODO: once CORRECTNESS_r03 lands green, reorder again — move
    # these 6 round-3 additions (plus anything round 4 adds) into positions
    # 1-50 and the r3-green names behind, so every registered query keeps a
    # driver row within one round of its registration.
    "agg_percentile_approx",
    "text_repetition",
    "doc_sample_temperature",
    "dedup_exact_keepbest",
    "scan_flight",
    "event_anomaly",
    "pipeline_curate_v2",
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
