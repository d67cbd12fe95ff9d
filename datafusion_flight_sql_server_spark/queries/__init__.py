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
#: round's registrations AND queries whose implementation materially
#: changed this round (appended as they land, trimming the tier-3 tail
#: to keep the prefix at exactly 50), tier 3 = a rotation of the oldest
#: green rows as regression insurance. Green on the prefix → every
#: registered query driver-verified at least once.
#: Round-8 state: tier 0 = PERMANENTLY PINNED infrastructure-coupled
#: queries — ``scan_flight`` transits the live Flight serving path
#: (execute_stream / multi-endpoint buckets), so a serving-engine change
#: can break it with no change to its own source; the round-7 rotation
#: proved rotating it out masks exactly that (the r7 serving regression
#: shipped under a 50/50-green CORRECTNESS file). It stays in the prefix
#: every round. Tier 2 = round-8 registrations and rewrites, appended as
#: they land; tier 3 = the oldest-first rotation — 46 of the 50 queries
#: whose latest driver row is round 3 (rounds 4–7 re-verified everything
#: newer); ``tpch_q8_market_share``, ``tpch_q9_product_profit``,
#: ``window_distribution`` and ``window_range_frame`` wait for round 9
#: to make room for the pin + tier 2. Green on this prefix → no
#: registered query's latest driver row predates round 3 except the
#: four deferred rows, and none predates its last source rewrite.
_PRIORITY = (
    # tier 0: permanently pinned — rides the serving engine internals
    "scan_flight",
    # tier 2: round-8 rewrites — one representative per operator cache
    # whose keying/locking changed this round (fingerprint + mutation
    # lock): dedup_near_minhash rides the MinHash front-end cache,
    # sim_topk_ivf the trained-quantizer cache
    "dedup_near_minhash",
    "sim_topk_ivf",
    # tier 2: round-8 registration (Heaps-law vocabulary growth)
    "text_vocab_growth",
    # tier 3: oldest-first rotation — latest driver row is round 3
    "agg_approx_distinct",
    "agg_bitwise",
    "agg_bool",
    "agg_percentile",
    "agg_pivot",
    "embed_centroids",
    "event_asof_join",
    "event_band_join",
    "event_session_window_native",
    "event_sliding_window",
    "event_time_rollup",
    "fn_bitwise",
    "fn_date_bin",
    "fn_hash_encode",
    "fn_map",
    "fn_string_distance",
    "fn_url",
    "join_skew_salted",
    "multimodal_frames",
    "param_bind_named",
    "param_bind_positional",
    "scan_binary",
    "scan_csv",
    "scan_json",
    "scan_memtable",
    "scan_orc",
    "sink_partitioned",
    "text_histogram",
    "text_rolling_hash",
    "text_topk_tokens",
    "tpch_q11_important_stock",
    "tpch_q12_shipping_priority_class",
    "tpch_q13_customer_distribution",
    "tpch_q14_promo_effect",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_part_counts",
    "tpch_q17_small_quantity",
    "tpch_q18_large_volume",
    "tpch_q19_discounted",
    "tpch_q20_potential_promotion",
    "tpch_q21_suppliers_waiting",
    "tpch_q22_global_sales",
    "tpch_q2_min_cost_supplier",
    "tpch_q4_order_priority",
    "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping",
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
