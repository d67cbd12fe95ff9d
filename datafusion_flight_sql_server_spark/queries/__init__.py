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
#: Tier 0 = PERMANENTLY PINNED infrastructure-coupled queries —
#: ``scan_flight`` transits the live Flight serving path
#: (execute_stream / multi-endpoint buckets), so a serving-engine change
#: can break it with no change to its own source; the round-7 rotation
#: proved rotating it out masks exactly that (the r7 serving regression
#: shipped under a 50/50-green CORRECTNESS file). It stays in the prefix
#: every round.
#:
#: FRESHNESS POLICY (round 9, VERDICT r8 #8): with 235 registered
#: queries, a 50-row prefix and ~3 rows/round spent on tier 0 + tier 2,
#: the tier-3 revisit period is ~5 rounds. The driver's row count is
#: fixed at 50, so the lever is the ROTATION DISCIPLINE, now explicit:
#: tier 3 fills every prefix slot tier 0/2 leave with the queries whose
#: latest driver row is OLDEST (oldest-first by CORRECTNESS_r* union,
#: alphabetical within a round), and any query deferred at the cut line
#: goes FIRST next round. Invariants kept per round: (a) no query's
#: latest driver row is ever more than 5 rounds old, (b) a deferred
#: query is never deferred twice, (c) tier 2 covers every query whose
#: implementation (or an operator/cache it rides) materially changed in
#: the round. SURVEY §5 documents the same policy.
#:
#: Round-13 state (optimization round): tier 2 holds the four queries
#: whose implementation materially changed — ``graph_triangles`` (wedge
#: self-join replaced by adjacency-array intersection),
#: ``dedup_ngram_jaccard`` (persisted single-pass front end + PPJoin
#: positional filter), ``graph_components_star`` (eager localCheckpoint
#: + single-pass small-star emit) and ``dedup_near_clusters`` (the
#: min-label propagation loop it rides folded its own-label leg into the
#: neighbor aggregation, removing a join per round). Oracle equivalence
#: of all four is additionally pinned by tests (property suites, plan
#: shapes, oracle parity). No new queries registered (optimization
#: rounds add none). Tier 3 is the round-8 cohort at the 5-round
#: freshness limit: ``agg_approx_distinct`` (deferred once at the r12
#: cut line — leads, and is alphabetically first anyway) through
#: ``tpch_q21_suppliers_waiting``, 45 rows — tier 2's four slots come
#: out of the round-9 cohort head (``agg_bitmap_intersect``,
#: ``agg_count_min``, ``agg_hll_rollup``) plus the cohort tail
#: ``tpch_q22_global_sales``, which is DEFERRED ONCE at the cut line
#: (its first deferral — invariant (b) holds) and leads the r14
#: rotation together with ``agg_bitmap_intersect``.
_PRIORITY = (
    # tier 0: permanently pinned — rides the serving engine internals
    "scan_flight",
    # tier 2: implementation materially changed this round (round 13)
    "graph_triangles",
    "dedup_ngram_jaccard",
    "graph_components_star",
    "dedup_near_clusters",
    # tier 3: the round-8 cohort (rows at the 5-round limit),
    # agg_approx_distinct deferred-once leading; tpch_q22_global_sales
    # deferred once at the cut line, leads r14
    "agg_approx_distinct",
    "agg_bitwise",
    "agg_bool",
    "agg_percentile",
    "agg_pivot",
    "embed_centroids",
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
    "text_vocab_growth",
    "tpch_q2_min_cost_supplier",
    "tpch_q4_order_priority",
    "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping",
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
