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
#: Round-6 state: tier 1 is EMPTY (r05 went 50/50 green, closing every
#: open row); tier 2 = the 6 round-6 registrations + the 17 queries the
#: round-6 perf/bugfix work rewrote (shared MinHash front end, trained-
#: quantizer cache, top-k sentinel fix, q10 shuffled-hash rewrite,
#: two-micro-batch streaming twins; embed_ivf_recall is the one cache
#: consumer left to the local oracle suite — the cache change is already
#: double-covered by sim_topk_ivf + embed_cluster_quality, and dropping
#: it makes room for the last round-1-only row); tier 3 = all 28 rows
#: whose only driver check is still round 1 (the r05 prefix's trimmed
#: tail) — this prefix re-verifies everything touched in round 6 and
#: retires every round-1-only row.
_PRIORITY = (
    # tier 2a: round-6 registrations
    "doc_dup_report",
    "embed_norm_audit",
    "event_dow_profile",
    "event_quantile_rollup",
    "text_length_quantiles",
    "doc_dsir_select",
    # tier 2b: round-6 rewritten/affected queries
    "tpch_q10_returned_items",
    "dedup_minhash_eval",
    "dedup_containment",
    "dedup_threshold_curve",
    "dedup_incremental_minhash",
    "dedup_near_minhash",
    "dedup_near_clusters",
    "graph_components_star",
    "sim_topk_ivf",
    "embed_cluster_quality",
    "dedup_semantic",
    "embed_coreset_sample",
    "sim_topk",
    "embed_knn_graph",
    "stream_sessionize_batch",
    "stream_tumbling_batch",
    # tier 3: the 28 rows never re-checked since round 1 (the r05
    # prefix's trimmed tail)
    "set_except",
    "agg_rollup",
    "agg_cube",
    "agg_grouping_sets",
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
