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
#: Round-11 state: tier 2 is EMPTY — the round's changes (dialect batch
#: 5, information_schema multi-database coverage + describe memo) live
#: in the serving layer, which the permanently-pinned ``scan_flight``
#: transits; no registered query's implementation changed. Tier 3 is
#: the COMPLETE round-6 cohort (45 queries — their rows age to the
#: 5-round freshness limit this round), led by ``agg_count_star`` (the
#: r10 overflow displacement), then alphabetical; the 4 remaining slots
#: take the oldest-first head of the round-7 cohort (the r12 rotation
#: continues at ``agg_listagg``).
_PRIORITY = (
    # tier 0: permanently pinned — rides the serving engine internals
    "scan_flight",
    # tier 3: the full round-6 cohort (rows at the 5-round limit)
    "agg_count_star",
    "agg_cube",
    "agg_grouping_sets",
    "agg_rollup",
    "dedup_containment",
    "dedup_incremental_minhash",
    "dedup_minhash_eval",
    "dedup_near_clusters",
    "dedup_semantic",
    "dedup_threshold_curve",
    "doc_dsir_select",
    "doc_dup_report",
    "embed_cluster_quality",
    "embed_coreset_sample",
    "embed_knn_graph",
    "embed_norm_audit",
    "event_dow_profile",
    "event_quantile_rollup",
    "filter_predicates",
    "fn_array",
    "fn_cast",
    "fn_conditional",
    "fn_datetime",
    "fn_explode",
    "fn_json",
    "fn_math",
    "fn_regex",
    "fn_string",
    "fn_struct",
    "graph_components_star",
    "join_cross",
    "set_except",
    "set_intersect",
    "set_union_all",
    "set_union_distinct",
    "sim_topk",
    "stream_sessionize_batch",
    "stream_tumbling_batch",
    "subquery_correlated_scalar",
    "subquery_exists",
    "subquery_in",
    "subquery_scalar",
    "text_length_quantiles",
    "topk",
    "tpch_q10_returned_items",
    # tier 3 overflow: oldest-first head of the round-7 cohort
    "agg_array",
    "agg_bitmap_distinct",
    "agg_corr_regr",
    "agg_filter_clause",
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
