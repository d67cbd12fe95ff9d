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
#: Round-7 state: tier 1 = ``text_lm_unigram`` — rewritten in round 5
#: (adaptive vocabulary fold) AFTER its last driver row (r4), the one
#: freshness gap the round-6 verdict named; tier 2 = round-7
#: registrations and rewrites, appended as they land; tier 3 = the
#: oldest-first rotation — all 46 queries whose latest driver row is
#: round 2 (rounds 3–6 re-verified everything newer). Green on this
#: prefix → no registered query's latest driver row predates round 2,
#: and none predates its last source rewrite.
_PRIORITY = (
    # tier 1: source rewritten after last driver check
    "text_lm_unigram",
    # tier 2: round-7 registrations / rewrites (appended as they land)
    # tier 3: oldest-first rotation — latest driver row is round 2
    "agg_array",
    "agg_bitmap_distinct",
    "agg_corr_regr",
    "agg_filter_clause",
    "agg_listagg",
    "agg_minmax_by",
    "agg_unpivot",
    "corpus_mix_report",
    "cte_recursive",
    "dedup_embed_cosine",
    "dedup_exact_keeprow",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "doc_chunk",
    "doc_pack",
    "doc_sample_stratified",
    "doc_split",
    "embed_quantize",
    "event_funnel",
    "event_gapfill",
    "event_retention",
    "event_sessionize",
    "event_transitions",
    "event_tumbling_window",
    "fn_try",
    "fn_variant",
    "graph_pagerank",
    "join_lateral",
    "multimodal_decode",
    "multimodal_meta",
    "multimodal_resize",
    "pipeline_curate",
    "profile_table",
    "sim_topk_lsh",
    "sink_clustered",
    "text_contamination",
    "text_entropy",
    "text_fingerprint",
    "text_langid",
    "text_ngrams_top",
    "text_quality",
    "text_quality_rules",
    "text_redact",
    "text_stats",
    "text_tokens",
    "window_ignore_nulls",
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
