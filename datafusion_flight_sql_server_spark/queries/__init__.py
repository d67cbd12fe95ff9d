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
#: Round-12 state: tier 2 = the two as-of queries —
#: ``operators/asof.py``'s duplicate tie-break contract was made total
#: and documented this round (VERDICT r11 #1), and both ride that
#: operator — plus the round's one NEW registration,
#: ``event_asof_join_strict`` (the strict-inequality variant of the
#: same operator). Tier 3 continues the oldest-first rotation exactly
#: where round 11 left it: the COMPLETE round-7 cohort (46 queries —
#: their rows age to the 5-round freshness limit this round),
#: alphabetical from ``agg_listagg``. The round-8 head
#: ``agg_approx_distinct`` defers at the cut line (once) and LEADS the
#: round-13 tier 3, which continues at ``agg_bitwise``; its row is r8,
#: exactly at the 5-round limit in r13.
_PRIORITY = (
    # tier 0: permanently pinned — rides the serving engine internals
    "scan_flight",
    # tier 2: operator code changed this round (asof tie-break contract)
    # + the round's new registration riding the same operator
    "event_asof_join",
    "event_asof_join_strict",
    "event_asof_nearest",
    # tier 3: the full round-7 cohort (rows at the 5-round limit)
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
    "filter_compare",
    "fn_try",
    "fn_variant",
    "graph_pagerank",
    "join_lateral",
    "multimodal_decode",
    "multimodal_meta",
    "multimodal_resize",
    "pipeline_curate",
    "profile_table",
    "scan_projection",
    "scan_star",
    "sim_topk_lsh",
    "sink_clustered",
    "text_contamination",
    "text_entropy",
    "text_fingerprint",
    "text_langid",
    "text_lm_unigram",
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
