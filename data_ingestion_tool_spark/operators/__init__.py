"""Operator registry: merge every module's SPECS into one dict.

Registry order is the de-facto external test plan: the driver's
correctness gate samples the first 50 ``queries()`` entries in
iteration order. ``_FRONT`` therefore pins the window to the operators
that most need an external row — the flagship ingest/validation path,
the whole LLM-pipeline tier (dedup / similarity / text / multimodal /
event windows), the six events queries repaired in round 2, and one
representative of each long-green relational family. Everything else
(already driver-green in round 1) rotates behind.
"""

from __future__ import annotations

from data_ingestion_tool_spark.operators import (
    dedup,
    events,
    graph,
    ingest,
    multimodal,
    rangejoin,
    relational,
    similarity,
    skew,
    text,
    tpch,
)
from data_ingestion_tool_spark.operators.base import QuerySpec, build_registry

_MODULES = [
    relational, events, text, dedup, similarity, multimodal, skew, ingest,
    rangejoin, tpch, graph,
]

#: First-50 pin list (driver correctness window). Keep this at exactly
#: the entries that need fresh driver rows; tests assert every name
#: exists in the registry.
#:
#: ROUND-3 ROTATION (executed): CORRECTNESS_r01+r02 are cumulatively
#: green for 92 distinct queries; this window pins 50 of the 52
#: oracle-paired queries that have never had a driver row — the
#: round-2 flagship tier (corpus_prep_pipeline, semantic_dedup,
#: media_dedup_exact, mixing, dq_*, all ten tpch_q* and the
#: point-in-time / span-dedup ops).
#:
#: ROUND-4 ROTATION PLAN: once CORRECTNESS_r03 lands green, pin the
#: two deferred entries (window_rank_extras, agg_string_concat — their
#: window/agg families are already driver-green from r01) plus every
#: oracle-paired query added in round 3 (all pre-verified at sf0.01
#: AND sf0.1 locally): exact_user_reach, exact_top_terms,
#: label_centroid_norms, embedding_dimension_stats, bm25_search,
#: cooccurrence_pmi, source_vocab_overlap, doc_rolling_fingerprints,
#: skyline_orders, self_join_blowup_estimate, time_weighted_avg_value,
#: frequent_event_sequences, user_activity_similarity,
#: weighted_doc_sample, cumulative_unique_users, and
#: tpch_q2/q12/q16/q20 (nineteen oracle-paired round-3 queries).
_FRONT = [
    # composed flagships (round-2 additions, never driver-checked)
    "corpus_prep_pipeline",
    "semantic_dedup",
    # dedup tier
    "shared_span_pairs",
    "dedup_containment",
    "dedup_incremental",
    # similarity / embeddings tier
    "ann_filtered_topk",
    "contrastive_negatives",
    # text / LLM-pipeline tier
    "unigram_logprob_scores",
    "source_mixing_weights",
    "temperature_mixed_sample",
    "boilerplate_ngram_flags",
    "doc_sample_balanced",
    "vocab_oov_rate",
    "source_token_entropy",
    "length_bucketed_batches",
    # data-quality audit tier
    "dq_orphan_orders",
    "dq_duplicate_linenumbers",
    "dq_value_bounds",
    "dq_price_drift_psi",
    "profile_orders",
    # multimodal
    "media_metadata_stats",
    "media_dedup_exact",
    # events / temporal analytics
    "event_transition_matrix",
    "rolling_weekly_active_users",
    "event_value_anomalies",
    "user_retention_cohorts",
    "value_histogram",
    # range / as-of joins
    "next_purchase_value",
    "global_click_purchase_pairs",
    "point_in_time_features",
    # relational remainder
    "equi_depth_histogram",
    "important_part_stock",
    "top_supplier_revenue",
    "idle_rich_customers",
    "orders_snapshot_diff",
    "hierarchy_rollup_cte",
    "winsorized_prices",
    "agg_regression",
    "join_key_skew_profile",
    # TPC-H remainder
    "tpch_q4_late_order_priority",
    "tpch_q6_forecast_revenue",
    "tpch_q7_nation_trade_volume",
    "tpch_q8_market_share",
    "tpch_q9_profit_shape",
    "tpch_q10_returned_items",
    "tpch_q13_order_distribution",
    "tpch_q17_small_qty_revenue",
    "tpch_q18_large_volume_customers",
    "tpch_q19_disjunctive_revenue",
    "tpch_q21_last_shipper",
]


def registry() -> dict[str, QuerySpec]:
    reg = build_registry(*[m.SPECS for m in _MODULES])
    missing = [n for n in _FRONT if n not in reg]
    if missing:
        raise KeyError(f"_FRONT names not in registry: {missing}")
    ordered = {n: reg[n] for n in _FRONT}
    ordered.update((n, s) for n, s in reg.items() if n not in ordered)
    return ordered


__all__ = ["QuerySpec", "registry"]
