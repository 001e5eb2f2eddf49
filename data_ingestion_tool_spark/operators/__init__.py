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
#: ROUND-4 ROTATION (executed): CORRECTNESS_r01-r03 are cumulatively
#: green for 142 distinct queries with zero hash mismatches. This
#: window pins (a) all 25 oracle-paired queries that have never had a
#: driver row — the round-3 additions plus the two deferred r01-family
#: entries — then (b) the 18 rows-only queries that have never had
#: even a rows-only driver row (sketches, ANN variants, BPE, kmeans),
#: then (c) new round-4 operators. After r04, every registry query
#: has a cumulative driver row.
#:
#: ROUND-5 ROTATION PLAN: once CORRECTNESS_r04 lands green, pin the
#: five oracle-paired queries that landed after this window was
#: sealed (all pre-verified vs DuckDB at sf0.001/0.01/0.1, two also
#: under a foreign-tz session): grouped_price_elasticity,
#: market_basket_brand_pairs, concurrent_sessions,
#: seasonal_value_anomalies, and the rows-only
#: embedding_pca_scores; fill the rest with regression re-checks of
#: long-unchecked r01 families. (dedup_near_clusters needs no slot:
#: it sits in this window and its recursive-CTE oracle landed before
#: the r04 driver run, so its r04 row is already hash-checked.)
_FRONT = [
    # (a) oracle-paired, never driver-checked — round-3 additions
    "skyline_orders",
    "window_rank_extras",
    "agg_string_concat",
    "exact_user_reach",
    "exact_top_terms",
    "time_weighted_avg_value",
    "frequent_event_sequences",
    "cumulative_unique_users",
    "bigram_logprob_scores",
    "bm25_search",
    "cooccurrence_pmi",
    "source_vocab_overlap",
    "doc_rolling_fingerprints",
    "weighted_doc_sample",
    "linewise_dedup",
    "dedup_impact_report",
    "label_centroid_norms",
    "embedding_dimension_stats",
    "user_activity_similarity",
    "self_join_blowup_estimate",
    "tpch_q2_min_cost_supplier",
    "tpch_q12_priority_shipping",
    "tpch_q16_part_supplier_variety",
    "tpch_q20_dominant_part_suppliers",
    "pagerank_supply_graph",
    # (b) rows-only by design, never driver-checked — the driver's
    # weaker rows+schema check still puts an external row under them
    "agg_approx_quantiles",
    "sketch_user_reach",
    "bpe_fit_merges",
    "bpe_token_counts",
    "text_semantic_dedup",
    "embed_documents",
    "heavy_hitter_terms",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_near_clusters",
    "kmeans_labels",
    "ann_lsh_topk",
    "ann_quantized_topk",
    "ann_ivf_topk",
    "label_top_eigenvalue",
    "embedding_outliers",
    "media_near_dup_features",
    "multimodal_prep_pipeline",
    # (c) round-4 additions (all pre-verified vs DuckDB at sf0.001,
    # sf0.01 AND sf0.1) + one regression re-check: semantic_dedup's
    # shared kernel changed this round (cluster cap / group_cols)
    "stratified_weighted_sample",
    "token_ngram_novelty",
    "doc_quality_ensemble",
    "event_attribution_last_touch",
    "embedding_covariance",
    "near_dup_graph_degree",
    "semantic_dedup",
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
