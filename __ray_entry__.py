"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library it calls) calls ``ray.init`` / ``ray.shutdown``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

# Make the repo importable regardless of the caller's cwd. Note: Ray
# WORKER processes inherit sys.path from the raylet environment, which
# is fixed at ray.init time — so a driver whose cwd is outside the repo
# must export PYTHONPATH=/root/repo (or chdir here) before ray.init for
# worker-side imports of `sigraph_ray` to resolve. The standard driver
# runs from the repo root, where Python's cwd-on-sys.path covers both.
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = (
    _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")
    if os.environ.get("PYTHONPATH") else _REPO)


def entry() -> Any:
    """Flagship: KG construction (pages → triples → graph) at sf0.001
    scale — deterministic synthetic Common-Crawl-style pages
    (BASELINE.json input_hint shape), full extraction + normalization +
    canonicalization pipeline; returns the triple Dataset."""
    from sigraph_ray.pipelines import kg as K

    pages = K.synth_pages(500, parallelism=8)
    return K.build_kg(pages, concurrency=2)["triples"]


def queries() -> dict[str, Callable[[str], Any]]:
    from sigraph_ray.pipelines import queries as Q

    return {
        # provenance-graph construction (SURVEY.md §2.5, U1-U4 + M1-M5)
        "prov_nodes": Q.q_prov_nodes,
        "prov_traces": Q.q_prov_traces,
        "prov_edges": Q.q_prov_edges,
        "incremental_traces": Q.q_incremental_traces,
        "incremental_edges": Q.q_incremental_edges,
        "prov_contains": Q.q_prov_contains,
        "prov_contains_pruned": Q.q_prov_contains_pruned,
        "prov_quarantine": Q.q_prov_quarantine,
        "related_traces": Q.q_related_traces,
        "distinct_units": Q.q_distinct_units,
        "rule_match": Q.q_rule_match,
        "sigma_match": Q.q_sigma_match,
        "label_sequences": Q.q_label_sequences,
        "tactic_histogram": Q.q_tactic_histogram,
        "doc_page": Q.q_doc_page,
        "prov_subgraph": Q.q_prov_subgraph,
        "prov_neighborhood": Q.q_prov_neighborhood,
        "trace_listing": Q.q_trace_listing,
        "iocs": Q.q_iocs,
        "drift_sequence": Q.q_drift_sequence,
        # relational coverage (S1, F1, J-family, U-family, O-family)
        "lineitem_agg": Q.q_lineitem_agg,
        "lineitem_rollup": Q.q_lineitem_rollup,
        "user_event_pivot": Q.q_user_event_pivot,
        "top_customers": Q.q_top_customers,
        "events_hourly": Q.q_events_hourly,
        "burst_hours": Q.q_burst_hours,
        "cohort_retention": Q.q_cohort_retention,
        "funnel_conversion": Q.q_funnel_conversion,
        "event_transitions": Q.q_event_transitions,
        "value_time_corr": Q.q_value_time_corr,
        "type_trend": Q.q_type_trend,
        "rolling_active_users": Q.q_rolling_active_users,
        "supplier_nation": Q.q_supplier_nation,
        "asof_attribution": Q.q_asof_attribution,
        "range_join": Q.q_range_join,
        "purchase_error_overlap": Q.q_purchase_error_overlap,
        "approx_distinct": Q.q_approx_distinct,
        "grouped_approx_distinct": Q.q_grouped_approx_distinct,
        "distinct_users_per_type": Q.q_distinct_users_per_type,
        "sessionize": Q.q_sessionize,
        "quantiles": Q.q_quantiles,
        "grouped_quantiles": Q.q_grouped_quantiles,
        "approx_quantiles": Q.q_approx_quantiles,
        "top_orders_per_customer": Q.q_top_orders_per_customer,
        "sliding_window": Q.q_sliding_window,
        "customers_without_orders": Q.q_customers_without_orders,
        "order_revenue": Q.q_order_revenue,
        "source_enriched": Q.q_source_enriched,
        "bloom_semi_lineitem": Q.q_bloom_semi_lineitem,
        "upsert_compact": Q.q_upsert_compact,
        "upsert_with_deletes": Q.q_upsert_with_deletes,
        "data_quality": Q.q_data_quality,
        "zorder_keys": Q.q_zorder_keys,
        "quality_filtered": Q.q_quality_filtered,
        # text analysis (brief: token counting, quality, fingerprints)
        "text_stats": Q.q_text_stats,
        "pii_scrub": Q.q_pii_scrub,
        "corpus_summary": Q.q_corpus_summary,
        "curated_per_source": Q.q_curated_per_source,
        "snapshot_delta": Q.q_snapshot_delta,
        "bpe_token_count": Q.q_bpe_token_count,
        "repetition_stats": Q.q_repetition_stats,
        "decontaminate": Q.q_decontaminate,
        "dup_passages": Q.q_dup_passages,
        "host_stats": Q.q_host_stats,
        "pack_sequences": Q.q_pack_sequences,
        "training_shards": Q.q_training_shards,
        "node_pagerank": Q.q_node_pagerank,
        "kcore": Q.q_kcore,
        "node_degrees": Q.q_node_degrees,
        "component_labels": Q.q_component_labels,
        "triangle_cooccur": Q.q_triangle_cooccur,
        "cooccur_shortest_paths": Q.q_cooccur_shortest_paths,
        "mixture_sample": Q.q_mixture_sample,
        "unigram_logprob": Q.q_unigram_logprob,
        "nb_classify": Q.q_nb_classify,
        "bpe_train": Q.q_bpe_train,
        "quality_scores": Q.q_quality_scores,
        "fingerprints": Q.q_fingerprints,
        "lang_id": Q.q_lang_id,
        "term_topk": Q.q_term_topk,
        "bigram_topk": Q.q_bigram_topk,
        "pmi_collocations": Q.q_pmi_collocations,
        "gazetteer_mentions": Q.q_gazetteer_mentions,
        "part_skyline": Q.q_part_skyline,
        "basket_pairs": Q.q_basket_pairs,
        "chi2_type_weekday": Q.q_chi2_type_weekday,
        "embed_covariance": Q.q_embed_covariance,
        "pca_embeddings": Q.q_pca_embeddings,
        "softmax_train": Q.q_softmax_train,
        "ip_jaccard": Q.q_ip_jaccard,
        "association_rules": Q.q_association_rules,
        "mention_snippets": Q.q_mention_snippets,
        "knn_label_agreement": Q.q_knn_label_agreement,
        "bm25_topk": Q.q_bm25_topk,
        "user_trigrams": Q.q_user_trigrams,
        "recency_score": Q.q_recency_score,
        "winsorized_value": Q.q_winsorized_value,
        "hits_cooccur": Q.q_hits_cooccur,
        "ks_doclen": Q.q_ks_doclen,
        "vocab_summary": Q.q_vocab_summary,
        "rrf_hybrid": Q.q_rrf_hybrid,
        "edge_type_signatures": Q.q_edge_type_signatures,
        "percent_rank": Q.q_percent_rank,
        "approx_term_topk": Q.q_approx_term_topk,
        "tfidf_keywords": Q.q_tfidf_keywords,
        "inverted_index": Q.q_inverted_index,
        "stratified_sample": Q.q_stratified_sample,
        "weighted_sample": Q.q_weighted_sample,
        "value_outliers": Q.q_value_outliers,
        "value_drift_psi": Q.q_value_drift_psi,
        "length_histogram": Q.q_length_histogram,
        "source_capped": Q.q_source_capped,
        "temperature_mixture": Q.q_temperature_mixture,
        "dedup_weighted_tokens": Q.q_dedup_weighted_tokens,
        "source_lang_entropy": Q.q_source_lang_entropy,
        "source_unigram_kl": Q.q_source_unigram_kl,
        "profile": Q.q_profile,
        "key_skew": Q.q_key_skew,
        "grouped_mode": Q.q_grouped_mode,
        "ntile_buckets": Q.q_ntile_buckets,
        "gap_filled_hourly": Q.q_gap_filled_hourly,
        # training-order export (stages/ordering)
        "det_shuffle": Q.q_det_shuffle,
        "interleave_sources": Q.q_interleave_sources,
        "shard_plan": Q.q_shard_plan,
        # dedup family
        "exact_dedup": Q.q_exact_dedup,
        "minhash_dedup": Q.q_minhash_dedup,
        "simhash_pairs": Q.q_simhash_pairs,
        "ngram_jaccard": Q.q_ngram_jaccard,
        "embed_cosine_pairs": Q.q_embed_cosine_pairs,
        "embed_dup_clusters": Q.q_embed_dup_clusters,
        "name_editdist_pairs": Q.q_name_editdist_pairs,
        "tfidf_cosine_pairs": Q.q_tfidf_cosine_pairs,
        # similarity search
        "knn_cosine": Q.q_knn_cosine,
        "knn_cosine_lsh": Q.q_knn_cosine_lsh,
        "knn_cosine_ivf": Q.q_knn_cosine_ivf,
        "knn_cosine_pq": Q.q_knn_cosine_pq,
        "doc_embed_knn": Q.q_doc_embed_knn,
        "knn_self_join": Q.q_knn_self_join,
        "label_centroids": Q.q_label_centroids,
        # query/RAG surface (F3 + graph retriever)
        "kg_neighborhood": Q.q_kg_neighborhood,
        # KG pipeline (oracle = generator intent, enforced in pytest)
        "kg_triples": Q.q_kg_triples,
        "kg_entities": Q.q_kg_entities,
    }


def oracle_sql() -> dict[str, str]:
    from sigraph_ray.pipelines import queries as Q

    return {
        "prov_nodes": Q.SQL_PROV_NODES,
        "prov_traces": Q.SQL_PROV_TRACES,
        "prov_edges": Q.SQL_PROV_EDGES,
        "incremental_traces": Q.SQL_INCREMENTAL_TRACES,
        "incremental_edges": Q.SQL_INCREMENTAL_EDGES,
        "prov_contains": Q.SQL_PROV_CONTAINS,
        "prov_contains_pruned": Q.SQL_PROV_CONTAINS_PRUNED,
        "prov_quarantine": Q.SQL_PROV_QUARANTINE,
        "related_traces": Q.SQL_RELATED_TRACES,
        "distinct_units": Q.SQL_DISTINCT_UNITS,
        "rule_match": Q.SQL_RULE_MATCH,
        "sigma_match": Q.SQL_SIGMA_MATCH,
        "label_sequences": Q.SQL_LABEL_SEQUENCES,
        "tactic_histogram": Q.SQL_TACTIC_HISTOGRAM,
        "doc_page": Q.SQL_DOC_PAGE,
        "prov_subgraph": Q.SQL_PROV_SUBGRAPH,
        "prov_neighborhood": Q.SQL_PROV_NEIGHBORHOOD,
        "trace_listing": Q.SQL_TRACE_LISTING,
        "iocs": Q.SQL_IOCS,
        "drift_sequence": Q.SQL_DRIFT_SEQUENCE,
        "lineitem_agg": Q.SQL_LINEITEM_AGG,
        "lineitem_rollup": Q.SQL_LINEITEM_ROLLUP,
        "user_event_pivot": Q.SQL_USER_EVENT_PIVOT,
        "top_customers": Q.SQL_TOP_CUSTOMERS,
        "events_hourly": Q.SQL_EVENTS_HOURLY,
        "burst_hours": Q.SQL_BURST_HOURS,
        "cohort_retention": Q.SQL_COHORT_RETENTION,
        "funnel_conversion": Q.SQL_FUNNEL_CONVERSION,
        "event_transitions": Q.SQL_EVENT_TRANSITIONS,
        "value_time_corr": Q.SQL_VALUE_TIME_CORR,
        "type_trend": Q.SQL_TYPE_TREND,
        "rolling_active_users": Q.SQL_ROLLING_ACTIVE_USERS,
        "supplier_nation": Q.SQL_SUPPLIER_NATION,
        "asof_attribution": Q.SQL_ASOF_ATTRIBUTION,
        "range_join": Q.SQL_RANGE_JOIN,
        "purchase_error_overlap": Q.SQL_PURCHASE_ERROR_OVERLAP,
        "sessionize": Q.SQL_SESSIONIZE,
        "distinct_users_per_type": Q.SQL_DISTINCT_USERS_PER_TYPE,
        "source_lang_entropy": Q.SQL_SOURCE_LANG_ENTROPY,
        "source_unigram_kl": Q.SQL_SOURCE_UNIGRAM_KL,
        "quantiles": Q.SQL_QUANTILES,
        "grouped_quantiles": Q.SQL_GROUPED_QUANTILES,
        "top_orders_per_customer": Q.SQL_TOP_ORDERS_PER_CUSTOMER,
        "sliding_window": Q.SQL_SLIDING_WINDOW,
        "customers_without_orders": Q.SQL_CUSTOMERS_WITHOUT_ORDERS,
        "order_revenue": Q.SQL_ORDER_REVENUE,
        "source_enriched": Q.SQL_SOURCE_ENRICHED,
        "bloom_semi_lineitem": Q.SQL_BLOOM_SEMI_LINEITEM,
        "upsert_compact": Q.SQL_UPSERT_COMPACT,
        "upsert_with_deletes": Q.SQL_UPSERT_WITH_DELETES,
        "data_quality": Q.SQL_DATA_QUALITY,
        "zorder_keys": Q.SQL_ZORDER_KEYS,
        "quality_filtered": Q.SQL_QUALITY_FILTERED,
        "text_stats": Q.SQL_TEXT_STATS,
        "pii_scrub": Q.SQL_PII_SCRUB,
        "corpus_summary": Q.SQL_CORPUS_SUMMARY,
        "curated_per_source": Q.SQL_CURATED_PER_SOURCE,
        "snapshot_delta": Q.SQL_SNAPSHOT_DELTA,
        "bpe_token_count": Q.SQL_BPE_TOKEN_COUNT,
        "repetition_stats": Q.SQL_REPETITION_STATS,
        "decontaminate": Q.SQL_DECONTAMINATE,
        "dup_passages": Q.SQL_DUP_PASSAGES,
        "host_stats": Q.SQL_HOST_STATS,
        "pack_sequences": Q.SQL_PACK_SEQUENCES,
        "node_degrees": Q.SQL_NODE_DEGREES,
        "component_labels": Q.SQL_COMPONENT_LABELS,
        "triangle_cooccur": Q.SQL_TRIANGLE_COOCCUR,
        "cooccur_shortest_paths": Q.SQL_COOCCUR_SHORTEST_PATHS,
        "mixture_sample": Q.SQL_MIXTURE_SAMPLE,
        "unigram_logprob": Q.SQL_UNIGRAM_LOGPROB,
        "nb_classify": Q.SQL_NB_CLASSIFY,
        "quality_scores": Q.SQL_QUALITY_SCORES,
        "fingerprints": Q.SQL_FINGERPRINTS,
        "lang_id": Q.SQL_LANG_ID,
        "term_topk": Q.SQL_TERM_TOPK,
        "bigram_topk": Q.SQL_BIGRAM_TOPK,
        "pmi_collocations": Q.SQL_PMI_COLLOCATIONS,
        "gazetteer_mentions": Q.SQL_GAZETTEER_MENTIONS,
        "part_skyline": Q.SQL_PART_SKYLINE,
        "basket_pairs": Q.SQL_BASKET_PAIRS,
        "chi2_type_weekday": Q.SQL_CHI2_TYPE_WEEKDAY,
        "embed_covariance": Q.SQL_EMBED_COVARIANCE,
        "ip_jaccard": Q.SQL_IP_JACCARD,
        "association_rules": Q.SQL_ASSOCIATION_RULES,
        "mention_snippets": Q.SQL_MENTION_SNIPPETS,
        "knn_label_agreement": Q.SQL_KNN_LABEL_AGREEMENT,
        "bm25_topk": Q.SQL_BM25_TOPK,
        "user_trigrams": Q.SQL_USER_TRIGRAMS,
        "recency_score": Q.SQL_RECENCY_SCORE,
        "winsorized_value": Q.SQL_WINSORIZED_VALUE,
        "ks_doclen": Q.SQL_KS_DOCLEN,
        "vocab_summary": Q.SQL_VOCAB_SUMMARY,
        "rrf_hybrid": Q.SQL_RRF_HYBRID,
        "edge_type_signatures": Q.SQL_EDGE_TYPE_SIGNATURES,
        "percent_rank": Q.SQL_PERCENT_RANK,
        "tfidf_keywords": Q.SQL_TFIDF_KEYWORDS,
        "inverted_index": Q.SQL_INVERTED_INDEX,
        "stratified_sample": Q.SQL_STRATIFIED_SAMPLE,
        "weighted_sample": Q.SQL_WEIGHTED_SAMPLE,
        "value_outliers": Q.SQL_VALUE_OUTLIERS,
        "value_drift_psi": Q.SQL_VALUE_DRIFT_PSI,
        "length_histogram": Q.SQL_LENGTH_HISTOGRAM,
        "source_capped": Q.SQL_SOURCE_CAPPED,
        "temperature_mixture": Q.SQL_TEMPERATURE_MIXTURE,
        "dedup_weighted_tokens": Q.SQL_DEDUP_WEIGHTED_TOKENS,
        "profile": Q.SQL_PROFILE,
        "key_skew": Q.SQL_KEY_SKEW,
        "grouped_mode": Q.SQL_GROUPED_MODE,
        "ntile_buckets": Q.SQL_NTILE_BUCKETS,
        "gap_filled_hourly": Q.SQL_GAP_FILLED_HOURLY,
        "det_shuffle": Q.SQL_DET_SHUFFLE,
        "interleave_sources": Q.SQL_INTERLEAVE_SOURCES,
        "shard_plan": Q.SQL_SHARD_PLAN,
        "exact_dedup": Q.SQL_EXACT_DEDUP,
        "simhash_pairs": Q.SQL_SIMHASH_PAIRS,
        "ngram_jaccard": Q.SQL_NGRAM_JACCARD,
        "embed_cosine_pairs": Q.SQL_EMBED_COSINE_PAIRS,
        "embed_dup_clusters": Q.SQL_EMBED_DUP_CLUSTERS,
        "name_editdist_pairs": Q.SQL_NAME_EDITDIST_PAIRS,
        "tfidf_cosine_pairs": Q.SQL_TFIDF_COSINE_PAIRS,
        "label_centroids": Q.SQL_LABEL_CENTROIDS,
        "knn_cosine": Q.SQL_KNN_COSINE,
        "knn_self_join": Q.SQL_KNN_SELF_JOIN,
        # minhash_dedup, knn_cosine_lsh/ivf, doc_embed_knn,
        # kg_neighborhood, kg_triples, kg_entities: not
        # SQL-expressible → rows-only (approximate / non-relational).
    }
