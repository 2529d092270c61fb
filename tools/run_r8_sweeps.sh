#!/bin/bash
# r8 strict-hash correctness sweeps (VERDICT r7 tasks 2-4):
#   pass 1: full-registry sf1 re-pin on the r7-regenerated fixture
#           (CORRECTNESS_SF1.json, split-half parallel, resumable via the
#           incremental .partial writes)
#   pass 2: sf3 strict hash sweep over the 51 STRESS_SF3 keys + the r8
#           tiered frequent-term key (its sf3 non-vacuosity is the point)
#   pass 3: sf10 strict hash sweep over the 12 STRESS_SF10 keys + 3
#           representatives added r8 (D6 ngram-jaccard post-rescope, the
#           tiered term key, HITS)
# --max-hash-rows 2000000: giant pair-list keys record rows+schema only
# (their VALUES are hash-pinned at sf1; Python-side canonicalization of a
# 15-30M-row result costs ~80 GB RSS — measured r7).
set -e
cd "$(dirname "$0")/.."

SF3_KEYS=q_agg_airport_shapley,q_agg_bootstrap_median,q_agg_bradley_terry,q_agg_groupby_pricing,q_agg_spearman,q_agg_tail_dependence,q_agg_trimmed_mean,q_dedup_blocking_quality,q_dedup_cluster_representative,q_dedup_components,q_dedup_cross_corpus,q_dedup_minhash_lsh,q_dedup_near_jaccard,q_dedup_ngram_jaccard,q_dedup_source_matrix,q_dedup_winnowing,q_etl_calendarize,q_etl_fd_audit,q_etl_rebalance_audit,q_graph_assortativity,q_graph_degree_dist,q_graph_distance_histogram,q_graph_global_efficiency,q_graph_hits,q_graph_katz,q_graph_kcore,q_graph_label_prop,q_graph_pagerank,q_graph_percolation_profile,q_graph_ppr,q_graph_scc,q_graph_temporal_triangles,q_join_star_5way,q_multimodal_cdc_chunks,q_sql_recursive_cte,q_text_boilerplate_ngrams,q_text_contamination,q_text_novelty,q_text_rake_keywords,q_text_repetition,q_text_tfidf_cosine,q_tpch_q18,q_tpch_q21,q_ts_underwater_recovery,q_vec_ivf_search_learned,q_vec_kmeans_ivf,q_vec_pca_explained,q_vec_pq_adc,q_win_lead_time,q_win_queue_percentiles,q_win_topk_per_group,q_text_frequent_terms_tiered

SF10_KEYS=q_agg_groupby_pricing,q_dedup_components,q_dedup_cross_corpus,q_dedup_minhash_lsh,q_graph_label_prop,q_graph_pagerank,q_join_star_5way,q_text_contamination,q_tpch_q18,q_vec_kmeans_ivf,q_vec_pq_adc,q_win_topk_per_group,q_dedup_ngram_jaccard,q_text_frequent_terms_tiered,q_graph_hits

echo "=== pass 2: sf3 strict hash sweep (52 keys)"
SPARK_GRAFT_CPUS=16 SPARK_GRAFT_DRIVER_MEM=24g \
python selfcheck.py --sf-dir .data/sf3 --only "$SF3_KEYS" \
    --max-hash-rows 2000000 --out CORRECTNESS_SF3.json

echo "=== pass 3: sf10 strict hash sweep (15 keys)"
SPARK_GRAFT_CPUS=16 SPARK_GRAFT_DRIVER_MEM=24g \
python selfcheck.py --sf-dir .data/sf10 --only "$SF10_KEYS" \
    --max-hash-rows 2000000 --out CORRECTNESS_SF10.json

echo "all r8 sweeps done"
