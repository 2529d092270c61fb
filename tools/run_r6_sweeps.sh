#!/bin/bash
# r6 widened scale sweeps: extend STRESS_SF1 to 35 new keys, widen
# STRESS_SF3 from 8 to ~30 keys, and add a NEW sf10 decade
# (STRESS_SF10.json) over the heaviest family representatives.
# Run on an otherwise-idle machine (warm ratios are the signal).
set -e
cd "$(dirname "$0")/.."

# Keys not yet in STRESS_SF1.json: the sf0.1 warm slow tail plus one
# representative per family added since the r4 sweep.
NEW_KEYS=q_etl_rebalance_audit,q_text_boilerplate_ngrams,q_agg_bootstrap_median,q_agg_airport_shapley,q_dedup_blocking_quality,q_graph_hits,q_graph_temporal_triangles,q_dedup_source_matrix,q_graph_distance_histogram,q_graph_assortativity,q_sql_recursive_cte,q_vec_pca_explained,q_agg_bradley_terry,q_graph_percolation_profile,q_dedup_ngram_jaccard,q_text_novelty,q_dedup_cluster_representative,q_graph_katz,q_graph_global_efficiency,q_agg_spearman,q_text_tfidf_cosine,q_win_queue_percentiles,q_text_repetition,q_ts_underwater_recovery,q_win_lead_time,q_agg_trimmed_mean,q_multimodal_cdc_chunks,q_etl_calendarize,q_text_rake_keywords,q_graph_scc,q_graph_ppr,q_graph_degree_dist,q_dedup_winnowing,q_etl_fd_audit,q_agg_tail_dependence

# sf3 widening: the existing 8 keys stay as recorded; add the new tail
# plus the TPC-H/join/window anchors so every family has a 30x point.
SF3_KEYS=$NEW_KEYS,q_tpch_q18,q_tpch_q21,q_agg_groupby_pricing,q_join_star_5way,q_win_topk_per_group,q_dedup_near_jaccard,q_vec_kmeans_ivf,q_graph_kcore

# sf10 (100x sf0.1): the heaviest key per 100TB-critical family.
SF10_KEYS=q_dedup_minhash_lsh,q_dedup_cross_corpus,q_dedup_components,q_graph_pagerank,q_graph_label_prop,q_text_contamination,q_agg_groupby_pricing,q_join_star_5way,q_vec_kmeans_ivf,q_vec_pq_adc,q_win_topk_per_group,q_tpch_q18

echo "=== pass 1: sf0.1 + sf1 for the 35 new keys (merge into STRESS_SF1.json)"
python tools/stress_merge.py --keys "$NEW_KEYS" \
    --sf-dir .data/sf1 --out STRESS_SF1.json --label sf1 \
    --also-small /root/testdata/sf0.1

echo "=== pass 2: sf3 widening (merge into STRESS_SF3.json)"
python tools/stress_merge.py --keys "$SF3_KEYS" \
    --sf-dir .data/sf3 --out STRESS_SF3.json --ratio-vs-sf1

echo "=== pass 3: sf10 decade (STRESS_SF10.json)"
python tools/stress_merge.py --keys "$SF10_KEYS" \
    --sf-dir .data/sf10 --out STRESS_SF10.json --ratio-vs-sf1 \
    --shuffle-partitions 128

echo "all sweeps done"
