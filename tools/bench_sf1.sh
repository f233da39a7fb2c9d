#!/bin/bash
# BENCH_sf1: heavy-family bench at 10x the sf0.1 row count (r10 verdict #8).
# Derives the corpus with tools/derive_sf1.py (replica-structured: dedup /
# ANN / graph internal structure preserved per replica, disjoint across),
# then runs the heavy families plus every round-10/11 op through graft.Bench
# against a DEDICATED history file (bench_history_sf1.json — never the
# sf0.1 one), writing the JSON line to BENCH_sf1.json.
set -e
SF1="${1:-/tmp/sf1_derived}"
cd /root/repo
if [ ! -f "$SF1/documents.parquet" ]; then
  echo "[sf1] deriving 10x corpus into $SF1"
  python3 tools/derive_sf1.py /root/testdata/sf0.1 "$SF1"
fi
HEAVY=dedup_near_duplicates,dedup_containment,dedup_hybrid_pairs
HEAVY=$HEAVY,dedup_modality_eval,dedup_self_similarity,dedup_clusters
HEAVY=$HEAVY,dedup_substring_spans,dedup_minhash_lsh,dedup_simhash_pairs
HEAVY=$HEAVY,ann_ivfpq,ann_pq_adc,ann_ivf_cosine,ann_lsh_bucketed
HEAVY=$HEAVY,knn_cosine_bruteforce,pq_encode,ivf_kmeans_assign,ann_ivfpq_pruned
HEAVY=$HEAVY,graph_pagerank,graph_ppr,graph_hits,graph_label_prop
HEAVY=$HEAVY,graph_triangles,graph_kcore,graph_adamic_adar
HEAVY=$HEAVY,stats_bootstrap_ci,text_tfidf_top_terms,text_decontaminate
HEAVY=$HEAVY,traj_similarity_grid,g10_contact_chains
HEAVY=$HEAVY,curation_pipeline_v2,curation_pipeline_v5
HEAVY=$HEAVY,ab_test_mann_whitney,ab_test_kruskal_wallis,ab_test_anova_f
HEAVY=$HEAVY,ts_cross_correlation,ts_burstiness
HEAVY=$HEAVY,ml_spearman_corr,ab_test_levene,ab_test_effect_size
HEAVY=$HEAVY,graph_assortativity,text_ttr,retrieval_rbo,embedding_whiten
HEAVY=$HEAVY,ml_cramers_v,a30_trimmed_mean,ab_test_permutation
HEAVY=$HEAVY,ml_lift_curve,text_source_vocab_jaccard
SPARK_GRAFT_SF_DIR="$SF1" SPARK_GRAFT_CPUS=32 SPARK_GRAFT_ONLY="$HEAVY" \
  SPARK_GRAFT_BENCH_HISTORY=bench_history_sf1.json \
  sbt -batch "runMain graft.Bench" 2>&1 |
  grep -E '^\[info\] \{"metric"' | sed 's/^\[info\] //' > BENCH_sf1.json
python3 - <<'EOF'
import json
j = json.load(open('BENCH_sf1.json'))
print('[sf1] total', round(j['value'], 1), 's over', len(j['queries']),
      'queries; failed:', j['failed'], 'noise:', j['noise_suspect'])
EOF
