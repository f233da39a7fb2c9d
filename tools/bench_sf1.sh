#!/bin/bash
# BENCH_sf1: heavy-family bench at 10x the sf0.1 row count (r10 verdict #8).
# Derives the corpus with tools/derive_sf1.py (replica-structured: dedup /
# ANN / graph internal structure preserved per replica, disjoint across),
# then runs the probe list through graft.Bench against a DEDICATED history
# file (bench_history_sf1.json — never the sf0.1 one), writing the JSON
# line to BENCH_sf1.json.
#
# The DEFAULT list is the round-11 operator set plus the heavies whose 10x
# growth round-10 probes already bounded. The full dedup/traj/contact
# composite set is NOT default: a round-11 attempt ran one of them for
# 2.5 h of full-core time at 10x without completing (candidates:
# traj_similarity_grid, g10_contact_chains, dedup_self_similarity — their
# candidate generation is block-quadratic and 10x rows in the SAME
# time/space/shingle key-space is a 100x pair budget, unlike production
# 10x which grows the KEY SPACE too). Isolate with
# SPARK_GRAFT_SF1_ONLY=<q> before re-adding any of them.
set -e
SF1="${1:-/tmp/sf1_derived}"
cd /root/repo
if [ ! -f "$SF1/documents.parquet" ]; then
  echo "[sf1] deriving 10x corpus into $SF1"
  python3 tools/derive_sf1.py /root/testdata/sf0.1 "$SF1"
fi
DEFAULT=ab_test_mann_whitney,ab_test_kruskal_wallis,ab_test_anova_f
DEFAULT=$DEFAULT,ts_cross_correlation,ts_burstiness,ml_spearman_corr
DEFAULT=$DEFAULT,ab_test_levene,ab_test_effect_size,ab_test_permutation
DEFAULT=$DEFAULT,a30_trimmed_mean,ml_lift_curve,ml_cramers_v
DEFAULT=$DEFAULT,ml_krippendorff_alpha,text_ttr,text_source_vocab_jaccard
DEFAULT=$DEFAULT,retrieval_rbo,embedding_whiten,graph_assortativity
DEFAULT=$DEFAULT,graph_clustering_coeff,funnel_time_to_convert
DEFAULT=$DEFAULT,dedup_minhash_lsh,dedup_exact,ann_ivf_cosine,ann_lsh_bucketed
DEFAULT=$DEFAULT,graph_pagerank,graph_kcore,stats_bootstrap_ci
DEFAULT=$DEFAULT,text_tfidf_top_terms,stream_replay_throughput
# Round-12 (r11 verdict #6): the linear-cost text family — the suite's
# biggest absolute movers at 10x — now ratchet budgets in
# bench_history_sf1.json like the sf0.1 rows do; plus the round-12 ops.
DEFAULT=$DEFAULT,text_top_ngrams,text_decontaminate,text_pmi_collocations
DEFAULT=$DEFAULT,text_unigram_logprob,text_hash_embedding
DEFAULT=$DEFAULT,curation_pipeline_v6,dedup_jaccard_prefix_capped
DEFAULT=$DEFAULT,dedup_title_edit_capped
# Round-13 (r12 verdict #3): the full graph family — the suite's top
# absolute costs, edges-linear by construction (fixed-iteration equi-join
# + dst aggregation) — now ratchets sf1 budgets too; plus the round-13
# planner-consumed LSH, the two-stage matryoshka serve, and the KS-gated
# admission composite.
DEFAULT=$DEFAULT,graph_ppr,graph_hits,graph_pagerank_dangling
DEFAULT=$DEFAULT,dedup_lsh_planned,ann_truncated_rerank,curation_pipeline_v7
# Round-13 late additions (first sf1 measurement seeds on the next run —
# the two-pass protocol: expect first-run floor flags only if >4 s).
DEFAULT=$DEFAULT,dq_js_by_source,dq_embedding_drift,ann_ivf_truncated_rerank
# Round-14 (r13 verdict #3/#5/#6): the one-pass production LSH path
# measured against the relational dedup_lsh_planned at the same
# (t, nPerms); the unified drift datacard; the leakage-safe curation v8.
DEFAULT=$DEFAULT,dedup_lsh_planned_onepass,dq_drift_datacard
DEFAULT=$DEFAULT,curation_pipeline_v8
DEFAULT=$DEFAULT,dedup_incremental_lsh,dq_psi_by_source_quantile
# Round-15 (r14 verdict #4/#7): the remaining serve-stack rows next to
# their relational/unpruned pairs (ann_ivfpq_pruned vs ann_ivfpq;
# dedup_lsh_planned is already listed), the engaged-cap skew_stress rows
# (their caps' cost claim measured at 10x, not argued), and the composed
# incremental-corpus session.
DEFAULT=$DEFAULT,ann_ivfpq,ann_ivfpq_pruned,skew_stress_near_dups
DEFAULT=$DEFAULT,skew_stress_containment,skew_stress_salted_join
DEFAULT=$DEFAULT,skew_stress_title_edit,skew_stress_semantic_hash
DEFAULT=$DEFAULT,skew_stress_colocation,e2e_incremental_session
# Round-15 (r14 verdict #5): the four-arm admission datacard driven over
# the replay source — |sources|-bounded state asserted per batch.
DEFAULT=$DEFAULT,stream_admission_throughput
# Round-16 (r15 verdict #3): the serve-only IVF-PQ row at 10x — ann_ivfpq
# times fit+serve and its sf1 reading is build-dominated at local
# partition counts (SCALE.md), so the partition-pruning lever needs the
# probe-only number next to the build-inclusive pair.
DEFAULT=$DEFAULT,ann_ivfpq_probe_only
ONLY="${SPARK_GRAFT_SF1_ONLY:-$DEFAULT}"
SPARK_GRAFT_SF_DIR="$SF1" SPARK_GRAFT_CPUS=32 SPARK_GRAFT_ONLY="$ONLY" \
  SPARK_GRAFT_BENCH_HISTORY=bench_history_sf1.json \
  sbt -batch "runMain graft.Bench" 2>&1 |
  grep -E '^\[info\] \{"metric":"total",' | sed 's/^\[info\] //' > BENCH_sf1.json
python3 - <<'EOF'
import json
j = json.load(open('BENCH_sf1.json'))
print('[sf1] total', round(j['value'], 1), 's over', len(j['queries']),
      'queries; failed:', j['failed'], 'noise:', j['noise_suspect'])
EOF
