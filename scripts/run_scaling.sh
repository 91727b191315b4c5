#!/usr/bin/env bash
# Empirical scale-curve record: run the heaviest documents/embeddings/
# events queries at x1/x2/x4/x8 staged scales (scripts/stage_scale.py)
# and leave one headline JSON per scale in /tmp/graft_scale/.
# Development tooling only — not part of the shipped library.
set -euo pipefail
cd "$(dirname "$0")/.."

# r14 adds the iterative-fixpoint family (g1/g4/rc1 — their trade-table
# inputs now inflate with scale, see stage_scale.py) so the "fixed job
# count, data-sized work per job" adjudication is measured, not argued.
# r16 adds the round's new operators (m7 perceptual-hash near-dup, t20
# quality classifier, d17 streaming-substr replay) to the main sweep.
# r16 continuation adds the session's new family: d19 line dedup (gram-
# grain corpus shuffle), sft1 conversation assembly (user-keyed windows
# over inflated disjoint users), pref1/ccnet1/t23 (group-keyed argmax /
# tercile / map-side filter over inflated documents), g5 LPA and t22
# TextRank (fixed-round iteration over k disconnected graph copies /
# growing word graph), vocab5 (vocab3's curve at the source grain).
QUERIES="d11_quality_keep,d6_neardup_clusters,d9_neardup_shuffle_kernel,d10_containment,d2_ngram_jaccard,d3_minhash_lsh,d8_semantic_dedup,vocab3_bpe_encode,pair2_hard_negatives,t6_tfidf,v5_knn_pq,p3_pipeline_e2e,split2_cluster_split,pack3_bin_packing,e5_transition_matrix,drift1_dist_shift,t19_gopher_rules,d12_incremental_dedup,j18_salted_join,g1_pagerank,g4_bfs_hops,rc1_recursive_cte,d14_substr_dedup,d15_substr_cut,d16_stream_dedup_replay,d17_stream_substr_replay,m7_image_neardup,t20_quality_classifier,m8_audio_neardup,m9_crossmodal_clusters,m10_video_neardup,d18_decontaminate_neardup,t21_pii_redact,d19_line_dedup,sft1_conversation_build,pref1_preference_pairs,g5_label_propagation,t22_textrank_keywords,ccnet1_ppl_buckets,t23_blocklist_filter,vocab5_fertility"

# r16: the gram-operator tail — x16/x32 documents-only scales where the
# corpus-token gram shuffle finally dominates the fixed session cost
# (d14/d16 measured exp ~0 at x8; VERDICT r15 item 5).
GRAM_QUERIES="d14_substr_dedup,d15_substr_cut,d16_stream_dedup_replay,d17_stream_substr_replay,d7_span_dedup,t20_quality_classifier,d19_line_dedup"

python3 scripts/stage_scale.py

# r15: anchor honesty — the r14 sweep's x1 points were recorded at load
# 2.75 (staging's own tail), above the repo's 2.2 "garbage" bar. Wait for
# the 1-minute load to settle below 1.3 before EACH scale so every
# anchor, not just x1, is taken from a quiet box; bounded so a stuck
# background process can't hang the sweep (it then records the load it
# got, visibly, in the per-scale JSON).
wait_idle() {
  for _ in $(seq 1 60); do
    load=$(cut -d' ' -f1 /proc/loadavg)
    awk -v l="$load" 'BEGIN{exit !(l < 1.3)}' && return 0
    sleep 10
  done
  echo "wait_idle: gave up at load $(cut -d' ' -f1 /proc/loadavg)"
}

run_scale() {
  m=$1; qs=$2
  echo "=== scale x$m ==="
  wait_idle
  # record the PRE-run load (what wait_idle controls): the end-of-run
  # load inside the headline JSON is the bench's own self-load
  cut -d' ' -f1 /proc/loadavg > /tmp/graft_scale/load_start_x$m.txt
  SPARK_GRAFT_SF_DIR=/tmp/graft_scale/x$m \
  SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_ONLY="$qs" \
  SPARK_GRAFT_BENCH_REPEAT=3 \
  SPARK_GRAFT_BENCH_FULL_PATH=0 \
  SPARK_GRAFT_BENCH_HEADLINE_PATH=/tmp/graft_scale/headline_x$m.json \
  sbt -batch 'runMain graft.Bench' 2>&1 | tail -2
}

for m in 1 2 4 8; do
  run_scale $m "$QUERIES"
done

for m in 16 32; do
  run_scale $m "$GRAM_QUERIES"
done

python3 scripts/collect_scaling.py "${SCALING_ROUND:-14}"
