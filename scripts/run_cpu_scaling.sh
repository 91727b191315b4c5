#!/usr/bin/env bash
# r17: CPU-scaling evidence at a CPU-DISCRIMINATING size (VERDICT r16
# item 7): the sf0.1 8-vs-32-core sweep measures nothing — every query is
# sub-3 s and fixed-overhead dominated, so 8 cores beats 32 on the
# headline total. This sweep runs the heavy tier against the x8 staged
# scale (scripts/stage_scale.py) at 8 and at 32 cores, so the ratio can
# actually move where parallel work exists. Development tooling only.
set -euo pipefail
cd "$(dirname "$0")/.."

# The >=1 s tier at x8 per SCALING_r16 times, plus the iterative family.
QUERIES="d11_quality_keep,d6_neardup_clusters,d10_containment,d2_ngram_jaccard,d3_minhash_lsh,d8_semantic_dedup,d9_neardup_shuffle_kernel,d18_decontaminate_neardup,d20_soft_dedup,split2_cluster_split,g1_pagerank,g4_bfs_hops,g5_label_propagation,rc1_recursive_cte,m7_image_neardup,m8_audio_neardup,m9_crossmodal_clusters,m10_video_neardup,t22_textrank_keywords,t6_tfidf,vocab3_bpe_encode,p3_pipeline_e2e,pair2_hard_negatives,ccnet1_ppl_buckets"

python3 scripts/stage_scale.py

wait_idle() {
  for _ in $(seq 1 60); do
    load=$(cut -d' ' -f1 /proc/loadavg)
    awk -v l="$load" 'BEGIN{exit !(l < 1.3)}' && return 0
    sleep 10
  done
  echo "wait_idle: gave up at load $(cut -d' ' -f1 /proc/loadavg)"
}

run_cpus() {
  c=$1
  echo "=== x8 at $c cores ==="
  wait_idle
  cut -d' ' -f1 /proc/loadavg > /tmp/graft_scale/load_start_cpu$c.txt
  SPARK_GRAFT_SF_DIR=/tmp/graft_scale/x8 \
  SPARK_GRAFT_CPUS=$c \
  SPARK_GRAFT_BENCH_ONLY="$QUERIES" \
  SPARK_GRAFT_BENCH_REPEAT=3 \
  SPARK_GRAFT_BENCH_FULL_PATH=0 \
  SPARK_GRAFT_BENCH_HEADLINE_PATH=/tmp/graft_scale/headline_x8_cpu$c.json \
  sbt -batch 'runMain graft.Bench' 2>&1 | tail -2
}

run_cpus 32
run_cpus 8

python3 - <<'EOF'
import json
out = {"note": ("8-vs-32-core ratios at the x8 staged scale - the "
                "CPU-discriminating size VERDICT r16 item 7 asked for "
                "(at sf0.1 every query is fixed-overhead bound and the "
                "ratio cannot move). ratio = t(8 cores) / t(32 cores); "
                ">1 means extra cores help."),
       "scale": 8, "unit": "sec", "repeat": 3}
for c in (8, 32):
    with open(f"/tmp/graft_scale/headline_x8_cpu{c}.json") as f:
        out[f"cpu{c}"] = json.load(f)["queries"]
    with open(f"/tmp/graft_scale/load_start_cpu{c}.txt") as f:
        out[f"load_start_cpu{c}"] = float(f.read().strip())
out["ratio_8_over_32"] = {
    k: round(out["cpu8"][k] / out["cpu32"][k], 3)
    for k in out["cpu32"] if k in out["cpu8"]
       and out["cpu32"][k] > 0 and out["cpu8"][k] > 0}
with open("SCALING_r17.json", "w") as f:
    json.dump(out, f, indent=1, sort_keys=True)
print("wrote SCALING_r17.json")
EOF
