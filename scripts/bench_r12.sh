#!/bin/bash
# Round-12 bench burns, serialized so no run contends with another:
#  1. BENCH_local_r14.json    — full repeats-3 band table at sf0.1 (204 queries)
#  2. BENCH_scale_x10_r12.json  — x10 pipeline set incl. the capped forms
#  3. BENCH_scale_x100a_r12.json — x100 CAPPED set (expected to complete)
#  4. BENCH_scale_x100b_r12.json — x100 UNCAPPED set (supersedes the tainted
#     r11 chain artifact: instrumented Bench, failures land in `failed`)
# Usage: scripts/bench_r12.sh [step...]   (default: all)
set -u
cd /root/repo
. scripts/java_opts.sh
CP="target/scala-2.13/classes:/opt/spark/jars/*"
CAPPED="corpus_pipeline_fast_capped,dedup_minhash_capped,dedup_simhash_lsh,dedup_minhash_capped_oracle"
UNCAPPED="corpus_pipeline,corpus_pipeline_fast,dedup_minhash"

run() { # out mem env-pairs...
  local out="$1" mem="$2"; shift 2
  echo "== $(date +%H:%M:%S) $out =="
  env "$@" java $GRAFT_JAVA_OPTS -Xmx"$mem" -cp "$CP" graft.Bench 2>/dev/null \
    | grep '^{' > "$out"
  tail -c 500 "$out"; echo
}

steps="${*:-1 2 3 4}"
for s in $steps; do case $s in
1) run BENCH_local_r14.json 24g \
     SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
     SPARK_GRAFT_BENCH_REPEATS=3 ;;
2) run BENCH_scale_x10_r12.json 24g \
     SPARK_GRAFT_SF_DIR=/root/repo/target/synth-corpus-x10 SPARK_GRAFT_CPUS=32 \
     SPARK_GRAFT_BENCH_REPEATS=2 SPARK_GRAFT_BENCH_ONLY="$CAPPED,$UNCAPPED" ;;
3) run BENCH_scale_x100a_r12.json 60g \
     SPARK_GRAFT_SF_DIR=/root/repo/target/synth-corpus-x100 SPARK_GRAFT_CPUS=32 \
     SPARK_GRAFT_BENCH_REPEATS=1 SPARK_GRAFT_BENCH_ONLY="$CAPPED" ;;
4) run BENCH_scale_x100b_r12.json 60g \
     SPARK_GRAFT_SF_DIR=/root/repo/target/synth-corpus-x100 SPARK_GRAFT_CPUS=32 \
     SPARK_GRAFT_BENCH_REPEATS=1 SPARK_GRAFT_BENCH_ONLY="$UNCAPPED" ;;
esac; done
echo "== $(date +%H:%M:%S) done =="
