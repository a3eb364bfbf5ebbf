#!/bin/bash
# Round-11 bench burns, serialized so no run contends with another:
#  1. BENCH_local_r13   — full repeats-3 band table at sf0.1 (new-protocol base)
#  2. BENCH_scale_x10_r11  — x10 points: pipeline pair + post-fix dedup_simhash_lsh
#  3. BENCH_scale_x100_r11 — x100 re-burns (simhash LSH post 8d68162; pipeline pair)
#  4. BENCH_twins_r11   — force-distributed composed-pipeline probe (sf0.1)
# Usage: scripts/bench_r11.sh [step...]   (default: all)
set -u
cd /root/repo
. scripts/java_opts.sh
CP="target/scala-2.13/classes:/opt/spark/jars/*"
PIPE="corpus_pipeline,corpus_pipeline_fast,dedup_simhash_lsh"

run() { # out mem env-pairs...
  local out="$1" mem="$2"; shift 2
  echo "== $(date +%H:%M:%S) $out =="
  env "$@" java $GRAFT_JAVA_OPTS -Xmx"$mem" -cp "$CP" graft.Bench 2>/dev/null \
    | grep '^{' > "$out"
  tail -c 400 "$out"; echo
}

steps="${*:-1 2 3 4}"
for s in $steps; do case $s in
1) run BENCH_local_r13.json 24g \
     SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
     SPARK_GRAFT_BENCH_REPEATS=3 ;;
2) run BENCH_scale_x10_r11.json 24g \
     SPARK_GRAFT_SF_DIR=/root/repo/target/synth-corpus-x10 SPARK_GRAFT_CPUS=32 \
     SPARK_GRAFT_BENCH_REPEATS=2 SPARK_GRAFT_BENCH_ONLY="$PIPE" ;;
3) run BENCH_scale_x100_r11.json 60g \
     SPARK_GRAFT_SF_DIR=/root/repo/target/synth-corpus-x100 SPARK_GRAFT_CPUS=32 \
     SPARK_GRAFT_BENCH_REPEATS=1 SPARK_GRAFT_BENCH_ONLY="$PIPE" ;;
4) run BENCH_twins_r11.json 24g \
     SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
     SPARK_GRAFT_BENCH_REPEATS=2 SPARK_GRAFT_FORCE_DISTRIBUTED=1 \
     SPARK_GRAFT_BENCH_ONLY="corpus_pipeline,corpus_pipeline_fast" ;;
esac; done
echo "== $(date +%H:%M:%S) done =="
