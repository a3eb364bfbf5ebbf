#!/bin/bash
# Round-13 bench burns, serialized so no run contends with another:
#  1. BENCH_local_r15.json     — full repeats-3 band table at sf0.1 (207 queries)
#  2. BENCH_scale_x10_r13.json — x10 points: doc_elaborates vs the adjacent
#     form (the storage lever's first scale measurement, board #7) plus the
#     new multi-pass capped family
#  3. BENCH_scale_x100_r13.json — the same set at x100 (doc_elaborates full
#     enumeration may die by contract; instrumented Bench records it in
#     `failed` rather than timing a corpse)
# Usage: scripts/bench_r13.sh [step...]   (default: all)
set -u
cd /root/repo
. scripts/java_opts.sh
CP="target/scala-2.13/classes:/opt/spark/jars/*"
SCALESET="doc_elaborates,doc_elaborates_adjacent,dedup_minhash_capped_multi,dedup_minhash_capped"

run() { # out mem env-pairs...
  local out="$1" mem="$2"; shift 2
  echo "== $(date +%H:%M:%S) $out =="
  env "$@" java $GRAFT_JAVA_OPTS -Xmx"$mem" -cp "$CP" graft.Bench 2>/dev/null \
    | grep '^{' > "$out"
  tail -c 500 "$out"; echo
}

steps="${*:-1 2 3}"
for s in $steps; do case $s in
1) run BENCH_local_r15.json 24g \
     SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
     SPARK_GRAFT_BENCH_REPEATS=3 ;;
2) run BENCH_scale_x10_r13.json 24g \
     SPARK_GRAFT_SF_DIR=/root/repo/target/synth-corpus-x10 SPARK_GRAFT_CPUS=32 \
     SPARK_GRAFT_BENCH_REPEATS=2 SPARK_GRAFT_BENCH_ONLY="$SCALESET" ;;
3) run BENCH_scale_x100_r13.json 60g \
     SPARK_GRAFT_SF_DIR=/root/repo/target/synth-corpus-x100 SPARK_GRAFT_CPUS=32 \
     SPARK_GRAFT_BENCH_REPEATS=1 SPARK_GRAFT_BENCH_ONLY="$SCALESET" ;;
esac; done
echo "== $(date +%H:%M:%S) done =="
# Steps 4-5 (post band-buckets JIT fix + SHUFFLE_HASH rank-join fix):
# refreshed capped/multi scale points superseding the step-2/3 rows.
for s in ${*:-}; do case $s in
4) run BENCH_scale_x10b_r13.json 24g \
     SPARK_GRAFT_SF_DIR=/root/repo/target/synth-corpus-x10 SPARK_GRAFT_CPUS=32 \
     SPARK_GRAFT_BENCH_REPEATS=2 SPARK_GRAFT_BENCH_ONLY="dedup_minhash_capped,dedup_minhash_capped_multi,corpus_pipeline_fast_capped" ;;
5) run BENCH_scale_x100b_r13.json 60g \
     SPARK_GRAFT_SF_DIR=/root/repo/target/synth-corpus-x100 SPARK_GRAFT_CPUS=32 \
     SPARK_GRAFT_BENCH_REPEATS=1 SPARK_GRAFT_BENCH_ONLY="dedup_minhash_capped,dedup_minhash_capped_multi,corpus_pipeline_fast_capped" ;;
esac; done
