#!/bin/bash
# Round-14 bench burns, serialized so no run contends with another:
#  1. BENCH_local_r16.json    — full repeats-3 band table at sf0.1 (round-14 HEAD:
#     +doc_elaborates_virtual, +graph_leiden_cert, +ann_lsh_multiprobe_cert)
#  2. BENCH_pipe_r14.json     — board #5: fresh repeats-3 protocol medians for the
#     pipeline pair at HEAD (BENCH_pipe_r11 was repeats-2 and pre-dates several
#     pipeline-touching rounds)
#  3. BENCH_scale_x10_r14.json  — doc_elaborates_virtual at x10 (decade-2 point)
#  4. BENCH_scale_x100_r14.json — doc_elaborates_virtual at x100: the board-#1
#     completion point — the concept-predicate virtual form must COMPLETE where
#     both materializations are recorded deaths (BENCH_scale_x100_r13 failed list)
#  5. CAPSWEEP_r14 x100 rows  — board #3: the W/P coverage ladder at decade 3
#     (full family as reference + the README ladder rows only)
# Usage: scripts/bench_r14.sh [step...]   (default: all)
set -u
cd /root/repo
. scripts/java_opts.sh
CP="target/scala-2.13/classes:/opt/spark/jars/*"

run() { # out mem env-pairs...
  local out="$1" mem="$2"; shift 2
  echo "== $(date +%H:%M:%S) $out =="
  env "$@" java $GRAFT_JAVA_OPTS -Xmx"$mem" -cp "$CP" graft.Bench 2>/dev/null \
    | grep '^{' > "$out"
  tail -c 500 "$out"; echo
}

steps="${*:-1 2 3 4 5}"
for s in $steps; do case $s in
1) run BENCH_local_r16.json 24g \
     SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
     SPARK_GRAFT_BENCH_REPEATS=3 ;;
2) run BENCH_pipe_r14.json 24g \
     SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
     SPARK_GRAFT_BENCH_REPEATS=3 \
     SPARK_GRAFT_BENCH_ONLY="corpus_pipeline,corpus_pipeline_fast,corpus_pipeline_fast_capped" ;;
3) run BENCH_scale_x10_r14.json 24g \
     SPARK_GRAFT_SF_DIR=/root/repo/target/synth-corpus-x10 SPARK_GRAFT_CPUS=32 \
     SPARK_GRAFT_BENCH_REPEATS=2 SPARK_GRAFT_BENCH_ONLY="doc_elaborates_virtual" ;;
4) run BENCH_scale_x100_r14.json 60g \
     SPARK_GRAFT_SF_DIR=/root/repo/target/synth-corpus-x100 SPARK_GRAFT_CPUS=32 \
     SPARK_GRAFT_BENCH_REPEATS=1 SPARK_GRAFT_BENCH_ONLY="doc_elaborates_virtual" ;;
5) echo "== $(date +%H:%M:%S) CAPSWEEP x100 ==" ;
   env SPARK_GRAFT_CAPSWEEP_GRID="8:1,8:2,8:3,32:1" SPARK_GRAFT_CPUS=32 \
     java $GRAFT_JAVA_OPTS -Xmx60g -cp "$CP" graft.CapSweep \
     /root/repo/target/synth-corpus-x100 2>target/capsweep_x100.err \
     | tee target/capsweep_x100.out ;;
esac; done
echo "== $(date +%H:%M:%S) done =="
