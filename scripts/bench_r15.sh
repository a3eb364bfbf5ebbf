#!/bin/bash
# Round-15 bench burns — QUIET-BOX PROTOCOL (board #4).
#
# Two consecutive rounds spent a board item adjudicating chain-state
# noise (r14 median ratio 0.91, r15→r16 1.143 — both pinned as session
# state by same-HEAD replicates). The r16b replicate conditions are now
# the DEFAULT for the standard band table:
#   - the persistent sbt shell (tmux session `sbt`) is KILLED first —
#     an idle sbt+zinc JVM holds ~2-4 GB resident and wakes up
#     unpredictably;
#   - any stray graft java processes are waited out (not killed — a
#     bench must never overlap another);
#   - /proc/loadavg is recorded immediately before each step into the
#     step's .load sidecar, so the artifact is adjudicable on its own
#     (Bench's own health object reports load at END of run).
# Step 2 is the ONE chained replicate kept for drift comparison only —
# same HEAD, run immediately after step 1 on the same quiet box; the
# band table of record is step 1.
#
# Steps:
#  1. BENCH_local_r17.json     — the standard band table: full repeats-3
#     at sf0.1, quiet box (round-15 HEAD: +tag_hierarchy_cert, native
#     SimHashLshKeys, quality-tower barrier, fixpoint virtual closure)
#  2. BENCH_local_r17b.json    — chained same-box replicate (drift only)
#  3. BENCH_sink_r15.json      — board #7: the virtual-elaborates SINK
#     form priced protocol-grade next to the sorted form (repeats 3,
#     sf0.1) — Bench resolves probe-only names via Probe.targetFn
#  4. BENCH_sink_x10_r15.json  — decade-2 sink/sorted pair (repeats 2)
#  5. BENCH_sink_x100_r15.json — decade-3 sink/sorted pair (repeats 1):
#     the protocol-grade number behind the "~2/3 of x100 wall is the
#     presentation sort" claim (SURVEY §6 round 14)
# Usage: scripts/bench_r15.sh [step...]   (default: all)
set -u
cd /root/repo
. scripts/java_opts.sh
CP="target/scala-2.13/classes:/opt/spark/jars/*"

quiet_box() {
  tmux kill-session -t sbt 2>/dev/null && echo "killed tmux sbt session"
  # wait (not kill) for any other graft/spark java to finish
  for i in $(seq 1 60); do
    n=$(pgrep -fc 'java.*graft\.' 2>/dev/null || true)
    [ "${n:-0}" -le 1 ] && break   # 1 = possibly this script's pgrep noise
    echo "waiting on $n graft java procs"; sleep 10
  done
}

run() { # out mem env-pairs...
  local out="$1" mem="$2"; shift 2
  cat /proc/loadavg > "target/$(basename "$out" .json).load"
  echo "== $(date +%H:%M:%S) $out load=$(cut -d' ' -f1-3 /proc/loadavg) =="
  env "$@" java $GRAFT_JAVA_OPTS -Xmx"$mem" -cp "$CP" graft.Bench 2>/dev/null \
    | grep '^{' > "$out"
  tail -c 500 "$out"; echo
}

quiet_box
steps="${*:-1 2 3 4 5}"
for s in $steps; do case $s in
1) run BENCH_local_r17.json 24g \
     SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
     SPARK_GRAFT_BENCH_REPEATS=3 ;;
2) run BENCH_local_r17b.json 24g \
     SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
     SPARK_GRAFT_BENCH_REPEATS=3 ;;
3) run BENCH_sink_r15.json 24g \
     SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
     SPARK_GRAFT_BENCH_REPEATS=3 \
     SPARK_GRAFT_BENCH_ONLY="doc_elaborates_virtual,doc_elaborates_virtual_nosort" ;;
4) run BENCH_sink_x10_r15.json 24g \
     SPARK_GRAFT_SF_DIR=/root/repo/target/synth-corpus-x10 SPARK_GRAFT_CPUS=32 \
     SPARK_GRAFT_BENCH_REPEATS=2 \
     SPARK_GRAFT_BENCH_ONLY="doc_elaborates_virtual,doc_elaborates_virtual_nosort" ;;
5) run BENCH_sink_x100_r15.json 60g \
     SPARK_GRAFT_SF_DIR=/root/repo/target/synth-corpus-x100 SPARK_GRAFT_CPUS=32 \
     SPARK_GRAFT_BENCH_REPEATS=1 \
     SPARK_GRAFT_BENCH_ONLY="doc_elaborates_virtual,doc_elaborates_virtual_nosort" ;;
esac; done
echo "== $(date +%H:%M:%S) done =="
