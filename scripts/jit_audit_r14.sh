#!/bin/bash
# Round-14 board #2: JIT-cliff audit of every knob-dependent generated
# projection. HotSpot's DontCompileHugeMethods limit (8 KB of BYTECODE
# per method) is 8x tighter than the janino 64 KB budget the code
# guards against, and crossing it is SILENT — no error line, the whole
# generated method just runs in the bytecode interpreter (round-13
# forensic: 46x stage CPU on the unrolled band projection).
#
# Protocol per target, fresh JVM each run:
#   A. default flags + -XX:+PrintCompilation  -> does any generated
#      method log "COMPILE SKIPPED: hot method too big"? (direct
#      evidence of the cliff)
#   B. -XX:-DontCompileHugeMethods             -> if warm wall improves
#      materially vs A, the skipped method was HOT (the cliff matters);
#      if A shows no skip, B is a control run (expect parity).
# Output: target/jit_audit/<name>.{a,b}.log + a summary table on stdout
# (captured to JITAUDIT_r14.txt by the caller).
set -u
cd /root/repo
. scripts/java_opts.sh
CP="target/scala-2.13/classes:/opt/spark/jars/*"
SF="${SPARK_GRAFT_JIT_SF:-/root/testdata/sf0.1}"
OUT=target/jit_audit
mkdir -p "$OUT"

# Knob-dependent generated projections (verdict list + the round-14
# additions). Format: probe-target[:sfDir-override]
TARGETS=(
  dedup_minhash_capped        # W=8 P=1 baseline (band-buckets native)
  dedup_minhash_capped_multi  # P=2 registered multi form
  dedup_minhash_capped_p3     # P=3 documented ladder setting
  dedup_minhash_capped_b24    # bands=24 single-family wide-band knob
  dedup_simhash_lsh           # t=24/b=16 default position tables
  dedup_simhash_lsh_wide      # t=64/b=20 documented decade-3 knob
  store_points                # digest towers
  search_quality              # quality-metrics towers (post-barrier)
  quality_verdict
  doc_elaborates_virtual      # round-14 concept-predicate form
  ann_lsh_multiprobe_cert     # Hamming-ball mask explode (probe side)
)

echo "== JIT audit $(date +%H:%M:%S) sf=$SF =="
printf "%-28s %8s %8s %8s %6s  %s\n" target warmA warmB ratio skips verdict
for t in "${TARGETS[@]}"; do
  a="$OUT/$t.a.log"; b="$OUT/$t.b.log"
  java $GRAFT_JAVA_OPTS -Xmx24g -XX:+PrintCompilation -cp "$CP" \
    graft.Probe "$t" "$SF" >"$a" 2>&1
  java $GRAFT_JAVA_OPTS -Xmx24g -XX:-DontCompileHugeMethods -cp "$CP" \
    graft.Probe "$t" "$SF" >"$b" 2>&1
  warmA=$(grep -oP 'round 2: \K[0-9.]+' "$a" | head -1)
  warmB=$(grep -oP 'round 2: \K[0-9.]+' "$b" | head -1)
  # only generated-code skips count — scala/spark library methods that
  # trip the limit are cold paths by construction
  skips=$(grep 'too big' "$a" | grep -cE 'Generated|Specific' || true)
  ratio=$(awk -v a="${warmA:-0}" -v b="${warmB:-1}" 'BEGIN{printf "%.2f", (b>0)? a/b : 0}')
  verdict=OK
  if [ "${skips:-0}" -gt 0 ]; then verdict="SKIPPED_GEN_METHOD"; fi
  hot=$(awk -v a="${warmA:-0}" -v b="${warmB:-1}" 'BEGIN{print (a > 1.3*b) ? 1 : 0}')
  if [ "$hot" = "1" ]; then verdict="$verdict+HOT_CLIFF"; fi
  printf "%-28s %8s %8s %8s %6s  %s\n" "$t" "${warmA:-?}" "${warmB:-?}" "$ratio" "${skips:-0}" "$verdict"
done
echo "== done $(date +%H:%M:%S) =="
