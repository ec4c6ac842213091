#!/bin/bash
# Round-3 pause-quality confirmation campaign (run on the attached TPU
# chip): the step-count scaling study (run first on the CPU backend —
# quality metrics are device-agnostic f32 math) found the default
# recipe crosses the flagship bar with more training:
#
#   steps   token-boundary F1@2 (seeds 0-4)       pause MAE
#   3000    0.941-0.958 (seeds 0/1/2)             0.48-0.72
#   5000    0.947-0.966 (5 seeds; only seed 3 <0.95)  0.34-0.61
#   7000    >= 0.961 on the weakest seed           <= 0.37
#
# This script confirms the 5000- and 7000-step rows on the TPU and the
# 5000-step hard-corpus row; one JSON line per run appended to $OUT.
#   bash scripts/quality_campaign2.sh [outfile]
set -u
OUT=${1:-/tmp/quality_campaign2.jsonl}
: > "$OUT"
run() {
  echo "### $*" | tee -a "$OUT"
  local out rc line
  out=$(timeout 3000 python -m aligner_tpu "$@" 2>/dev/null)
  rc=$?
  line=${out##*$'\n'}
  if [ $rc -ne 0 ] || [ "${line#\{}" = "$line" ]; then
    # non-zero exit (incl. timeout's 124) or last stdout line is not a
    # JSON object: record the failure explicitly instead of silently
    # dropping the row.
    echo "FAILED rc=$rc: $*" | tee -a "$OUT"
  else
    echo "$line" | tee -a "$OUT"
  fi
}

for s in 0 1 2; do
  run demo-pauses --steps 5000 --seed "$s" --skip-blind
done
for s in 0 1 2 3; do
  run demo-pauses --steps 7000 --seed "$s" --skip-blind
done
for s in 0 1; do
  run demo-pauses --steps 5000 --hard --seed "$s" --skip-blind
done
# RoMo family (refinement pinned by the reconstruction objective):
# CPU preview at 600 steps gave refined F1 0.984-0.996 vs rough
# 0.88-0.91 (seeds 0/1); confirm on chip incl. the hard corpus.
for s in 0 1; do
  run demo-romo --steps 600 --seed "$s"
done
run demo-romo --steps 600 --hard --seed 0
# Long-utterance rows (~4x the default utterance length):
run demo-ota --steps 2000 --recon --temperature 0.15 --max-tokens 64 --seed 0
run demo-mobo --steps 300 --max-tokens 64 --seed 0
run demo-pauses --steps 5000 --max-tokens 48 --seed 0 --skip-blind
echo "campaign done" | tee -a "$OUT"
