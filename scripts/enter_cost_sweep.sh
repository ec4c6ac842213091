#!/bin/bash
# Decode-time pause enter-cost sweep (round-4 verdict next-step 6):
# same checkpoint, `align --pause-enter-cost` varied, pause
# precision/recall/MAE scored per setting. Settles whether the knob
# moves the operating point anywhere, or is a measured no-op at
# converged checkpoints (docs/design.md found it flat on the hard
# synthetic-mel corpus; this runs the *wav* pipeline).
#
# Usage: bash scripts/enter_cost_sweep.sh CORPUS CKPT [OUT_JSONL]
set -e
CORPUS=$1
CK=$2
OUT=${3:-/tmp/enter_cost_sweep.jsonl}

for cost in -2 -1 -0.5 0 0.5 1 2 4; do
  d=$CK/sweep_ec$cost.jsonl
  [ -f "$d" ] || python -m aligner_tpu align "$CORPUS" \
      --checkpoint-dir "$CK" --output "$d" --pause-enter-cost "$cost"
  row=$(python scripts/score_wav_alignments.py "$CORPUS" "$d")
  python -c "import json,sys; r={'enter_cost': float(sys.argv[2]), **json.loads(sys.argv[3])}; open(sys.argv[1],'a').write(json.dumps(r)+'\n'); print(json.dumps(r))" "$OUT" "$cost" "$row"
done
