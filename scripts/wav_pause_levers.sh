#!/bin/bash
# Pause-aware feature-lever rows: the seed-0 wav pause diagnosis showed
# the dominant error is *placement* (silence detected, attributed to an
# adjacent gap — 272/337 false positives within 2 gaps; gap-tolerant
# P/R 0.54/0.73 vs strict 0.25/0.33), which is a direct prediction of
# the mel window smear (win 1024 = 4 hops of boundary blur). These rows
# re-train the pause-aware model with the round-5 --mel-* levers on the
# SAME pause corpus to test that causal story.
#
# Usage: bash scripts/wav_pause_levers.sh [WORK] [SEED]
set -e
WORK=${1:-/tmp/wavpause_campaign}
SEED=${2:-0}
CORPUS=$WORK/corpus_s$SEED
ROWS=$WORK/lever_rows.jsonl

[ -f "$CORPUS/metadata.csv" ] || \
  python scripts/make_wav_corpus.py "$CORPUS" --pause-prob 0.4 --seed "$SEED"

run () {  # name, score flags -- train flags
  local name=$1; shift
  local score_flags=()
  while [ "$1" != "--" ]; do score_flags+=("$1"); shift; done
  shift
  local ck=$WORK/ck_${name}_s$SEED
  if [ -f "$ck/row.done" ]; then return 0; fi
  if [ ! -f "$ck/train.done" ]; then
    python -m aligner_tpu train "$CORPUS" --checkpoint-dir "$ck" \
      --steps 6000 --recon --temperature 0.15 --seed "$SEED" \
      --bin-start 3000 --bin-ramp 2000 --resume --model-pauses "$@"
    touch "$ck/train.done"
  fi
  [ -f "$ck/durations.jsonl" ] || \
    python -m aligner_tpu align "$CORPUS" --checkpoint-dir "$ck" \
      --output "$ck/durations.jsonl"
  local row
  row=$(python scripts/score_wav_alignments.py "$CORPUS" \
          "$ck/durations.jsonl" "${score_flags[@]}")
  python -c "import json,sys; r={'run':sys.argv[2],'seed':int(sys.argv[3]),**json.loads(sys.argv[4])}; open(sys.argv[1],'a').write(json.dumps(r)+'\n'); print(json.dumps(r))" \
    "$ROWS" "pa_$name" "$SEED" "$row"
  touch "$ck/row.done"
}

run hop128win512 --truth-scale 2 --tolerance 4 -- --mel-hop 128 --mel-win 512
run win512 -- --mel-win 512
