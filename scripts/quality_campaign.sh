#!/bin/bash
# Round-3 quality campaign (run on the attached TPU chip):
#   bash scripts/quality_campaign.sh [outfile]
#
# 1. Pause-quality push (round-2 verdict item 2): A/B the bridge pause
#    prior vs round-2's inherit, the flagship-style recipe (2000 steps,
#    temperature 0.15), and the pause occupancy bias — 2 seeds on the
#    winners.
# 2. Hard-corpus re-earn (item 4): OTA / MoBo / pauses headline recipes
#    on the coarticulated + overlapped + gain-varied corpus, 2 seeds.
# Each demo prints one JSON line; everything is appended to $OUT.
set -u
OUT=${1:-/tmp/quality_campaign.jsonl}
: > "$OUT"
run() {
  echo "### $*" | tee -a "$OUT"
  timeout 1800 python -m aligner_tpu "$@" 2>/dev/null | tail -1 | tee -a "$OUT"
}

# --- pause quality (easy corpus) -----------------------------------
# NOTE: commit 8b69aa7 later made a -3 -> --pause-bias curriculum the
# DEFAULT; the rows below predate it and measured constant-bias
# behaviour, so each pins --pause-bias-start to the final bias
# (start == final disables the curriculum) to stay reproducible.
run demo-pauses --steps 1500 --seed 0 --pause-prior inherit --pause-bias-start 0 --skip-blind
run demo-pauses --steps 1500 --seed 0 --pause-prior bridge --pause-bias-start 0 --skip-blind
run demo-pauses --steps 2000 --seed 0 --temperature 0.15 --pause-prior bridge --pause-bias-start 0 --skip-blind
run demo-pauses --steps 2000 --seed 0 --temperature 0.15 --pause-prior bridge --pause-bias -1.0 --pause-bias-start -1.0 --skip-blind
run demo-pauses --steps 2000 --seed 1 --temperature 0.15 --pause-prior bridge --pause-bias-start 0 --skip-blind

# --- hard corpus ----------------------------------------------------
run demo-ota --steps 2000 --recon --temperature 0.15 --hard --seed 0
run demo-ota --steps 2000 --recon --temperature 0.15 --hard --seed 1
run demo-mobo --steps 300 --hard --seed 0
run demo-mobo --steps 300 --hard --seed 1
run demo-pauses --steps 2000 --temperature 0.15 --hard --seed 0
echo "campaign done" | tee -a "$OUT"
