#!/bin/bash
# Wav front-end pause campaign: train the pause-aware aligner from real
# audio (the full user pipeline: make_wav_corpus -> train --model-pauses
# -> align -> score) and contrast it with the pause-blind model on the
# SAME pause-bearing corpus. Companion to the round-4 wav campaign in
# docs/PERF.md (which ran on a pauseless corpus); this is the first
# quality row where the reference OTA branch's stated goal — implicit
# pauses from un-transcribed audio (/root/reference/README.md:21-25) —
# is exercised end to end through ops/mel.py and data/files.py.
#
# Usage: bash scripts/wav_pause_campaign.sh [WORKDIR] [SEED] [STEPS]
set -e
WORK=${1:-/tmp/wavpause_campaign}
SEED=${2:-0}
STEPS=${3:-6000}
CORPUS=$WORK/corpus_s$SEED
mkdir -p "$WORK"

[ -f "$CORPUS/metadata.csv" ] || \
  python scripts/make_wav_corpus.py "$CORPUS" --pause-prob 0.4 --seed "$SEED"

run () {  # name, extra train flags...
  local name=$1; shift
  local ck=$WORK/ck_${name}_s$SEED
  # Separate train/align sentinels + --resume: a rerun after an align
  # failure (or a tunnel drop mid-training) continues from the latest
  # checkpoint instead of retraining 6000 steps from scratch.
  if [ ! -f "$ck/train.done" ]; then
    python -m aligner_tpu train "$CORPUS" --checkpoint-dir "$ck" \
      --steps "$STEPS" --recon --temperature 0.15 --seed "$SEED" \
      --bin-start $((STEPS / 2)) --bin-ramp $((STEPS / 3)) --resume "$@"
    touch "$ck/train.done"
  fi
  if [ ! -f "$ck/durations.jsonl" ]; then
    python -m aligner_tpu align "$CORPUS" --checkpoint-dir "$ck" \
      --output "$ck/durations.jsonl"
  fi
  echo "run=wav_pauses_${name} seed=$SEED steps=$STEPS"
  python scripts/score_wav_alignments.py "$CORPUS" "$ck/durations.jsonl"
}

run pauseaware --model-pauses
run pauseblind
