#!/bin/bash
# Round-5 wav quality campaign: every chip row the round-4 verdict asks
# for, one sentinel per run so tunnel drops resume cheaply.
#
#   verdict #2 — multi-seed the wav table (seeds 1, 2) + feature levers
#                (hop 128, win 512, center=False)
#   verdict #3 — MoBo and RoMo trained/decoded on audio
#   verdict #4 — phone-tokenizer row (space-separated ARPAbet symbols)
#   verdict #5 — bf16 quality-parity row
#
# Usage: bash scripts/round5_campaign.sh [WORKDIR]
# Rows append to $WORK/rows.jsonl as {"run": ..., <scorer json>}.
set -e
WORK=${1:-/tmp/r5_campaign}
mkdir -p "$WORK"
ROWS=$WORK/rows.jsonl

corpus () {  # seed [extra make_wav_corpus flags...]
  local seed=$1; shift
  local dir=$WORK/corpus_s$seed$CSUFFIX
  # stdout is this function's return value — send the generator's
  # progress line to stderr or it pollutes the captured path
  [ -f "$dir/metadata.csv" ] || \
    python scripts/make_wav_corpus.py "$dir" --seed "$seed" "$@" 1>&2
  echo "$dir"
}

run () {  # name, corpus, seed, [score flags --] train flags...
  local name=$1 corp=$2 seed=$3; shift 3
  local score_flags=()
  while [ "$1" != "--" ]; do score_flags+=("$1"); shift; done
  shift
  local ck=$WORK/ck_$name
  if [ -f "$ck/row.done" ]; then return 0; fi
  if [ ! -f "$ck/train.done" ]; then
    python -m aligner_tpu train "$corp" --checkpoint-dir "$ck" \
      --steps 6000 --recon --temperature 0.15 --seed "$seed" \
      --bin-start 3000 --bin-ramp 2000 --resume "$@"
    touch "$ck/train.done"
  fi
  [ -f "$ck/durations.jsonl" ] || \
    python -m aligner_tpu align "$corp" --checkpoint-dir "$ck" \
      --output "$ck/durations.jsonl"
  local row
  row=$(python scripts/score_wav_alignments.py "$corp" \
          "$ck/durations.jsonl" "${score_flags[@]}")
  python - "$ROWS" "$name" "$seed" "$row" <<'PY'
import json, sys
rows, name, seed, row = sys.argv[1:]
rec = {"run": name, "seed": int(seed), **json.loads(row)}
with open(rows, "a") as f:
    f.write(json.dumps(rec) + "\n")
print(json.dumps(rec))
PY
  touch "$ck/row.done"
}

# --- verdict #2a: seeds 1-2 of the round-4 headline recipe ----------
for s in 1 2; do
  run baseline_s$s "$(corpus $s)" $s --
done

# --- verdict #2b: feature levers (seed 0 corpus) --------------------
C0=$(corpus 0)
run hop128_s0   "$C0" 0 --truth-scale 2 --tolerance 4 -- --mel-hop 128
run win512_s0   "$C0" 0 -- --mel-win 512
run nocenter_s0 "$C0" 0 -- --no-mel-center
# second scoring of the hop-128 alignments at the *tight* tolerance
# (±2 hop-128 frames = half the physical window): resolution evidence.
if [ ! -f "$WORK/ck_hop128_s0/row2.done" ]; then
  row=$(python scripts/score_wav_alignments.py "$C0" \
          "$WORK/ck_hop128_s0/durations.jsonl" --truth-scale 2)
  python -c "import json,sys; r={'run':'hop128_tight_s0','seed':0,**json.loads(sys.argv[2])}; open(sys.argv[1],'a').write(json.dumps(r)+'\n'); print(json.dumps(r))" "$ROWS" "$row"
  touch "$WORK/ck_hop128_s0/row2.done"
fi

# --- verdict #3: MoBo / RoMo on audio -------------------------------
run mobo_s0 "$C0" 0 -- --model mobo
run romo_s0 "$C0" 0 -- --model romo

# --- verdict #4: phone-tokenizer row --------------------------------
CSUFFIX=_phone
CP=$(corpus 0 --transcripts phone)
CSUFFIX=
run phone_s0 "$CP" 0 -- --tokenizer phone

# --- verdict #5: bf16 parity row ------------------------------------
run bf16_s0 "$C0" 0 -- --compute-dtype bfloat16

echo "=== round5 campaign complete ==="
cat "$ROWS"
