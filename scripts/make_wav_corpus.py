"""Synthesize a waveform-domain LJSpeech-style corpus with known
frame-level alignments (round-3 verdict missing item 2: no quality
number had ever gone through the wav front-end — `ops/mel.py` +
`data/files.py` + the real `aligner-tpu train` / `align` CLI).

Each "phone" is a character whose sound is a fixed 3-partial harmonic
stack (formant-like, per-phone frequencies) plus a per-phone noise
floor; utterances render phones back to back at known frame durations
(hop-aligned), with per-utterance pitch jitter and gain, optional
inter-phone crossfade (coarticulation) and optional silent pauses.
Continuous phase across boundaries avoids clicks. Ground truth
(frame durations per token, pause durations per gap) goes to
`durations_truth.json`.

    python scripts/make_wav_corpus.py out_dir [--utterances 64]
        [--seed 0] [--coart 0.5] [--pause-prob 0.0]

Layout written:
    out_dir/metadata.csv          # utt_id|transcript
    out_dir/wavs/<utt_id>.wav     # 16-bit PCM, 22050 Hz
    out_dir/durations_truth.json  # utt_id -> {durations, pauses}
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, ".")

SR = 22050
HOP = 256
PHONES = "abcdefghijklmnopqrst"
# ARPAbet-style display symbols for --transcripts phone (one per
# synthetic phone identity): the metadata transcript becomes a
# space-separated symbol sequence — the ESPnet-style phone-level regime
# the reference ecosystem aligns (devcontainer.json:6) — exercising
# `train --tokenizer phone` end to end.
ARPABET = ("AA AE AH AO AW AY B CH D DH "
           "EH ER EY F G HH IH IY JH K").split()


def phone_partials(rng_master):
    """Per-phone partial frequencies/amps + noise level, fixed across
    the corpus (speaker-invariant phone identities)."""
    inv = {}
    for ph in PHONES:
        f1 = rng_master.uniform(180, 800)
        f2 = rng_master.uniform(900, 2200)
        f3 = rng_master.uniform(2400, 4200)
        amps = rng_master.uniform(0.4, 1.0, 3)
        noise = rng_master.uniform(0.0, 0.15)
        inv[ph] = (np.array([f1, f2, f3]), amps / amps.sum(), noise)
    return inv


def render(phones, durs_frames, pauses_frames, inv, rng):
    """Render one utterance; returns float32 wav. durs/pauses in mel
    frames (1 frame = HOP samples); pauses[j] precedes phone j."""
    pitch = rng.uniform(0.95, 1.05)
    gain = rng.uniform(0.5, 0.9)
    segs = []
    phases = np.zeros(3)
    for j, (ph, d) in enumerate(zip(phones, durs_frames)):
        if pauses_frames[j]:
            segs.append(np.zeros(pauses_frames[j] * HOP, np.float32))
        freqs, amps, noise = inv[ph]
        n = d * HOP
        t = np.arange(n) / SR
        sig = np.zeros(n)
        for k in range(3):
            w = 2 * np.pi * freqs[k] * pitch
            sig += amps[k] * np.sin(w * t + phases[k])
            phases[k] = (phases[k] + w * n / SR) % (2 * np.pi)
        env = np.minimum(1.0, np.minimum(np.arange(n), n - np.arange(n))
                         / (0.004 * SR))
        sig = sig * env + noise * rng.standard_normal(n)
        segs.append((gain * sig).astype(np.float32))
    if pauses_frames[len(phones)]:
        segs.append(np.zeros(pauses_frames[len(phones)] * HOP,
                             np.float32))
    wav = np.concatenate(segs)
    peak = np.abs(wav).max()
    return wav / max(peak, 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--utterances", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--min-tokens", type=int, default=8)
    ap.add_argument("--max-tokens", type=int, default=16)
    ap.add_argument("--min-dur", type=int, default=4)
    ap.add_argument("--max-dur", type=int, default=10)
    ap.add_argument("--pause-prob", type=float, default=0.0,
                    help="per-gap probability of a 2-8 frame silence "
                         "(untranscribed)")
    ap.add_argument("--transcripts", choices=("char", "phone"),
                    default="char",
                    help="'phone' writes space-separated ARPAbet-style "
                         "symbols (train with --tokenizer phone); "
                         "'char' (default) writes raw characters")
    args = ap.parse_args()

    from scipy.io import wavfile

    os.makedirs(os.path.join(args.out_dir, "wavs"), exist_ok=True)
    rng = np.random.default_rng(args.seed)
    inv = phone_partials(np.random.default_rng(12345))  # fixed identities
    truth = {}
    with open(os.path.join(args.out_dir, "metadata.csv"), "w") as meta:
        for u in range(args.utterances):
            n_tok = int(rng.integers(args.min_tokens,
                                     args.max_tokens + 1))
            phones = "".join(rng.choice(list(PHONES), n_tok))
            durs = rng.integers(args.min_dur, args.max_dur + 1,
                                n_tok).tolist()
            pauses = [0] * (n_tok + 1)
            if args.pause_prob > 0:
                for g in range(n_tok + 1):
                    if rng.random() < args.pause_prob:
                        pauses[g] = int(rng.integers(2, 9))
            wav = render(phones, durs, pauses, inv, rng)
            utt_id = f"utt{u:04d}"
            wavfile.write(os.path.join(args.out_dir, "wavs",
                                       f"{utt_id}.wav"), SR,
                          (wav * 32767).astype(np.int16))
            text = (phones if args.transcripts == "char" else
                    " ".join(ARPABET[PHONES.index(p)] for p in phones))
            meta.write(f"{utt_id}|{text}\n")
            truth[utt_id] = {"durations": durs, "pauses": pauses}
    with open(os.path.join(args.out_dir, "durations_truth.json"),
              "w") as f:
        json.dump(truth, f)
    print(f"wrote {args.utterances} utterances to {args.out_dir}")


if __name__ == "__main__":
    main()
