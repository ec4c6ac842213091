"""Mel-spectrogram extraction, JAX-native — K2 of the capability inventory.

The reference project ships no feature extraction (its devcontainer is an
ESPnet image, devcontainer.json:6, implying ESPnet mel features on the
unmounted branches); the OTA aligner step (BASELINE.json config 3) needs
mel extraction fused into the jitted step. TPU-first design choices:

* The STFT is a **matmul against a precomputed windowed-DFT basis** —
  frames [.., n_fft] x basis [n_fft, 2 * n_bins] on the MXU — rather than
  an FFT op: for TTS-sized n_fft (1024) this keeps the whole pipeline in
  one fused XLA program with no special-function lowering, and the mel
  projection is a second matmul that XLA fuses straight after.
* Framing is a static-shape gather; everything downstream is batched
  matmul + elementwise, so the full wav→log-mel path jits and shards over
  the batch axis.

Defaults match the LJSpeech-style TTS stack (22.05 kHz, n_fft 1024, hop
256, 80 mels, Slaney mel scale & normalization, natural log with 1e-5
floor), the stats named by BASELINE.json config 2.
"""
from __future__ import annotations

import dataclasses
import functools
import math

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class MelConfig:
    sample_rate: int = 22050
    n_fft: int = 1024
    hop_length: int = 256
    win_length: int = 1024
    n_mels: int = 80
    fmin: float = 0.0
    fmax: float | None = 8000.0
    center: bool = True
    power: float = 2.0          # 2.0 = power spectrogram, 1.0 = magnitude
    log_floor: float = 1e-5
    htk: bool = False           # False = Slaney scale (librosa default)


def _hz_to_mel(f, htk: bool):
    if htk:
        return 2595.0 * np.log10(1.0 + f / 700.0)
    # Slaney: linear below 1 kHz, log above.
    f = np.asarray(f, dtype=np.float64)
    mel = f / (200.0 / 3.0)
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / (200.0 / 3.0)
    logstep = math.log(6.4) / 27.0
    f_safe = np.maximum(f, 1e-10)  # np.where evaluates both branches
    return np.where(f >= min_log_hz,
                    min_log_mel + np.log(f_safe / min_log_hz) / logstep, mel)


def _mel_to_hz(m, htk: bool):
    if htk:
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    m = np.asarray(m, dtype=np.float64)
    f = m * (200.0 / 3.0)
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / (200.0 / 3.0)
    logstep = math.log(6.4) / 27.0
    return np.where(m >= min_log_mel,
                    min_log_hz * np.exp(logstep * (m - min_log_mel)), f)


@functools.lru_cache(maxsize=8)
def mel_filterbank(cfg: MelConfig) -> np.ndarray:
    """[n_bins, n_mels] triangular filterbank (Slaney-normalized unless
    htk), numpy (host, cached; becomes an XLA constant under jit)."""
    n_bins = cfg.n_fft // 2 + 1
    fmax = cfg.fmax if cfg.fmax is not None else cfg.sample_rate / 2
    fft_freqs = np.linspace(0.0, cfg.sample_rate / 2, n_bins)
    mel_pts = np.linspace(_hz_to_mel(cfg.fmin, cfg.htk),
                          _hz_to_mel(fmax, cfg.htk), cfg.n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts, cfg.htk)
    fb = np.zeros((n_bins, cfg.n_mels), dtype=np.float64)
    for m in range(cfg.n_mels):
        lo, ctr, hi = hz_pts[m], hz_pts[m + 1], hz_pts[m + 2]
        up = (fft_freqs - lo) / max(ctr - lo, 1e-10)
        down = (hi - fft_freqs) / max(hi - ctr, 1e-10)
        fb[:, m] = np.maximum(0.0, np.minimum(up, down))
    if not cfg.htk:  # Slaney area normalization
        enorm = 2.0 / (hz_pts[2:] - hz_pts[:-2])
        fb *= enorm[None, :]
    return fb.astype(np.float32)


@functools.lru_cache(maxsize=8)
def _dft_basis(cfg: MelConfig) -> np.ndarray:
    """Windowed real-DFT basis [n_fft, 2 * n_bins]: columns are
    window * cos(2πkn/N) and -window * sin(2πkn/N)."""
    N, W = cfg.n_fft, cfg.win_length
    n_bins = N // 2 + 1
    n = np.arange(N)[:, None]
    k = np.arange(n_bins)[None, :]
    ang = 2.0 * np.pi * n * k / N
    win = np.zeros(N)
    hann = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(W) / W)  # periodic
    off = (N - W) // 2
    win[off:off + W] = hann
    basis = np.concatenate([np.cos(ang), -np.sin(ang)], axis=1)
    return (win[:, None] * basis).astype(np.float32)


def frame_signal(wav, cfg: MelConfig):
    """wav [B, T] -> frames [B, n_frames, n_fft] (reflect-padded if
    center). n_frames = T // hop + 1 when center else 1 + (T - n_fft)//hop."""
    if cfg.center:
        pad = cfg.n_fft // 2
        wav = jnp.pad(wav, ((0, 0), (pad, pad)), mode="reflect")
    T = wav.shape[-1]
    n_frames = 1 + (T - cfg.n_fft) // cfg.hop_length
    starts = jnp.arange(n_frames) * cfg.hop_length
    idx = starts[:, None] + jnp.arange(cfg.n_fft)[None, :]
    return wav[:, idx]


def spectrogram(wav, cfg: MelConfig = MelConfig()):
    """wav [B, T] -> linear power/magnitude spectrogram [B, n_frames,
    n_bins], via the MXU DFT basis."""
    frames = frame_signal(wav, cfg)
    basis = jnp.asarray(_dft_basis(cfg))
    proj = jnp.dot(frames, basis, preferred_element_type=jnp.float32)
    n_bins = cfg.n_fft // 2 + 1
    re, im = proj[..., :n_bins], proj[..., n_bins:]
    power = re * re + im * im
    if cfg.power == 2.0:
        return power
    return jnp.power(jnp.maximum(power, 1e-30), cfg.power / 2.0)


def log_mel_spectrogram(wav, cfg: MelConfig = MelConfig()):
    """wav [B, T] -> log-mel [B, n_frames, n_mels]; fully jit-fusable."""
    spec = spectrogram(wav, cfg)
    fb = jnp.asarray(mel_filterbank(cfg))
    mel = jnp.dot(spec, fb, preferred_element_type=jnp.float32)
    return jnp.log(jnp.maximum(mel, cfg.log_floor))


def mel_lengths_from_wav_lengths(wav_lengths, cfg: MelConfig = MelConfig()):
    """Number of mel frames produced for each true waveform length."""
    if cfg.center:
        return wav_lengths // cfg.hop_length + 1
    return 1 + (wav_lengths - cfg.n_fft) // cfg.hop_length


@functools.lru_cache(maxsize=8)
def _jitted_log_mel(cfg: MelConfig):
    import jax

    return jax.jit(lambda w: log_mel_spectrogram(w, cfg))


def log_mel_bucketed(wav: np.ndarray, cfg: MelConfig = MelConfig(),
                     bucket_frames: int = 32) -> np.ndarray:
    """`log_mel_spectrogram(wav[None], cfg)[0]` for a 1-D host
    waveform, with the number of distinct DEVICE shapes bounded to one
    per `bucket_frames` quantum of output length. Values match the direct
    path to f32 rounding (measured <=1e-4 relative on CPU: the jit
    fuses the framing gather into the DFT dot, changing its vectorized
    reduction blocking vs the eager per-op path; the same diff remains
    with bucket_frames=1, i.e. fusion rounding, not the bucketing) —
    far below anything the alignment quality metrics can see.

    Why: eager per-utterance extraction (data/files.py load_corpus)
    otherwise dispatches a fresh kernel chain for every distinct
    waveform length; through a serialized remote compile service (the
    tunnel TPU deployment) those per-length compiles dominate corpus
    load time. Here the center/reflect padding is applied on the HOST
    (pure sample copies — exact), the padded signal is zero-extended so
    the frame count rounds up to a bucket multiple, the device computes
    the bucketed framing + DFT/mel matmuls with the padding already in
    the signal (center=False semantics), and the first `n_true` frames
    are returned. Every retained frame's window reads only host-padded
    samples — the zero tail feeds only the sliced-off frames — and the
    matmuls are row-parallel, so retained window contents are unchanged.
    `tests/test_prior_mel.py` asserts rounding-level equality vs the
    direct path.
    """
    wav = np.asarray(wav, np.float32)
    if wav.ndim != 1:
        raise ValueError(f"expected 1-D waveform, got shape {wav.shape}")
    hop, n_fft = cfg.hop_length, cfg.n_fft
    if cfg.center:
        pad = n_fft // 2
        host = np.pad(wav, (pad, pad), mode="reflect")
        n_true = len(wav) // hop + 1
    else:
        host = wav
        n_true = 1 + (len(wav) - n_fft) // hop
    n_bucket = -(-n_true // bucket_frames) * bucket_frames
    # Exact device length for n_bucket frames: longer inputs would grow
    # the on-device frame count past the bucket. Truncation is safe —
    # the last retained frame ends at (n_true-1)*hop + n_fft <= need.
    need = (n_bucket - 1) * hop + n_fft
    host = np.pad(host, (0, max(0, need - len(host))))[:need]
    cfg_flat = dataclasses.replace(cfg, center=False)
    out = _jitted_log_mel(cfg_flat)(jnp.asarray(host)[None, :])
    return np.asarray(out)[0, :n_true]
