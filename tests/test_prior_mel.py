"""Beta-binomial prior vs scipy; mel extraction vs numpy STFT."""
import jax.numpy as jnp
import numpy as np
from scipy.stats import betabinom

from aligner_tpu.ops.mel import (MelConfig, log_mel_spectrogram,
                                 mel_filterbank, mel_lengths_from_wav_lengths,
                                 spectrogram)
from aligner_tpu.ops.prior import beta_binomial_log_prior


def test_prior_matches_scipy():
    T_x, T_y = 12, 20
    t_x, t_y = 9, 16
    omega = 1.0
    got = np.asarray(beta_binomial_log_prior(
        jnp.array([t_x]), jnp.array([t_y]), T_x, T_y, omega))[0]
    for y in range(t_y):
        rv = betabinom(t_x - 1, omega * (y + 1), omega * (t_y - y))
        want = rv.logpmf(np.arange(t_x))
        np.testing.assert_allclose(got[y, :t_x], want, rtol=5e-3, atol=5e-3)
    # padding is NEG
    assert (got[t_y:] < -1e14).all()
    assert (got[:, t_x:] < -1e14).all()


def test_prior_rows_normalized():
    got = np.asarray(beta_binomial_log_prior(
        jnp.array([50]), jnp.array([100]), 64, 128, omega=0.5))[0]
    probs = np.exp(got[:100, :50])
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=2e-2, atol=2e-2)


def np_stft_power(wav, cfg):
    pad = cfg.n_fft // 2
    w = np.pad(wav, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = 1 + (w.shape[-1] - cfg.n_fft) // cfg.hop_length
    win = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(cfg.win_length)
                             / cfg.win_length)
    out = np.zeros((wav.shape[0], n_frames, cfg.n_fft // 2 + 1))
    for b in range(wav.shape[0]):
        for i in range(n_frames):
            seg = w[b, i * cfg.hop_length:i * cfg.hop_length + cfg.n_fft]
            out[b, i] = np.abs(np.fft.rfft(seg * win)) ** 2
    return out


def test_spectrogram_matches_numpy_fft():
    cfg = MelConfig(n_fft=256, hop_length=64, win_length=256)
    rng = np.random.default_rng(0)
    wav = rng.standard_normal((2, 2048)).astype(np.float32)
    got = np.asarray(spectrogram(jnp.asarray(wav), cfg))
    want = np_stft_power(wav, cfg)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_log_mel_shapes_and_lengths():
    cfg = MelConfig()
    rng = np.random.default_rng(1)
    wav = rng.standard_normal((3, 22050)).astype(np.float32) * 0.1
    mel = log_mel_spectrogram(jnp.asarray(wav), cfg)
    n_frames = 22050 // cfg.hop_length + 1
    assert mel.shape == (3, n_frames, cfg.n_mels)
    assert np.isfinite(np.asarray(mel)).all()
    lens = mel_lengths_from_wav_lengths(jnp.array([22050, 11025]), cfg)
    assert int(lens[0]) == n_frames


def test_mel_filterbank_properties():
    cfg = MelConfig()
    fb = mel_filterbank(cfg)
    assert fb.shape == (cfg.n_fft // 2 + 1, cfg.n_mels)
    assert (fb >= 0).all()
    # every filter has support
    assert (fb.sum(0) > 0).all()


def test_prior_ratio_matches_gammaln_and_scipy():
    T_x, T_y = 24, 40
    t_x = jnp.array([20, 1, 24]); t_y = jnp.array([36, 12, 40])
    for omega in (1.0, 0.5, 3.0):
        r = np.asarray(beta_binomial_log_prior(t_x, t_y, T_x, T_y, omega,
                                               method="ratio"))
        g = np.asarray(beta_binomial_log_prior(t_x, t_y, T_x, T_y, omega,
                                               method="gammaln"))
        for i, (txi, tyi) in enumerate([(20, 36), (1, 12), (24, 40)]):
            np.testing.assert_allclose(r[i, :tyi, :txi], g[i, :tyi, :txi],
                                       rtol=5e-3, atol=5e-3)
            for y in (0, tyi // 2, tyi - 1):
                rv = betabinom(txi - 1, omega * (y + 1),
                               omega * (tyi - y))
                np.testing.assert_allclose(
                    r[i, y, :txi], rv.logpmf(np.arange(txi)),
                    rtol=5e-3, atol=5e-3)
        assert (r[0, 36:] < -1e14).all() and (r[0, :, 20:] < -1e14).all()


def test_htk_mel_scale_variant():
    cfg = MelConfig(n_fft=256, hop_length=64, win_length=256, htk=True,
                    n_mels=40)
    fb = mel_filterbank(cfg)
    assert fb.shape == (129, 40) and (fb >= 0).all() and (fb.sum(0) > 0).all()
    wav = np.random.default_rng(0).standard_normal((1, 2048)) \
        .astype(np.float32)
    mel = log_mel_spectrogram(jnp.asarray(wav), cfg)
    assert np.isfinite(np.asarray(mel)).all()
    # HTK and Slaney scales genuinely differ
    fb_slaney = mel_filterbank(MelConfig(n_fft=256, hop_length=64,
                                         win_length=256, n_mels=40))
    assert not np.allclose(fb, fb_slaney)


def test_log_mel_bucketed_matches_direct():
    """The bucketed loader (host reflect-pad + zero-extend to a frame
    bucket + slice) must match the direct per-length path to float32
    rounding (measured <=1e-4 relative) — load_corpus relies on this to
    bound remote compile count without (measurably) changing any
    archived quality number. The slack is jit-vs-eager fusion changing
    the DFT dot's vectorized reduction blocking: with bucket_frames=1
    (identical shapes) the diff remains, so it is fusion rounding, not
    the bucketing."""
    from aligner_tpu.ops.mel import log_mel_bucketed

    rng = np.random.default_rng(7)
    for cfg in (MelConfig(), MelConfig(center=False),
                MelConfig(n_fft=512, win_length=512, hop_length=128),
                MelConfig(hop_length=128, win_length=512, n_fft=512,
                          center=False)):
        for t in (cfg.n_fft + 1, 4096, 4096 + 130, 8192 - 1,
                  # exact bucket boundary: n_true == bucket multiple
                  (32 - 1) * cfg.hop_length + (cfg.hop_length if
                                               cfg.center else cfg.n_fft)):
            wav = (rng.standard_normal(t) * 0.3).astype(np.float32)
            want = np.asarray(log_mel_spectrogram(
                jnp.asarray(wav)[None, :], cfg))[0]
            got = log_mel_bucketed(wav, cfg)
            assert got.shape == want.shape, (cfg, t)
            np.testing.assert_allclose(got, want, rtol=3e-4, atol=1e-5,
                                       err_msg=f"{cfg} {t}")
