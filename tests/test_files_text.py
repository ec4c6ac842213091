"""File corpus loader + tokenizer + cpp implementation path."""
import os

import numpy as np

import jax.numpy as jnp

from aligner_tpu.data import CharTokenizer, PhoneTokenizer, load_corpus


def test_tokenizer_roundtrip():
    tok = CharTokenizer()
    ids = tok.encode("Hello, TTS 42!")
    assert ids.dtype == np.int32
    assert tok.decode(ids) == "Hello, TTS 42!"
    assert (ids >= 2).all()
    # unknown char maps to unk
    assert tok.encode("é")[0] == tok.unk_id
    assert tok.labels("ab c") == ["a", "b", " ", "c"]


def test_phone_tokenizer_roundtrip():
    tok = PhoneTokenizer.from_corpus(["HH AH0 L OW1", "W ER1 L D"])
    # sorted unique vocabulary, deterministic for a corpus
    assert tok.phones == ("AH0", "D", "ER1", "HH", "L", "OW1", "W")
    assert tok.vocab_size == 9
    ids = tok.encode("HH AH0 L OW1")
    assert ids.dtype == np.int32 and len(ids) == 4 and (ids >= 2).all()
    assert tok.decode(ids) == "HH AH0 L OW1"
    assert tok.labels("HH AH0") == ["HH", "AH0"]
    # out-of-vocabulary symbol maps to unk
    assert tok.encode("ZH")[0] == tok.unk_id
    # one token per phone, not per character
    assert len(tok.encode("W ER1 L D")) == 4


def test_load_corpus_from_wav_dir(tmp_path):
    from scipy.io import wavfile

    os.makedirs(tmp_path / "wavs")
    rng = np.random.default_rng(0)
    sr = 22050
    with open(tmp_path / "metadata.csv", "w") as f:
        for i in range(3):
            utt = f"utt{i}"
            f.write(f"{utt}|normalized|hello world {i}\n")
            wav = (rng.standard_normal(sr // 2) * 0.1 * 32767) \
                .astype(np.int16)
            wavfile.write(tmp_path / "wavs" / f"{utt}.wav", sr, wav)
    items = list(load_corpus(str(tmp_path)))
    assert len(items) == 3
    it = items[0]
    assert it["text"] == "hello world 0"
    assert it["mel"].shape[1] == 80
    assert it["tokens"].ndim == 1 and len(it["tokens"]) == 13
    assert np.isfinite(it["mel"]).all()


def test_load_corpus_resamples(tmp_path):
    from scipy.io import wavfile

    os.makedirs(tmp_path / "wavs")
    with open(tmp_path / "metadata.csv", "w") as f:
        f.write("a|x\n")
    wav = (np.sin(np.linspace(0, 800 * np.pi, 8000)) * 0.5 * 32767) \
        .astype(np.int16)
    wavfile.write(tmp_path / "wavs" / "a.wav", 16000, wav)
    items = list(load_corpus(str(tmp_path)))
    # 0.5s at 22050 -> ~11025 samples -> ~44 frames at hop 256
    assert abs(items[0]["mel"].shape[0] - 44) <= 2


def test_cpp_implementation_path():
    from aligner_tpu.ops.mas import maximum_path
    from aligner_tpu.utils.masks import lattice_mask

    rng = np.random.default_rng(0)
    B, T_x, T_y = 3, 10, 20
    value = jnp.asarray((rng.standard_normal((B, T_x, T_y)) * 2)
                        .astype(np.float32))
    mask = lattice_mask(jnp.array([10, 4, 1]), jnp.array([20, 9, 5]),
                        T_x, T_y)
    got = maximum_path(value, mask, implementation="cpp")
    want = maximum_path(value, mask, implementation="lax")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
