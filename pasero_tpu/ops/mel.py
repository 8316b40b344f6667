"""Log-mel spectrogram frontend: GEMM-native STFT + mel filterbank.

The reference offloads feature extraction to offline HF scripts
(pasero/examples/Whisper/extract-features.py); here it is a first-class
on-device op (BASELINE.json north star). The STFT is expressed as matrix
multiplications with precomputed windowed-DFT bases — frames @ (win * cos),
frames @ (win * sin) — so the whole pipeline (framing -> window -> DFT ->
power -> mel projection -> log) runs on the MXU; a Pallas kernel fuses the
power/mel/log stages to avoid materializing the (frames, n_freq) power
spectrum in HBM.

Filterbank and normalization follow Whisper's parameters: n_fft=400, hop=160,
n_mels=80/128, slaney-scaled mel filters, log10 clamped to max-8 dynamic
range then (x+4)/4 scaling.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

INTERPRET = False


def hann_window(n: int) -> np.ndarray:
    return 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n) / n))


def mel_filterbank(sr: int = 16000, n_fft: int = 400, n_mels: int = 80,
                   fmin: float = 0.0, fmax: Optional[float] = None) -> np.ndarray:
    """Slaney-style mel filterbank (librosa-compatible), (n_freq, n_mels)."""
    fmax = fmax or sr / 2
    n_freq = n_fft // 2 + 1

    def hz_to_mel(f):
        f = np.asarray(f, dtype=np.float64)
        mel = f / (200.0 / 3)
        log_region = f >= 1000.0
        mel = np.where(log_region,
                       15.0 + np.log(np.maximum(f, 1e-10) / 1000.0)
                       / (np.log(6.4) / 27.0), mel)
        return mel

    def mel_to_hz(m):
        m = np.asarray(m, dtype=np.float64)
        f = m * (200.0 / 3)
        log_region = m >= 15.0
        f = np.where(log_region, 1000.0 * np.exp((np.log(6.4) / 27.0)
                                                 * (m - 15.0)), f)
        return f

    mels = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    hz = mel_to_hz(mels)
    freqs = np.linspace(0, sr / 2, n_freq)
    weights = np.zeros((n_mels, n_freq))
    fdiff = np.diff(hz)
    ramps = hz[:, None] - freqs[None, :]
    for i in range(n_mels):
        lower = -ramps[i] / fdiff[i]
        upper = ramps[i + 2] / fdiff[i + 1]
        weights[i] = np.maximum(0, np.minimum(lower, upper))
    enorm = 2.0 / (hz[2:n_mels + 2] - hz[:n_mels])  # slaney normalization
    weights *= enorm[:, None]
    return weights.T.astype(np.float32)            # (n_freq, n_mels)


@functools.lru_cache(maxsize=8)
def _dft_bases(n_fft: int):
    """Windowed DFT bases (n_fft, n_freq) for the real/imag parts."""
    n_freq = n_fft // 2 + 1
    window = hann_window(n_fft)
    t = np.arange(n_fft)[:, None]
    k = np.arange(n_freq)[None, :]
    angle = -2.0 * np.pi * t * k / n_fft
    cos_b = (window[:, None] * np.cos(angle)).astype(np.float32)
    sin_b = (window[:, None] * np.sin(angle)).astype(np.float32)
    return cos_b, sin_b


def frame_signal(audio: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """(B, N) -> (B, frames, n_fft) with Whisper-style reflect padding."""
    pad = n_fft // 2
    audio = jnp.pad(audio, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = 1 + (audio.shape[1] - n_fft) // hop
    idx = (jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :])
    return audio[:, idx]


def log_mel_spectrogram(audio: jnp.ndarray, sr: int = 16000, n_fft: int = 400,
                        hop: int = 160, n_mels: int = 80,
                        use_pallas: bool = False) -> jnp.ndarray:
    """(B, N) float32 waveform -> (B, frames, n_mels) Whisper-style log-mel.

    The last frame is dropped like Whisper (it corresponds to the final,
    incomplete hop).
    """
    frames = frame_signal(audio.astype(jnp.float32), n_fft, hop)[:, :-1]
    cos_b, sin_b = _dft_bases(n_fft)
    mel_w = jnp.asarray(mel_filterbank(sr, n_fft, n_mels))
    if use_pallas:
        mel = _fused_power_mel(frames, jnp.asarray(cos_b), jnp.asarray(sin_b),
                               mel_w)
    else:
        real = jnp.einsum("btn,nf->btf", frames, jnp.asarray(cos_b))
        imag = jnp.einsum("btn,nf->btf", frames, jnp.asarray(sin_b))
        power = real * real + imag * imag
        mel = jnp.einsum("btf,fm->btm", power, mel_w)
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    log_spec = jnp.maximum(log_spec,
                           jnp.max(log_spec, axis=(1, 2), keepdims=True) - 8.0)
    return (log_spec + 4.0) / 4.0


# -- fused Pallas kernel ------------------------------------------------------

def _mel_kernel(frames_ref, cos_ref, sin_ref, mel_ref, out_ref):
    """One (batch, frame-block) program: window+DFT+power+mel fused in VMEM."""
    frames = frames_ref[0].astype(jnp.float32)               # (BT, n_fft)
    real = jnp.dot(frames, cos_ref[...], preferred_element_type=jnp.float32)
    imag = jnp.dot(frames, sin_ref[...], preferred_element_type=jnp.float32)
    power = real * real + imag * imag                        # (BT, n_freq)
    out_ref[0] = jnp.dot(power, mel_ref[...],
                         preferred_element_type=jnp.float32)


def _fused_power_mel(frames: jnp.ndarray, cos_b, sin_b, mel_w) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, T, n_fft = frames.shape
    n_freq = cos_b.shape[1]
    n_mels = mel_w.shape[1]
    BLOCK_T = 256
    T_pad = (T + BLOCK_T - 1) // BLOCK_T * BLOCK_T
    frames = jnp.pad(frames, ((0, 0), (0, T_pad - T), (0, 0)))

    out = pl.pallas_call(
        _mel_kernel,
        grid=(B, T_pad // BLOCK_T),
        interpret=INTERPRET,
        in_specs=[
            pl.BlockSpec((1, BLOCK_T, n_fft), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, n_freq), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, n_freq), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_freq, n_mels), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BLOCK_T, n_mels), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T_pad, n_mels), jnp.float32),
    )(frames, cos_b, sin_b, mel_w)
    return out[:, :T]
