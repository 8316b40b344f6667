#!/usr/bin/env python3
"""On-device speech frontend benchmark: log-mel frames/sec and real-time
factor (RTF) of the fused Pallas STFT+mel kernel (BASELINE.md's speech
metric; the reference extracts features offline with HF torch scripts)."""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=16,
                        help="utterances per call")
    parser.add_argument("--seconds", type=float, default=30.0,
                        help="audio length per utterance (Whisper window)")
    parser.add_argument("--sr", type=int, default=16000)
    parser.add_argument("--repeats", type=int, default=5)
    args = parser.parse_args(argv)

    from pasero_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from pasero_tpu.ops.mel import log_mel_spectrogram

    B = args.batch
    samples = int(args.seconds * args.sr)
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((B, samples)), jnp.float32)

    # reduce on device so the completion barrier transfers one scalar, not
    # the full mel tensor through the axon tunnel
    fn = jax.jit(lambda a: log_mel_spectrogram(a, sr=args.sr))
    probe = jax.jit(lambda a: jnp.sum(log_mel_spectrogram(a, sr=args.sr)))
    mel = fn(audio)
    float(probe(audio))  # compile + warm
    frames = B * mel.shape[1]

    best = float("inf")
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        float(probe(audio))
        best = min(best, time.perf_counter() - t0)

    audio_seconds = B * args.seconds
    rtf = best / audio_seconds
    print(f"log-mel {mel.shape} | {frames / best / 1e6:.2f}M frames/s | "
          f"RTF {rtf:.2e} ({1 / rtf:,.0f}x faster than real time)")


if __name__ == "__main__":
    main()
