#!/usr/bin/env python3
"""Extract Whisper log-mel features from wav files into the binary feature
format (TPU equivalent of the reference's examples/Whisper/extract-features.py,
using the on-device mel frontend)."""

import argparse
import sys, os, wave
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("wavs", nargs="+")
    parser.add_argument("-o", "--output", required=True)
    parser.add_argument("--n-mels", type=int, default=80)
    args = parser.parse_args()

    import jax.numpy as jnp
    from pasero_tpu.ops.mel import log_mel_spectrogram
    from pasero_tpu.data.files import NumpyFile

    def features():
        for path in args.wavs:
            with wave.open(path) as w:
                assert w.getframerate() == 16000, f"{path}: expected 16kHz"
                raw = np.frombuffer(w.readframes(w.getnframes()), np.int16)
            audio = raw.astype(np.float32) / 32768.0
            yield np.asarray(log_mel_spectrogram(
                jnp.asarray(audio[None]), n_mels=args.n_mels)[0])

    NumpyFile.build(args.output, features(), dtype="float16",
                    num_feats=len(args.wavs))
    print(f"wrote {len(args.wavs)} feature arrays -> {args.output}")


if __name__ == "__main__":
    main()
