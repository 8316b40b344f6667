#!/usr/bin/env python3
"""Extract wav2vec layer features for the IWSLT2023 recipes.

Reads segment lines from stdin (``<utt-id> [<start-sec> <end-sec>]``), cuts
the matching audio files, runs them through a HuggingFace Wav2Vec2 model
(torch, CPU or GPU) and stores the chosen hidden layer in the binary feature
format this framework's speech tasks read (reference:
examples/IWSLT2023/extract-features.py; our on-disk format is compatible —
pasero_tpu/data/files.py:NumpyFile).

If --txt-file is given, the matching target line of every kept segment is
echoed to stdout (so the .npy and the text stay aligned even when some
segments are skipped).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import numpy as np


def find_audio(utt_id: str, audio_dirs, extension: str):
    for d in audio_dirs:
        for sub in ("", "wav", "flac"):
            path = os.path.join(d, sub, f"{utt_id}{extension}")
            if os.path.exists(path):
                return path
    return None


def load_audio(path: str, start: float, end: float):
    import soundfile  # ships with torchaudio images; fall back to wave
    audio, rate = soundfile.read(path, dtype="float32")
    if audio.ndim > 1:
        audio = audio.mean(axis=1)
    lo = int(start * rate) if start else 0
    hi = int(end * rate) if end else len(audio)
    return audio[lo:hi], rate


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("model", help="HuggingFace Wav2Vec2 model dir/name")
    parser.add_argument("--layer-id", type=int, default=8,
                        help="hidden layer to export (w2v2nima: 8, xlsr: 18)")
    parser.add_argument("--audio-dirs", nargs="+", required=True)
    parser.add_argument("--file-extension", default=".wav")
    parser.add_argument("--txt-file")
    parser.add_argument("-o", "--output", required=True)
    parser.add_argument("--dtype", default="float16")
    parser.add_argument("--max-seconds", type=float, default=60.0)
    args = parser.parse_args()

    import torch
    from transformers import Wav2Vec2FeatureExtractor, Wav2Vec2Model
    from pasero_tpu.data.files import NumpyFile

    extractor = Wav2Vec2FeatureExtractor.from_pretrained(args.model)
    model = Wav2Vec2Model.from_pretrained(args.model).eval()
    device = "cuda" if torch.cuda.is_available() else "cpu"
    model.to(device)

    segments = []
    for line in sys.stdin:
        parts = line.split()
        if not parts:
            continue
        utt = parts[0]
        start = float(parts[1]) if len(parts) > 1 else 0.0
        end = float(parts[2]) if len(parts) > 2 else 0.0
        segments.append((utt, start, end))
    targets = None
    if args.txt_file:
        with open(args.txt_file) as f:
            targets = f.read().splitlines()
        assert len(targets) == len(segments), \
            f"{len(targets)} target lines for {len(segments)} segments"

    # cheap pre-pass (existence + duration) fixes the record count before the
    # expensive model pass, so features can stream straight to disk
    kept, paths = [], []
    for i, (utt, start, end) in enumerate(segments):
        path = find_audio(utt, args.audio_dirs, args.file_extension)
        if path is None:
            print(f"missing audio for {utt}", file=sys.stderr)
            continue
        duration = (end - start) if end else None
        if duration is not None and not 0 < duration <= args.max_seconds:
            continue
        kept.append(i)
        paths.append((path, start, end))

    def features():
        with torch.inference_mode():
            for path, start, end in paths:
                audio, rate = load_audio(path, start, end)
                inputs = extractor(audio, sampling_rate=rate,
                                   return_tensors="pt")
                out = model(inputs.input_values.to(device),
                            output_hidden_states=True)
                yield out.hidden_states[args.layer_id][0].cpu().numpy()

    NumpyFile.build(args.output, features(), dtype=args.dtype,
                    num_feats=len(paths))
    if targets is not None:
        for i in kept:
            print(targets[i])
    print(f"wrote {len(kept)}/{len(segments)} segments -> {args.output}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
