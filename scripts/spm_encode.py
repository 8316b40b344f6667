#!/usr/bin/env python3
"""Encode text into SentencePiece pieces (reference: scripts/spm-encode.py).

Requires the `sentencepiece` package (not bundled in this image); the import
is deferred so `--help` works without it.
"""

import argparse
import sys

parser = argparse.ArgumentParser()
parser.add_argument("sentencepiece_model")
parser.add_argument("--input", "-i",
                    help="input file (default: standard input)")
parser.add_argument("--output", "-o",
                    help="output file (default: standard output)")

if __name__ == "__main__":
    args = parser.parse_args()
    try:
        import sentencepiece as spm
    except ImportError:
        sys.exit("spm_encode.py requires the `sentencepiece` package "
                 "(pip install sentencepiece)")
    infile = open(args.input) if args.input and args.input != "-" else sys.stdin
    outfile = open(args.output, "w") if args.output else sys.stdout
    model = spm.SentencePieceProcessor(model_file=args.sentencepiece_model)
    try:
        for line in infile:
            pieces = model.EncodeAsPieces(line.strip())
            print(*pieces, file=outfile)
    except (KeyboardInterrupt, BrokenPipeError):
        sys.stdout = None
