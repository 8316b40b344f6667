#!/usr/bin/env python3
"""Encode text into SentencePiece pieces (reference: scripts/spm-encode.py).

Requires the `sentencepiece` package (not bundled in this image); the import
is deferred so `--help` works without it.
"""

import argparse
import contextlib
import sys


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Tokenize stdin (or -i FILE) into SentencePiece pieces")
    parser.add_argument("sentencepiece_model")
    parser.add_argument("--input", "-i",
                        help="input file (default: standard input)")
    parser.add_argument("--output", "-o",
                        help="output file (default: standard output)")
    args = parser.parse_args(argv)

    try:
        import sentencepiece as spm
    except ImportError:
        sys.exit("spm_encode.py requires the `sentencepiece` package "
                 "(pip install sentencepiece)")
    processor = spm.SentencePieceProcessor(
        model_file=args.sentencepiece_model)

    with contextlib.ExitStack() as stack:
        src = sys.stdin
        if args.input and args.input != "-":
            src = stack.enter_context(open(args.input))
        dst = sys.stdout
        if args.output:
            dst = stack.enter_context(open(args.output, "w"))
        with contextlib.suppress(KeyboardInterrupt, BrokenPipeError):
            for line in src:
                dst.write(" ".join(
                    processor.EncodeAsPieces(line.strip())) + "\n")


if __name__ == "__main__":
    main()
