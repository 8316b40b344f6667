#!/usr/bin/env python3
"""Print unique tokens from tokenized text, most frequent first.

Equivalent of the reference's scripts/get-vocab.py: reads whitespace-tokenized
text and emits `token count` lines sorted by descending frequency.
"""

import argparse
import collections
import contextlib
import sys


def count_tokens(lines) -> collections.Counter:
    counts = collections.Counter()
    for line in lines:
        counts.update(line.split())
    return counts


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Read tokenized text and print every unique token with "
                    "its count, most frequent first")
    parser.add_argument("--input", "-i",
                        help="input file (default: standard input)")
    parser.add_argument("--output", "-o",
                        help="output file (default: standard output)")
    args = parser.parse_args(argv)

    with contextlib.ExitStack() as stack:
        src = sys.stdin
        if args.input and args.input != "-":
            src = stack.enter_context(open(args.input))
        dst = sys.stdout
        if args.output:
            dst = stack.enter_context(open(args.output, "w"))
        with contextlib.suppress(KeyboardInterrupt, BrokenPipeError):
            for token, count in count_tokens(src).most_common():
                dst.write(f"{token} {count}\n")


if __name__ == "__main__":
    main()
