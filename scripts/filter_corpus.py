#!/usr/bin/env python3
"""Parallel-corpus cleaning (pasero/scripts/filter-corpus.py +
pasero/evaluation.py:92-239): ordered --actions pipeline over N parallel
files with line-id tracking, resumable langid filtering, dedup and shuffle.

Usage (reference interface):
    python scripts/filter_corpus.py corpus.de corpus.en \
        --actions clean length dedup shuffle -o clean.de clean.en
    python scripts/filter_corpus.py corpus.de corpus.en \
        --actions langid --langs deu_Latn eng_Latn --indices kept.ids --continue
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Filter a parallel corpus by removing lines in the wrong "
                    "language, with mismatched lengths or duplicates; can "
                    "also shuffle it")
    parser.add_argument("files", nargs="+", help="parallel input text files "
                        "(langid languages inferred from extensions)")
    parser.add_argument("-o", "--output", nargs="+",
                        help="save the filtered corpus into these files")
    parser.add_argument("--input-indices",
                        help="pre-filter input lines by the ids in this file")
    parser.add_argument("--indices",
                        help="save the line ids of the kept lines here")
    parser.add_argument("--actions", nargs="+", required=True,
                        choices=["clean", "length", "langid", "dedup",
                                 "shuffle"],
                        help="perform these actions in this order")
    parser.add_argument("-v", "--verbose", action="store_true")
    parser.add_argument("--continue", dest="continue_", action="store_true",
                        help="resume if the --indices file already exists "
                             "(incompatible with dedup/shuffle and -o)")
    parser.add_argument("--langs", nargs="+",
                        help="language codes of the files for langid")
    parser.add_argument("--min-len", type=int, default=1)
    parser.add_argument("--max-len", type=int, default=1000)
    parser.add_argument("--max-ratio", type=float, default=9.0)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    assert args.output or args.indices, "need --output or --indices"
    assert not args.output or len(args.output) == len(args.files)
    assert not args.continue_ or ("shuffle" not in args.actions
                                  and "dedup" not in args.actions
                                  and not args.output)
    assert args.langs or "langid" not in args.actions

    from pasero_tpu.evaluation import Dedup, FilterByLang, FilterByLen, Shuffle

    start = 0
    init_indices = []
    if args.continue_ and args.indices and os.path.isfile(args.indices):
        with open(args.indices) as f:
            try:
                init_indices = [int(x) for x in f][:-1]
                start = max(init_indices, default=-1) + 1
            except ValueError:
                init_indices, start = [], 0

    keep_input = None
    if args.input_indices:
        keep_input = set(int(x) for x in open(args.input_indices))

    def read():
        handles = [open(p) for p in args.files]
        for i, lines in enumerate(zip(*handles)):
            if i < start:
                continue
            if keep_input is not None and i not in keep_input:
                continue
            yield i, tuple(line.rstrip("\n") for line in lines)

    # run filters with the id embedded as the first tuple element so dropped
    # lines drop their ids too
    def embed(pairs):
        for i, tup in pairs:
            yield (str(i),) + tup

    class _IdAware:
        """Wrap a pair-filter so it judges only the text columns."""

        def __init__(self, filt):
            self.filt = filt

        def __call__(self, rows):
            # the bundled filters are simple generators over tuples; they all
            # judge every column, so strip the id column for the decision
            for row in rows:
                for out in self.filt([row[1:]]):
                    yield (row[0],) + out

    pipeline = embed(read())
    langs = args.langs or [p.rsplit(".", 1)[-1] for p in args.files]
    for action in args.actions:
        if action == "clean":
            pipeline = _IdAware(FilterByLen(min_len=1, max_len=10 ** 9,
                                            max_ratio=10 ** 9))(pipeline)
        elif action == "length":
            pipeline = _IdAware(FilterByLen(args.min_len, args.max_len,
                                            args.max_ratio))(pipeline)
        elif action == "langid":
            pipeline = _IdAware(FilterByLang(langs[0],
                                             langs[-1]))(pipeline)
        elif action == "dedup":
            pipeline = _IdAware(Dedup())(pipeline)
        elif action == "shuffle":
            pipeline = Shuffle(args.seed)(pipeline)

    outs = [open(p, "w") for p in args.output] if args.output else None
    idx_out = None
    if args.indices:
        idx_out = open(args.indices, "a" if args.continue_ else "w")
    n = len(init_indices)
    for row in pipeline:
        i, tup = row[0], row[1:]
        if outs:
            for line, f in zip(tup, outs):
                print(line, file=f)
        if idx_out:
            print(i, file=idx_out)
        n += 1
        if args.verbose and n % 100000 == 0:
            print(f"kept {n} lines", file=sys.stderr)
    print(f"kept {n} lines", file=sys.stderr)


if __name__ == "__main__":
    main()
