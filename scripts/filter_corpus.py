#!/usr/bin/env python3
"""Parallel-corpus cleaning (pasero/scripts/filter-corpus.py +
evaluation.py:92-239): language-id filtering, deduplication, length/ratio
filtering and shuffling.

Usage: python scripts/filter_corpus.py corpus.de corpus.en -o clean
           [--source-lang de --target-lang en] [--min-len 1] [--max-len 250]
           [--max-ratio 9] [--dedup] [--shuffle] [--langid]
"""

import argparse
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("source")
    parser.add_argument("target")
    parser.add_argument("-o", "--output-prefix", required=True)
    parser.add_argument("--source-lang")
    parser.add_argument("--target-lang")
    parser.add_argument("--min-len", type=int, default=1)
    parser.add_argument("--max-len", type=int, default=1000)
    parser.add_argument("--max-ratio", type=float, default=9.0)
    parser.add_argument("--dedup", action="store_true")
    parser.add_argument("--shuffle", action="store_true")
    parser.add_argument("--langid", action="store_true")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    from pasero_tpu.evaluation import Dedup, FilterByLang, FilterByLen, Shuffle

    def read_pairs():
        with open(args.source) as src, open(args.target) as tgt:
            for s, t in zip(src, tgt):
                yield s.rstrip("\n"), t.rstrip("\n")

    pipeline = read_pairs()
    pipeline = FilterByLen(args.min_len, args.max_len, args.max_ratio)(pipeline)
    if args.dedup:
        pipeline = Dedup()(pipeline)
    if args.langid and args.source_lang and args.target_lang:
        pipeline = FilterByLang(args.source_lang, args.target_lang)(pipeline)
    if args.shuffle:
        pipeline = Shuffle(args.seed)(pipeline)

    src_ext = args.source.rsplit(".", 1)[-1]
    tgt_ext = args.target.rsplit(".", 1)[-1]
    n = 0
    with open(f"{args.output_prefix}.{src_ext}", "w") as out_src, \
            open(f"{args.output_prefix}.{tgt_ext}", "w") as out_tgt:
        for s, t in pipeline:
            print(s, file=out_src)
            print(t, file=out_tgt)
            n += 1
    print(f"kept {n} pairs -> {args.output_prefix}.{{{src_ext},{tgt_ext}}}")


if __name__ == "__main__":
    main()
