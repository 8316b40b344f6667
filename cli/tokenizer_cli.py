"""Tokenizer CLIs: pasero-tokenize / -detokenize / -build-tokenizer /
-build-dict / -noisify (pasero/cli/tokenizer.py:44-239).
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def tokenize_main(argv=None):
    parser = argparse.ArgumentParser(description="BPE-tokenize stdin to stdout")
    parser.add_argument("model", help="path to the BPE model (bpecodes)")
    parser.add_argument("--dict", help="vocabulary for BPE filtering")
    parser.add_argument("--inline-case", action="store_true", default=None)
    parser.add_argument("--no-inline-case", dest="inline_case",
                        action="store_false")
    parser.add_argument("--bpe-dropout", type=float, default=0.0)
    parser.add_argument("--spell-out", type=float, default=0.0)
    args = parser.parse_args(argv)

    from pasero_tpu.tokenizers import PaseroTokenizer, load_vocab
    kwargs = {}
    if args.inline_case is not None:
        kwargs["inline_case"] = args.inline_case
    vocab = load_vocab(args.dict) if args.dict else None
    tokenizer = PaseroTokenizer(args.model, vocab=vocab, **kwargs)
    for line in sys.stdin:
        print(" ".join(tokenizer.tokenize(
            line.rstrip("\n"), dropout=args.bpe_dropout,
            spell_out=args.spell_out)))


def detokenize_main(argv=None):
    parser = argparse.ArgumentParser(description="detokenize stdin to stdout")
    parser.parse_args(argv)
    from pasero_tpu.tokenizers import detokenize
    for line in sys.stdin:
        print(detokenize(line.split()))


def build_tokenizer_main(argv=None):
    parser = argparse.ArgumentParser(description="train a Pasero BPE model")
    parser.add_argument("inputs", nargs="+", help="training text files")
    parser.add_argument("-o", "--output", required=True, help="model path")
    parser.add_argument("--size", type=int, default=8000,
                        help="number of BPE merges")
    parser.add_argument("--inline-case", action="store_true", default=True)
    parser.add_argument("--no-inline-case", dest="inline_case",
                        action="store_false")
    parser.add_argument("--nfkc", action="store_true")
    parser.add_argument("--tokenization", type=int, default=2,
                        choices=[0, 1, 2, 3, 4],
                        help="pre-splitting aggressivity")
    parser.add_argument("--temperature", type=float, default=1.0,
                        help="per-language oversampling temperature")
    parser.add_argument("--protect-regex")
    parser.add_argument("--vocab-path",
                        help="also write per-language vocabularies here "
                             "({lang} placeholder supported)")
    parser.add_argument("--dict-path", help="also build a dictionary here")
    parser.add_argument("--dict-size", type=int)
    parser.add_argument("--dict-min-count", type=int, default=10)
    parser.add_argument("--dict-padding-factor", type=int, default=8)
    parser.add_argument("--dict-custom-symbols", nargs="*", default=[])
    args = parser.parse_args(argv)

    from pasero_tpu.tokenizers import PaseroTokenizer
    model, vocabs = PaseroTokenizer.train(
        args.inputs, output=args.output, num_symbols=args.size,
        inline_case=args.inline_case, nfkc=args.nfkc,
        tokenization=args.tokenization, temperature=args.temperature,
        protect_regex=args.protect_regex)
    print(f"trained {len(model)} merges -> {args.output}")
    if args.vocab_path:
        for lang, vocab in vocabs.items():
            path = args.vocab_path.replace("{lang}", lang)
            with open(path, "w") as f:
                for token, count in vocab.most_common():
                    print(token, count, file=f)
    if args.dict_path:
        items = PaseroTokenizer.build_dict(
            vocabs, vocab_size=args.dict_size, min_count=args.dict_min_count,
            padding_factor=args.dict_padding_factor,
            extra_tokens=["<T>", "<U>", "<mask>"] + args.dict_custom_symbols)
        with open(args.dict_path, "w") as f:
            for token, count in items:
                print(token, count, file=f)
        print(f"built dictionary with {len(items) + 4} entries "
              f"-> {args.dict_path}")


def build_dict_main(argv=None):
    parser = argparse.ArgumentParser(
        description="build a dictionary from tokenized stdin")
    parser.add_argument("-o", "--output", required=True)
    parser.add_argument("--size", type=int, help="max vocabulary size")
    parser.add_argument("--min-count", type=int, default=1)
    parser.add_argument("--padding-factor", type=int, default=8,
                        help="pad the final size to a multiple of this")
    parser.add_argument("--custom-symbols", nargs="*", default=[])
    args = parser.parse_args(argv)

    import collections
    counts = collections.Counter()
    for line in sys.stdin:
        counts.update(line.split())
    from pasero_tpu.tokenizers import PaseroTokenizer
    items = PaseroTokenizer.build_dict(
        {"any": counts}, vocab_size=args.size, min_count=args.min_count,
        padding_factor=args.padding_factor,
        extra_tokens=["<T>", "<U>", "<mask>"] + args.custom_symbols)
    with open(args.output, "w") as f:
        for token, count in items:
            print(token, count, file=f)
    print(f"built dictionary with {len(items) + 4} entries -> {args.output}")


def noisify_main(argv=None):
    parser = argparse.ArgumentParser(description="add noise to stdin text")
    parser.add_argument("--char-noise", type=float, default=0.0)
    parser.add_argument("--word-noise", type=float, default=0.0)
    parser.add_argument("--space-noise", type=float, default=0.0)
    parser.add_argument("--punct-noise", type=float, default=0.0)
    parser.add_argument("--masking", type=float, default=0.0)
    parser.add_argument("--seed", type=int)
    args = parser.parse_args(argv)

    from pasero_tpu.tokenizers.noise import noisify
    rng = np.random.default_rng(args.seed)
    for line in sys.stdin:
        print(noisify(line.rstrip("\n"), rng=rng,
                      char_noise=args.char_noise, word_noise=args.word_noise,
                      space_noise=args.space_noise,
                      punct_noise=args.punct_noise, masking=args.masking))


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "tokenize"
    {"tokenize": tokenize_main, "detokenize": detokenize_main,
     "build-tokenizer": build_tokenizer_main, "build-dict": build_dict_main,
     "noisify": noisify_main}[cmd](sys.argv[2:])
