"""Tokenizer CLIs: pasero-tokenize / -detokenize / -build-tokenizer /
-build-dict / -noisify (pasero/cli/tokenizer.py:44-239).

Flag surface follows the reference CLI (including --input/--output file
arguments, subword-nmt-style --vocabulary/--threshold filtering, and the
--dict-* dictionary options); the older short spellings this repo used
first (--size, --dict-min-count, --bpe-dropout) remain as aliases.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def _open_io(args):
    infile = open(args.input) if getattr(args, "input", None) else sys.stdin
    outfile = (open(args.output_text, "w")
               if getattr(args, "output_text", None) else sys.stdout)
    return infile, outfile


def _add_io(parser):
    parser.add_argument("--input", "-i",
                        help="input file (default: standard input)")
    parser.add_argument("--output", "-o", dest="output_text",
                        help="output file (default: standard output)")


def _add_dict_args(parser):
    parser.add_argument("--dict-placeholders", type=int, default=0,
                        help="pad the dictionary with this many dummy symbols")
    parser.add_argument("--dict-padding-factor", type=int, default=8,
                        help="dictionary size (incl. specials) must be a "
                             "multiple of this")
    parser.add_argument("--dict-padding-offset", type=int, default=4,
                        help="number of special symbols not in the dictionary")
    parser.add_argument("--dict-min-freq", "--dict-min-count",
                        dest="dict_min_freq", type=int, default=10,
                        help="minimum frequency to enter the dictionary")
    parser.add_argument("--dict-char-coverage", type=float, default=1.0,
                        help="keep only the most frequent characters whose "
                             "total coverage exceeds this ratio")
    parser.add_argument("--dict-custom-symbols", nargs="*", default=[],
                        help="add these symbols to the dictionary")
    parser.add_argument("--dict-max-size", "--dict-size", dest="dict_max_size",
                        type=int, help="maximum dictionary size")


def tokenize_main(argv=None):
    parser = argparse.ArgumentParser(description="BPE-tokenize text")
    parser.add_argument("model", help="path to the BPE model (bpecodes)")
    _add_io(parser)
    parser.add_argument("--vocabulary", "--dict", dest="vocabulary",
                        help="vocabulary file (token freq pairs) restricting "
                             "the generated subwords")
    parser.add_argument("-t", "--threshold", type=int,
                        help="only generate subwords whose frequency in the "
                             "vocabulary file is at least this value")
    parser.add_argument("--unk", help="replace OOV tokens by this symbol")
    parser.add_argument("--inline-case", action="store_true", default=None)
    parser.add_argument("--no-inline-case", dest="inline_case",
                        action="store_false")
    parser.add_argument("--dropout", "--bpe-dropout", dest="dropout",
                        type=float, default=0.0, help="BPE dropout rate")
    parser.add_argument("--spell-out", type=float, default=0.0,
                        help="spell out each subword with this probability")
    args = parser.parse_args(argv)

    from pasero_tpu.tokenizers import PaseroTokenizer, load_vocab
    kwargs = {}
    if args.inline_case is not None:
        kwargs["inline_case"] = args.inline_case
    vocab = (load_vocab(args.vocabulary, threshold=args.threshold)
             if args.vocabulary else None)
    tokenizer = PaseroTokenizer(args.model, vocab=vocab, **kwargs)
    infile, outfile = _open_io(args)
    for line in infile:
        print(" ".join(tokenizer.tokenize(
            line.rstrip("\n"), unk=args.unk, dropout=args.dropout,
            spell_out=args.spell_out)), file=outfile)


def detokenize_main(argv=None):
    parser = argparse.ArgumentParser(description="merge BPE units back")
    _add_io(parser)
    args = parser.parse_args(argv)
    from pasero_tpu.tokenizers import detokenize
    infile, outfile = _open_io(args)
    for line in infile:
        print(detokenize(line.split()), file=outfile)


def _write_dict(items, path, offset=4):
    with open(path, "w") as f:
        for token, count in items:
            print(token, count, file=f)
    print(f"built dictionary with {len(items) + offset} entries -> {path}")


def build_tokenizer_main(argv=None):
    parser = argparse.ArgumentParser(description="train a Pasero BPE model")
    parser.add_argument("inputs", nargs="*", help="training text files")
    parser.add_argument("--inputs", "-i", dest="inputs_opt", nargs="+",
                        help="training text files (alternative spelling)")
    parser.add_argument("-o", "--output", required=True, help="model path")
    parser.add_argument("--symbols", "-s", "--size", dest="num_symbols",
                        type=int, default=8000, help="number of BPE merges")
    parser.add_argument("--existing-bpe-path",
                        help="load this BPE model instead of training and "
                             "generate vocabularies/dictionaries with it")
    parser.add_argument("--verbose", "-v", action="store_true")
    parser.add_argument("--inline-case", action="store_true", default=True)
    parser.add_argument("--no-inline-case", dest="inline_case",
                        action="store_false")
    parser.add_argument("--nfkc", action="store_true")
    parser.add_argument("--split-by-script", dest="split_script",
                        action="store_true", default=True)
    parser.add_argument("--no-split-by-script", dest="split_script",
                        action="store_false")
    parser.add_argument("--tokenization", type=int, default=2,
                        choices=[0, 1, 2, 3, 4],
                        help="pre-splitting aggressivity")
    parser.add_argument("--max-lines", type=int, default=10 ** 7,
                        help="lines to read per file (counts extrapolated)")
    parser.add_argument("--temperature", type=float, default=1.0,
                        help="per-language oversampling temperature")
    parser.add_argument("--protect-regex")
    parser.add_argument("--vocab-path",
                        help="also write per-language vocabularies here "
                             "({lang} placeholder supported)")
    parser.add_argument("--dict-path", "-d", help="also build a dictionary")
    parser.add_argument("--lang-codes", nargs="*",
                        help="add these language codes to the dictionary "
                             "(empty flag: infer from input file extensions)")
    _add_dict_args(parser)
    args = parser.parse_args(argv)
    inputs = list(args.inputs) + list(args.inputs_opt or [])
    if not inputs:
        parser.error("no input files")

    from pasero_tpu.tokenizers import PaseroTokenizer
    model, vocabs = PaseroTokenizer.train(
        inputs, output=args.output, num_symbols=args.num_symbols,
        existing_bpe_path=args.existing_bpe_path,
        inline_case=args.inline_case, nfkc=args.nfkc,
        split_script=args.split_script, tokenization=args.tokenization,
        max_lines=args.max_lines, temperature=args.temperature,
        protect_regex=args.protect_regex)
    print(f"trained {len(model)} merges -> {args.output}")
    if args.vocab_path:
        for lang, vocab in vocabs.items():
            path = (args.vocab_path.replace("{lang}", lang)
                    if "{lang}" in args.vocab_path
                    else f"{args.vocab_path}.{lang}")
            with open(path, "w") as f:
                for token, count in vocab.most_common():
                    print(token, count, file=f)
    if args.dict_path:
        lang_codes = args.lang_codes
        if lang_codes == []:  # bare --lang-codes: infer from extensions
            lang_codes = sorted(vocabs)
        extra = ["<T>", "<U>", "<mask>"] + args.dict_custom_symbols
        if lang_codes:
            from pasero_tpu.preprocessing import get_lang_code
            extra += [get_lang_code(code) for code in lang_codes]
        items = PaseroTokenizer.build_dict(
            vocabs, vocab_size=args.dict_max_size,
            min_count=args.dict_min_freq,
            padding_factor=args.dict_padding_factor,
            placeholders=args.dict_placeholders,
            padding_offset=args.dict_padding_offset,
            char_coverage=args.dict_char_coverage,
            extra_tokens=extra)
        _write_dict(items, args.dict_path, args.dict_padding_offset)


def build_dict_main(argv=None):
    parser = argparse.ArgumentParser(
        description="build a dictionary from tokenized text")
    parser.add_argument("--input", "-i",
                        help="input file (default: standard input)")
    parser.add_argument("-o", "-d", "--dict-path", dest="output",
                        required=True)
    parser.add_argument("--max-lines", type=int,
                        help="maximum number of lines to read")
    # first-release spellings kept as aliases
    parser.add_argument("--size", dest="legacy_size", type=int,
                        help=argparse.SUPPRESS)
    parser.add_argument("--min-count", dest="legacy_min_count", type=int,
                        help=argparse.SUPPRESS)
    parser.add_argument("--padding-factor", dest="legacy_padding", type=int,
                        help=argparse.SUPPRESS)
    parser.add_argument("--custom-symbols", nargs="*", default=None,
                        help=argparse.SUPPRESS)
    _add_dict_args(parser)
    args = parser.parse_args(argv)
    if args.legacy_size is not None:
        args.dict_max_size = args.legacy_size
    if args.legacy_min_count is not None:
        args.dict_min_freq = args.legacy_min_count
    if args.legacy_padding is not None:
        args.dict_padding_factor = args.legacy_padding
    if args.custom_symbols is not None:
        args.dict_custom_symbols = args.custom_symbols

    import collections
    counts = collections.Counter()
    infile = open(args.input) if args.input else sys.stdin
    for n, line in enumerate(infile):
        if args.max_lines and n >= args.max_lines:
            break
        counts.update(line.split())
    from pasero_tpu.tokenizers import PaseroTokenizer
    items = PaseroTokenizer.build_dict(
        {"any": counts}, vocab_size=args.dict_max_size,
        min_count=args.dict_min_freq,
        padding_factor=args.dict_padding_factor,
        placeholders=args.dict_placeholders,
        padding_offset=args.dict_padding_offset,
        char_coverage=args.dict_char_coverage,
        extra_tokens=["<T>", "<U>", "<mask>"] + args.dict_custom_symbols)
    _write_dict(items, args.output, args.dict_padding_offset)


def noisify_main(argv=None):
    parser = argparse.ArgumentParser(description="add noise to text")
    _add_io(parser)
    parser.add_argument("--char-noise", type=float, default=0.0)
    parser.add_argument("--word-noise", type=float, default=0.0)
    parser.add_argument("--space-noise", type=float, default=0.0)
    parser.add_argument("--punct-noise", type=float, default=0.0)
    parser.add_argument("--masking", type=float, default=0.0)
    parser.add_argument("--seed", type=int, default=1234)
    args = parser.parse_args(argv)

    from pasero_tpu.tokenizers.noise import noisify
    rng = np.random.default_rng(args.seed)
    infile, outfile = _open_io(args)
    for line in infile:
        print(noisify(line.rstrip("\n"), rng=rng,
                      char_noise=args.char_noise, word_noise=args.word_noise,
                      space_noise=args.space_noise,
                      punct_noise=args.punct_noise, masking=args.masking),
              file=outfile)


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "tokenize"
    {"tokenize": tokenize_main, "detokenize": detokenize_main,
     "build-tokenizer": build_tokenizer_main, "build-dict": build_dict_main,
     "noisify": noisify_main}[cmd](sys.argv[2:])
