#!/usr/bin/env python3
"""Export a HuggingFace tokenizer's vocabulary as a dict.json usable by
pasero_tpu (pasero/scripts/hf-tokenizer-to-dict.py).

Usage: python scripts/hf_tokenizer_to_dict.py <hf-name-or-path> -o dict.json
"""

import argparse
import json


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("model")
    parser.add_argument("-o", "--output", required=True)
    args = parser.parse_args(argv)
    from transformers import AutoTokenizer
    tok = AutoTokenizer.from_pretrained(args.model)
    with open(args.output, "w") as f:
        json.dump(tok.get_vocab(), f, ensure_ascii=False)
    print(f"wrote {len(tok.get_vocab())} entries -> {args.output}")


if __name__ == "__main__":
    main()
