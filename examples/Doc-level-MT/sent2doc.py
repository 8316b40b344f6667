#!/usr/bin/env python3
"""Merge consecutive sentence-level lines into doc-level lines with <sep>.

Equivalent of the reference's examples/Doc-level-MT/sent2doc.py: stdin has one
sentence per line (document order preserved); stdout gets one document per
line whose sentences are joined with ``<sep>``.

Usage: sent2doc.py [--max-doc-size 3] [--sep '<sep>'] < sents.txt > docs.txt
"""

import argparse
import sys


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--max-doc-size", type=int, default=3,
                        help="sentences per output document")
    parser.add_argument("--sep", default="<sep>")
    args = parser.parse_args()
    doc = []
    for line in sys.stdin:
        doc.append(line.strip())
        if len(doc) >= args.max_doc_size:
            print(f" {args.sep} ".join(doc))
            doc = []
    if doc:
        print(f" {args.sep} ".join(doc))


if __name__ == "__main__":
    main()
