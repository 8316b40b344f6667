"""pasero-retriever: BM25 document retrieval server (pasero/cli/retriever.py).

Usage: pasero-retriever collection1.jsonl [collection2.jsonl ...] [--port 8001]
"""

from __future__ import annotations

import argparse
import logging
import os


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("collections", nargs="+", help="JSONL document files")
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8001)
    parser.add_argument("--save-index", action="store_true",
                        help="pickle the BM25 index next to each collection "
                             "and reuse it on restart")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    from pasero_tpu.serving import BM25Index, serve_retriever
    collections = {
        os.path.splitext(os.path.basename(p))[0]: BM25Index.load_collection(
            p, save_index=args.save_index)
        for p in args.collections}
    serve_retriever(collections, host=args.host, port=args.port)


if __name__ == "__main__":
    main()
