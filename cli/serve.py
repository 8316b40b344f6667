"""pasero-serve: HTTP model server (pasero/cli/serve.py).

Usage: pasero-serve MODEL_DIR [MODEL_DIR2 ...] [--port 8000]
                    [--retriever-url http://host:8001]
Model names default to the directory basename; append ':name' to override.
"""

from __future__ import annotations

import argparse
import logging
import os
import sys


def main(argv=None):
    from pasero_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    parser = argparse.ArgumentParser()
    parser.add_argument("models", nargs="+",
                        help="model directories, optionally 'PATH:name'")
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--retriever-url")
    parser.add_argument("--dtype", choices=["float16", "bfloat16", "float32"],
                        help="compute dtype for the served models")
    parser.add_argument("--quantize", choices=["int8"],
                        help="weight-only int8 for the served pasero models "
                             "(ops/quantize.py; halves the weight read that "
                             "bounds large-model decoding)")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s | %(name)s | %(message)s")

    from pasero_tpu.decoding.generator import TextGenerator
    from pasero_tpu.serving import serve
    models = {}
    for spec in args.models:
        if spec.startswith("hf:"):
            # serve an unconverted HuggingFace model through the same routes
            # (reference: cli/serve_hf.py; here one server handles both)
            from pasero_tpu.serving.hf_server import HFGenerator
            path = spec[3:]
            name = path.rstrip("/").split("/")[-1]
            models[name] = HFGenerator.build(path, dtype=args.dtype)
            continue
        path, _, name = spec.partition(":")
        name = name or os.path.basename(os.path.normpath(path))
        kwargs = {"dtype": args.dtype} if args.dtype else {}
        if args.quantize:
            kwargs["quantize"] = args.quantize
        models[name] = TextGenerator.build(path, **kwargs)
    serve(models, host=args.host, port=args.port,
          retriever_url=args.retriever_url)


if __name__ == "__main__":
    main()
