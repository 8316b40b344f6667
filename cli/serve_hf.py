"""pasero-serve-hf: serve raw HuggingFace models (pasero/cli/serve_hf.py).

Usage: pasero-serve-hf HF_MODEL_ID [MORE_IDS ...] [--port 8000]
Shares the HTTP surface (routes, playground, SSE streaming) with pasero-serve;
the model runs through transformers on the host.
"""

from pasero_tpu.serving.hf_server import main

if __name__ == "__main__":
    main()
