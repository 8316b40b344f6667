"""BM25 retriever server (pasero/cli/retriever.py:21-141).

The reference uses the rank_bm25 package (absent here); BM25-Okapi is
implemented directly. Collections are JSONL files ({"text": ...} or raw
strings per line); indexes persist via pickle next to the collection.
"""

from __future__ import annotations

import json
import logging
import math
import os
import pickle
import re
from collections import Counter
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

logger = logging.getLogger("retriever")

_TOKEN_RE = re.compile(r"\w+", re.UNICODE)


def _tokenize(text: str) -> list:
    return _TOKEN_RE.findall(text.lower())


class BM25Index:
    K1 = 1.5
    B = 0.75

    def __init__(self, documents: list):
        self.documents = documents
        self.doc_tokens = [_tokenize(d) for d in documents]
        self.doc_lens = [len(t) for t in self.doc_tokens]
        self.avg_len = sum(self.doc_lens) / max(1, len(self.doc_lens))
        self.doc_freqs = [Counter(t) for t in self.doc_tokens]
        df: Counter = Counter()
        for freqs in self.doc_freqs:
            df.update(freqs.keys())
        n = len(documents)
        self.idf = {t: math.log(1 + (n - c + 0.5) / (c + 0.5))
                    for t, c in df.items()}

    def search(self, query: str, k: int = 3) -> list:
        q_tokens = _tokenize(query)
        scores = []
        for i, freqs in enumerate(self.doc_freqs):
            score = 0.0
            norm = self.K1 * (1 - self.B + self.B * self.doc_lens[i]
                              / max(self.avg_len, 1e-9))
            for t in q_tokens:
                f = freqs.get(t, 0)
                if f:
                    score += self.idf.get(t, 0.0) * f * (self.K1 + 1) / (f + norm)
            scores.append(score)
        order = sorted(range(len(scores)), key=scores.__getitem__, reverse=True)
        return [{"text": self.documents[i], "score": scores[i]}
                for i in order[:k] if scores[i] > 0]

    # -- persistence ---------------------------------------------------------
    @classmethod
    def load_collection(cls, path: str,
                        save_index: bool = True) -> "BM25Index":
        cache = path + ".bm25.pkl"
        if (save_index and os.path.exists(cache)
                and os.path.getmtime(cache) >= os.path.getmtime(path)):
            with open(cache, "rb") as f:
                return pickle.load(f)
        documents = []
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    obj = json.loads(line)
                    documents.append(obj["text"] if isinstance(obj, dict)
                                     else str(obj))
                except json.JSONDecodeError:
                    documents.append(line)
        index = cls(documents)
        if save_index:
            try:
                with open(cache, "wb") as f:
                    pickle.dump(index, f)
            except OSError:
                pass
        return index


class RetrieverHandler(BaseHTTPRequestHandler):
    collections: dict = {}

    def log_message(self, fmt, *args):
        logger.info(fmt, *args)

    def _send(self, code, payload):
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if self.path.rstrip("/") in ("", "/list"):
            self._send(200, {"collections": sorted(self.collections)})
        else:
            self._send(404, {"error": "unknown path"})

    def do_POST(self):
        if self.path.rstrip("/") != "/retrieve":
            self._send(404, {"error": "unknown path"})
            return
        length = int(self.headers.get("Content-Length", 0))
        data = json.loads(self.rfile.read(length)) if length else {}
        name = data.get("collection")
        index = self.collections.get(name)
        if index is None:
            self._send(404, {"error": f"unknown collection {name!r}"})
            return
        documents = index.search(data.get("query", ""), k=int(data.get("k", 3)))
        self._send(200, {"documents": documents})


def serve_retriever(collections: dict, host: str = "0.0.0.0", port: int = 8001):
    handler = type("Handler", (RetrieverHandler,),
                   {"collections": collections})
    server = ThreadingHTTPServer((host, port), handler)
    logger.info(f"retriever serving {sorted(collections)} on {host}:{port}")
    server.serve_forever()
