"""Serving tests: BM25 retriever and the HTTP surface (no model load)."""

import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import pytest

from pasero_tpu.serving import BM25Index, check_params
from pasero_tpu.serving.retriever import RetrieverHandler


def test_bm25_ranking(tmp_path):
    docs = ["the cat sat on the mat", "dogs chase cats in the park",
            "quantum computing with superconducting qubits",
            "the quick brown fox jumps over the lazy dog"]
    index = BM25Index(docs)
    top = index.search("quantum qubits", k=2)
    assert top and top[0]["text"] == docs[2]
    top = index.search("cat mat", k=2)
    assert top[0]["text"] == docs[0]
    assert index.search("zzzz", k=2) == []


def test_bm25_collection_cache(tmp_path):
    path = tmp_path / "coll.jsonl"
    path.write_text("\n".join(json.dumps({"text": f"document {i} about topic"})
                              for i in range(5)))
    index = BM25Index.load_collection(str(path))
    assert len(index.documents) == 5
    assert (tmp_path / "coll.jsonl.bm25.pkl").exists()
    index2 = BM25Index.load_collection(str(path))  # from cache
    assert index2.documents == index.documents


def test_check_params():
    assert check_params({"beam_size": "4"}) == {"beam_size": 4}
    with pytest.raises(ValueError):
        check_params({"bogus": 1})
    with pytest.raises(ValueError):
        check_params({"beam_size": "abc"})


def test_retriever_http(tmp_path):
    path = tmp_path / "wiki.jsonl"
    path.write_text("\n".join(json.dumps({"text": t}) for t in
                    ["paris is the capital of france",
                     "the moon orbits the earth"]))
    handler = type("H", (RetrieverHandler,),
                   {"collections": {"wiki": BM25Index.load_collection(str(path))}})
    server = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/list") as r:
            assert json.loads(r.read())["collections"] == ["wiki"]
        body = json.dumps({"collection": "wiki", "query": "capital of france",
                           "k": 1}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/retrieve", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as r:
            docs = json.loads(r.read())["documents"]
        assert "paris" in docs[0]["text"]
    finally:
        server.shutdown()
