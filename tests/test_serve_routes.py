"""ServeHandler route tests: decode JSON, SSE framing, playground pages,
chat messages, and the RAG branch (VERDICT round-1 weak #5).

Drives the real HTTP server with a fake generator so every route is exercised
without a model load; tests/test_serve_hf.py covers a real (tiny HF) model.
"""

import json
import threading
import urllib.error
import urllib.request
from http.server import ThreadingHTTPServer

import pytest

from pasero_tpu.serving import BM25Index
from pasero_tpu.serving.retriever import RetrieverHandler
from pasero_tpu.serving.server import ServeHandler


class FakeTask:
    def __init__(self, info=None, retriever_config=None):
        self.task_info = info or {"model_type": "decoder"}
        self.preprocessor = type(
            "PP", (), {"tokenize": staticmethod(lambda text: text.split())})()
        if retriever_config is not None:
            self.cfg = type("Cfg", (), {"retriever_config": retriever_config})()


class FakeGenerator:
    """Records calls; echoes inputs back."""

    def __init__(self, **task_kwargs):
        self.task = FakeTask(**task_kwargs)
        self.cfg = type("Cfg", (), {"task": "translation"})()
        self.decode_calls = []
        self.stream_calls = []
        self.score_calls = []
        self.wants_retrieval = True

    def score(self, inputs, targets, **opts):
        """Teacher-forced yes/no scoring: higher logp on ' Yes' when
        wants_retrieval, on ' No' otherwise."""
        self.score_calls.append((inputs, targets))
        out = []
        for target in targets:
            good = target.strip().lower() == \
                ("yes" if self.wants_retrieval else "no")
            out.append({"detok": target, "score": -0.5 if good else -5.0})
        return out

    def decode(self, inputs, return_scores=False, nbest=1, meta=None, **opts):
        self.decode_calls.append((inputs, nbest, meta, opts))
        return [[{"detok": f"HYP{n}: {text}", "score": -0.5 - n}
                 for n in range(nbest)] for text in inputs]

    def stream(self, input, meta=None, **opts):
        self.stream_calls.append((input, meta, opts))
        if isinstance(input, str) and input.endswith('RETRIEVE("'):
            # the query-generation call of the RAG branch
            yield 'moon orbit"', [7]
            return
        for i, word in enumerate(["hello ", "world"]):
            yield word, list(range(i + 1))


@pytest.fixture()
def server():
    """(base_url, {name: FakeGenerator}, set_retriever) running server."""
    models = {"mt": FakeGenerator()}
    handler = type("H", (ServeHandler,),
                   {"models": models, "retriever_url": None,
                    "lock": threading.Lock()})
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    url = f"http://127.0.0.1:{httpd.server_address[1]}"
    yield url, models, handler
    httpd.shutdown()


def get(url, raw=False):
    with urllib.request.urlopen(url, timeout=10) as r:
        body = r.read()
        ctype = r.headers.get("Content-Type")
    return body if raw else (json.loads(body)
                             if ctype == "application/json"
                             else body.decode())


def post(url, data, raw=False):
    req = urllib.request.Request(
        url, data=json.dumps(data).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=10) as r:
        body = r.read()
    return body if raw else json.loads(body)


def test_index_and_pages(server):
    url, _, _ = server
    index = get(url + "/")
    assert "<!doctype html>" in index.lower() and "pasero-tpu" in index
    playground = get(url + "/mt")
    assert "__MODEL__" not in playground and '"mt"' in playground or \
        "mt" in playground
    api = get(url + "/mt/api")
    assert "/mt/decode" in api and "__MODEL__" not in api


def test_list_help_info(server):
    url, _, _ = server
    listing = get(url + "/list")
    assert listing["models"]["mt"]["model_type"] == "decoder"
    assert listing["models"]["mt"]["task"] == "translation"
    help_ = get(url + "/help")
    assert "beam_size" in help_["decode parameters"]
    info = get(url + "/mt/info")
    assert info["model_type"] == "decoder"


def test_decode_route(server):
    url, models, _ = server
    out = post(url + "/mt/decode",
               {"input": ["guten tag", "hallo"], "beam_size": 4, "nbest": 2})
    assert out["detok"] == ["HYP0: guten tag", "HYP0: hallo"]
    assert out["scores"] == [-0.5, -0.5]
    assert len(out["nbest"][0]) == 2
    inputs, nbest, meta, opts = models["mt"].decode_calls[-1]
    assert opts["beam_size"] == 4 and nbest == 2

    # unknown parameter -> 400 with an error message
    with pytest.raises(urllib.error.HTTPError) as e:
        post(url + "/mt/decode", {"input": ["x"], "bogus": 1})
    assert e.value.code == 400
    assert "bogus" in json.loads(e.value.read())["error"]

    # missing input -> 400
    with pytest.raises(urllib.error.HTTPError) as e:
        post(url + "/mt/decode", {})
    assert e.value.code == 400


def test_stream_sse_framing(server):
    url, _, _ = server
    body = post(url + "/mt/stream", {"input": "hi",
                                     "sampling_temperature": 0.7}, raw=True)
    events = [e for e in body.decode().split("\n\n") if e]
    assert all(e.startswith("data: ") for e in events)
    parsed = [json.loads(e[len("data: "):]) for e in events]
    assert [p.get("text") for p in parsed[:-1]] == ["hello ", "world"]
    assert parsed[-1] == {"done": True}
    # tokens accompany each text event
    assert parsed[0]["tokens"] == [0]


def test_chat_messages(server):
    url, models, _ = server
    history = ["hi there", "hello!", "how are you?"]
    out = post(url + "/mt/decode", {"messages": history})
    assert out["detok"] == [f"HYP0: {history}"]
    inputs, _, _, _ = models["mt"].decode_calls[-1]
    assert inputs == [history]  # one sample whose input is the turn list

    post(url + "/mt/stream", {"messages": history}, raw=True)
    assert models["mt"].stream_calls[-1][0] == history


def test_rag_branch(server, tmp_path):
    url, models, handler = server
    # live retriever with a small collection
    coll = tmp_path / "wiki.jsonl"
    coll.write_text("\n".join(json.dumps({"text": t}) for t in
                    ["the moon orbits the earth every 27 days",
                     "paris is the capital of france"]))
    rhandler = type("R", (RetrieverHandler,),
                    {"collections": {"wiki": BM25Index.load_collection(str(coll))}})
    retriever = ThreadingHTTPServer(("127.0.0.1", 0), rhandler)
    threading.Thread(target=retriever.serve_forever, daemon=True).start()
    handler.retriever_url = f"http://127.0.0.1:{retriever.server_address[1]}"

    try:
        # 1) query generation (query_template -> RETRIEVE("...") stream)
        models["rag"] = FakeGenerator(
            info={"model_type": "decoder"},
            retriever_config={
                "collection": "wiki",
                "query_template": 'Generate a query in the format '
                                  '{retrieve} for: {user_msg}'})
        post(url + "/rag/stream", {"input": "tell me about the moon"},
             raw=True)
        calls = models["rag"].stream_calls
        assert calls[0][0].endswith('RETRIEVE("')
        final_prompt = calls[-1][0]
        assert "orbits the earth" in final_prompt
        assert "# Document 1" in final_prompt
        assert "tell me about the moon" in final_prompt

        # 2) no query template: the user message is the query directly
        models["rag2"] = FakeGenerator(
            info={"model_type": "decoder"},
            retriever_config={"collection": "wiki"})
        post(url + "/rag2/stream", {"input": "moon orbit facts"}, raw=True)
        calls = models["rag2"].stream_calls
        assert len(calls) == 1 and "orbits the earth" in calls[0][0]

        # 3) LLM-decided retrieval, 'No' branch: prompt passes unchanged
        models["norag"] = FakeGenerator(
            info={"model_type": "decoder"},
            retriever_config={
                "collection": "wiki",
                "auto_template": "Would documents help answer "
                                 '"{user_msg}"?'})
        models["norag"].wants_retrieval = False
        post(url + "/norag/stream",
             {"input": "User: what is two plus two?"}, raw=True)
        calls = models["norag"].stream_calls
        assert len(calls) == 1
        assert calls[0][0] == "User: what is two plus two?"
        assert models["norag"].score_calls, "yes/no scoring did not run"
        targets = models["norag"].score_calls[0][1]
        assert [t.strip() for t in targets] == ["Yes", "No"]

        # 4) 'Yes' branch with an explicit user query override
        models["yesrag"] = FakeGenerator(
            info={"model_type": "decoder"},
            retriever_config={
                "collection": "wiki",
                "auto_template": "Would documents help for {user_msg}?"})
        post(url + "/yesrag/stream",
             {"input": "User: about paris\nRetriever query: capital of "
                       "france"}, raw=True)
        final = models["yesrag"].stream_calls[-1][0]
        assert "capital of france" in final       # the right doc was fetched
        assert "Retriever query:" not in final    # override line stripped
        assert not models["yesrag"].score_calls   # explicit query skips vote
    finally:
        retriever.shutdown()


def test_pack_documents_token_budget():
    from pasero_tpu.serving.server import pack_documents
    tokenize = str.split
    docs = [{"text": "one two three four five"},       # 5 tokens
            {"text": "a b"},                            # 2 tokens (too short)
            {"text": "x " * 50},                        # 50 tokens (too long)
            {"text": "six seven eight"}]                # 3 tokens
    out = pack_documents(docs, tokenize, max_doc_len=9, min_doc_len=3,
                         topk=5)
    assert out == ["# Document 1\none two three four five",
                   "# Document 2\nsix seven eight"]
    # budget exhaustion stops packing
    out = pack_documents(docs, tokenize, max_doc_len=5, min_doc_len=3)
    assert out == ["# Document 1\none two three four five"]
    # topk cap
    out = pack_documents(docs, tokenize, max_doc_len=100, min_doc_len=0,
                         topk=1)
    assert len(out) == 1
