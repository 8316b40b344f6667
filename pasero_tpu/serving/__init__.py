"""HTTP serving: model server (decode/stream/playground) + BM25 retriever."""

from .retriever import BM25Index, serve_retriever
from .server import check_params, serve
