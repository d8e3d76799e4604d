"""HTTP serving layer (SURVEY.md §2 S16 — the reference's server/).

The reference ships an OpenAI-compatible embedding server
(``server/src/lib.rs``: ``health_check`` :143, ``create_embeddings``
:148, run :838). This is the Spark-engine analogue, built on the
serving read path:

- ``GET /health`` — liveness + index metadata.
- ``POST /v1/embeddings`` — OpenAI-shaped request/response
  (``{"model": ..., "input": "text" | ["text", ...]}`` →
  ``{"object": "list", "data": [{"embedding": [...], ...}]}``) over a
  deterministic feature-hashing text embedding (the classical hashing
  trick: token → md5 → signed dimension bucket, L2-normalized — the
  static-embedding slot; a model-backed deployment swaps the kernel).
- ``POST /v1/search`` — BM25 top-k through ``IndexReader.search_local``
  (``{"query": "...", "k": 10}`` or ``{"queries": [{"query_id",
  "query_text", "k"}, ...]}``). The reference delegates retrieval to
  vector-DB adapters; here the engine itself serves it.

Pure stdlib (``http.server`` ThreadingHTTPServer) — and crucially the
process needs NO Spark/JVM: ``IndexReader(None, root)`` works for
serving because ``search_local`` reads the index with pyarrow only.
Spark builds and maintains the index; any number of these stateless
serving processes point at the same committed index root (the commit
protocol guarantees they never see a half-written batch).
"""

from __future__ import annotations

import hashlib
import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from embedanything_spark.analyzer import tokenize

EMBED_DIM = 64


def text_hash_embedding(text: str, dim: int = EMBED_DIM) -> list[float]:
    """Feature-hashing bag-of-tokens embedding: each token hashes to a
    signed dimension (md5 → bucket + sign), accumulated and
    L2-normalized. Deterministic, vocabulary-free, and a real public
    technique (the hashing trick) — not a placeholder RNG."""
    vec = np.zeros(dim, dtype=np.float64)
    for t in tokenize(text):
        h = hashlib.md5(t.encode()).digest()
        idx = int.from_bytes(h[:4], "little") % dim
        vec[idx] += 1.0 if h[4] & 1 else -1.0
    n = float(np.linalg.norm(vec))
    return (vec / n if n else vec).tolist()


def _embeddings_response(model: str, inputs: list[str]) -> dict:
    """OpenAI embeddings response shape (lib.rs:115-141)."""
    data = [{"object": "embedding", "index": i,
             "embedding": text_hash_embedding(text)}
            for i, text in enumerate(inputs)]
    n_tokens = sum(len(tokenize(t)) for t in inputs)
    return {"object": "list", "data": data, "model": model,
            "usage": {"prompt_tokens": n_tokens,
                      "total_tokens": n_tokens}}


class _Handler(BaseHTTPRequestHandler):
    reader = None          # IndexReader, set by make_server
    server_version = "embedanything-spark/0.1"

    def log_message(self, fmt, *args):   # quiet by default
        pass

    def _send(self, code: int, payload: dict) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _body(self) -> dict:
        n = int(self.headers.get("Content-Length", 0))
        return json.loads(self.rfile.read(n) or b"{}")

    def do_GET(self):
        if self.path == "/health":
            meta = dict(self.reader.meta) if self.reader else {}
            self._send(200, {"status": "healthy",
                             "n_docs": meta.get("n_docs"),
                             "avgdl": meta.get("avgdl")})
        else:
            self._send(404, {"error": f"no route {self.path}"})

    def do_POST(self):
        try:
            req = self._body()
        except json.JSONDecodeError as e:
            return self._send(400, {"error": f"bad json: {e}"})
        if self.path == "/v1/embeddings":
            inputs = req.get("input", [])
            if isinstance(inputs, str):
                inputs = [inputs]
            if not inputs or not all(isinstance(x, str) for x in inputs):
                return self._send(
                    400, {"error": "input must be a string or "
                                   "non-empty list of strings"})
            return self._send(200, _embeddings_response(
                req.get("model", "hashing-trick-64"), inputs))
        if self.path == "/v1/search":
            if self.reader is None:
                return self._send(503, {"error": "no index configured"})
            import pandas as pd
            # build + validate + search all inside the try: a
            # non-numeric k, or queries rows missing
            # query_id/query_text/k, must surface as a 400 JSON
            # error, never a dropped connection
            try:
                if "queries" in req:
                    q = pd.DataFrame(req["queries"])
                    missing = {"query_id", "query_text",
                               "k"} - set(q.columns)
                    if missing:
                        raise ValueError(
                            "queries rows missing fields: "
                            f"{sorted(missing)}")
                else:
                    q = pd.DataFrame(
                        {"query_id": [0],
                         "query_text": [req.get("query", "")],
                         "k": [int(req.get("k", 10))]})
                out = self.reader.search_local(q)
            except (KeyError, ValueError, TypeError,
                    AttributeError) as e:
                return self._send(400, {"error": str(e)})
            return self._send(200, {
                "results": out.to_dict(orient="records")})
        return self._send(404, {"error": f"no route {self.path}"})


def make_server(index_root: str | None, host: str = "127.0.0.1",
                port: int = 0) -> ThreadingHTTPServer:
    """Build (not start) the server; ``port=0`` picks a free port
    (``server.server_address[1]``). ``index_root=None`` serves only
    /health and /v1/embeddings."""
    handler = type("Handler", (_Handler,), {})
    if index_root is not None:
        from embedanything_spark.index.query import IndexReader
        handler.reader = IndexReader(None, index_root)
    return ThreadingHTTPServer((host, port), handler)


def serve(index_root: str | None, host: str = "0.0.0.0",
          port: int = 8080) -> None:
    srv = make_server(index_root, host, port)
    print(f"serving on http://{host}:{srv.server_address[1]} "
          f"(index={index_root})", flush=True)
    srv.serve_forever()
