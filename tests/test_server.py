"""HTTP serving tier: /health, /v1/embeddings (OpenAI shape),
/v1/search parity with IndexReader.search_local — and the no-Spark
contract (IndexReader(None, root) serves without a session)."""

import json
import threading
import urllib.request

import numpy as np
import pandas as pd
import pytest

from embedanything_spark.index.build import IndexWriter
from embedanything_spark.index.query import IndexReader
from embedanything_spark.server import make_server, text_hash_embedding


@pytest.fixture(scope="module")
def index_dir(tmp_path_factory, transcripts_df):
    root = tmp_path_factory.mktemp("srv_idx")
    IndexWriter(str(root), block_range=256, num_partitions=4) \
        .build(transcripts_df)
    return str(root)


@pytest.fixture(scope="module")
def server(index_dir):
    srv = make_server(index_dir, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=30) as r:
        return r.status, json.loads(r.read())


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=60) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_health(server):
    code, body = _get(f"{server}/health")
    assert code == 200
    assert body["status"] == "healthy"
    assert body["n_docs"] > 0


def test_embeddings_openai_shape(server):
    code, body = _post(f"{server}/v1/embeddings",
                       {"model": "m", "input": ["hello world", "x"]})
    assert code == 200
    assert body["object"] == "list" and body["model"] == "m"
    assert [d["index"] for d in body["data"]] == [0, 1]
    vec = np.array(body["data"][0]["embedding"])
    assert vec.shape == (64,)
    assert abs(np.linalg.norm(vec) - 1.0) < 1e-9
    assert body["data"][0]["embedding"] == text_hash_embedding(
        "hello world")
    assert body["usage"]["prompt_tokens"] == 3
    # string input accepted like the reference's enum input
    code, one = _post(f"{server}/v1/embeddings", {"input": "hello"})
    assert code == 200 and len(one["data"]) == 1


def test_embeddings_rejects_bad_input(server):
    code, body = _post(f"{server}/v1/embeddings", {"input": []})
    assert code == 400 and "error" in body
    code, body = _post(f"{server}/v1/embeddings", {"input": [1, 2]})
    assert code == 400


def test_search_parity_with_search_local(server, index_dir,
                                         queries_pdf):
    reader = IndexReader(None, index_dir)   # no-Spark serving reader
    want = reader.search_local(queries_pdf.head(3))
    code, body = _post(f"{server}/v1/search", {
        "queries": queries_pdf.head(3).to_dict(orient="records")})
    assert code == 200
    got = pd.DataFrame(body["results"])
    pd.testing.assert_frame_equal(
        got[want.columns], want, check_dtype=False)


def test_search_single_query_form(server):
    code, body = _post(f"{server}/v1/search",
                       {"query": "term00001", "k": 3})
    assert code == 200
    ranks = [r["rank"] for r in body["results"]]
    assert ranks == sorted(ranks) and len(ranks) <= 3


def test_search_empty_query(server):
    code, body = _post(f"{server}/v1/search", {"query": "", "k": 3})
    assert code == 200 and body["results"] == []


def test_unknown_route_404(server):
    code, body = _post(f"{server}/v1/nope", {})
    assert code == 404


def test_search_malformed_payloads_400(server):
    """Malformed /v1/search bodies return a JSON 400 — never a
    dropped connection: non-numeric k, and queries rows lacking the
    required fields."""
    code, body = _post(f"{server}/v1/search",
                       {"query": "term00001", "k": "lots"})
    assert code == 400 and "error" in body
    code, body = _post(f"{server}/v1/search",
                       {"queries": [{"q": "missing fields"}]})
    assert code == 400 and "error" in body
    code, body = _post(f"{server}/v1/search",
                       {"queries": "not-a-list"})
    assert code == 400 and "error" in body
