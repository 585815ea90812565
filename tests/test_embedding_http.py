"""OpenAI-compatible HTTP embedding client (sources/embedding.py):
loopback mock-server tests mirroring the reference's httpmock suite
(crates/embedding/src/lib.rs:50-160) — success, malformed/empty
response, HTTP error passthrough, retry-then-succeed on 429, and the
full Spark text2vec path against the live local server."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np
import pytest

from pgvecto_rs_spark.sources.embedding import (
    EmbeddingError,
    openai_provider,
    text2vec,
)

DIMS = 4


class _Handler(BaseHTTPRequestHandler):
    # class-level knobs set per test
    mode = "ok"
    fail_first = 0
    seen: list[dict] = []

    def do_POST(self):  # noqa: N802
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        type(self).seen.append(
            {"path": self.path, "auth": self.headers.get("Authorization"), "body": body}
        )
        if type(self).fail_first > 0:
            type(self).fail_first -= 1
            self.send_response(429)
            self.end_headers()
            return
        if type(self).mode == "empty":
            payload = {"object": "list", "data": [], "model": body["model"]}
        elif type(self).mode == "http500":
            self.send_response(500)
            self.end_headers()
            return
        elif type(self).mode == "http401":
            self.send_response(401)
            self.end_headers()
            return
        else:
            # deterministic embedding: dim d of text i = len(text)*10 + d
            payload = {
                "object": "list",
                "model": body["model"],
                "data": [
                    {
                        "object": "embedding",
                        "index": i,
                        "embedding": [len(t) * 10.0 + d for d in range(DIMS)],
                    }
                    # reversed: client must re-sort by index
                    for i, t in reversed(list(enumerate(body["input"])))
                ],
                "usage": {"prompt_tokens": 0, "total_tokens": 0},
            }
        out = json.dumps(payload).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(out)))
        self.end_headers()
        self.wfile.write(out)

    def log_message(self, *a):  # quiet
        pass


@pytest.fixture()
def server():
    _Handler.mode, _Handler.fail_first, _Handler.seen = "ok", 0, []
    srv = HTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}/v1"
    srv.shutdown()


def _prov(server, **kw):
    kw.setdefault("retries", 0)
    return openai_provider(
        base_url=server, api_key="fake-key", model="mock-model", **kw
    )


def test_batched_call_success(server):
    mat = _prov(server)(["ab", "xyzw"])
    assert mat.shape == (2, DIMS)
    # order restored from the index field despite reversed response
    assert mat[0].tolist() == [20.0 + d for d in range(DIMS)]
    assert mat[1].tolist() == [40.0 + d for d in range(DIMS)]
    req = _Handler.seen[0]
    assert req["path"].endswith("/embeddings")
    assert req["auth"] == "Bearer fake-key"
    assert req["body"]["input"] == ["ab", "xyzw"]


def test_empty_response_raises(server):
    _Handler.mode = "empty"
    with pytest.raises(EmbeddingError, match="0 embeddings for 1"):
        _prov(server)(["hello"])


def test_http_error_no_retry_on_401(server):
    _Handler.mode = "http401"
    with pytest.raises(EmbeddingError, match="401"):
        _prov(server, retries=3)(["x"])
    assert len(_Handler.seen) == 1, "auth errors must not retry"


def test_retry_then_succeed_on_429(server):
    _Handler.fail_first = 2
    mat = _prov(server, retries=3)(["ok"])
    assert mat.shape == (1, DIMS)
    assert len(_Handler.seen) == 3


def test_retries_exhausted_raises(server):
    _Handler.mode = "http500"
    with pytest.raises(EmbeddingError, match="500"):
        _prov(server, retries=1)(["x"])
    assert len(_Handler.seen) == 2


def test_spark_text2vec_over_live_server(spark, server):
    df = spark.createDataFrame(
        [(1, "ab"), (2, "defg"), (3, None)], "id long, text string"
    )
    col = text2vec(_prov(server), DIMS)("text")
    rows = {r["id"]: r["emb"] for r in df.select("id", col.alias("emb")).collect()}
    assert rows[1] == [20.0 + d for d in range(DIMS)]
    assert rows[2] == [40.0 + d for d in range(DIMS)]
    assert rows[3] == [0.0 + d for d in range(DIMS)]  # NULL -> "" (len 0)
