"""Served-model inference stage (stages/inference.py): retry / timeout /
degradation semantics against injected transports, plus a REAL localhost
HTTP server driven through a Ray Data actor pool — the production pattern
(reference submission/utils/extractor.py:12-181) end-to-end."""

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pyarrow as pa
import pytest
import ray.data

from invoice_extraction_ray.config import (
    SERVED_FAIL_CODE,
    SERVED_FAIL_MOD,
    SERVED_LONG_MIN_TOKENS,
)
from invoice_extraction_ray.stages.inference import (
    ERR_CONNECTION,
    HttpTransport,
    ServedModelClient,
    TransportError,
    stub_label_transport,
)


def _batch(texts, ids=None):
    ids = ids if ids is not None else list(range(len(texts)))
    return pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})


def test_stub_transport_labels_and_per_row_degradation():
    texts = [
        "one two three",  # 3 tokens -> short
        " ".join(["w"] * SERVED_LONG_MIN_TOKENS),  # exactly threshold -> long
        " ".join(["w"] * SERVED_FAIL_MOD),  # fail mod -> error row
        None,  # 0 tokens -> 0 % mod == 0 -> error row
    ]
    out = ServedModelClient(transport=stub_label_transport)(_batch(texts))
    assert out.column("label").to_pylist() == ["short", "long", None, None]
    assert out.column("error").to_pylist() == [
        None,
        None,
        SERVED_FAIL_CODE,
        SERVED_FAIL_CODE,
    ]


class _FlakyTransport:
    """Raises retryably on the first ``fail_n`` calls, then succeeds."""

    def __init__(self, fail_n):
        self.fail_n = fail_n
        self.calls = 0

    def __call__(self, texts):
        self.calls += 1
        if self.calls <= self.fail_n:
            raise TransportError("http_503")
        return [{"label": "ok"} for _ in texts]


def test_retry_recovers_from_transient_failures():
    tr = _FlakyTransport(fail_n=2)
    stage = ServedModelClient(transport=tr, max_retries=2, backoff_s=0.001)
    out = stage(_batch(["a", "b"]))
    assert out.column("label").to_pylist() == ["ok", "ok"]
    assert out.column("error").to_pylist() == [None, None]
    assert tr.calls == 3  # two failures + the success
    assert stage.attempts == 3


def test_retry_exhaustion_degrades_never_raises():
    tr = _FlakyTransport(fail_n=10**9)
    stage = ServedModelClient(transport=tr, max_retries=2, backoff_s=0.001)
    out = stage(_batch(["a", "b", "c"]))
    assert out.column("label").to_pylist() == [None, None, None]
    assert out.column("error").to_pylist() == ["http_503"] * 3
    assert stage.attempts == 3  # bounded: 1 + max_retries


def test_broken_custom_transport_degrades_to_connection_error():
    stage = ServedModelClient(
        transport=lambda texts: 1 / 0, max_retries=0, backoff_s=0.001
    )
    out = stage(_batch(["a"]))
    assert out.column("error").to_pylist() == [ERR_CONNECTION]


def test_micro_batch_isolation():
    """A request-level failure degrades ONLY its own micro-batch."""

    class _FailSecond:
        def __init__(self):
            self.calls = 0

        def __call__(self, texts):
            self.calls += 1
            if self.calls == 2:
                raise TransportError("http_500")
            return [{"label": "ok"} for _ in texts]

    stage = ServedModelClient(
        transport=_FailSecond(), max_retries=0, micro_batch=2, backoff_s=0.001
    )
    out = stage(_batch(["a", "b", "c", "d"]))
    assert out.column("label").to_pylist() == ["ok", "ok", None, None]
    assert out.column("error").to_pylist() == [None, None, "http_500", "http_500"]


def test_constructor_requires_exactly_one_of_endpoint_transport():
    with pytest.raises(ValueError):
        ServedModelClient()
    with pytest.raises(ValueError):
        ServedModelClient(endpoint="http://x", transport=stub_label_transport)


# ---------------------------------------------------------------------------
# real localhost HTTP server through a Ray actor pool
# ---------------------------------------------------------------------------


class _Handler(BaseHTTPRequestHandler):
    def do_POST(self):
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        results = stub_label_transport(body["texts"])
        payload = json.dumps({"results": results}).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def log_message(self, *a):  # keep pytest output clean
        pass


@pytest.fixture()
def http_endpoint():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/infer"
    srv.shutdown()
    srv.server_close()


def test_http_transport_roundtrip(http_endpoint):
    tr = HttpTransport(http_endpoint, timeout_s=10.0)
    assert tr(["one two three"]) == [{"label": "short"}]


def test_http_actor_pool_end_to_end(http_endpoint, ray_session):
    """The full production shape: Ray Data actor pool holding an HTTP client
    session, workers calling the local endpoint, degradation columns out."""
    texts = ["short text here", " ".join(["tok"] * 50), " ".join(["x"] * 13)] * 20
    ds = ray.data.from_arrow(_batch(texts)).map_batches(
        ServedModelClient,
        fn_constructor_kwargs={"endpoint": http_endpoint, "timeout_s": 10.0},
        batch_format="pyarrow",
        batch_size=16,
        concurrency=2,
    )
    rows = ds.take_all()
    assert len(rows) == 60
    by_text = {}
    for r in rows:
        by_text.setdefault(r["text"], set()).add((r["label"], r["error"]))
    assert by_text["short text here"] == {("short", None)}
    assert by_text[" ".join(["tok"] * 50)] == {("long", None)}
    assert by_text[" ".join(["x"] * 13)] == {(None, SERVED_FAIL_CODE)}


def test_http_connection_error_degrades(ray_session):
    """Dead endpoint: every row degrades, the stage never raises."""
    stage = ServedModelClient(
        endpoint="http://127.0.0.1:9/nope", max_retries=1, backoff_s=0.001
    )
    out = stage(_batch(["a", "b"]))
    assert out.column("label").to_pylist() == [None, None]
    assert set(out.column("error").to_pylist()) <= {ERR_CONNECTION, "timeout"}


def test_embedding_client_rows_and_degradation():
    from invoice_extraction_ray.stages.inference import (
        ServedEmbeddingClient,
        stub_embed_transport,
    )

    texts = ["Ab1 cd", " ".join(["x"] * SERVED_FAIL_MOD), None]
    out = ServedEmbeddingClient(transport=stub_embed_transport)(_batch(texts))
    embs = out.column("embedding").to_pylist()
    # "Ab1 cd": 2 tokens, 6 chars, 1 digit, 1 uppercase
    assert embs[0] == [2.0, 6.0, 1.0, 1.0]
    assert embs[1] is None and embs[2] is None  # fail-mod row and empty row
    assert out.column("error").to_pylist() == [
        None,
        SERVED_FAIL_CODE,
        SERVED_FAIL_CODE,
    ]


def test_embedding_client_request_level_degradation():
    from invoice_extraction_ray.stages.inference import ServedEmbeddingClient

    stage = ServedEmbeddingClient(
        transport=_FlakyTransport(fail_n=10**9), max_retries=1, backoff_s=0.001
    )
    out = stage(_batch(["a", "b"]))
    assert out.column("embedding").to_pylist() == [None, None]
    assert out.column("error").to_pylist() == ["http_503"] * 2


def test_reward_client_rows_and_degradation():
    from invoice_extraction_ray.config import SERVED_REWARD_SCALE
    from invoice_extraction_ray.stages.inference import (
        ServedRewardClient,
        stub_reward_transport,
    )

    texts = ["Ab1 cd", " ".join(["x"] * SERVED_FAIL_MOD), None]
    out = ServedRewardClient(transport=stub_reward_transport)(_batch(texts))
    rewards = out.column("reward_e4").to_pylist()
    # "Ab1 cd": 2 tokens, 6 chars -> floor(SCALE*2 / 7)
    assert rewards[0] == (SERVED_REWARD_SCALE * 2) // 7
    assert rewards[1] is None and rewards[2] is None
    assert out.column("error").to_pylist() == [
        None,
        SERVED_FAIL_CODE,
        SERVED_FAIL_CODE,
    ]


def test_reward_client_request_level_degradation():
    from invoice_extraction_ray.stages.inference import ServedRewardClient

    stage = ServedRewardClient(
        transport=_FlakyTransport(fail_n=10**9), max_retries=1, backoff_s=0.001
    )
    out = stage(_batch(["a", "b"]))
    assert out.column("reward_e4").to_pylist() == [None, None]
    assert out.column("error").to_pylist() == ["http_503"] * 2
