"""Served-model inference stage — an actor pool holding a client session
that calls an external inference endpoint with timeout, bounded retry and
per-row error-column degradation.

This is the engine counterpart of the reference's only cross-process stage
(``submission/utils/extractor.py:12-181``: an HTTP client with a 120 s
timeout that degrades connection errors, HTTP status errors and response
parse errors into an error field instead of failing the pipeline), and the
lifecycle pattern every 100-TB labeling / embedding / reward-scoring
pipeline needs:

- the CLIENT SESSION is actor state — built once per actor in
  ``__init__`` (a Ray Data actor-pool ``map_batches(Cls, concurrency=N)``
  stage), never per batch;
- requests go out in MICRO-BATCHES (bounded payload per call, so a slow
  endpoint backpressures the stream through Ray's streaming executor
  instead of buffering the corpus);
- transient failures retry with exponential backoff a bounded number of
  times; terminal failures degrade to a per-row ``error`` column and the
  stage NEVER raises — one dead endpoint must not kill a week-long run;
- degradation categories mirror the reference: ``connection_error``,
  ``timeout``, ``http_<status>``, ``parse_error``.

The transport is injectable (any ``Callable[[list[str]], list[dict]]``)
so tests and the deterministic oracle query run the identical stage code
with a local stub while production points ``endpoint=`` at a real server.
"""

from __future__ import annotations

import json
import time
from typing import Callable, Optional

import pyarrow as pa

# request-level degradation codes (reference extractor.py:126-181 ladder)
ERR_CONNECTION = "connection_error"
ERR_TIMEOUT = "timeout"
ERR_PARSE = "parse_error"

# deterministic stub semantics — shared with the oracle SQL through
# config.py (CLAUDE.md shared-semantics rule)
from ..config import SERVED_FAIL_CODE as STUB_FAIL_CODE
from ..config import SERVED_FAIL_MOD as STUB_FAIL_MOD
from ..config import SERVED_LONG_MIN_TOKENS as STUB_LONG_MIN_TOKENS


class TransportError(Exception):
    """A retryable request-level failure; ``code`` is the error-column
    value written if retries exhaust."""

    def __init__(self, code: str):
        super().__init__(code)
        self.code = code


class HttpTransport:
    """POST ``{"texts": [...]}`` to ``endpoint``, expect
    ``{"results": [{"label": ...} | {"error": ...}, ...]}``.  Holds the
    opener (session analogue) for the actor's lifetime."""

    def __init__(self, endpoint: str, timeout_s: float = 120.0):
        import urllib.request

        self.endpoint = endpoint
        self.timeout_s = timeout_s
        self._opener = urllib.request.build_opener()

    def __call__(self, texts: list) -> list:
        import socket
        import urllib.error
        import urllib.request

        body = json.dumps({"texts": texts}).encode()
        req = urllib.request.Request(
            self.endpoint, data=body, headers={"Content-Type": "application/json"}
        )
        try:
            with self._opener.open(req, timeout=self.timeout_s) as resp:
                raw = resp.read()
        except urllib.error.HTTPError as e:  # status line came back
            raise TransportError(f"http_{e.code}") from e
        except (socket.timeout, TimeoutError) as e:
            raise TransportError(ERR_TIMEOUT) from e
        except urllib.error.URLError as e:
            if isinstance(getattr(e, "reason", None), (socket.timeout, TimeoutError)):
                raise TransportError(ERR_TIMEOUT) from e
            raise TransportError(ERR_CONNECTION) from e
        except OSError as e:
            raise TransportError(ERR_CONNECTION) from e
        try:
            results = json.loads(raw)["results"]
            if not isinstance(results, list) or len(results) != len(texts):
                raise ValueError("results shape")
        except (ValueError, KeyError, TypeError) as e:
            raise TransportError(ERR_PARSE) from e
        return results


def stub_label_transport(texts: list) -> list:
    """Deterministic local stand-in for a served labeling model, used by
    the ``served_labels`` oracle query and tests: whitespace token count
    (identical to ``str.split()`` / RE2 ``\\S+`` — the repo's
    oracle-verified tokenizer) drives a short/long label; every row whose
    token count is divisible by ``STUB_FAIL_MOD`` simulates a per-row
    server-side failure so the degradation path is exercised (and oracled)
    on real data."""
    out = []
    for s in texts:
        n = len((s or "").split())
        if n % STUB_FAIL_MOD == 0:
            out.append({"error": STUB_FAIL_CODE})
        else:
            out.append({"label": "long" if n >= STUB_LONG_MIN_TOKENS else "short"})
    return out


class ServedModelClient:
    """Callable-class actor stage: ``map_batches(ServedModelClient,
    fn_constructor_kwargs=..., concurrency=pool_size())``.

    Exactly one of ``endpoint`` / ``transport`` must be given.  Output is
    the input batch plus a ``label`` column and an ``error`` column (both
    nullable strings; exactly one is non-null per row)."""

    def __init__(
        self,
        endpoint: Optional[str] = None,
        transport: Optional[Callable[[list], list]] = None,
        timeout_s: float = 120.0,
        max_retries: int = 2,
        backoff_s: float = 0.05,
        micro_batch: int = 32,
        text_col: str = "text",
    ):
        if (endpoint is None) == (transport is None):
            raise ValueError("pass exactly one of endpoint / transport")
        self.transport = transport or HttpTransport(endpoint, timeout_s)
        self.max_retries = max_retries
        self.backoff_s = backoff_s
        self.micro_batch = micro_batch
        self.text_col = text_col
        self.attempts = 0  # per-actor request-attempt telemetry

    def _call_with_retry(self, texts: list):
        """Returns the per-row results list, or a degradation code string
        when retries exhaust.  Never raises."""
        delay = self.backoff_s
        for attempt in range(self.max_retries + 1):
            self.attempts += 1
            try:
                return self.transport(texts)
            except TransportError as e:
                code = e.code
            except Exception:  # a broken custom transport degrades too
                code = ERR_CONNECTION
            if attempt < self.max_retries:
                time.sleep(delay)
                delay *= 2
        return code

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t.column(self.text_col).to_pylist()
        labels: list = []
        errors: list = []
        for lo in range(0, len(texts), self.micro_batch):
            chunk = texts[lo : lo + self.micro_batch]
            result = self._call_with_retry(chunk)
            if isinstance(result, str):  # request-level degradation
                labels.extend([None] * len(chunk))
                errors.extend([result] * len(chunk))
                continue
            for r in result:
                if isinstance(r, dict) and "label" in r:
                    labels.append(r["label"])
                    errors.append(None)
                elif isinstance(r, dict) and "error" in r:
                    labels.append(None)
                    errors.append(str(r["error"]))
                else:  # row-level parse degradation
                    labels.append(None)
                    errors.append(ERR_PARSE)
        return t.append_column("label", pa.array(labels, pa.string())).append_column(
            "error", pa.array(errors, pa.string())
        )


def stub_embed_transport(texts: list) -> list:
    """Deterministic local stand-in for a served EMBEDDING model: a 4-dim
    vector of exact text statistics (whitespace tokens, characters, ASCII
    digits, ASCII uppercase — each SQL-mirrorable), with the same
    per-row failure rule as the label stub so the degradation path stays
    exercised.  ASCII character classes match RE2/DuckDB exactly."""
    import re

    digits = re.compile(r"[0-9]")
    upper = re.compile(r"[A-Z]")
    out = []
    for s in texts:
        s = s or ""
        n = len(s.split())
        if n % STUB_FAIL_MOD == 0:
            out.append({"error": STUB_FAIL_CODE})
            continue
        out.append(
            {
                "embedding": [
                    float(n),
                    float(len(s)),
                    float(len(digits.findall(s))),
                    float(len(upper.findall(s))),
                ]
            }
        )
    return out


class ServedEmbeddingClient(ServedModelClient):
    """The embedding member of the served-model triad (labeling /
    embedding / reward scoring): identical session + micro-batch + retry +
    degradation lifecycle, but rows gain an ``embedding`` list<float32>
    column (null on error) instead of a label."""

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t.column(self.text_col).to_pylist()
        embs: list = []
        errors: list = []
        for lo in range(0, len(texts), self.micro_batch):
            chunk = texts[lo : lo + self.micro_batch]
            result = self._call_with_retry(chunk)
            if isinstance(result, str):
                embs.extend([None] * len(chunk))
                errors.extend([result] * len(chunk))
                continue
            for r in result:
                if isinstance(r, dict) and "embedding" in r:
                    embs.append([float(x) for x in r["embedding"]])
                    errors.append(None)
                elif isinstance(r, dict) and "error" in r:
                    embs.append(None)
                    errors.append(str(r["error"]))
                else:
                    embs.append(None)
                    errors.append(ERR_PARSE)
        return t.append_column(
            "embedding", pa.array(embs, pa.list_(pa.float32()))
        ).append_column("error", pa.array(errors, pa.string()))


def served_embeddings(sf_dir: str) -> "ray.data.Dataset":  # noqa: F821
    """Documents embedded by the (stubbed) served model — the embedding
    twin of :func:`served_labels`.  Output: (doc_id, embedding, error)."""
    import ray.data

    from ..ops._util import pool_size

    return (
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(
            ServedEmbeddingClient,
            fn_constructor_kwargs={"transport": stub_embed_transport},
            batch_format="pyarrow",
            batch_size=512,
            concurrency=pool_size(),
        )
        .map_batches(
            lambda t: t.select(["doc_id", "embedding", "error"]),
            batch_format="pyarrow",
        )
    )


def served_labels(sf_dir: str) -> "ray.data.Dataset":  # noqa: F821
    """Documents labeled by the (stubbed) served model — the T7/E1 registry
    query: actor-pool inference with per-row degradation over the
    ``documents`` table.  Output: (doc_id, label, error)."""
    import ray.data

    from ..ops._util import pool_size

    return (
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(
            ServedModelClient,
            fn_constructor_kwargs={"transport": stub_label_transport},
            batch_format="pyarrow",
            batch_size=512,
            concurrency=pool_size(),
        )
        .map_batches(
            lambda t: t.select(["doc_id", "label", "error"]),
            batch_format="pyarrow",
        )
    )


def stub_reward_transport(texts: list) -> list:
    """Deterministic local stand-in for a served REWARD model (quality /
    preference scorer): token density (whitespace tokens per character) as
    exact e4 fixed point — floor((SCALE * n_tokens) / (n_chars + 1)), pure
    non-negative integer arithmetic on both engines — with the same per-row
    failure rule as the label/embedding stubs."""
    from ..config import SERVED_REWARD_SCALE

    out = []
    for s in texts:
        s = s or ""
        n = len(s.split())
        if n % STUB_FAIL_MOD == 0:
            out.append({"error": STUB_FAIL_CODE})
        else:
            out.append({"reward_e4": (SERVED_REWARD_SCALE * n) // (len(s) + 1)})
    return out


class ServedRewardClient(ServedModelClient):
    """The reward member of the served-model triad (labeling / embedding /
    REWARD scoring — the RLHF/quality-filter scorer): identical session +
    micro-batch + retry + degradation lifecycle; rows gain a nullable
    ``reward_e4`` int64 column."""

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t.column(self.text_col).to_pylist()
        rewards: list = []
        errors: list = []
        for lo in range(0, len(texts), self.micro_batch):
            chunk = texts[lo : lo + self.micro_batch]
            result = self._call_with_retry(chunk)
            if isinstance(result, str):
                rewards.extend([None] * len(chunk))
                errors.extend([result] * len(chunk))
                continue
            for r in result:
                if isinstance(r, dict) and "reward_e4" in r:
                    rewards.append(int(r["reward_e4"]))
                    errors.append(None)
                elif isinstance(r, dict) and "error" in r:
                    rewards.append(None)
                    errors.append(str(r["error"]))
                else:
                    rewards.append(None)
                    errors.append(ERR_PARSE)
        return t.append_column(
            "reward_e4", pa.array(rewards, pa.int64())
        ).append_column("error", pa.array(errors, pa.string()))


def served_rewards(sf_dir: str) -> "ray.data.Dataset":  # noqa: F821
    """Documents scored by the (stubbed) served reward model — completes
    the served-model triad.  Output: (doc_id, reward_e4, error)."""
    import ray.data

    from ..ops._util import pool_size

    return (
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(
            ServedRewardClient,
            fn_constructor_kwargs={"transport": stub_reward_transport},
            batch_format="pyarrow",
            batch_size=512,
            concurrency=pool_size(),
        )
        .map_batches(
            lambda t: t.select(["doc_id", "reward_e4", "error"]),
            batch_format="pyarrow",
        )
    )
