"""External embedding source — the ``text2vec_openai`` analogue.

Reference: src/embedding/mod.rs:1-20 + crates/embedding/ call an
OpenAI-compatible HTTP endpoint per text and return a ``vector``; GUCs
hold the base URL / API key (src/gucs/embedding.rs:24-47).

Spark design: batch embedding is a Pandas UDF so one Arrow batch maps
to one provider call (the right granularity for rate-limited APIs).
This runtime has no network, so:

- ``text2vec(provider_fn)`` wires any user-supplied
  ``list[str] -> ndarray`` callable (the production path — inject an
  HTTP client there);
- ``text2vec_hash`` is the built-in deterministic offline provider
  (feature-hashed unigram embedding, L2-normalized) so pipelines and
  the ANN layer can run end-to-end without a network.
"""

from __future__ import annotations

import hashlib
import json
import time
import urllib.error
import urllib.request
from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "EmbeddingError",
    "embedding_options",
    "get_option",
    "openai_provider",
    "set_option",
    "text2vec",
    "text2vec_hash",
    "text2vec_openai",
]


# GUC analogue (src/gucs/embedding.rs:24-47, openai_options.slt): the
# provider settings a deployment points at an OpenAI-compatible
# endpoint.  SET/SHOW semantics; consumed by whoever constructs the
# provider callable for text2vec.
_OPTIONS: dict[str, str] = {
    "openai_base_url": "https://api.openai.com/v1",
    "openai_api_key": "",
    "openai_model": "text-embedding-3-small",
    "openai_timeout_secs": "30",
    "openai_retries": "2",
}


def set_option(name: str, value: str) -> None:
    """``SET vectors.<name> TO <value>`` analogue (known keys only)."""
    if name not in _OPTIONS:
        raise KeyError(f"unknown embedding option {name!r}")
    _OPTIONS[name] = value


def get_option(name: str) -> str:
    """``SHOW vectors.<name>`` analogue."""
    return _OPTIONS[name]


def embedding_options() -> dict[str, str]:
    """Snapshot of all embedding provider options."""
    return dict(_OPTIONS)


def text2vec(provider: Callable[[list[str]], "np.ndarray"], dims: int) -> Callable[[Column], Column]:
    """Build an embedding Column function from a batch provider."""

    @F.pandas_udf("array<float>")
    def embed(texts: pd.Series) -> pd.Series:
        mat = provider(texts.fillna("").tolist())
        mat = np.asarray(mat, dtype=np.float32)
        if mat.shape != (len(texts), dims):
            raise ValueError(f"provider returned {mat.shape}, expected ({len(texts)}, {dims})")
        return pd.Series([row.tolist() for row in mat])

    return embed


class EmbeddingError(RuntimeError):
    """Embedding-provider failure (crates/embedding/src/openai.rs
    EmbeddingError): carries the provider's hint after retries are
    exhausted."""

    def __init__(self, hint: str) -> None:
        super().__init__(f"Error happens at embedding. INFORMATION: hint = {hint}")
        self.hint = hint


def openai_provider(
    base_url: str | None = None,
    api_key: str | None = None,
    model: str | None = None,
    dims: int | None = None,
    timeout_secs: float | None = None,
    retries: int | None = None,
) -> Callable[[list[str]], np.ndarray]:
    """Batch provider for an OpenAI-compatible ``POST {base}/embeddings``
    endpoint — the real-HTTP twin of the reference's blocking client
    (crates/embedding/src/lib.rs:14-48; GUC defaults
    src/gucs/embedding.rs:24-47).  Differences, deliberate:

    - one request per Arrow batch (``input`` as a list — the documented
      OpenAI batch form) instead of the reference's call-per-text: at
      corpus scale per-text HTTP round-trips dominate;
    - JSON body (the current API contract) rather than the reference's
      form encoding;
    - bounded exponential-backoff retries on 429/5xx/transport errors
      (``openai_retries``), since a 1000-executor fan-in WILL see rate
      limits.

    Unset arguments fall back to the session options (the GUCs).  The
    returned callable is what :func:`text2vec` expects; it runs inside
    executors' Python workers, so it must stay picklable (module-level
    function + closure of plain values — no session objects).
    """
    base = (base_url if base_url is not None else get_option("openai_base_url")).rstrip("/")
    key = api_key if api_key is not None else get_option("openai_api_key")
    mdl = model if model is not None else get_option("openai_model")
    tmo = float(timeout_secs if timeout_secs is not None else get_option("openai_timeout_secs"))
    tries = 1 + int(retries if retries is not None else get_option("openai_retries"))

    def provider(texts: list[str]) -> np.ndarray:
        body = {"model": mdl, "input": texts}
        if dims is not None:
            body["dimensions"] = int(dims)
        req = urllib.request.Request(
            f"{base}/embeddings",
            data=json.dumps(body).encode(),
            headers={
                "Content-Type": "application/json",
                "Authorization": f"Bearer {key}",
            },
            method="POST",
        )
        last_hint = "unknown"
        for attempt in range(tries):
            try:
                with urllib.request.urlopen(req, timeout=tmo) as resp:
                    payload = json.loads(resp.read().decode())
                data = sorted(payload["data"], key=lambda d: d["index"])
                if len(data) != len(texts):
                    raise EmbeddingError(
                        f"service returned {len(data)} embeddings for {len(texts)} inputs"
                    )
                return np.asarray([d["embedding"] for d in data], dtype=np.float32)
            except urllib.error.HTTPError as e:
                last_hint = f"HTTP {e.code}: {e.reason}"
                if e.code not in (429, 500, 502, 503, 504):
                    raise EmbeddingError(last_hint) from e
            except EmbeddingError:
                raise
            except (urllib.error.URLError, OSError, ValueError, KeyError) as e:
                last_hint = str(e)
            if attempt + 1 < tries:
                time.sleep(min(8.0, 0.2 * 2**attempt))
        raise EmbeddingError(last_hint)

    return provider


def text2vec_openai(
    text: Column | str, dims: int, model: str | None = None, **client_opts
) -> Column:
    """``text2vec_openai(text, model)`` analogue over the live HTTP
    client: one Arrow batch -> one batched ``/embeddings`` call."""
    c = F.col(text) if isinstance(text, str) else text
    return text2vec(openai_provider(model=model, dims=dims, **client_opts), dims)(c)


def _hash_provider(dims: int, seed: int = 42) -> Callable[[list[str]], np.ndarray]:
    # token -> (slot, sign), memoized across rows/batches: natural-text
    # vocabularies repeat tokens heavily, and the per-token md5 in pure
    # Python was the whole cost of the embedding pass (measured ~3x at
    # corpus scale).  Bounded by vocabulary size, worker-lifetime.
    cache: dict[str, tuple[int, float]] = {}

    def provider(texts: list[str]) -> np.ndarray:
        out = np.zeros((len(texts), dims), dtype=np.float64)
        for r, t in enumerate(texts):
            row = out[r]
            for tok in t.lower().split():
                hit = cache.get(tok)
                if hit is None:
                    h = hashlib.md5(f"{seed}:{tok}".encode()).digest()
                    hit = (
                        int.from_bytes(h[:4], "little") % dims,
                        1.0 if h[4] & 1 else -1.0,
                    )
                    cache[tok] = hit
                row[hit[0]] += hit[1]
            n = np.linalg.norm(row)
            if n > 0:
                row /= n
        return out.astype(np.float32)

    return provider


def text2vec_hash(text: Column | str, dims: int = 64, seed: int = 42) -> Column:
    """Deterministic offline embedding (feature hashing, md5-based so it
    is reproducible across runs/engines), L2-normalized."""
    c = F.col(text) if isinstance(text, str) else text
    return text2vec(_hash_provider(dims, seed), dims)(c)
