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
from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["embedding_options", "get_option", "set_option", "text2vec", "text2vec_hash"]


# GUC analogue (src/gucs/embedding.rs:24-47, openai_options.slt): the
# provider settings a deployment points at an OpenAI-compatible
# endpoint.  SET/SHOW semantics; consumed by whoever constructs the
# provider callable for text2vec.
_OPTIONS: dict[str, str] = {
    "openai_base_url": "https://api.openai.com/v1",
    "openai_api_key": "",
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
