"""Index maintenance API + pgvector-compat parameter mapping.

Reference surface:
- ``alter_vector_index(oid, key, value)`` — runtime-alter the alterable
  options (src/sql/finalize.sql:595-596, src/index/views.rs:7-15;
  alterable keys crates/base/src/index.rs:158-167, 595-617: optimizing
  threads/cadence, segment sizes).
- ``fence_vector_index(oid)`` — block until background indexing is done
  (finalize.sql:598-599, src/index/functions.rs:15-41).
- ``pg_vector_index_stat`` view — per-index segment stats
  (finalize.sql:805-820) — every index class here exposes ``stat()``.
- pgvector-compat DDL rewrite: ``USING hnsw/ivfflat`` with pgvector's
  parameter names (m / ef_construction / lists) maps onto the native
  options with pgvector's defaults m=16, ef_construction=64
  (src/index/compatibility.rs:7-117, defaults :86-100).
"""

from __future__ import annotations

from typing import Any

from pgvecto_rs_spark.indexes import base

# keys alterable at runtime (search-time knobs; build-time options are
# immutable, matching the reference's alterable-key whitelist spirit)
_ALTERABLE = {
    "ivf": {"default_nprobe"},
    "hnsw": {"default_ef_search"},
    "flat": {"default_rerank_size"},
    "fresh": {"default_nprobe", "default_ef_search", "default_rerank_size"},
}

# the reference's alterable option tree (IndexAlterableOptions =
# segment + optimizing, crates/base/src/index.rs:158-167, 201-246),
# dotted keys exactly as index_edit.slt spells them; (type, min, max)
# mirrors the validate(range) attributes
_ALTERABLE_COMMON: dict[str, tuple[type, float, float]] = {
    "segment.max_growing_segment_size": (int, 1, 4_000_000_000),
    "segment.max_sealed_segment_size": (int, 1, 4_000_000_000),
    "optimizing.sealing_secs": (int, 1, 86_400),
    "optimizing.sealing_size": (int, 1, 4_000_000_000),
    "optimizing.optimizing_secs": (int, 1, 86_400),
    "optimizing.optimizing_threads": (int, 1, 65_535),
    "optimizing.delete_threshold": (float, 0.0001, 1.0),
}


def alter_index(index, key: str, value: Any) -> None:
    """Persist a runtime-alterable option into the index meta
    (alter_vector_index analogue, index.rs:595-617 + the Alter derive).

    Two families, matching the reference:
    - the common segment/optimizing tree (dotted keys, index_edit.slt)
      — consumed by the background ``IndexOptimizer`` cadence;
    - per-kind search-time knobs (this engine's default_* extensions).

    Unknown keys error with 'not found'; unparsable / out-of-range
    values error with 'Invalid index options' — the reference's two
    error classes (AlterError::KeyNotExists / InvalidIndexOptions)."""
    kind = index.meta.get("kind", "?")
    spec = _ALTERABLE_COMMON.get(key)
    if spec is not None:
        ty, lo, hi = spec
        try:
            parsed = ty(value)
        except (TypeError, ValueError):
            raise ValueError(f"Invalid index options: failed to parse {value!r} for {key!r}")
        if isinstance(value, str) and ty is int and not value.lstrip("-").isdigit():
            raise ValueError(f"Invalid index options: failed to parse {value!r} for {key!r}")
        if not (lo <= parsed <= hi):
            raise ValueError(
                f"Invalid index options: {key}={parsed} outside [{lo}, {hi}]"
            )
        index.meta[key] = parsed
        base.write_meta(index.path, index.meta)
        return
    allowed = _ALTERABLE.get(kind, set())
    if key not in allowed:
        raise ValueError(
            f"option {key!r} of {kind} index not found (alterable: "
            f"{sorted(allowed) + sorted(_ALTERABLE_COMMON)})"
        )
    index.meta[key] = value
    base.write_meta(index.path, index.meta)


def fence_index(index) -> dict:
    """Block until the index finishes building (fence_vector_index).

    All builds in this engine are synchronous Spark jobs, so by the time
    ``create`` returns the index is sealed; the fence just re-reads and
    returns the stat — the same post-condition the reference's poll loop
    guarantees (``stat().indexing == false``)."""
    st = index.stat()
    assert st["idx_indexing"] is False
    return st


def pgvector_compat_options(using: str, **opts) -> dict:
    """Map pgvector DDL parameters to native index options
    (compatibility.rs:64-117).

    ``USING hnsw  (m=?, ef_construction=?)`` -> HNSWIndex kwargs with
    pgvector defaults m=16, ef_construction=64 (not the native 12/300);
    ``USING ivfflat (lists=?)`` -> IVFIndex kwargs (lists -> nlist).
    """
    u = using.lower()
    if u == "hnsw":
        known = {"m", "ef_construction"}
        extra = set(opts) - known
        if extra:
            raise ValueError(f"unknown hnsw options {sorted(extra)}")
        return {
            "kind": "hnsw",
            "m": int(opts.get("m", 16)),
            "ef_construction": int(opts.get("ef_construction", 64)),
        }
    if u == "ivfflat":
        extra = set(opts) - {"lists"}
        if extra:
            raise ValueError(f"unknown ivfflat options {sorted(extra)}")
        return {"kind": "ivf", "nlist": int(opts.get("lists", 100))}
    raise ValueError(f"unsupported access method {using!r} (hnsw | ivfflat)")
