"""Planner sugar: route top-k / range queries to an index when one
exists, else the exact scan — reproducing the reference's plan decisions.

Reference decision table (tests/sqllogictest/pushdown_plan.slt:24-134 +
src/index/am.rs:106-133):

- ``ORDER BY dist(col, q) LIMIT k`` with an index on (col, metric)
  -> index path (cost made ~zero, am.rs:110-121), else seq scan;
- ``vectors.enable_index = false`` vetoes the index path
  (src/gucs/planning.rs:17-25) -> seq scan;
- sphere predicate on an indexed column -> range search via index,
  multiple spheres on the SAME column merge to the min radius; spheres
  on a DIFFERENT column become a recheck (post-filter)
  (src/index/am_scan.rs:26-55);
- ordering by one column while filtering a sphere on another: the
  ORDER BY column's index wins, the sphere is a residual filter
  (pushdown_plan.slt:88-118 two-index choice).

There is no Catalyst extension hook from pure Python, so the planner is
an explicit API over DataFrames + registered indexes; the decisions and
their EXPLAIN-able outcomes mirror the slt goldens.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pgvecto_rs_spark.operators import search as SR


@dataclass
class _Entry:
    index: object  # FlatIndex | IVFIndex | HNSWIndex | FreshVectorIndex
    column: str
    metric: str
    id_col: str = "vec_id"


@dataclass
class Sphere:
    """sphere(center, radius) predicate (finalize.sql:640-650)."""

    column: str
    center: Sequence[float]
    radius: float
    metric: str = "l2"


class IndexCatalog:
    """Registered vector indexes per (table, column, metric)."""

    def __init__(self) -> None:
        self._by_key: dict[tuple[str, str, str], _Entry] = {}

    def register(self, table: str, column: str, metric: str, index, id_col: str = "vec_id") -> None:
        self._by_key[(table, column, metric.lower())] = _Entry(index, column, metric.lower(), id_col)

    def lookup(self, table: str, column: str, metric: str) -> _Entry | None:
        return self._by_key.get((table, column, metric.lower()))


class Planner:
    """Explicit plan router with the reference's decision semantics."""

    def __init__(self, catalog: IndexCatalog, enable_index: bool = True):
        self.catalog = catalog
        self.enable_index = enable_index  # vectors.enable_index GUC
        self.last_decision: dict | None = None

    # ------------------------------------------------------------------
    def top_k(
        self,
        table: str,
        df: DataFrame,
        column: str,
        query: Sequence[float],
        k: int,
        metric: str = "l2",
        spheres: Sequence[Sphere] = (),
        filter=None,
        extra_queries: Sequence[Sequence[float]] = (),
        **index_opts,
    ) -> DataFrame:
        """``SELECT ... [WHERE spheres...] ORDER BY dist LIMIT k``.

        ``extra_queries`` carries additional ORDER BY vector expressions:
        duplicates of ``query`` collapse (the reference tolerates a
        repeated identical orderby), but a *different* vector is rejected
        exactly like scan_build (src/index/am_scan.rs:34-39)."""
        for eq in extra_queries:
            if not _close(eq, query):
                raise ValueError("vector search with multiple vectors is not supported")
        entry = self.catalog.lookup(table, column, metric) if self.enable_index else None

        # threshold merge: spheres on the ORDER BY column with the same
        # metric shrink to the min radius and ride the index scan;
        # everything else is a recheck filter (am_scan.rs:26-55)
        threshold: float | None = None
        residual = filter
        for s in spheres:
            same = s.column == column and s.metric.lower() == metric.lower()
            if same and _close(s.center, query):
                threshold = s.radius if threshold is None else min(threshold, s.radius)
            else:
                pred = SR.distance(F.col(s.column), list(s.center), s.metric) < s.radius
                residual = pred if residual is None else (residual & pred)

        if entry is not None:
            if residual is None:
                out = entry.index.search(query, k=k, **index_opts)
            else:
                # recheck = heap fetch: the residual may reference base
                # columns the index does not store, so candidates join
                # back to the table by id (the reference rechecks on the
                # fetched heap tuple) — with bounded VBASE-style widening
                # until k survivors.
                heap = df.withColumnRenamed(entry.id_col, "id") if entry.id_col != "id" else df
                n_rows = getattr(entry.index, "meta", {}).get("n_rows", 1 << 30)
                kk = k
                for _ in range(4):
                    cand = entry.index.search(query, k=kk, **index_opts)
                    out = (
                        cand.join(heap, "id")
                        .where(residual)
                        .orderBy(F.col("distance").asc(), F.col("id").asc())
                        .select("id", "distance")
                    )
                    if kk >= n_rows or len(out.limit(k).collect()) >= min(k, n_rows):
                        break
                    kk = min(n_rows, kk * 4)
                out = out.limit(k)
            if threshold is not None:
                out = out.where(F.col("distance") < threshold)
            self.last_decision = {
                "path": "index",
                "index_kind": getattr(entry.index, "meta", {}).get("kind", "?"),
                "threshold": threshold,
                "recheck": residual is not None,
            }
            return out

        out = SR.top_k(df, column, query, k, metric=metric, filter=residual, tiebreaker=None)
        if threshold is not None:
            out = out.where(F.col("distance") < threshold)
        self.last_decision = {"path": "seqscan", "threshold": threshold, "recheck": residual is not None}
        return out

    def range_search(
        self,
        table: str,
        df: DataFrame,
        sphere: Sphere,
        k: int | None = None,
        filter=None,
        **index_opts,
    ) -> DataFrame:
        """``WHERE col <<op>> sphere(c, r)`` — index range-scan when
        available (strategy-2 FOR SEARCH, finalize.sql:745-803).

        With a LIMIT the sphere rides the index's ordered top-k stream
        and the radius filters it (the reference's ordered sphere scan);
        without one, a native ``range_search`` on the index answers the
        pure sphere predicate (IVF list pruning / HNSW stream widening /
        flat SQ code-bound two-phase), falling back to the exact
        seqscan filter when the index kind has neither."""
        entry = (
            self.catalog.lookup(table, sphere.column, sphere.metric)
            if self.enable_index
            else None
        )
        approx_ok = bool(index_opts.pop("approx", False))
        if entry is not None and k is not None:
            out = entry.index.search(
                sphere.center,
                k=k,
                filter=filter,
                **_sig_filter(entry.index.search, index_opts),
            )
            self.last_decision = {"path": "index-range-limit"}
            return out.where(F.col("distance") < sphere.radius)
        # A bare sphere predicate (no LIMIT) is an EXACT set in SQL; only
        # dispatch to an index range_search whose result is provably the
        # full sphere (flat/IVF).  Exactness can depend on the radius:
        # sparse postings cover only docs overlapping the query support,
        # complete iff radius <= 0 (range_exact_for hook).  HNSW's
        # range_search is reachability-approximate, so it needs an
        # explicit approx=True opt-in — otherwise the exact seqscan
        # filter below answers.
        exact_for = getattr(entry.index, "range_exact_for", None) if entry else None
        provably_exact = (
            exact_for(sphere.radius)
            if exact_for is not None
            else getattr(entry.index, "RANGE_EXACT", False)
            if entry is not None
            else False
        )
        if (
            entry is not None
            and hasattr(entry.index, "range_search")
            and (provably_exact or approx_ok)
        ):
            out = entry.index.range_search(
                sphere.center,
                sphere.radius,
                filter=filter,
                **_sig_filter(entry.index.range_search, index_opts),
            )
            self.last_decision = {"path": "index-range"}
            return out
        self.last_decision = {"path": "seqscan-range"}
        return SR.range_search(
            df, sphere.column, list(sphere.center), sphere.radius, metric=sphere.metric, filter=filter
        )


def _sig_filter(method, opts: dict) -> dict:
    """Drop index_opts the target method doesn't accept (e.g. ``nprobe``
    against flat.range_search) instead of raising TypeError — knobs are
    per-index-kind, the planner call site is kind-agnostic."""
    import inspect

    try:
        params = inspect.signature(method).parameters
    except (TypeError, ValueError):  # builtins / C-level callables
        return dict(opts)
    if any(p.kind is inspect.Parameter.VAR_KEYWORD for p in params.values()):
        return dict(opts)
    return {k: v for k, v in opts.items() if k in params}


def _close(a: Sequence[float], b: Sequence[float]) -> bool:
    return len(a) == len(b) and all(abs(float(x) - float(y)) < 1e-12 for x, y in zip(a, b))
