"""The engine's query registry, split by domain.

Importing this package registers every query: each domain module calls
:func:`pgvecto_rs_spark.queries._core.register` at import time, and the
shared ``_REGISTRY``/driver-window ordering lives in ``_core``.  The
public surface (``queries()``, ``oracle_sql()``, ``entry()``, shared
constants, and every registered query function by name) is re-exported
here so ``pgvecto_rs_spark.queries`` keeps its original module API.
"""

from __future__ import annotations

from pgvecto_rs_spark.queries import _core
from pgvecto_rs_spark.queries._core import (  # noqa: F401
    DIMS,
    Q64,
    Q64_SQL,
    RANGE_RADIUS,
    SPARSE_THRESHOLD,
    STOPWORDS_SQL,
    QueryFn,
    _DRIVER_WINDOW,
    _REGISTRY,
    _docs,
    _emb,
    _events,
    _ordered,
    _q_col,
    _r4,
    _r4t,
    _scaled_sum,
    _tune,
    entry,
    oracle_sql,
    queries,
    register,
)

# registration side-effects, one domain per module
from pgvecto_rs_spark.queries import (  # noqa: E402, F401
    ann,
    documents,
    embedding,
    events,
    multimodal,
    tpch,
    vector,
)

# re-export every registered query function by name (tests import e.g.
# ``events_sessions`` directly from this package, as they could from the
# original single-file module)
_g = globals()
for _n, (_fn, _sql) in _core._REGISTRY.items():
    _g.setdefault(_n, _fn)
del _g, _n, _fn, _sql
