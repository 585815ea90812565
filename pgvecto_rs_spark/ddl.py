"""DDL surface: the reference's CREATE INDEX options grammar.

The reference's index DDL is

    CREATE INDEX ON t USING vectors (val vector_l2_ops)
    WITH (options = "[indexing.hnsw]\\nm = 12");

— an opclass naming (type, metric) plus a TOML options document parsed
into ``IndexOptions`` (src/index/am_options.rs:119-164; grammar + the
validation matrix crates/base/src/index.rs:106-156, 182-197, 281-496,
``deny_unknown_fields`` everywhere).  This module is that entry point
for Spark: ``create_index(spark, df, path, opclass=..., options=...)``
parses the SAME TOML grammar (stdlib ``tomllib``), validates ranges
like the reference's ``validate(range)`` attributes, maps the tree onto
the native index classes, persists any ``[segment]``/``[optimizing]``
tables into the index meta (the alterable option tree consumed by
``streaming.IndexOptimizer``), and returns the built index.

Grammar accepted (reference spellings):

    [indexing.flat|ivf|hnsw|sparse_inverted_index]  — absent table
        defaults to hnsw (am_options falls back to
        IndexingOptions::default() = Hnsw) — mirrored here.
    [indexing.ivf]      nlist (1..1e6), spherical_centroids,
                        residual_quantization
    [indexing.hnsw]     m (4..128), ef_construction (10..2000)
    [indexing.X.quantization.scalar]   bits in {1,2,4,8}
    [indexing.X.quantization.product]  ratio (1..8), bits in {1,2,4,8}
    [indexing.X.quantization.rabitq]
    [segment] / [optimizing]            the alterable tree (maintenance)

Unknown tables/keys raise ValueError ("Invalid index options"), like
serde's deny_unknown_fields.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: opclass -> (vector type, metric) — src/sql/finalize.sql:745-803
OPCLASSES: dict[str, tuple[str, str]] = {
    "vector_l2_ops": ("vector", "l2"),
    "vector_dot_ops": ("vector", "dot"),
    "vector_cos_ops": ("vector", "cos"),
    "vecf16_l2_ops": ("vecf16", "l2"),
    "vecf16_dot_ops": ("vecf16", "dot"),
    "vecf16_cos_ops": ("vecf16", "cos"),
    "svector_l2_ops": ("svector", "l2"),
    "svector_dot_ops": ("svector", "dot"),
    "svector_cos_ops": ("svector", "cos"),
    "bvector_hamming_ops": ("bvector", "l2"),   # hamming rides the l2 kernel
    "bvector_dot_ops": ("bvector", "dot"),
    "bvector_jaccard_ops": ("bvector", "jaccard"),
}

_KINDS = ("flat", "ivf", "hnsw", "sparse_inverted_index")
_QUANTS = ("scalar", "product", "rabitq")


def _bad(reason: str) -> "ValueError":
    return ValueError(f"Invalid index options: {reason}")


def _check_range(val, lo, hi, key: str) -> int:
    if not isinstance(val, int) or isinstance(val, bool) or not (lo <= val <= hi):
        raise _bad(f"{key}={val!r} outside [{lo}, {hi}]")
    return val


def _only_keys(tbl: dict, allowed: set, where: str) -> None:
    unknown = set(tbl) - allowed
    if unknown:
        raise _bad(f"unknown key(s) {sorted(unknown)} in [{where}]")


def parse_options(options: str) -> dict:
    """TOML options document -> a normalized spec dict:
    {kind, params, quantization: (kind, params) | None, alterable: {...}}."""
    import tomllib

    try:
        doc = tomllib.loads(options or "")
    except tomllib.TOMLDecodeError as e:
        raise _bad(f"failed to parse TOML ({e})")
    _only_keys(doc, {"indexing", "segment", "optimizing"}, "<root>")

    indexing = doc.get("indexing", {})
    if not isinstance(indexing, dict):
        raise _bad("[indexing] must be a table")
    kinds = [k for k in indexing if k in _KINDS]
    if len(set(indexing) - set(_KINDS)) > 0:
        raise _bad(f"unknown key(s) {sorted(set(indexing) - set(_KINDS))} in [indexing]")
    if len(kinds) > 1:
        raise _bad(f"multiple indexing kinds {kinds}")
    # serde's externally-tagged enum default: Hnsw (am_options falls
    # back to IndexingOptions::default())
    kind = kinds[0] if kinds else "hnsw"
    tbl = dict(indexing.get(kind, {}))

    quant = None
    if "quantization" in tbl:
        q = tbl.pop("quantization")
        if not isinstance(q, dict) or len(q) != 1 or next(iter(q)) not in _QUANTS:
            raise _bad(f"quantization must be exactly one of {_QUANTS}")
        qkind, qtbl = next(iter(q.items()))
        qtbl = dict(qtbl)
        if qkind == "scalar":
            _only_keys(qtbl, {"bits"}, f"indexing.{kind}.quantization.scalar")
            bits = qtbl.get("bits", 8)
            if bits not in (1, 2, 4, 8):
                raise _bad("invalid quantization bits")
            quant = ("scalar", {"bits": bits})
        elif qkind == "product":
            _only_keys(qtbl, {"ratio", "bits"}, f"indexing.{kind}.quantization.product")
            ratio = _check_range(qtbl.get("ratio", 1), 1, 8, "ratio")
            bits = qtbl.get("bits", 8)
            if bits not in (1, 2, 4, 8):
                raise _bad("invalid quantization bits")
            quant = ("product", {"ratio": ratio, "bits": bits})
        else:
            _only_keys(qtbl, set(), f"indexing.{kind}.quantization.rabitq")
            quant = ("rabitq", {})

    params: dict = {}
    if kind == "flat":
        _only_keys(tbl, set(), "indexing.flat")
    elif kind == "ivf":
        _only_keys(
            tbl, {"nlist", "spherical_centroids", "residual_quantization"},
            "indexing.ivf",
        )
        params["nlist"] = _check_range(tbl.get("nlist", 1000), 1, 1_000_000, "nlist")
        params["spherical"] = bool(tbl.get("spherical_centroids", False))
        params["residual_quantization"] = bool(tbl.get("residual_quantization", False))
    elif kind == "hnsw":
        _only_keys(tbl, {"m", "ef_construction"}, "indexing.hnsw")
        params["m"] = _check_range(tbl.get("m", 12), 4, 128, "m")
        params["ef_construction"] = _check_range(
            tbl.get("ef_construction", 300), 10, 2000, "ef_construction"
        )
    else:  # sparse_inverted_index
        _only_keys(tbl, set(), "indexing.sparse_inverted_index")

    # the alterable tree rides through to index meta (maintenance.py
    # validates each dotted key exactly like alter_vector_index)
    alterable: dict = {}
    for section in ("segment", "optimizing"):
        stbl = doc.get(section, {})
        if not isinstance(stbl, dict):
            raise _bad(f"[{section}] must be a table")
        for k, v in stbl.items():
            alterable[f"{section}.{k}"] = v

    return {"kind": kind, "params": params, "quantization": quant, "alterable": alterable}


def create_index(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    vector_col: str = "embedding",
    id_col: str = "vec_id",
    opclass: str = "vector_l2_ops",
    options: str = "",
):
    """The CREATE INDEX entry point (am.rs:136-244 analogue): parse the
    opclass + TOML options, build the right index, persist any
    segment/optimizing options into its meta, and return the handle.

    bvector/svector opclasses require the column layouts of
    ``functions.binary`` / ``functions.sparse``; the sparse kind only
    supports the inverted index with the dot metric, and bvector's
    jaccard opclass only the exact scan (same support matrix as the
    reference's validation, index.rs:106-156)."""
    if opclass not in OPCLASSES:
        raise ValueError(f"unknown opclass {opclass!r}")
    vtype, metric = OPCLASSES[opclass]
    spec = parse_options(options)
    kind, params, quant = spec["kind"], spec["params"], spec["quantization"]

    from pgvecto_rs_spark.maintenance import alter_index

    def _quant_kwargs() -> dict:
        if quant is None:
            return {}
        qkind, qp = quant
        if qkind == "scalar":
            return {"quantization": f"sq{qp['bits']}"}
        if qkind == "product":
            return {"quantization": "pq", "pq_ratio": qp["ratio"], "pq_bits": qp["bits"]}
        return {"quantization": "rabitq"}

    storage = "f16" if vtype == "vecf16" else "f32"

    if vtype == "svector":
        if kind != "sparse_inverted_index":
            raise _bad(
                f"svector supports [indexing.sparse_inverted_index] only "
                f"here (got [indexing.{kind}])"
            )
        if metric != "dot":
            # index.rs:141-147: the sparse inverted index is Dot-only
            raise _bad("sparse_inverted_index supports the dot metric only")
        from pgvecto_rs_spark.indexes import SparseInvertedIndex

        idx = SparseInvertedIndex.create(
            spark, df, path, svector_col=vector_col, id_col=id_col
        )
    elif vtype == "bvector":
        # binary vectors ride the dense machinery on the 0/1 embedding:
        # Hamming(x, y) == squared-L2 on the embedded bits and the
        # binary dot is the dense dot, so build/probing/batch reuse the
        # dense index classes unchanged (see bin_hamming_ivf_topk)
        if metric == "jaccard":
            raise NotImplementedError(
                "bvector_jaccard_ops: Jaccard has no L2/dot reduction; "
                "use the exact scan (operators.search + "
                "functions.binary.bvector_jaccard_distance)"
            )
        from pgvecto_rs_spark.functions import binary as VB

        bits = df.select(
            F.col(id_col), VB.bvector_to_dense(F.col(vector_col)).alias("__bits01")
        )
        if kind == "flat":
            from pgvecto_rs_spark.indexes import FlatIndex

            idx = FlatIndex.create(
                spark, bits, path, vector_col="__bits01", id_col=id_col,
                metric=metric, **_quant_kwargs(),
            )
        elif kind == "ivf":
            from pgvecto_rs_spark.indexes import IVFIndex

            idx = IVFIndex.create(
                spark, bits, path, vector_col="__bits01", id_col=id_col,
                metric=metric, nlist=params["nlist"], spherical=params["spherical"],
                residual_quantization=params["residual_quantization"],
                **_quant_kwargs(),
            )
        elif kind == "hnsw":
            from pgvecto_rs_spark.indexes import HNSWIndex

            idx = HNSWIndex.create(
                spark, bits, path, vector_col="__bits01", id_col=id_col,
                metric=metric, m=params["m"],
                ef_construction=params["ef_construction"], **_quant_kwargs(),
            )
        else:
            raise _bad(f"[indexing.{kind}] is not valid for bvector")
    elif kind == "flat":
        from pgvecto_rs_spark.indexes import FlatIndex

        idx = FlatIndex.create(
            spark, df, path, vector_col=vector_col, id_col=id_col,
            metric=metric, storage=storage, **_quant_kwargs(),
        )
    elif kind == "ivf":
        from pgvecto_rs_spark.indexes import IVFIndex

        idx = IVFIndex.create(
            spark, df, path, vector_col=vector_col, id_col=id_col,
            metric=metric, nlist=params["nlist"], spherical=params["spherical"],
            residual_quantization=params["residual_quantization"],
            storage=storage, **_quant_kwargs(),
        )
    elif kind == "hnsw":
        from pgvecto_rs_spark.indexes import HNSWIndex

        idx = HNSWIndex.create(
            spark, df, path, vector_col=vector_col, id_col=id_col,
            metric=metric, m=params["m"],
            ef_construction=params["ef_construction"],
            storage=storage, **_quant_kwargs(),
        )
    else:
        raise _bad(f"[indexing.{kind}] is not valid for {vtype}")

    for key, val in spec["alterable"].items():
        alter_index(idx, key, val)
    return idx


def create_index_pgvector(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    using: str = "hnsw",
    vector_col: str = "embedding",
    id_col: str = "vec_id",
    opclass: str = "vector_l2_ops",
    **with_options,
):
    """pgvector-compat DDL entry (`CREATE INDEX ... USING hnsw (col
    vector_l2_ops) WITH (m=16, ef_construction=64)`): the reference
    rewrites this via a ProcessUtility hook onto its native options
    (src/index/compatibility.rs:7-117, pgvector defaults m=16 /
    ef_construction=64 / lists=100 at :86-100) — mirrored here through
    ``maintenance.pgvector_compat_options`` + the native builders."""
    from pgvecto_rs_spark.maintenance import pgvector_compat_options

    mapped = pgvector_compat_options(using, **with_options)
    kind = mapped.pop("kind")
    if kind == "hnsw":
        toml = (
            f"[indexing.hnsw]\nm = {mapped['m']}\n"
            f"ef_construction = {max(10, mapped['ef_construction'])}"
        )
    else:
        toml = f"[indexing.ivf]\nnlist = {mapped['nlist']}"
    return create_index(
        spark, df, path, vector_col=vector_col, id_col=id_col,
        opclass=opclass, options=toml,
    )
