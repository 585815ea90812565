"""Skew remedies for key-keyed joins.

A 100 TB join where a handful of keys dominate (the head URL, the empty
document, the default label) stalls on the few tasks holding those
keys.  Two remedies compose with everything in this repo:

- **AQE skew-join** (`spark.sql.adaptive.skewJoin.enabled`, on by
  default in our session): splits oversized partitions at runtime.
  Prefer it when it applies (sort-merge joins).
- **Salting** (this module): for the cases AQE can't re-plan (e.g. the
  build side of an already-chosen strategy, or deterministic layout
  requirements), spread each skewed key over ``salt`` synthetic
  sub-keys on the big side and replicate the small side ``salt`` times.
  Join cardinality and results are IDENTICAL to the plain join; only
  the key distribution changes.

``salted_join`` keeps the decision explicit and the arithmetic
deterministic (xxhash64 of the whole row picks the salt — no RNG, so
retries/speculative tasks agree).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join"]


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | list[str],
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big`` (skewed side) with ``small`` on ``on``,
    spreading each key over ``salt`` sub-keys.

    ``big`` rows get a deterministic salt from xxhash64 over all their
    columns; ``small`` is exploded ``salt``-fold (size × salt must stay
    broadcast-or-small — that's the salting trade).  Supported ``how``:
    inner / left (the shapes where the skewed side survives intact).
    Output columns = the plain join's (salt column dropped).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner'|'left'")
    keys = [on] if isinstance(on, str) else list(on)
    bcols = big.columns
    b = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in bcols]), F.lit(salt)).cast("int")
    )
    s = small.withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    out = b.join(s, keys + ["__salt"], how)
    return out.drop("__salt")
