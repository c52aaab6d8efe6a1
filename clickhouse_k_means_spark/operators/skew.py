"""Skew mitigation — salted joins for hot keys.

AQE's skew-join splitting (enabled in session.py) covers sort-merge
joins at runtime; ``salted_join`` is the explicit form for when you
know the key distribution is pathological and the build side is too
large to broadcast: fact rows scatter across ``n_salts`` sub-keys,
the dim side replicates ``n_salts``×, and the join runs on
``(key, salt)`` — a hot key's rows land in ``n_salts`` tasks instead
of one.

Cost model: dim side grows ``n_salts``× (keep it the smaller side);
shuffle width per key multiplies by ``n_salts``. Worth it exactly when
one task would otherwise process a multi-GB key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the fact side salted and the dim side replicated.

    Result equals ``fact.join(dim, on, how)`` row-for-row; the salt is
    only a partitioning device (derived from a per-row id, so identical
    fact rows still spread). Supported ``how``: inner / left.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner|left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    salted_fact = fact.withColumn(
        _SALT, F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast("int")
    )
    replicated_dim = dim.withColumn(
        _SALT, F.explode(F.array(*[F.lit(s) for s in range(n_salts)]))
    )
    out = salted_fact.join(replicated_dim, keys + [_SALT], how)
    return out.drop(_SALT)
