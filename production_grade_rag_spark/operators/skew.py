"""Skew mitigation for joins (100 TB pattern; agg-side twin is the
salted two-phase aggregation in the ev_skew_salted_agg catalog entry).

A hot join key sends its entire fact partition to ONE reducer.  When
the dimension side is too big to broadcast, the classic fix is
salting: fact rows get a deterministic salt in [0, n), the dimension
side is replicated once per salt value, and the join key becomes
(key, salt) — each hot key now spreads across n reducers.  Semantics
are unchanged: every fact row joins exactly the one replica carrying
its salt.

Cost model: the dimension side is written n_salts times into the
shuffle, so pick n_salts ~ (hot-key rows / healthy-partition rows),
not "big"; AQE's skew-join splitting handles moderate skew on its own
— reach for salting when one key exceeds what a single task can hold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(fact: DataFrame, dim: DataFrame, on: str,
                n_salts: int = 16, how: str = "inner") -> DataFrame:
    """Equi-join ``fact`` (skewed side) with ``dim`` on ``on``,
    spreading each join key over ``n_salts`` shuffle partitions.

    Result set is identical to ``fact.join(dim, on, how)``.  Only
    inner and left joins are supported: the dimension replicas would
    multiply unmatched dim rows under right/full outer semantics.
    The salt is a deterministic hash of the whole fact row, so the
    plan replays identically (oracle-checkable).
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports inner/left, not {how!r}: dim rows "
            "are replicated per salt, which breaks right/outer")
    salt = F.pmod(F.hash(*[F.col(c) for c in fact.columns]),
                  F.lit(n_salts))
    f = fact.withColumn("__salt", salt)
    d = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    return f.join(d, [on, "__salt"], how).drop("__salt")
