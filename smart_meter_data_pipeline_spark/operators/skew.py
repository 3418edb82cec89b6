"""Skew mitigation: salted join for hot keys.

AQE's skew-join splitting (on in ``session.py``) handles most skew at
runtime by splitting oversized shuffle partitions. Salting is the
static complement for the pathological case AQE can't fix: ONE key so
hot that a single (key) hash bucket exceeds an executor — e.g. a
null-ish default meter_id, or a celebrity user_id in events. The salted
form spreads that key over ``n_salts`` buckets at the cost of
replicating the (small but not broadcastable) right side n_salts×.

The salt must come from row identity on the LEFT side (salting by the
join key alone re-creates the same hot bucket); here it's a
deterministic hash of the whole row, so replays and retries place rows
identically — no rand(), no partition-id dependence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``left ⋈ right ON on`` with the left side spread over
    ``n_salts`` sub-buckets per key and the right side replicated to
    meet every bucket. Result equals the plain join (order aside)."""
    salt = F.pmod(
        F.xxhash64(F.struct(*[F.col(c) for c in left.columns])), F.lit(n_salts)
    )
    lhs = left.withColumn("_salt", salt)
    salts = (
        right.sparkSession.range(n_salts)
        .select(F.col("id").cast("int").alias("_salt"))
    )
    rhs = right.crossJoin(F.broadcast(salts))
    joined = lhs.join(rhs, [on, "_salt"], how)
    return joined.drop("_salt")
