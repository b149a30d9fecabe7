"""Skew mitigation: salted join for pathological hot keys.

AQE's skew-join handles moderate skew by splitting oversized
sort-merge partitions; for extreme hot keys (one key = 30% of a 100 TB
fact table) the standard remedy is salting: spread the hot key's rows
over ``n_salts`` sub-partitions and replicate the build side once per
salt. Result sets are identical to the plain join; only the shuffle
layout changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT = "_salt"


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``probe`` (large, possibly skewed) to ``build`` (smaller)
    on the given keys, spreading each probe key over ``n_salts``
    shuffle partitions. The build side is replicated once per salt
    value (explode of a literal range — cheap, no extra scan)."""
    if SALT in probe.columns or SALT in build.columns:
        raise ValueError(f"column {SALT!r} already present")
    salts = F.array(*[F.lit(i).cast("int") for i in range(n_salts)])
    probe_s = probe.withColumn(
        SALT,
        F.pmod(F.xxhash64(*[F.col(c) for c in probe.columns]), F.lit(n_salts))
        .cast("int"),
    )
    build_s = build.withColumn(SALT, F.explode(salts))
    return probe_s.join(build_s, on + [SALT], how).drop(SALT)
