"""Skew-mitigation join: explicit key salting.

AQE's skew-join split (on in this engine's sessions) is the first-line
fix and needs no code. Salting is the manual escape hatch for the cases
AQE cannot fix: a BUILD-side hot key in a shuffled join where one reducer
partition receives most of the stream (AQE splits oversized partitions of
the PROBE side, but a single hot key on both sides still meets in one
task), or engines/configs where AQE is unavailable.

``salted_join`` replicates the small side N× (one replica per salt) and
scatters the big side's hot keys across the N replicas with a
deterministic per-row salt — the join key becomes (key, salt), so the hot
key's rows spread over N tasks. Cost: small side shuffles N× its size;
pick N ≈ (hot-key rows / target rows-per-task). Deterministic salt
(hash of stable columns, not rand()) keeps retries/speculative tasks
consistent and results reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    salt_from: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join ``big ⋈ small`` on ``key`` with the shuffle spread over
    ``n_salts`` sub-partitions per key. Output columns = big's columns
    followed by small's non-key columns (the salt column is internal).

    ``salt_from``: big-side columns the per-row salt derives from
    (defaults to all of big's columns) — any stable selection works; more
    columns → finer spread.

    Only ``inner`` and ``left`` joins are supported: an unmatched
    small-side row exists once per salt replica, so right/full joins
    would emit it n_salts times.
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    salt_cols: list[Column] = [F.col(c) for c in (salt_from or big.columns)]
    salted_big = big.withColumn("_salt", F.pmod(F.hash(*salt_cols), F.lit(n_salts)))
    salted_small = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out_cols = [F.col(f"b.{c}") for c in big.columns] + [
        F.col(f"s.{c}") for c in small.columns if c != key
    ]
    return (
        salted_big.alias("b")
        .join(
            salted_small.alias("s"),
            (F.col(f"b.{key}") == F.col(f"s.{key}")) & (F.col("b._salt") == F.col("s._salt")),
            how,
        )
        .select(*out_cols)
    )
