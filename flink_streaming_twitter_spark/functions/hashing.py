"""Deterministic, engine-portable hashing primitives.

Spark's ``hash``/``xxhash64`` (Murmur3/xxHash) and DuckDB's ``hash``
(xxHash variant) do not agree, so every hash the correctness oracle sees is
derived from **md5 hex digits cast to integers** — byte-identical in any
engine. This costs a little over a native 64-bit hash but stays entirely
JVM-side in Spark (no Python), and at 100 TB the md5 of short shingles is
cheap relative to the shuffles around it.

The MinHash family uses universal hashing h_i(x) = (a_i*x + b_i) mod p over
x = md5_int31(shingle), with p = 2^31-1 and a,b drawn deterministically
from md5 of the permutation index — every product stays < 2^62, so the
arithmetic is exact int64 in both Spark and DuckDB.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE_31 = (1 << 31) - 1


def md5_int60(col: Column) -> Column:
    """First 15 hex digits of md5 as a non-negative int64 (60 bits)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def md5_int64_signed(col: Column) -> Column:
    """First 16 hex digits of md5 as the signed int64 holding those 64
    bits (two's complement; may be negative).

    ``conv(...16 hex digits..., 16, 10)`` returns the UNSIGNED decimal
    string (up to 2^64-1); casting that to long throws for values
    >= 2^63 under Spark 4's default ANSI mode (~half of all md5
    outputs). Assemble the value arithmetically instead: low 60 bits
    plus the sign-adjusted top nibble scaled by 2^60 — every
    intermediate stays inside int64 (the extreme is -8 * 2^60 =
    -2^63, exactly the int64 minimum)."""
    h = F.md5(col)
    low60 = F.conv(F.substring(h, 2, 15), 16, 10).cast("long")
    top4 = F.conv(F.substring(h, 1, 1), 16, 10).cast("long")
    signed_top = F.when(top4 >= 8, top4 - F.lit(16)).otherwise(top4)
    return signed_top * F.lit(1 << 60) + low60


def md5_int31(col: Column) -> Column:
    """md5-derived integer in [0, 2^31): safe multiplicand for mod-p
    universal hashing without int64 overflow."""
    return md5_int60(col) % F.lit(1 << 31)


def _perm_params(num_perm: int, seed: str = "flink-streaming-twitter") -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) pairs for the i-th min-hash permutation,
    derived from md5 so the DuckDB oracle can hard-code identical values."""
    params = []
    for i in range(num_perm):
        a = int(hashlib.md5(f"{seed}-a-{i}".encode()).hexdigest()[:8], 16) % MERSENNE_31
        b = int(hashlib.md5(f"{seed}-b-{i}".encode()).hexdigest()[:8], 16) % MERSENNE_31
        params.append((a or 1, b))
    return params


def minhash_exprs(hash_col: str, num_perm: int) -> list[Column]:
    """Column expressions h_i = (a_i * x + b_i) mod (2^31 - 1) for each
    permutation, to be min()-aggregated per document."""
    return [
        ((F.lit(a) * F.col(hash_col) + F.lit(b)) % F.lit(MERSENNE_31)).alias(f"mh{i}")
        for i, (a, b) in enumerate(_perm_params(num_perm))
    ]


def minhash_set_exprs(set_col: str, num_perm: int) -> list[Column]:
    """Row-wise MinHash over a packed shingle-hash array: for each
    permutation i, ``array_min(transform(shs, x -> (a_i*x + b_i) mod p))``.
    Identical values to min-aggregating the exploded form, with zero
    shuffle."""
    def perm(a: int, b: int) -> Column:
        return F.array_min(
            F.transform(F.col(set_col), lambda x: (F.lit(a) * x + F.lit(b)) % F.lit(MERSENNE_31))
        )

    return [perm(a, b) for a, b in _perm_params(num_perm)]


def minhash_params_sql(num_perm: int) -> list[tuple[int, int]]:
    """The same (a_i, b_i) pairs for embedding into oracle SQL text."""
    return _perm_params(num_perm)
