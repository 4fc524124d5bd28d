"""Portable 32-bit hashing: identical values in Spark and DuckDB.

MinHash/SimHash/fingerprinting need hash values that the DuckDB oracle can
reproduce exactly. Engine-native hashes (Spark murmur3 `hash()`, DuckDB
`hash()`) differ, so we derive a 32-bit integer from the first 8 hex chars
of md5 — md5 hex output is identical everywhere:

    Spark :  conv(substring(md5(x), 1, 8), 16, 10)::long
    DuckDB:  ('0x' || substr(md5(x), 1, 8))::BIGINT

Non-negative, < 2^32, uniform. Seeded variants prefix the seed — this is
the "k independent permutations" construction for MinHash.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hash32(col: Column) -> Column:
    """Portable 32-bit hash of a string column (long in [0, 2^32))."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def hash32_seeded(col: Column, seed: int) -> Column:
    """Seeded portable hash: h_seed(x) = hash32(seed || ':' || x)."""
    return hash32(F.concat(F.lit(f"{seed}:"), col))


def hash32_sql(expr: str) -> str:
    """DuckDB SQL twin of ``hash32``."""
    return f"('0x' || substr(md5({expr}), 1, 8))::BIGINT"


def hash32_seeded_sql(expr: str, seed: int) -> str:
    """DuckDB SQL twin of ``hash32_seeded``."""
    return hash32_sql(f"'{seed}:' || {expr}")
