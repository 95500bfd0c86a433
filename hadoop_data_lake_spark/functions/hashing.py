"""Portable deterministic hashing.

The dedup/fingerprint/LSH operators need a hash that (a) is stable across
Spark versions and partitionings and (b) can be reproduced bit-for-bit by an
external SQL engine (the DuckDB correctness oracle). Spark's xxhash64/hash use
engine-specific seeds, so we standardize on the first 60 bits of MD5:

    Spark : conv(substr(md5(s), 1, 15), 16, 10)  cast to long
    DuckDB: ('0x' || substr(md5(s), 1, 15))::ubigint

15 hex digits = 60 bits < 2^63, so the signed/unsigned distinction never
bites. MD5 is computed JVM-side (whole-stage codegen), so this stays on the
fast path — no Python UDF involved.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_60bit(col: Column) -> Column:
    """60-bit integer hash of a string column (portable, JVM-side)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def salted_md5_60bit(col: Column, salt: int) -> Column:
    """Independent-ish hash family member i: hash of 'i|' || s."""
    return md5_60bit(F.concat(F.lit(f"{salt}|"), col))


def md5_60bit_sql(expr: str) -> str:
    """DuckDB SQL fragment equivalent to md5_60bit(expr)."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::ubigint)"


def salted_md5_60bit_sql(expr: str, salt: str | int) -> str:
    """DuckDB SQL fragment equivalent to salted_md5_60bit; `salt` may be an
    int literal or a SQL expression (e.g. a lambda variable)."""
    if isinstance(salt, int):
        return md5_60bit_sql(f"concat('{salt}|', {expr})")
    return md5_60bit_sql(f"concat(cast({salt} as varchar) || '|', {expr})")
