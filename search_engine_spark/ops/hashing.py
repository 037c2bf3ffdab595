"""Deterministic, engine-portable hashing expressions.

Spark's ``xxhash64``/``hash`` and DuckDB's ``hash`` are different
algorithms, so every dedup/sketch operator here derives its integers
from **MD5** — available and bit-identical in Spark, DuckDB, and
Python's hashlib. That makes each operator's output independently
checkable by an ANSI-SQL oracle (the driver's DuckDB harness) and
reproducible across engines/cluster sizes.

``h60(s)``  = first 15 hex digits of md5(s) as a non-negative int64
(60 bits, always < 2^63).
``h31(s)``  = h60(s) mod (2^31 - 1), small enough that an affine
permutation ``(a*h + b) mod M31`` never overflows int64 — the MinHash
permutation family.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

M31 = 2_147_483_647  # 2^31 - 1 (prime)

# Affine permutation family for MinHash: a_i odd, deterministic, < 2^31.
PERM_A0, PERM_A_STEP = 1_103_515_245, 12_345
PERM_B0, PERM_B_STEP = 12_345, 1_013


def perm_ab(i: int) -> tuple[int, int]:
    return (PERM_A0 + PERM_A_STEP * (2 * i + 1)) % M31, (PERM_B0 + PERM_B_STEP * i) % M31


def h60(col: Column | str) -> Column:
    """60-bit md5-derived hash (Spark side)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def h31(col: Column | str) -> Column:
    return h60(col) % F.lit(M31)


def py_h60(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def py_h31(s: str) -> int:
    return py_h60(s) % M31


def sql_h60(expr: str) -> str:
    """DuckDB-SQL equivalent of :func:`h60` for oracle queries."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def sql_h31(expr: str) -> str:
    return f"({sql_h60(expr)} % {M31})"
