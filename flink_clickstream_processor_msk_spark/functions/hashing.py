"""Cross-engine deterministic hashing primitives.

Everything the dedup / similarity / fingerprint operators hash with is
md5-derived, because md5 is the one hash both Spark and ANSI-SQL engines
(DuckDB oracle) compute identically. Spark's native hash/xxhash64 are
faster but engine-specific — fine for internal partitioning, unusable for
oracle-checked results.

- ``h60(col)``: first 15 hex chars of md5 → 60-bit bigint.
- ``h28(col)``: ``h60 % 2^28`` — small enough that ``a*h28 + b`` stays
  under 2^63 for 31-bit coefficients (overflow-safe affine permutations).
- ``perm_coefficients(n)``: deterministic (a, b) pairs for the
  universal-hash permutations ``(a*h + b) mod P`` with P = 1e9+7 — the
  formula itself is applied in dedup._signatures_from_sets (numpy) and
  inlined into the SQL oracle.

SQL twins live in oracles_beyond.py; keep formulas in lockstep.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MOD_P = 1_000_000_007
H28_MOD = 1 << 28


def h60(col: Column) -> Column:
    """60-bit deterministic hash of a string column (md5-prefix)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def h28(col: Column) -> Column:
    """28-bit hash (overflow-safe for affine permutations)."""
    return h60(col) % F.lit(H28_MOD)


def perm_coefficients(n: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for n permutations, derived from a Python
    ``random.Random(seed)`` — generated once, identical in the SQL oracle
    because the coefficients are inlined as literals on both sides."""
    import random

    rng = random.Random(seed)
    return [(rng.randrange(1, MOD_P - 1), rng.randrange(0, MOD_P - 1)) for _ in range(n)]
