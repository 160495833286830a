"""Cross-engine deterministic hashing.

The dedup operators (MinHash, SimHash, fingerprinting) need hash values that
the DuckDB oracle can reproduce bit-for-bit. Spark's built-in hash functions
(murmur3/xxhash64) have no DuckDB twin, so we define a polynomial rolling
hash over character codes as a *pair* of implementations generated from the
same constants:

    fold(chars, h -> (h * 31 + ascii(c)) mod P)     P = 1_000_000_007

Spark: `F.aggregate` over `F.split(s, '')` — JVM-side, codegen'd.
DuckDB: `list_reduce(list_transform(str_split(s, ''), ...))`.
Both are strict left folds, so results are identical (verified: hash of
'spark' = 109638365 on both engines).

MinHash permutations h_i(x) = (A_i * x + B_i) mod P use fixed constants
below — shared by the Spark plan and the generated oracle SQL.

This mirrors the reference's use of a keyed hash for partitioning
(md5-mod at reference worker/__main__.py:62-65) — there it routes shuffle
data; here it powers content fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

P = 1_000_000_007

# 16 fixed (A, B) pairs for MinHash permutations; odd multipliers, generated
# once from a fixed seed and frozen here so both engines agree forever.
MINHASH_PERMS: tuple[tuple[int, int], ...] = (
    (387420489, 123456791),
    (268435399, 987654323),
    (479001599, 192837465),
    (715827883, 564738291),
    (104857601, 918273645),
    (532677047, 246813579),
    (754974721, 135792468),
    (899999963, 864209753),
    (617283949, 111111113),
    (362436069, 222222227),
    (521288629, 333333349),
    (88675123, 444444443),
    (5783321, 555555559),
    (673154123, 666666667),
    (994443577, 777777783),
    (282475249, 888888893),
)

# 8 bands × 2 rows: candidate probability 1-(1-j²)⁸ ≈ 0.90 at jaccard 0.5 —
# tuned for near-dup detection at the 0.5 threshold the dedup ops use.
N_BANDS = 8
ROWS_PER_BAND = 2
assert N_BANDS * ROWS_PER_BAND == len(MINHASH_PERMS)

SIMHASH_BITS = 32


def char_hash(col: Column | str) -> Column:
    """Polynomial hash of a string column (Spark side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.aggregate(
        F.filter(F.split(c, ""), lambda x: x != ""),
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + F.ascii(x)) % P,
    )


def char_hash_sql(expr: str) -> str:
    """The same polynomial hash as DuckDB SQL (oracle side)."""
    return (
        f"coalesce(list_reduce("
        f"list_transform(list_filter(str_split({expr}, ''), x -> x <> ''), "
        f"x -> CAST(ascii(x) AS BIGINT)), "
        f"(a, b) -> (a * 31 + b) % {P}), 0)"
    )


def perm_hash(h: Column, i: int) -> Column:
    """i-th MinHash permutation of an already-hashed token (Spark side)."""
    a, b = MINHASH_PERMS[i]
    return (h * a + b) % P


def perm_hash_sql(expr: str, i: int) -> str:
    a, b = MINHASH_PERMS[i]
    return f"(({expr}) * {a} + {b}) % {P}"
