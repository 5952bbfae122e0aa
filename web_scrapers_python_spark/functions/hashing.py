"""Cross-engine deterministic hashing for dedup / sketching operators.

The training-data dedup layer (MinHash, SimHash, fingerprints) needs a
string->int64 hash that is (a) computable JVM-side in Spark with
built-in expressions (no Python in the hot path) and (b) reproducible
in ANSI-ish SQL so DuckDB can act as an independent oracle. Neither
engine's native hash qualifies (Spark ``hash``/``xxhash64`` vs DuckDB
``hash`` are different algorithms), so we define one from sha256 —
available and bit-identical in both:

    H(s)   = int64( first 15 hex chars of sha256(s) )        in [0, 2^60)
    h31(s) = H(s) mod P,  P = 2^31 - 1  (Mersenne prime)

Universal-hash family for MinHash permutations (overflow-safe: a,h < P
so a*h+b < 2^62 fits int64 in both engines):

    perm_i(h) = (a_i * h + b_i) mod P
    a_i = ((2i+1) * 40503)     mod P   (odd, non-zero)
    b_i = (i * 2654435761)     mod P

Every Spark expression here has a ``*_sql`` twin generating the DuckDB
spelling of the *same arithmetic*; tests assert bit-equality row by row.

This module is engine infrastructure that the reference repo does not
have (its dedup is exact-only, cassandra_manager.py:317-329); it is the
scale path mandated for the 100 TB design point.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

P31 = 2_147_483_647           # 2^31 - 1
M32 = 4_294_967_296           # 2^32
KNUTH = 2_654_435_761


def perm_coeffs(i: int) -> tuple[int, int]:
    """Fixed universal-hash coefficients for permutation ``i``."""
    return ((2 * i + 1) * 40503) % P31, (i * KNUTH) % P31


# ---------------------------------------------------------------------------
# Spark expressions
# ---------------------------------------------------------------------------

def h64(c: Column) -> Column:
    """H(s): int64 from the first 15 hex chars of sha256 — range [0, 2^60)."""
    return F.conv(F.substring(F.sha2(c, 256), 1, 15), 16, 10).cast("long")


def h31(c: Column) -> Column:
    return h64(c) % F.lit(P31)


def h32(c: Column) -> Column:
    return h64(c) % F.lit(M32)


def perm(h: Column, i: int) -> Column:
    a, b = perm_coeffs(i)
    return (F.lit(a) * h + F.lit(b)) % F.lit(P31)


def normalize_text(c: Column) -> Column:
    """lower + collapse whitespace + strip — the canonical form every
    fingerprint/sketch hashes over."""
    return F.regexp_replace(
        F.regexp_replace(F.lower(c), r"\s+", " "), r"^ | $", "")


def char_shingles(norm: Column, k: int = 7) -> Column:
    """Distinct char k-grams of pre-normalized text; whole string when
    shorter than k. Runs as a JVM higher-order function (no UDF)."""
    n = F.length(norm)
    grams = F.transform(
        F.sequence(F.lit(1), n - F.lit(k - 1)),
        lambda i: norm.substr(i, F.lit(k)),
    )
    return F.array_distinct(F.when(n < k, F.array(norm)).otherwise(grams))


def word_tokens(norm: Column) -> Column:
    """Distinct whitespace tokens of pre-normalized text."""
    return F.array_distinct(F.split(norm, " "))


# ---------------------------------------------------------------------------
# DuckDB SQL twins — same arithmetic, oracle spelling
# ---------------------------------------------------------------------------

def h64_sql(e: str) -> str:
    return f"cast('0x' || substring(sha256({e}), 1, 15) as bigint)"


def h31_sql(e: str) -> str:
    return f"({h64_sql(e)} % {P31})"


def h32_sql(e: str) -> str:
    return f"({h64_sql(e)} % {M32})"


def perm_sql(h: str, i: int) -> str:
    a, b = perm_coeffs(i)
    return f"(({a} * {h} + {b}) % {P31})"


def normalize_text_sql(e: str) -> str:
    return f"trim(regexp_replace(lower({e}), '\\s+', ' ', 'g'))"


def char_shingles_sql(norm: str, k: int = 7) -> str:
    return (
        f"list_distinct(CASE WHEN length({norm}) < {k} THEN [{norm}] "
        f"ELSE [substring({norm}, i, {k}) "
        f"for i in range(1, length({norm}) - {k - 2})] END)"
    )


def word_tokens_sql(norm: str) -> str:
    return f"list_distinct(string_split({norm}, ' '))"
