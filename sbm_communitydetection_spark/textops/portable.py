"""Portable (Spark ⇔ DuckDB) primitives for the text/dedup pipeline.

Every operator in textops/ is implemented twice — once as DataFrame
expressions, once as ANSI-SQL emitted for the DuckDB oracle — from the
SAME constants in this module, so the two sides cannot drift.

The portable 60-bit hash is the first 15 hex chars of md5, identical in
both engines:

    Spark : conv(substring(md5(x), 1, 15), 16, 10)::long
    DuckDB: ('0x' || substr(md5(x), 1, 15))::BIGINT

md5 here is a deterministic fingerprint, not a security primitive.  All
downstream arithmetic (minhash permutations, simhash bit tests) stays in
exact int64 range on both engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Minhash universe: base hash reduced mod P keeps a_i * h + b_i < 2^63.
HASH_P = 1_000_000_007
MINHASH_NUM = 32
MINHASH_BANDS = 8
MINHASH_ROWS_PER_BAND = MINHASH_NUM // MINHASH_BANDS
SIMHASH_BITS = 60  # the portable hash is 60 bits wide
NGRAM_N = 3


def md5_long(c: Column) -> Column:
    """60-bit deterministic hash of a string column."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def md5_long_sql(expr: str) -> str:
    return f"CAST(concat('0x', substr(md5({expr}), 1, 15)) AS BIGINT)"


def minhash_perm(hash_id: Column, base: Column) -> Column:
    """Permutation i applied to a base hash: ((2i+1)·h + i·2654435761 mod P) mod P."""
    a = hash_id * 2 + 1
    b = (hash_id * F.lit(2654435761)) % HASH_P
    return (a * base + b) % HASH_P


def minhash_perm_sql(hash_id: str, base: str) -> str:
    return f"(({hash_id} * 2 + 1) * {base} + ({hash_id} * 2654435761) % {HASH_P}) % {HASH_P}"


def words_col(text: Column) -> Column:
    return F.split(text, " ")


def shingles_col(text: Column, n: int = NGRAM_N) -> Column:
    """Word n-grams (array<string>); empty array when fewer than n words."""
    w = F.split(text, " ")
    return F.when(
        F.size(w) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - n + 1),
            lambda i: F.concat_ws(" ", F.slice(w, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def shingles_sql(text_expr: str, n: int = NGRAM_N) -> str:
    w = f"string_split({text_expr}, ' ')"
    return (
        f"CASE WHEN len({w}) >= {n} THEN "
        f"list_transform(generate_series(1, len({w}) - {n} + 1), "
        f"i -> array_to_string({w}[i:i+{n - 1}], ' ')) "
        f"ELSE CAST([] AS VARCHAR[]) END"
    )
