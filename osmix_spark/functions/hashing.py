"""Portable deterministic hashing.

Two tiers:

- ``portable_hash64``: md5-derived 60-bit integer hash that any ANSI-SQL
  engine (DuckDB oracle included) reproduces bit-for-bit:
  Spark   conv(substr(md5(s), 1, 15), 16, 10)::long
  DuckDB  ('0x' || substr(md5(s), 1, 15))::UBIGINT
  Used wherever cross-engine parity matters (minhash, fingerprints,
  dedupe keys, content hashes).

- ``fast_hash64``: Spark-native xxhash64 for engine-internal keys (salting,
  bucket routing) where speed matters and parity does not.

Content hashing plays the role of the reference's FNV-1a dataset hash
(packages/shared/src/content-hasher.ts:9-54, osm.ts:286-295): hash per
logical row, combine with an order-insensitive aggregate, so the result is
identical at any parallelism / partition order (north-rule requirement).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def portable_hash64(col: Column, seed: str = "") -> Column:
    """60-bit integer hash reproducible in DuckDB (see module docstring)."""
    s = F.concat(F.lit(seed), F.lit("|"), col.cast("string"))
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def portable_hash64_sql(expr: str, seed: str = "") -> str:
    """The DuckDB-side twin of ``portable_hash64`` as a SQL snippet."""
    return f"(('0x' || substr(md5('{seed}' || '|' || CAST({expr} AS VARCHAR)), 1, 15))::UBIGINT)::BIGINT"


def portable_hash64_pair(col: Column, seed: str = "mh") -> tuple[Column, Column]:
    """ONE md5, TWO independent 60-bit hashes (hex chars 1-15 and 17-31).

    The Kirsch-Mitzenmacher base pair (h1, h2): the derived family
    h_i = h1 + i*h2 behaves like i independent hashes for sketching
    (Kirsch & Mitzenmacher 2006, "Less Hashing, Same Performance").
    For minhash this cuts hashing cost per shingle from num_hashes md5s
    to one — the signature stage is hash-bound at corpus scale. Each h_i
    is individually uniform (collision property per column is exact);
    only the cross-column variance is mildly higher than independent
    hashes — the accepted KM tradeoff.
    No overflow: h1, h2 < 2^60, so h1 + i*h2 < 2^63 for i <= 7."""
    m = F.md5(F.concat(F.lit(seed), F.lit("|"), col.cast("string")))
    h1 = F.conv(F.substring(m, 1, 15), 16, 10).cast("long")
    h2 = F.conv(F.substring(m, 17, 15), 16, 10).cast("long")
    return h1, h2


def portable_hash64_pair_sql(expr: str, seed: str = "mh") -> tuple[str, str]:
    """The DuckDB-side twin of ``portable_hash64_pair``."""
    m = f"md5('{seed}' || '|' || CAST({expr} AS VARCHAR))"
    return (
        f"(('0x' || substr({m}, 1, 15))::UBIGINT)::BIGINT",
        f"(('0x' || substr({m}, 17, 15))::UBIGINT)::BIGINT",
    )


def fast_hash64(*cols: Column) -> Column:
    return F.xxhash64(*cols)


def content_hash(df: DataFrame, *cols: str) -> int:
    """Order-insensitive dataset content hash over the named columns.

    Per-row 60-bit portable hash -> bigint XOR-free sum mod 2^63 via sum of
    longs (overflow-safe by summing as decimal then mod). Stable across
    partitioning, ordering, and parallelism.
    """
    row_hash = portable_hash64(
        F.concat_ws("\x1f", *[F.col(c).cast("string") for c in cols]), "row"
    )
    total = df.select(
        F.sum(row_hash.cast("decimal(38,0)")).alias("h"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    h = int(total["h"] or 0) % (1 << 63)
    return (h * 1000003 + int(total["n"])) % (1 << 63)
