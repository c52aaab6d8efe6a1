"""Deterministic, engine-portable hash expressions.

Every hash here is defined in terms of ``md5`` hex strings so the SAME
value is computable in Spark SQL and in the DuckDB oracle (Spark's
native ``xxhash64``/``hash`` have no DuckDB twin). 60-bit values (15
hex chars) keep everything inside a signed BIGINT, portable to both
engines.

Used by the dedup family (MinHash-LSH, SimHash, fingerprinting) — all
pure Column expressions, no UDFs, so a 100 TB dedup run stays inside
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_hex(c: Column | str) -> Column:
    """Lowercase hex md5 of a string column (same output as DuckDB md5)."""
    return F.md5(F.col(c) if isinstance(c, str) else c)


def hash64(c: Column | str, salt: int | None = None) -> Column:
    """Deterministic 60-bit positive hash of a string column.

    ``conv(substr(md5(salt # s), 1, 15), 16, 10)::bigint`` — DuckDB
    twin: ``('0x' || substr(md5(...), 1, 15))::BIGINT``.
    """
    c = F.col(c) if isinstance(c, str) else c
    if salt is not None:
        c = F.concat(F.lit(f"{salt}#"), c)
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def minhash_expr(shingles: Column | str, n_hashes: int = 16) -> Column:
    """MinHash signature: array of ``n_hashes`` 60-bit mins over a
    shingle array — one pass per element via ``transform`` + a driver
    loop over the hash seeds, all constant-folded.

    Returns ``array<bigint>`` of length ``n_hashes``.
    """
    sh = F.col(shingles) if isinstance(shingles, str) else shingles
    return F.array(*[F.array_min(F.transform(sh, _salted(i))) for i in range(n_hashes)])


def _salted(salt: int):
    """Unary hashing lambda for Spark HOFs.

    MUST stay unary: a two-arg lambda makes ``transform`` pass the
    array index as the second argument, silently overriding a
    default-arg salt capture.
    """
    return lambda s: hash64(s, salt=salt)


def simhash(token_col: Column | str, bits: int = 64) -> Column:
    """Per-token SimHash contribution vector: array<int> of +1/-1 per bit.

    Sum these arrays per document (``aggregate``/groupBy), then take the
    sign per position to get the document SimHash. Bits come from the
    first 16 hex chars of md5(token) — portable to the DuckDB oracle via
    the same substring + hex-digit decomposition.
    """
    c = F.col(token_col) if isinstance(token_col, str) else token_col
    h = F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")
    # 60 usable bits from 15 hex chars; cap `bits` accordingly.
    n = min(bits, 60)
    return F.array(
        *[
            (F.shiftright(h, b).bitwiseAND(F.lit(1)) * 2 - 1).cast("int")
            for b in range(n)
        ]
    )


def simhash_from_counts(bit_sums: Column) -> Column:
    """Collapse summed ±1 bit counts (array<bigint>) into a packed
    bigint SimHash: bit b set iff sum at position b > 0."""
    # aggregate over (sum, index) pairs: acc + (sum>0) << idx
    n = 60  # matches simhash() width
    return F.aggregate(
        F.zip_with(
            bit_sums,
            F.sequence(F.lit(0), F.lit(n - 1)),
            lambda s, i: F.when(s > 0, F.shiftleft(F.lit(1).cast("bigint"), i)).otherwise(
                F.lit(0).cast("bigint")
            ),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two packed bigint hashes (bit_count of xor)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_doc(token_col: Column, bits: int = 60) -> Column:
    """Packed 60-bit document SimHash from a token array column.

    One fused expression, no explode/shuffle: fold the token array into
    per-bit ±1 sums (``aggregate`` with an array accumulator), then set
    bit b iff its sum is positive. Token multiplicity counts (standard
    SimHash weights by occurrence).
    """
    n = min(bits, 60)
    zeros = F.array(*[F.lit(0).cast("bigint") for _ in range(n)])

    def _step(acc: Column, tok: Column) -> Column:
        h = F.conv(F.substring(F.md5(tok), 1, 15), 16, 10).cast("bigint")
        contrib = F.array(
            *[
                (F.shiftright(h, b).bitwiseAND(F.lit(1).cast("bigint")) * 2 - 1)
                for b in range(n)
            ]
        )
        return F.zip_with(acc, contrib, lambda a, c: a + c)

    sums = F.aggregate(token_col, zeros, _step)
    # 2^i via pow: exact in doubles for i <= 59, so the bigint cast is
    # exact (shiftleft only takes a literal shift amount).
    return F.aggregate(
        F.zip_with(
            sums,
            F.sequence(F.lit(0), F.lit(n - 1)),
            lambda s, i: F.when(
                s > 0, F.pow(F.lit(2.0), i.cast("double")).cast("bigint")
            ).otherwise(F.lit(0).cast("bigint")),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
