"""Engine-portable deterministic string hashing (Spark <-> DuckDB).

The correctness gate runs every catalog query on Spark AND its oracle SQL on
DuckDB and compares values exactly, so hash-based operators (MinHash,
SimHash, LSH) need a hash function BOTH engines compute bit-identically.
Spark's ``xxhash64`` has no DuckDB twin, but md5 does: DuckDB's
``md5_number_lower(s)`` is the little-endian integer of the digest's last 8
bytes, and Spark can assemble the same integer from hex-substring byte
arithmetic (``conv(substr(md5(x), pos, 2), 16, 10)``) inside whole-stage
codegen. Values are masked to < 2^59 so every downstream bit op stays in
non-negative BIGINT range on both engines (DuckDB's ``&`` result casts to
BIGINT; Spark longs never go negative).

Seeded hash families (MinHash) come from exact integer arithmetic over the
base hash — ``(a_s * x + b_s) mod (2^31 - 1)`` with x < 2^32 and a_s < 2^31,
so products stay below 2^63: exact in Spark longs and DuckDB BIGINTs alike,
no decimal/HUGEINT promotion needed.

This is the *portability* tier: md5 costs a few x more than xxhash64 per
call, but it is computed once per shingle/token and amortizes over the
seeded family, which is pure integer math. The xxhash64-based variants in
``operators/dedup.py`` remain for raw-throughput pipelines that do not need
an engine-independent replay.
"""

from __future__ import annotations

P31 = 2_147_483_647  # Mersenne prime 2^31 - 1: modulus of the seeded family
BAND_RADIX = 2_147_483_648  # 2^31: band-bucket packing radix (h < P31)


def phash_from_hex_sql(hex_expr: str, bits: int = 59) -> str:
    """Spark SQL fragment: low ``bits`` bits (<= 59) of the little-endian
    integer of the last 8 digest bytes of an md5 HEX STRING expression.

    ``hex_expr`` is substituted once per extracted byte (4-8x), so hot
    paths must pass a plain column name holding a pre-computed digest —
    Catalyst does NOT common-subexpression-eliminate repeated md5 calls
    (measured ~4x on the sf0.1 shingle pass). CollapseProject keeps the
    two-step projection intact because the digest alias is multi-use."""
    if not 1 <= bits <= 59:
        raise ValueError("bits must be in [1, 59] to stay in positive BIGINT")
    nbytes = (bits + 7) // 8
    terms = []
    for i in range(nbytes):
        # digest byte 8+i lives at hex chars [17 + 2i, 18 + 2i] (1-indexed)
        byte = (
            f"CAST(conv(substr({hex_expr}, {17 + 2 * i}, 2), 16, 10) AS BIGINT)"
        )
        rem = bits - 8 * i
        if rem < 8:
            byte = f"({byte} % {1 << rem})"
        terms.append(byte if i == 0 else f"{byte} * {1 << (8 * i)}L")
    return "(" + " + ".join(terms) + ")"


def md5_hex_sql(expr: str) -> str:
    """Spark SQL fragment for the md5 hex digest of a string expression —
    the first step of the two-step portable hash projection."""
    return f"md5(cast(({expr}) as binary))"


def phash_spark_sql(expr: str, bits: int = 59) -> str:
    """Spark SQL fragment: low ``bits`` bits (<= 59) of the little-endian
    integer of md5(expr)'s last 8 digest bytes — equals DuckDB's
    ``md5_number_lower(expr) & mask``. ``expr`` is a SQL string expression.

    Convenience single-expression form: it inlines the md5 call once per
    extracted byte, so per-row hot paths should use
    ``md5_hex_sql`` + ``phash_from_hex_sql`` in two projections instead."""
    return phash_from_hex_sql(md5_hex_sql(expr), bits)


def phash_duck_sql(expr: str, bits: int = 59) -> str:
    """DuckDB SQL fragment computing the same value as ``phash_spark_sql``."""
    if not 1 <= bits <= 59:
        raise ValueError("bits must be in [1, 59] to stay in positive BIGINT")
    mask = (1 << bits) - 1
    return f"CAST(md5_number_lower({expr}) & {mask} AS BIGINT)"


def phash_col(c, bits: int = 59):
    """Column form of ``phash_spark_sql`` for use inside higher-order-function
    lambdas (where SQL-text fragments can't be spliced): low ``bits`` bits of
    the little-endian integer of md5(c)'s last 8 digest bytes. Inlines one
    md5 call per extracted byte, so keep ``bits`` small in per-element hot
    paths (bits<=8 -> exactly one md5 call)."""
    from pyspark.sql import functions as F

    if not 1 <= bits <= 59:
        raise ValueError("bits must be in [1, 59] to stay in positive BIGINT")
    hexd = F.md5(c.cast("binary"))
    nbytes = (bits + 7) // 8
    total = None
    for i in range(nbytes):
        byte = F.conv(F.substring(hexd, 17 + 2 * i, 2), 16, 10).cast("bigint")
        rem = bits - 8 * i
        if rem < 8:
            byte = byte % (1 << rem)
        term = byte if i == 0 else byte * (1 << (8 * i))
        total = term if total is None else total + term
    return total


def hash_family(num: int, salt: int = 0x5DEECE66D) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the seeded family
    h_s(x) = (a_s * x + b_s) mod P31, with a_s odd in [1, 2^31) and
    b_s in [0, P31). Plain LCG — fixed constants, no runtime entropy, so the
    Spark plan and the DuckDB oracle inline identical literals."""
    state = salt % (1 << 31) or 1
    out = []
    for _ in range(num):
        state = (state * 1103515245 + 12345) % (1 << 31)
        a = state | 1
        state = (state * 1103515245 + 12345) % (1 << 31)
        b = state % P31
        out.append((a, b))
    return out


def exact_round_div_sql(p: str, q: str, div: str, decimals: int = 6) -> str:
    """SQL text for engine-exact ROUND(p/q, decimals) where p, q are
    non-negative INTEGER expressions: half-up rounding computed in pure
    integer arithmetic — ``(2*p*10^d + q) intdiv (2*q) / 10^d``. ROUND on a
    double is NOT engine-stable at half-way boundaries (Spark rounds the
    decimal expansion half-up, DuckDB differs in the last digit — observed
    on the quality score at sf0.001); this form is bit-identical anywhere.
    ``div`` is the integer-division operator: "DIV" (Spark) or "//" (DuckDB).

    The scaled integer is CAST to DOUBLE before the final scale division:
    a bare ``/ 1000000.0`` parses as a DECIMAL literal in Spark, silently
    typing the whole result DECIMAL(30,9) where the DuckDB twin produces
    DOUBLE (caught by the cross-engine rounding fuzz). The cast form is
    engine-identical: the numerator is an exact integer double (all our
    domains stay far below 2^53) and IEEE division is correctly rounded,
    so both engines produce the same nearest double to the rational.
    """
    scale = 10**decimals
    return (
        f"(CAST((({p}) * {2 * scale} + ({q})) {div} (2 * ({q})) AS DOUBLE)"
        f" / {scale}.0)"
    )


def exact_round_div_sql_wide(
    p: str, q: str, div: str, decimals: int = 6
) -> str:
    """128-bit-capable variant of ``exact_round_div_sql`` for rationals
    whose scaled numerator ``p * 2*10^d`` can exceed int64 (e.g. the drift
    TVD's sum of count cross-products once per-window totals approach
    ~1.5e6 rows at d=6 — and the cross-products alone overflow near 3e9
    rows/window). The intermediate is DECIMAL(38,0) on Spark ("DIV") and
    HUGEINT on DuckDB ("//") — both exact integer arithmetic to ~1e38,
    i.e. safe past 1e16-row windows; the final nearest-double conversion
    is identical to the narrow variant."""
    scale = 10**decimals
    big = "DECIMAL(38,0)" if div.upper() == "DIV" else "HUGEINT"
    return (
        f"(CAST((CAST(({p}) AS {big}) * {2 * scale} + ({q}))"
        f" {div} (2 * ({q})) AS DOUBLE) / {scale}.0)"
    )


def exact_round_neg_mean_sql(
    sum_expr: str, cnt_expr: str, div: str, decimals: int = 6
) -> str:
    """SQL text for engine-exact ROUND(sum/cnt, decimals) where ``sum_expr``
    is a NEGATIVE DECIMAL sum with scale <= decimals and ``cnt_expr`` a
    positive integer count (the mean-log-prob shape). The naive
    round(double) form sits EXACTLY on a half boundary whenever
    2*sum*10^d ≡ cnt (mod 2*cnt) — common, since the sum lives on a 10^-d
    grid — and Spark (rounds the shortest decimal repr, half-up away from
    zero) disagrees with DuckDB (rounds the binary value) there; observed
    on bigram means at sf0.1. This form is pure integer arithmetic:
    negate to positive, scale to an exact BIGINT, half-up integer divide,
    negate back. ``div`` is "DIV" (Spark) or "//" (DuckDB). The DOUBLE
    cast before the scale division keeps the result type (and value)
    engine-identical — see ``exact_round_div_sql``."""
    scale = 10**decimals
    p = f"CAST((-({sum_expr})) * {scale} AS BIGINT)"
    return (
        f"(-(CAST(({p} * 2 + ({cnt_expr})) {div} (2 * ({cnt_expr}))"
        f" AS DOUBLE)) / {scale}.0)"
    )
