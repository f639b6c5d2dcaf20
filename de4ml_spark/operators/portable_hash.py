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
    # NULLIF degenerate guard: a zero denominator (empty group, n-1 at
    # n=1, zero-count day) yields NULL in BOTH engines (x DIV NULL is
    # NULL on Spark, x // NULL is NULL on DuckDB) instead of killing the
    # job with an ANSI DIVIDE_BY_ZERO — a monitoring window with one row
    # must degrade, not abort. Identity for every nonzero q.
    return (
        f"(CAST((({p}) * {2 * scale} + ({q})) {div}"
        f" (2 * NULLIF(({q}), 0)) AS DOUBLE)"
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
    # same NULLIF degenerate guard as the narrow variant
    return (
        f"(CAST((CAST(({p}) AS {big}) * {2 * scale} + ({q}))"
        f" {div} (2 * NULLIF(({q}), 0)) AS DOUBLE) / {scale}.0)"
    )


LN2 = 0.6931471805599453  # nearest double to ln 2

# --------------------------------------------------------------------------
# Portable natural log: ln(p/q) for integer p >= q >= 1 computed ONLY from
# operations that IEEE 754 requires to be correctly rounded (+, -, *, / on
# doubles) plus exact integer/string ops for range reduction — so Spark and
# DuckDB produce the BIT-IDENTICAL double, unlike libm ln (JVM Math.log vs
# glibc log), whose last-ulp disagreement can flip a 6-decimal ROUND at a
# half boundary and fail the driver's value hash (the open tfidf ADVICE
# item). Range reduction: p/q = m * 2^k with m in [1, 2), k from the exact
# bit length of p intdiv q (Spark conv-to-binary / DuckDB to_base — pure
# integer/string, no libm); then ln m = 2 atanh(z), z = (m-1)/(m+1) in
# [0, 1/3], via a FIXED 19-term Horner polynomial with literal double
# coefficients. Both engines parse the same decimal literals to the same
# nearest double and evaluate the same correctly-rounded op sequence, so
# the results agree to the bit; accuracy vs true ln is ~2 ulp (measured
# worst 3e-16 relative over random ratios), which is immaterial — the
# score DEFINITION is this function, on both sides.
# --------------------------------------------------------------------------


def _ln_horner(var: str, n_terms: int = 19) -> str:
    """Horner text for poly(w) = sum_{i<n} w^i/(2i+1): atanh(z)/z with
    w = z^2. z <= 1/3 so terms decay 9x; 19 terms reach < 1e-18."""
    coefs = [repr(1.0 / (2 * i + 1)) for i in range(n_terms)]
    acc = f"CAST({coefs[-1]} AS DOUBLE)"
    for c in reversed(coefs[:-1]):
        acc = f"({acc} * {var} + CAST({c} AS DOUBLE))"
    return acc


def with_portable_ln(df, p: str, q: str, out: str):
    """Append double column ``out`` = portable ln(p/q) to a Spark frame;
    ``p``/``q`` are SQL texts of integer expressions with p >= q >= 1.
    Staged through named temp columns so the expression tree stays linear
    (no text blow-up) and whole-stage codegen keeps it JVM-side."""
    from pyspark.sql import functions as F

    t = "__pl_"
    return (
        df.withColumn(
            f"{t}k",
            F.expr(
                f"length(conv(CAST(({p}) DIV ({q}) AS BIGINT), 10, 2)) - 1"
            ),
        )
        .withColumn(
            f"{t}m",
            F.expr(
                f"CAST(({p}) AS DOUBLE) / CAST(({q}) * "
                f"shiftleft(CAST(1 AS BIGINT), {t}k) AS DOUBLE)"
            ),
        )
        .withColumn(
            f"{t}z",
            F.expr(
                f"({t}m - CAST(1.0 AS DOUBLE)) / ({t}m + CAST(1.0 AS DOUBLE))"
            ),
        )
        .withColumn(
            out,
            F.expr(
                f"CAST(2.0 AS DOUBLE) * {t}z * {_ln_horner(f'({t}z * {t}z)')}"
                f" + CAST({t}k AS DOUBLE) * CAST({LN2!r} AS DOUBLE)"
            ),
        )
        .drop(f"{t}k", f"{t}m", f"{t}z")
    )


def portable_ln_duck_ctes(
    src: str, passthrough: str, p: str, q: str, out: str, tag: str
) -> str:
    """DuckDB twin of ``with_portable_ln`` as a chain of CTEs (same staged
    shape, same op order — the CTE names are ``{tag}_1..3`` and the final
    one ``{tag}_out`` carries ``passthrough`` columns plus ``out``).
    Returns the CTE text to splice after a WITH; select FROM {tag}_out."""
    return f"""{tag}_1 AS (
  SELECT {passthrough}, ({p}) AS pl_p, ({q}) AS pl_q,
         length(to_base(CAST(({p}) // ({q}) AS BIGINT), 2)) - 1 AS pl_k
  FROM {src}
),
{tag}_2 AS (
  SELECT *, CAST(pl_p AS DOUBLE)
            / CAST(pl_q * (CAST(1 AS BIGINT) << pl_k) AS DOUBLE) AS pl_m
  FROM {tag}_1
),
{tag}_3 AS (
  SELECT *, (pl_m - CAST(1.0 AS DOUBLE)) / (pl_m + CAST(1.0 AS DOUBLE)) AS pl_z
  FROM {tag}_2
),
{tag}_out AS (
  SELECT {passthrough},
         CAST(2.0 AS DOUBLE) * pl_z * {_ln_horner("(pl_z * pl_z)")}
         + CAST(pl_k AS DOUBLE) * CAST({LN2!r} AS DOUBLE) AS {out}
  FROM {tag}_3
)"""


def round6_floor_sql(x: str) -> str:
    """Engine-exact ROUND(x, 6) for a NON-NEGATIVE double expression whose
    value both engines already agree on bitwise: floor(x*1e6 + 0.5) uses
    only correctly-rounded multiply/add and the exact floor, unlike
    ROUND(double, 6) which Spark applies to the decimal expansion and
    DuckDB to the binary value (divergent at half boundaries)."""
    return (
        f"(CAST(CAST(floor(({x}) * 1000000.0 + 0.5) AS BIGINT) AS DOUBLE)"
        " / 1000000.0)"
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


def portable_ln_const(p: int, q: int = 1) -> float:
    """Driver-side replay of the EXACT op sequence ``with_portable_ln``
    emits, for inlining a constant like ln(10) as a literal that equals
    what either engine would compute (CPython floats are IEEE doubles
    with correctly rounded + - * /). Pinned against DuckDB by the
    hypothesis test in tests/test_portable_ln.py."""
    k = (p // q).bit_length() - 1
    m = float(p) / float(q * (1 << k))
    z = (m - 1.0) / (m + 1.0)
    w = z * z
    coefs = [1.0 / (2 * i + 1) for i in range(19)]
    acc = coefs[-1]
    for c in reversed(coefs[:-1]):
        acc = acc * w + c
    return 2.0 * z * acc + float(k) * LN2


def wide_to_double_sql(expr: str, div: str) -> str:
    """Engine-portable conversion of a 128-bit integer expression
    (DECIMAL(38,0) on Spark, HUGEINT on DuckDB — pass div='DIV'/'//')
    to DOUBLE.

    Direct CAST is NOT safe above int64: DuckDB's hugeint->double is
    not always correctly rounded (measured round 7b:
    106705227903395487431 converts to 0x441723547db7ebf4 in DuckDB vs
    the true-nearest 0x441723547db7ebf3 from Spark's decimal path and
    Python) — a one-ulp split that breaks the value-hash. int64->double
    is hardware-rounded identically everywhere, so this decomposes
    |x| into four 30-bit chunks (covers 2^120 > 1e36), converts each
    exactly, and recombines with FIXED association:
    ((c3*2^90 + c2*2^60) + c1*2^30) + c0. Each step is one
    correctly-rounded IEEE op on identical inputs, so the result is
    bit-identical across engines (within 3 ulp of true — the value's
    DEFINITION is this recomposition, on both sides).
    """
    x = f"({expr})"
    sign = f"(CASE WHEN {x} < 0 THEN -1.0 ELSE 1.0 END)"
    a = f"(CASE WHEN {x} < 0 THEN -{x} ELSE {x} END)"
    b30 = 1 << 30
    # mod-BEFORE-div: a bare ``a DIV 2^60`` can exceed int64 near the
    # DECIMAL(38) ceiling and Spark's DIV result would wrap (possibly
    # negative, poisoning the following %); taking the modulus first
    # keeps every intermediate quotient < 2^30
    c0 = f"CAST({a} % {b30} AS BIGINT)"
    c1 = f"CAST(({a} % {b30 * b30}) {div} {b30} AS BIGINT)"
    c2 = f"CAST(({a} % {b30 * b30 * b30}) {div} {b30 * b30} AS BIGINT)"
    c3 = f"CAST({a} {div} {b30 * b30 * b30} AS BIGINT)"
    return (
        f"({sign} * (((CAST({c3} AS DOUBLE) * {float(2 ** 90)!r}"
        f" + CAST({c2} AS DOUBLE) * {float(2 ** 60)!r})"
        f" + CAST({c1} AS DOUBLE) * {float(2 ** 30)!r})"
        f" + CAST({c0} AS DOUBLE)))"
    )


def wide_halfup_div_sql(p: str, q: str, div: str) -> str:
    """Exact HALF-UP division of a 128-bit integer ``p`` (>= 0,
    DECIMAL(38,0) on Spark / HUGEINT on DuckDB) by an int64 ``q`` >= 1,
    with a quotient that may itself exceed int64 — the case neither
    Spark's DIV (silently wraps to LONG) nor a float detour (Spark
    floor(DOUBLE) saturates at 2^63-1) can handle.

    Two-step long division entirely in safe integer ops: with
    p' = 2p + q, q' = 2q and B = 2^30, split p' = p1*B^2 + p0
    (p1 via mod-before-exact-division, p0 = p' % B^2 < 2^60). Then
    q1 = p1 DIV q' and q0 = (r1*B^2 + p0) DIV q' with r1 = p1 % q' —
    every intermediate quotient is < 2^60 + q' (safe) provided
    p < ~8e37 / 1 and p1 DIV q' fits int64 (p < q' * 2^63 * 2^60,
    i.e. any p representable in DECIMAL(38,0) for q >= 8; for q < 8
    the bound is p < 8.5e37). Result: q1*B^2 + q0 as a 128-bit
    integer, bit-identical across engines.
    """
    big = "DECIMAL(38,0)" if div.upper() == "DIV" else "HUGEINT"
    b2 = 1 << 60
    pp = f"(2 * CAST(({p}) AS {big}) + ({q}))"
    # NULLIF degenerate guard (see exact_round_div_sql): q = 0 yields a
    # NULL quotient in both engines instead of an ANSI DIVIDE_BY_ZERO
    qq = f"(2 * CAST(NULLIF(({q}), 0) AS {big}))"
    # the B^2 split is an EXACT division: Spark uses decimal `/`
    # (exact for divisible operands; DIV would wrap the wide quotient),
    # DuckDB uses `//` (its `/` is FLOAT division even on HUGEINT)
    if div.upper() == "DIV":
        p1 = f"(CAST(({pp} - ({pp} % {b2})) / {b2} AS {big}))"
    else:
        p1 = f"(({pp} - ({pp} % {b2})) // {b2})"
    p0 = f"(CAST({pp} % {b2} AS BIGINT))"
    q1 = f"(CAST({p1} {div} {qq} AS BIGINT))"
    r1 = f"({p1} % {qq})"
    q0 = f"(CAST(({r1} * {b2} + {p0}) {div} {qq} AS BIGINT))"
    return (
        f"(CAST({q1} AS {big}) * {b2} + {q0})"
    )
