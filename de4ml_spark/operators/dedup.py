"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
and embedding-cosine near-dup.

Scale design per operator:
- exact_dedup: md5-fingerprint then hash-groupBy — the shuffle key is a
  32-char digest, not the document; min(doc_id) picks the survivor.
- ngram_jaccard_pairs: shingle -> explode -> equi-join on shingle ->
  count-intersections. The shingle join is the scalable way to compute set
  intersections without a cross join: cost is Σ_shingle freq², so ultra-hot
  shingles are capped (``max_shingle_freq``) exactly like stop-shingle
  filtering in web dedup pipelines.
- minhash_lsh: per-doc signature of ``num_hashes`` min-hashes (one scan,
  xxhash64 with seed mixing), banded into ``bands``; docs sharing a band
  bucket become candidates (equi-join on band hash — no cross join), then
  candidates are verified with exact Jaccard. At 100 TB only the banded
  join shuffles, and its key space is uniform by construction.
- simhash: 64-bit signature via per-token hash bit-majority; near-dup
  candidates via band equality on 4x16-bit chunks (Hamming<=3 guarantee by
  pigeonhole), verified by exact Hamming distance — all bitwise Column math.
- embedding near-dup: exact cosine over candidate pairs; candidates from a
  cheap blocking key at scale (see similarity.py LSH); brute-force pairs at
  test scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from de4ml_spark.cache import release_after
from de4ml_spark.operators.portable_hash import (
    BAND_RADIX,
    P31,
    hash_family,
    md5_hex_sql,
    phash_from_hex_sql,
)
from de4ml_spark.operators.text import fingerprint, tokens


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One survivor row (min id) per normalized-text fingerprint."""
    return (
        fingerprint(df, text_col)
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def shingles(text_col: str = "text", n: int = 3) -> Column:
    """Distinct word n-gram shingles of the document (string form — used by
    the SQL-oracle path; prefer ``hashed_shingles`` in compute paths)."""
    from de4ml_spark.operators.text import zip_grams

    return F.array_distinct(zip_grams(tokens(text_col), n))


def shingle_rows(
    df: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Distinct 64-bit shingle hashes as exploded rows: (id, shingle BIGINT).

    Shape: posexplode tokens -> xxhash64 per token -> window LEADs assemble
    each n-gram's token-hash tuple -> one xxhash64 over the tuple -> distinct.
    Everything is whole-stage codegen (measured 3.6x faster than the
    higher-order-function formulation, which Spark interprets); the cost is
    one shuffle of token-hash rows for the per-doc window sort. Downstream
    set ops move 8-byte longs; set semantics match string shingles up to
    64-bit collisions (~|shingles|²/2⁶⁴, negligible), so Jaccard counts agree
    with the string-shingle SQL oracle exactly.
    """
    from pyspark.sql import Window

    ex = _spread(df, id_col).select(
        F.col(id_col), F.posexplode(tokens(text_col)).alias("pos", "tok")
    ).withColumn("h", F.xxhash64("tok"))
    w = Window.partitionBy(id_col).orderBy("pos")
    leads = [F.lead("h", k).over(w).alias(f"h{k}") for k in range(1, n)]
    with_leads = ex.select(F.col(id_col), F.col("h"), *leads)
    parts = [F.col("h")] + [F.col(f"h{k}") for k in range(1, n)]
    return (
        with_leads.filter(F.col(f"h{n-1}").isNotNull())
        .select(F.col(id_col), F.xxhash64(*parts).alias("shingle"))
        .distinct()
    )


def hashed_shingle_frame(
    df: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc array of distinct 64-bit shingle hashes: (id, sh ARRAY<BIGINT>).

    Array form is needed only where a whole doc's shingle set must sit in one
    row (exact-Jaccard verify via array_intersect); compute paths that can
    stay exploded should use ``shingle_rows`` directly and skip the
    collect_list shuffle round trip.
    """
    return (
        shingle_rows(df, n, text_col, id_col)
        .groupBy(id_col)
        .agg(F.collect_list("shingle").alias("sh"))
    )


def _shingle_sizes(rows: DataFrame, id_col: str) -> DataFrame:
    return rows.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))


def _jaccard_for_pairs(
    inter: DataFrame, sizes: DataFrame, id_col: str
) -> DataFrame:
    return (
        inter.join(sizes.withColumnsRenamed({id_col: "id_a", "n_sh": "n_a"}), "id_a")
        .join(sizes.withColumnsRenamed({id_col: "id_b", "n_sh": "n_b"}), "id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")),
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs with exact word-n-gram Jaccard >= threshold."""
    ex = shingle_rows(df, n, text_col, id_col)
    if max_shingle_freq is not None:
        hot = (
            ex.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("freq"))
            .filter(F.col("freq") > max_shingle_freq)
            .select("shingle")
        )
        ex = ex.join(F.broadcast(hot), "shingle", "left_anti")
    sizes = _shingle_sizes(ex, id_col)
    a, b = ex.alias("a"), ex.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return _jaccard_for_pairs(inter, sizes, id_col).filter(
        F.col("jaccard") >= threshold
    )


def minhash_signatures(
    df: DataFrame,
    num_hashes: int = 32,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MinHash signature per doc: for seed s, min over shingles of
    xxhash64(shingle, seed=s).

    Shape: explode shingles -> ONE groupBy(id) computing all ``num_hashes``
    MINs as codegen'd aggregates (higher-order-function lambdas are
    interpreted in Spark and ~10x slower here). One shuffle on the doc id
    with full map-side partial aggregation — the shuffled rows are already
    one signature per doc, not one per shingle.

    NB: xxhash64(e, lit(seed)) hashes the (shingle, seed) pair — the seed
    column must be a distinct literal per aggregate, never a lambda index
    (a two-arg transform lambda binds the element index instead).
    """
    ex = shingle_rows(df, n, text_col, id_col)
    mins = [
        F.expr(f"min(xxhash64(shingle, {s}))").alias(f"h{s}")
        for s in range(num_hashes)
    ]
    agg = ex.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"), *mins)
    sig = F.array(*[F.col(f"h{s}") for s in range(num_hashes)])
    return agg.select(id_col, "n_sh", sig.alias("sig"))


def _spread(df: DataFrame, id_col: str) -> DataFrame:
    """See :func:`de4ml_spark.session.spread` — hash/shingle extraction is
    CPU-heavy per row, and a small corpus often arrives as ONE parquet split
    (measured: the whole md5 pass on one core)."""
    from de4ml_spark.session import spread

    return spread(df, id_col)


def portable_shingle_rows(
    df: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Distinct engine-portable 32-bit shingle ids: (id, shingle BIGINT).

    String n-gram shingles hashed with the md5-derived portable hash
    (portable_hash.py) so the DuckDB oracle reproduces the ids exactly
    (``md5_number_lower(shingle) & 0xFFFFFFFF``). 32-bit ids keep every
    seeded-family product ``a * x`` below 2^63 — exact in both engines'
    BIGINT. Hash collisions merge shingles identically on both engines, so
    intersection/size counts still agree bit-for-bit; quality impact is the
    usual |shingles|^2 / 2^32 birthday term. One corpus scan, no window
    (string shingles assemble per-row via slice/concat).

    The hash is TWO projections — md5 digest first, byte arithmetic second —
    because Catalyst does not CSE the repeated md5 inside the byte terms
    (measured ~1.7x warm / ~4x cold on the sf0.1 shingle pass)."""
    from de4ml_spark.operators.text import zip_grams

    sh = zip_grams(tokens(text_col), n)
    ex = _spread(df, id_col).select(F.col(id_col), F.explode(sh).alias("s"))
    digest = ex.select(F.col(id_col), F.expr(md5_hex_sql("s")).alias("m"))
    return digest.select(
        F.col(id_col), F.expr(phash_from_hex_sql("m", 32)).alias("shingle")
    ).distinct()


def _band_candidates(banded: DataFrame, id_col: str) -> DataFrame:
    """Distinct (id_a < id_b) pairs sharing any (band, bucket)."""
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def _verify_candidates(
    ex: DataFrame,
    cand: DataFrame,
    id_col: str,
    threshold: float,
    sizes: DataFrame | None = None,
) -> DataFrame:
    """Exact-Jaccard verification of candidate pairs against the shingle
    rows ``ex``: prune the corpus to candidate docs (broadcast semi-join —
    the candidate set is tiny compared to the corpus), count intersections
    via the shingle equi-join, keep only candidate pairs, then the size
    join. ``sizes`` (id, n_sh) can be passed when the caller already
    computed per-doc shingle counts in another aggregate (the signature
    groupBy) — saves a full groupBy pass over ``ex``. Returns
    (id_a, id_b, jaccard)."""
    cand_ids = cand.select(
        F.explode(F.array("id_a", "id_b")).alias(id_col)
    ).distinct()
    exc = ex.join(F.broadcast(cand_ids), id_col)
    ca, cb = exc.alias("a"), exc.alias("b")
    inter = (
        ca.join(
            cb,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("inter"))
        .join(F.broadcast(cand), ["id_a", "id_b"])
    )
    if sizes is None:
        sizes = _shingle_sizes(ex, id_col)
    return (
        _jaccard_for_pairs(inter, sizes, id_col)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "inter", "n_a", "n_b", "jaccard")
    )


def minhash_lsh_pairs_portable(
    df: DataFrame,
    threshold: float = 0.8,
    num_hashes: int = 24,
    bands: int = 12,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MinHash+LSH near-dup pairs with an engine-portable hash family —
    same banding/verify pipeline as ``minhash_lsh_pairs`` but every hash is
    reproducible in ANSI SQL (DuckDB oracle: ``dedupq.minhash_oracle_sql``).

    Signature hash s of a doc = min over shingles x of (a_s*x + b_s) mod
    (2^31-1); band buckets pack the band's two signature values into one
    BIGINT (h0 * 2^31 + h1) — pure integer math, exact on both engines.
    Restricted to rows_per_band == 2 so bucket packing stays below 2^62."""
    rows_per_band = num_hashes // bands
    if rows_per_band != 2 or num_hashes % bands:
        raise ValueError("portable variant requires num_hashes == 2 * bands")
    ex = portable_shingle_rows(df, n, text_col, id_col).persist()
    fam = hash_family(num_hashes)
    mins = [
        F.expr(f"min((shingle * {a}L + {b}L) % {P31}L)").alias(f"h{s}")
        for s, (a, b) in enumerate(fam)
    ]
    # n_sh rides along in the signature aggregate — the Jaccard verify's
    # size join then reuses it instead of re-aggregating ``ex``. The
    # signature relation is persisted because two consumers read it
    # (band explode + size join); it is one small row per doc.
    sigs = (
        ex.groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_sh"), *mins)
        .persist()
    )
    banded = sigs.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        (
                            F.col(f"h{2 * b}") * F.lit(BAND_RADIX)
                            + F.col(f"h{2 * b + 1}")
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")
    cand = _band_candidates(banded, id_col).persist()
    sizes = sigs.select(id_col, "n_sh")
    result = _verify_candidates(ex, cand, id_col, threshold, sizes=sizes)
    return release_after(result, ex, sigs, cand)


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    num_hashes: int = 32,
    bands: int = 16,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MinHash+LSH near-dup candidates, verified with exact Jaccard.

    bands=16 over 32 hashes (rows/band=2) -> candidate P(match) at j=0.8 is
    1-(1-0.8^2)^16 ≈ 1.0; at j=0.3 it is ≈ 0.78 of a much smaller pair set —
    verified by exact Jaccard afterwards, so extra candidates cost compute,
    not correctness (the classic S-curve tradeoff).
    """
    rows_per_band = num_hashes // bands
    # Persist the exploded shingle rows ONCE: signatures, shingle-set sizes,
    # and the exact-Jaccard verify all derive from this single (id, shingle
    # BIGINT) relation — one corpus scan + one window sort total, and every
    # downstream op joins/aggregates 8-byte longs in whole-stage codegen.
    ex = shingle_rows(df, n, text_col, id_col).persist()
    mins = [
        F.expr(f"min(xxhash64(shingle, {s}))").alias(f"h{s}")
        for s in range(num_hashes)
    ]
    sigs = ex.groupBy(id_col).agg(*mins).select(
        id_col, F.array(*[F.col(f"h{s}") for s in range(num_hashes)]).alias("sig")
    )
    banded = sigs.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[F.col("sig")[i] for i in range(b * rows_per_band, (b + 1) * rows_per_band)]
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")
    cand = _band_candidates(banded, id_col).persist()
    result = _verify_candidates(ex, cand, id_col, threshold)
    return release_after(result, ex, cand)


def embedding_neardup_blocked(
    df: DataFrame,
    threshold: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int = 8,
) -> DataFrame:
    """Exact all-pairs cosine >= threshold via block-matrix multiply in
    Arrow-batched ``applyInPandas`` — the scale path for exact pair scoring.

    The interpreted pair-join path (embedding_neardup_pairs) evaluates one
    HOF fold per pair inside BroadcastNestedLoopJoin: ~2 us/pair, 25 s for
    12.5M pairs at sf0.1. Here each vector is replicated to its n_blocks
    block-pair groups (shuffle volume x n_blocks), and each group computes
    a dense numpy/BLAS similarity matrix (~GFLOP/s): same O(n²) flops,
    orders of magnitude faster per flop, and work is spread over
    n_blocks*(n_blocks+1)/2 independent tasks. Choose n_blocks so a block
    fits executor memory: block_rows ≈ corpus/n_blocks, matrix bytes ≈
    block_rows² * 8.

    Output pairs are exact; cos_sim is rounded to 6 decimals. BLAS
    summation order differs from the sequential fold, so last-bit
    differences are possible pre-round — tests gate set-equality of pairs
    against the fold path, not bit-equality of the raw doubles.
    """
    blocks = df.select(
        F.col(id_col).alias("vid"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("e"),
        (F.col(id_col) % n_blocks).alias("blk"),
    )
    partner = blocks.select(
        "vid",
        "e",
        "blk",
        F.explode(
            F.array(*[F.lit(b) for b in range(n_blocks)])
        ).alias("pb"),
    ).select(
        "vid",
        "e",
        "blk",
        F.least("blk", "pb").alias("ga"),
        F.greatest("blk", "pb").alias("gb"),
    ).distinct()

    out_schema = "id_a BIGINT, id_b BIGINT, cos_sim DOUBLE"

    def score_group(pdf):
        import numpy as np
        import pandas as pd

        ga, gb = int(pdf["ga"].iloc[0]), int(pdf["gb"].iloc[0])
        mat = np.array(pdf["e"].tolist(), dtype=np.float64)
        ids = pdf["vid"].to_numpy()
        blks = pdf["blk"].to_numpy()
        norms = np.sqrt((mat * mat).sum(axis=1))
        if ga == gb:
            sims = (mat @ mat.T) / np.outer(norms, norms)
            ia, ib = np.triu_indices(len(ids), k=1)
            id_a, id_b, cs = ids[ia], ids[ib], sims[ia, ib]
        else:
            a_mask, b_mask = blks == ga, blks == gb
            ma, mb = mat[a_mask], mat[b_mask]
            sims = (ma @ mb.T) / np.outer(norms[a_mask], norms[b_mask])
            ia, ib = np.nonzero(np.ones_like(sims, dtype=bool))
            id_a, id_b, cs = ids[a_mask][ia], ids[b_mask][ib], sims[ia, ib]
        lo = np.minimum(id_a, id_b)
        hi = np.maximum(id_a, id_b)
        cs = np.round(cs, 6)
        keep = (lo < hi) & (cs >= threshold)
        return pd.DataFrame(
            {"id_a": lo[keep], "id_b": hi[keep], "cos_sim": cs[keep]}
        )

    return (
        partner.groupBy("ga", "gb")
        .applyInPandas(score_group, out_schema)
        .select("id_a", "id_b", "cos_sim")
    )


def embedding_neardup_pairs_fast(
    df: DataFrame,
    threshold: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_blocks: int = 8,
) -> DataFrame:
    """Exact cosine pairs with the SAME values as
    :func:`embedding_neardup_pairs`, at blocked-BLAS speed (r17, guide
    §1.2/§4.2: fix the per-task work, then keep the exact semantics).

    Two stages:

    1. **Candidates** from :func:`embedding_neardup_blocked` at
       ``threshold - 1e-3``. BLAS reassociates the 64-term dot sum, but
       its result differs from the sequential fold by at most
       dim · 2⁻⁵² relative to the norm product (≈1.4e-14 — Cauchy-
       Schwarz bounds Σ|aᵢbᵢ| by ‖a‖‖b‖), and rounding to 6 decimals
       moves a value by ≤5e-7; a 1e-3 guard band is therefore ~10⁹×
       wider than the worst case, so the candidate set is a strict
       superset of the qualifying pairs. No false negatives.
    2. **Exact rescore** of candidates only: join the two vectors back
       (broadcast at test scale, shuffled hash at corpus scale) and
       recompute cos_sim with the UNROLLED left-to-right ``dot_sql`` —
       bit-identical to the HOF fold the pair-join path evaluates
       (similarity.py pins that equivalence) — inside a codegen'd
       BroadcastHashJoin, then apply the real threshold. Any BLAS
       false positive is dropped here.

    Replaces the interpreted BroadcastNestedLoopJoin all-pairs path for
    the two oracle-checked exact-cosine entries: the fold evaluated
    ~2 µs/pair interpreted (2M pairs → ~23 s at sf0.1); candidates ×
    rescore is ~1 s for the identical result set and values.
    """
    from de4ml_spark.operators.similarity import dot_sql, norm_sql

    cand = embedding_neardup_blocked(
        df, threshold - 1e-3, id_col, vec_col, n_blocks
    ).select("id_a", "id_b")
    v = df.select(
        F.col(id_col),
        F.transform(vec_col, lambda x: x.cast("double")).alias("e"),
    ).withColumn("nrm", F.expr(norm_sql("e", dim)))
    return (
        cand.join(
            v.select(
                F.col(id_col).alias("id_a"),
                F.col("e").alias("ea"),
                F.col("nrm").alias("na"),
            ),
            "id_a",
        )
        .join(
            v.select(
                F.col(id_col).alias("id_b"),
                F.col("e").alias("eb"),
                F.col("nrm").alias("nb"),
            ),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            F.round(
                F.expr(dot_sql("ea", "eb", dim))
                / (F.col("na") * F.col("nb")),
                6,
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def simhash_bands(bits: int, n_bands: int = 4) -> list[tuple[int, int]]:
    """(shift, width) per band: ``bits`` split into ``n_bands`` contiguous
    chunks, widths differing by at most 1 (e.g. 59 -> 15/15/15/14)."""
    base, extra = divmod(bits, n_bands)
    out, shift = [], 0
    for i in range(n_bands):
        width = base + (1 if i < extra else 0)
        out.append((shift, width))
        shift += width
    return out


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 64,
    portable: bool = False,
) -> DataFrame:
    """``bits``-bit SimHash: signature bit j is the majority vote of
    per-token hash bits j.

    The token hash defaults to xxhash64 (raw-throughput path);
    ``portable=True`` swaps in the engine-portable md5 hash so a DuckDB
    oracle can replay the signature bit-for-bit (then ``bits`` must be
    <= 59 to stay in positive BIGINT on both engines). The portable hash
    is a two-step projection — digest once, then byte arithmetic — since
    Catalyst does not CSE the md5 repeated inside the 8 byte terms.

    Shape: explode tokens -> one groupBy(id) with ``bits`` conditional SUMs
    -> assemble the signature from the vote signs. Everything stays in
    whole-stage codegen (higher-order-function lambdas are interpreted in
    Spark and were ~50x slower here); one shuffle on the doc id.
    """
    ex = _spread(df, id_col).select(
        F.col(id_col), F.explode(tokens(text_col)).alias("tok")
    )
    if portable:
        hashed = ex.select(
            F.col(id_col), F.expr(md5_hex_sql("tok")).alias("m")
        ).select(
            F.col(id_col), F.expr(phash_from_hex_sql("m", bits)).alias("h")
        )
    else:
        hashed = ex.withColumn("h", F.xxhash64("tok"))
    # Aggregates and the signature assembly are emitted as SQL strings (one
    # F.expr each) — building 64 vote columns from Column operators costs
    # hundreds of Py4J round trips of pure plan-construction latency.
    votes = [
        F.expr(
            f"sum(CASE WHEN (shiftrightunsigned(h, {j}) & 1) = 1 "
            f"THEN 1 ELSE -1 END)"
        ).alias(f"v{j}")
        for j in range(bits)
    ]
    voted = hashed.groupBy(id_col).agg(*votes)
    sig_sql = " | ".join(
        f"(CASE WHEN v{j} > 0 THEN shiftleft(1L, {j}) ELSE 0L END)"
        for j in range(bits)
    )
    return voted.select(F.col(id_col), F.expr(sig_sql).alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 64,
    portable: bool = False,
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) <= max_hamming. Candidates via
    4-band equality (pigeonhole: hamming<=3 ⇒ >=1 band equal), then exact
    Hamming verify via bit_count — no cross join. ``bits``/``portable``
    select the portable signature (see ``simhash``)."""
    sigs = simhash(df, text_col, id_col, bits, portable)
    bandcol = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    F.shiftrightunsigned(F.col("simhash"), shift)
                    .bitwiseAND(F.lit((1 << width) - 1))
                    .alias("bucket"),
                )
                for b, (shift, width) in enumerate(simhash_bands(bits))
            ]
        )
    ).alias("bb")
    banded = sigs.select(id_col, "simhash", bandcol).select(
        id_col, "simhash", "bb.band", "bb.bucket"
    )
    a, b2 = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b2,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = 64,
) -> DataFrame:
    """Pairs with cosine similarity >= threshold, exact arithmetic.

    Norms precompute once per vector in the (codegen'd) pre-join
    projection, so each pair costs one dot instead of three. The non-equi
    pair join executes as BroadcastNestedLoopJoin — no codegen — so the
    per-pair dot uses the HOF fold (inside an interpreted operator the
    fold's tight loop beats a deep unrolled tree). Test-scale path: full
    pair join (O(n²) — fine at sf). At 100 TB the candidate generation
    swaps to LSH bucketing (similarity.py random_hyperplane_buckets) with
    this same exact rescoring afterwards.
    """
    from de4ml_spark.operators.similarity import dot, norm, norm_sql

    v = df.select(
        F.col(id_col),
        F.transform(vec_col, lambda x: x.cast("double")).alias("e"),
    ).withColumn(
        "nrm",
        F.expr(norm_sql("e", dim)) if dim is not None else norm(F.col("e")),
    )
    a, b = v.alias("a"), v.alias("b")
    return (
        a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(
                dot(F.col("a.e"), F.col("b.e"))
                / (F.col("a.nrm") * F.col("b.nrm")),
                6,
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def connected_components(
    pairs: DataFrame,
    vertices: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 20,
) -> DataFrame:
    """Near-dup cluster assignment: (id, component) where component is the
    MIN id reachable through the pair graph; singletons map to themselves.

    Min-label propagation: each round every vertex takes the min of its own
    label and its neighbors' labels; stop when a round changes nothing.
    Rounds needed = graph diameter — near-dup clusters are tiny cliques/
    chains (2-4 hops), so this converges in a handful of rounds even at
    100 TB corpus scale; each round is one shuffle join on the edge list
    plus a groupBy-min. The edge list (near-dup pairs) is orders of
    magnitude smaller than the corpus, so rounds are cheap; labels persist
    each round and the previous round unpersists (bounded memory).

    The iteration is driver-controlled (non-SQL-expressible per round), but
    the FIXPOINT equals the transitive closure — the DuckDB oracle computes
    it with a recursive CTE.
    """
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .union(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .distinct()
        .persist()
    )
    labels = vertices.select(
        F.col(id_col).alias("node"), F.col(id_col).alias("comp")
    ).persist()
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges["src"] == labels["node"])
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("comp").alias("n_comp"))
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("comp"), F.coalesce(F.col("n_comp"), F.col("comp"))
                ).alias("comp"),
            )
            .persist()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    result = labels.select(
        F.col("node").alias(id_col), F.col("comp").alias("component")
    )
    return release_after(result, edges, labels)
