"""Property-based tests (hypothesis) for the pure plan-construction logic,
plus randomized single-DataFrame checks of operators against plain-Python
reference implementations.

The hypothesis targets are driver-side pure functions (no Spark jobs), so
hundreds of examples run in milliseconds; the Spark-side randomized tests
batch all cases into ONE DataFrame so the whole property costs one job.
"""

from __future__ import annotations

import random

from hypothesis import given, settings
from hypothesis import strategies as st

from de4ml_spark.contracts.jsonschema import (
    flatten_manifest,
    merge_manifests,
    struct_from_json_schema,
    to_json_schema,
)

# ---------------------------------------------------------------------------
# JSON Schema -> StructType -> manifest round-trip properties
# ---------------------------------------------------------------------------

_prim = st.sampled_from(["string", "integer", "number", "boolean"])
_name = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1, max_size=8
)


@st.composite
def json_schemas(draw, depth=2):
    """Random object schema: primitives, nested objects, arrays of
    primitives, arrays of flat objects (the reference's full type surface)."""
    n = draw(st.integers(1, 4))
    names = draw(
        st.lists(_name, min_size=n, max_size=n, unique=True)
    )
    props = {}
    for nm in names:
        kind = draw(st.integers(0, 3 if depth > 0 else 1))
        if kind == 0:
            props[nm] = {"type": draw(_prim)}
        elif kind == 1:
            props[nm] = {"type": "array", "items": {"type": draw(_prim)}}
        elif kind == 2:
            props[nm] = draw(json_schemas(depth=depth - 1))
        else:
            # array<struct> fields must be primitive-only (the reference
            # flattens exactly one level; flatten_manifest rejects deeper)
            k = draw(st.integers(1, 3))
            leaf_names = draw(st.lists(_name, min_size=k, max_size=k, unique=True))
            flat = {
                "type": "object",
                "properties": {
                    ln: {"type": draw(_prim)} for ln in leaf_names
                },
            }
            props[nm] = {"type": "array", "items": flat}
    return {"type": "object", "properties": props}


@given(json_schemas())
@settings(max_examples=200, deadline=None)
def test_manifest_paths_unique_and_ordered(schema):
    struct = struct_from_json_schema(schema)
    manifest = flatten_manifest(struct)
    # every leaf yields exactly one path; paths unique; order deterministic
    assert len(manifest) == len(set(manifest))
    assert manifest == flatten_manifest(struct_from_json_schema(schema))
    # __ appears only as a nesting separator: splitting on __ re-yields
    # non-empty components
    for path in manifest:
        assert all(part for part in path.split("__"))


@given(json_schemas(), json_schemas())
@settings(max_examples=200, deadline=None)
def test_manifest_merge_is_additive_prefix(a, b):
    ma = flatten_manifest(struct_from_json_schema(a))
    mb = flatten_manifest(struct_from_json_schema(b))
    combined = sorted(set(ma) | set(mb))
    merged = merge_manifests(ma, combined)
    # old columns keep their exact positions (old files stay readable)
    assert merged[: len(ma)] == ma
    # nothing is lost and nothing duplicated
    assert sorted(merged) == combined


# ---------------------------------------------------------------------------
# StructType -> JSON Schema -> StructType round trip (export direction)
# ---------------------------------------------------------------------------

from pyspark.sql import types as T  # noqa: E402

_canon = st.sampled_from(
    [T.LongType(), T.DoubleType(), T.StringType(), T.BooleanType()]
)
# types outside the reference's JSON surface: exported via the spark_type
# escape hatch, must still round-trip exactly
_exotic = st.sampled_from(
    [
        T.IntegerType(),
        T.FloatType(),
        T.DateType(),
        T.TimestampType(),
        T.DecimalType(12, 2),
        T.BinaryType(),
    ]
)


@st.composite
def struct_types(draw, depth=2):
    n = draw(st.integers(1, 4))
    names = draw(st.lists(_name, min_size=n, max_size=n, unique=True))
    fields = []
    for nm in names:
        kind = draw(st.integers(0, 4 if depth > 0 else 2))
        if kind == 0:
            dt = draw(_canon)
        elif kind == 1:
            dt = draw(_exotic)
        elif kind == 2:
            dt = T.ArrayType(draw(st.one_of(_canon, _exotic)))
        elif kind == 3:
            dt = draw(struct_types(depth=depth - 1))
        else:
            dt = T.ArrayType(draw(struct_types(depth=depth - 1)))
        fields.append(T.StructField(nm, dt, nullable=draw(st.booleans())))
    return T.StructType(fields)


@given(struct_types())
@settings(max_examples=200, deadline=None)
def test_to_json_schema_round_trip_fixpoint(struct):
    """Export -> import is the identity on StructTypes (including
    nullability-as-required and escape-hatch types), and re-export of the
    imported struct is a schema fixpoint."""
    schema = to_json_schema(struct)
    assert struct_from_json_schema(schema) == struct
    assert to_json_schema(struct_from_json_schema(schema)) == schema


@given(json_schemas())
@settings(max_examples=200, deadline=None)
def test_import_export_import_fixpoint(schema):
    """For any schema in the reference's surface, import -> export ->
    import lands on the same StructType (export loses only syntactic
    variation, never structure)."""
    struct = struct_from_json_schema(schema)
    assert struct_from_json_schema(to_json_schema(struct)) == struct


# ---------------------------------------------------------------------------
# Operator vs plain-Python reference, batched into one DataFrame
# ---------------------------------------------------------------------------


def _py_shingles(text: str, n: int = 3) -> set[str]:
    toks = text.split()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def test_ngram_jaccard_matches_python_reference(spark):
    """300 random doc pairs (some near-dup, some disjoint): the operator's
    (inter, jaccard) must equal the plain-Python set computation."""
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(50)]
    docs = []
    for i in range(0, 300, 2):
        base = [rng.choice(vocab) for _ in range(rng.randint(3, 30))]
        mutated = list(base)
        if rng.random() < 0.5 and len(mutated) > 4:
            mutated[rng.randrange(len(mutated))] = rng.choice(vocab)
        else:
            mutated = [rng.choice(vocab) for _ in range(rng.randint(3, 30))]
        docs.append((i, " ".join(base)))
        docs.append((i + 1, " ".join(mutated)))
    df = spark.createDataFrame(docs, "doc_id BIGINT, text STRING")

    from de4ml_spark.operators.dedup import ngram_jaccard_pairs

    got = {
        (r["id_a"], r["id_b"]): (r["inter"], round(r["jaccard"], 9))
        for r in ngram_jaccard_pairs(df, threshold=0.0).collect()
    }
    py_sh = {i: _py_shingles(t) for i, t in docs}
    for (ia, ib), (inter, jac) in got.items():
        expect_inter = len(py_sh[ia] & py_sh[ib])
        expect_union = len(py_sh[ia] | py_sh[ib])
        assert inter == expect_inter, (ia, ib)
        assert jac == round(expect_inter / expect_union, 9), (ia, ib)
    # completeness: every python pair with inter>0 must appear
    ids = sorted(py_sh)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            if py_sh[a] and py_sh[b] and py_sh[a] & py_sh[b]:
                assert (a, b) in got, (a, b)


def test_nearest_join_matches_python_reference(spark):
    """Random probe/feature streams (with equal-instant collisions): the
    union + prev/next carry-window nearest join must equal the brute-force
    Python nearest computation on every probe — including tolerance
    cutoffs, equidistant prefer-earlier ties, and equal-instant
    max-tiebreak resolution."""
    from pyspark.sql import functions as F

    from de4ml_spark.operators.asof import nearest_join

    rng = random.Random(23)
    TOL = 50  # microseconds, in a 0..400 range so cutoffs actually bite
    probes, feats = [], []
    fid = 0
    for key in range(12):
        for i in range(rng.randint(0, 12)):
            probes.append((key * 1000 + i, key, rng.randint(0, 400)))
        for _ in range(rng.randint(0, 12)):
            fid += 1
            # coarse grid forces equal-instant collisions
            feats.append((key, rng.randint(0, 40) * 10, fid, rng.random()))
    left = spark.createDataFrame(
        [(pid, k, t) for pid, k, t in probes],
        "probe_id BIGINT, k BIGINT, tus BIGINT",
    ).select(
        "probe_id", "k", F.timestamp_micros(F.col("tus")).alias("ts")
    )
    right = spark.createDataFrame(
        feats, "k BIGINT, tus BIGINT, fid BIGINT, v DOUBLE"
    ).select(
        "k", F.timestamp_micros(F.col("tus")).alias("ts"), "fid", "v"
    )
    got = {
        r["probe_id"]: (r["v_near"], r["dist_us"])
        for r in nearest_join(
            left,
            right,
            on="k",
            tolerance_us=TOL,
            payload=["v"],
            right_tiebreak=["fid"],
        ).collect()
    }

    by_key: dict[int, list] = {}
    for k, t, fid_, v in feats:
        by_key.setdefault(k, []).append((t, fid_, v))
    for pid, k, t in probes:
        cands = by_key.get(k, [])
        # backward: greatest t' <= t (break equal t' by max fid);
        # forward: smallest t' > t... forward frame includes t'==t rows?
        # they sort BEFORE the probe, so equal-instant rows are backward
        prev = max(
            ((tp, f, v) for tp, f, v in cands if tp <= t), default=None
        )
        nxt = min(
            ((tp, f, v) for tp, f, v in cands if tp > t), default=None
        )
        prev_ok = prev is not None and t - prev[0] <= TOL
        next_ok = nxt is not None and nxt[0] - t <= TOL
        if prev_ok and (not next_ok or t - prev[0] <= nxt[0] - t):
            want = (prev[2], t - prev[0])
        elif next_ok:
            want = (nxt[2], nxt[0] - t)
        else:
            want = (None, None)
        assert got[pid] == want, (pid, k, t, got[pid], want)


def test_validation_rules_match_python_reference(spark):
    """Random rows against bounds/required rules: the split must equal the
    plain-Python predicate on every row."""
    from de4ml_spark.contracts.validation import Rule, split_valid

    rng = random.Random(13)
    rows = [
        (
            i,
            None if rng.random() < 0.2 else rng.uniform(-2, 2),
            None if rng.random() < 0.1 else rng.randint(-5, 15),
        )
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "id BIGINT, p DOUBLE, n BIGINT")
    rules = [
        Rule(loc="p", kind="required"),
        Rule(loc="p", kind="bounds", lo=0.0, hi=1.0),
        Rule(loc="n", kind="bounds", lo=0, hi=10),
    ]
    valid, rejects = split_valid(df, rules)
    got_valid = {r["id"] for r in valid.collect()}

    def ok(p, n):
        if p is None or not (0.0 <= p <= 1.0):
            return False
        return n is None or 0 <= n <= 10

    want_valid = {i for i, p, n in rows if ok(p, n)}
    assert got_valid == want_valid
    assert {r["id"] for r in rejects.collect()} == {
        i for i, _, _ in rows
    } - want_valid


def test_winnowing_shared_run_guarantee(spark):
    """Winnowing guarantee: two docs sharing a run of >= k+w-1 consecutive
    tokens (k=3, w=4 -> 6 tokens) share at least one fingerprint; identical
    docs share ALL fingerprints."""
    rng = random.Random(99)
    vocab = [f"t{i}" for i in range(40)]
    shared = [rng.choice(vocab) for _ in range(8)]  # 8-token shared run
    docs = []
    for i in range(0, 60, 2):
        pre = [rng.choice(vocab) for _ in range(rng.randint(0, 10))]
        post = [rng.choice(vocab) for _ in range(rng.randint(0, 10))]
        pre2 = [rng.choice(vocab) for _ in range(rng.randint(0, 10))]
        docs.append((i, " ".join(pre + shared + post)))
        docs.append((i + 1, " ".join(pre2 + shared)))
    docs.append((1000, " ".join(shared)))
    docs.append((1001, " ".join(shared)))
    df = spark.createDataFrame(docs, "doc_id BIGINT, text STRING")

    # reuse the query fn's plan on an in-memory table via a temp view swap:
    # simplest is to call the operator logic directly through the query by
    # writing parquet, but the query takes sf_dir — so inline the same plan
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from de4ml_spark.operators.text import tokens

    k, w = 3, 4
    toks = tokens("text")
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (k - 1), F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
    )
    ex = df.select("doc_id", F.posexplode(grams).alias("pos", "g")).withColumn(
        "h", F.substring(F.md5("g"), 1, 16)
    )
    win = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
    part = Window.partitionBy("doc_id")
    fps = (
        ex.withColumn("mh", F.min("h").over(win))
        .withColumn("maxp", F.max("pos").over(part))
        .filter(F.col("pos") <= F.col("maxp") - (w - 1))
        .select("doc_id", F.col("mh").alias("fp"))
        .distinct()
    )
    by_doc: dict[int, set] = {}
    for r in fps.collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    for i in range(0, 60, 2):
        assert by_doc[i] & by_doc[i + 1], f"docs {i},{i+1} share no fingerprint"
    assert by_doc[1000] == by_doc[1001]


# ---------------------------------------------------------------------------
# Round-4 operators vs plain-Python references (one DataFrame, one job each)
# ---------------------------------------------------------------------------


def test_ewma_matches_python_reference(spark):
    """alpha=1/2 EWMA closed form == the literal recurrence, bit-exact on
    6-decimal-grid inputs across random per-key series."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rng = random.Random(7)
    rows = []
    for key in range(40):
        for i in range(rng.randint(1, 30)):
            rows.append((key, i, round(rng.uniform(0, 2000), 6)))
    df = spark.createDataFrame(rows, "k BIGINT, i INT, x DOUBLE")
    w = Window.partitionBy("k").orderBy("i")
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    xi = (F.col("x").cast("decimal(24,6)") * 1000000).cast("bigint")
    staged = df.withColumn("xi", xi).withColumn(
        "rn", F.row_number().over(w)
    ).withColumn(
        "t",
        F.when(F.col("rn") == 1, F.col("xi")).otherwise(
            F.col("xi") * F.expr("shiftleft(CAST(1 AS BIGINT), rn - 2)")
        ),
    )
    got = {
        (r["k"], r["i"]): r["ewma"]
        for r in staged.select(
            "k",
            "i",
            (
                F.sum("t").over(wcum).cast("double")
                / F.expr("CAST(shiftleft(CAST(1 AS BIGINT), rn - 1) AS DOUBLE)")
                / F.lit(1000000.0)
            ).alias("ewma"),
        ).collect()
    }
    by_key: dict[int, list] = {}
    for k, i, x in rows:
        by_key.setdefault(k, []).append((i, x))
    for k, series in by_key.items():
        y = None
        for i, x in sorted(series):
            # the reference recurrence, in exact integer micro-units
            xi_int = int(round(x * 1000000))
            y = xi_int if y is None else (xi_int + y) / 2.0
            assert got[(k, i)] == y / 1000000.0, (k, i)


def test_cdc_chunks_reassemble_lossless(spark):
    """CDC chunking must be a partition of the token stream: chunk texts
    joined by a single space reproduce the original text exactly."""
    from pyspark.sql import functions as F

    from de4ml_spark.operators.portable_hash import phash_col
    from de4ml_spark.operators.text import tokens

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(40)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 300))))
        for i in range(60)
    ]
    docs = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    toks = tokens("text")
    n = F.size(toks)
    bnds = F.filter(
        F.sequence(F.lit(1), n),
        lambda i: phash_col(F.element_at(toks, i), 3) == 0,
    )
    base = docs.select(
        "doc_id", "text", toks.alias("toks"), n.alias("n"), bnds.alias("bnds")
    )
    starts = F.concat(
        F.array(F.lit(1)),
        F.transform(
            F.filter(F.col("bnds"), lambda b: b < F.col("n")), lambda b: b + 1
        ),
    )
    s2 = base.select("doc_id", "text", "toks", "n", "bnds", starts.alias("starts"))
    ends = F.transform(
        F.col("starts"),
        lambda s: F.coalesce(
            F.array_min(F.filter(F.col("bnds"), lambda b: b >= s)), F.col("n")
        ),
    )
    s3 = s2.select("doc_id", "text", "starts", ends.alias("ends"), "toks")
    chunks = F.zip_with(
        F.col("starts"),
        F.col("ends"),
        lambda s, e: F.concat_ws(" ", F.slice(F.col("toks"), s, e - s + 1)),
    )
    out = s3.select("doc_id", "text", F.array_join(chunks, " ").alias("re"))
    for r in out.collect():
        assert r["re"] == r["text"], r["doc_id"]


def test_grouped_quantiles_match_numpy(spark):
    """Histogram-based grouped quantiles == numpy's linear interpolation
    on random per-group samples (including duplicate-heavy groups)."""
    import numpy as np

    from de4ml_spark.profile.battery import grouped_exact_quantiles

    rng = random.Random(13)
    rows = []
    for g in range(12):
        size = rng.randint(1, 200)
        # duplicate-heavy: values drawn from a small grid
        grid = rng.randint(2, 25)
        for _ in range(size):
            rows.append((g, round(rng.randint(0, grid) * 0.5, 1)))
    df = spark.createDataFrame(rows, "g BIGINT, v DOUBLE")
    got = {
        r["g"]: (r["q25"], r["q50"], r["q75"], r["n"])
        for r in grouped_exact_quantiles(df, ["g"], "v", [0.25, 0.5, 0.75]).collect()
    }
    by_g: dict[int, list] = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    for g, vs in by_g.items():
        q25, q50, q75 = np.percentile(np.array(vs), [25, 50, 75], method="linear")
        gq25, gq50, gq75, n = got[g]
        assert n == len(vs)
        assert abs(gq25 - q25) < 1e-12 and abs(gq50 - q50) < 1e-12
        assert abs(gq75 - q75) < 1e-12, g


def test_grouped_quantiles_from_hist_matches_raw(spark):
    """The pre-aggregated-histogram entry point == the raw-row path on the
    same multiset, including counts > 1 and value collisions after a
    derived-value re-key (the mad_price |x − median| reuse shape)."""
    from pyspark.sql import functions as F

    from de4ml_spark.profile.battery import (
        grouped_exact_quantiles,
        grouped_exact_quantiles_from_hist,
    )

    rng = random.Random(29)
    rows = []
    for g in range(5):
        for _ in range(rng.randint(3, 120)):
            # symmetric grid so |v - center| collides distinct values
            rows.append((g, round(rng.randint(-6, 6) * 0.5, 1)))
    df = spark.createDataFrame(rows, "g BIGINT, v DOUBLE")
    raw = grouped_exact_quantiles(df, ["g"], "v", [0.25, 0.5, 0.75])
    hist = (
        df.groupBy(F.col("g"), F.col("v").alias("__v"))
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    hst = grouped_exact_quantiles_from_hist(hist, ["g"], [0.25, 0.5, 0.75])
    assert sorted(map(tuple, raw.collect())) == sorted(
        map(tuple, hst.collect())
    )
    # derived-value re-key: |v| merges +x/-x histogram rows; must equal
    # the raw path over the same derived rows
    dev_raw = grouped_exact_quantiles(
        df.select("g", F.abs(F.col("v")).alias("v")), ["g"], "v", [0.5]
    )
    dev_hist = (
        hist.groupBy(F.col("g"), F.abs(F.col("__v")).alias("__v"))
        .agg(F.sum("__cnt").alias("__cnt"))
    )
    dev_hst = grouped_exact_quantiles_from_hist(dev_hist, ["g"], [0.5])
    assert sorted(map(tuple, dev_raw.collect())) == sorted(
        map(tuple, dev_hst.collect())
    )


def test_pattern_automaton_matches_regex(spark):
    """The streaming automaton's transition function == regex count on
    random symbol strings (single-batch equivalence; cross-batch is
    covered in test_streaming_patterns)."""
    import re

    rng = random.Random(17)
    for _ in range(300):
        s = "".join(rng.choice("vcpes") for _ in range(rng.randint(0, 40)))
        open_, conv = False, 0
        for ch in s:
            if ch == "v":
                open_ = True
            elif ch == "p" and open_:
                conv += 1
                open_ = False
        assert conv == len(re.findall("v[^vp]*p", s)), s


def test_rolling_active_users_matches_python_reference(spark):
    """Interval-stabbing sliding distinct == brute-force per-day distinct
    count on random sparse user-day activity — including merge boundaries
    (gaps of exactly window_days and window_days+1), duplicate events per
    day, and days with zero active users (must appear with 0)."""
    import datetime

    from pyspark.sql import functions as F

    from de4ml_spark.queries.tsq2 import rolling_active_users

    rng = random.Random(41)
    base = datetime.date(2024, 3, 1)
    rows = []
    eid = 0
    for user in range(15):
        for _ in range(rng.randint(0, 10)):
            off = rng.choice(
                # cluster around merge-critical gaps: dense runs plus
                # offsets that land exactly 7 and 8 days apart
                [rng.randint(0, 5), rng.randint(0, 60), 7 * rng.randint(0, 8)]
            )
            for _ in range(rng.randint(1, 2)):  # duplicate same-day events
                eid += 1
                rows.append((eid, user, off))
    ev = spark.createDataFrame(
        rows, "event_id BIGINT, user_id BIGINT, off INT"
    ).select(
        "event_id",
        "user_id",
        F.date_add(F.lit(base), F.col("off")).cast("timestamp").alias("ts"),
    )
    for window_days in (1, 7):
        got = {
            r["day"]: r["active_users_7d"]
            for r in rolling_active_users(ev, window_days=window_days).collect()
        }
        by_user_days = {}
        for _, user, off in rows:
            by_user_days.setdefault(user, set()).add(off)
        lo, hi = (
            min(o for _, _, o in rows),
            max(o for _, _, o in rows),
        )
        assert set(got) == {
            base + datetime.timedelta(days=d) for d in range(lo, hi + 1)
        }
        for d in range(lo, hi + 1):
            want = sum(
                1
                for days in by_user_days.values()
                if any(d - (window_days - 1) <= a <= d for a in days)
            )
            day = base + datetime.timedelta(days=d)
            assert got[day] == want, (window_days, day, got[day], want)


def test_transition_matrix_matches_python_reference(spark):
    """LAG-bigram transition counts and probabilities == brute force on
    random per-user symbol sequences with equal-timestamp collisions
    (resolved by the event_id tiebreak in both)."""
    from fractions import Fraction

    from pyspark.sql import functions as F

    from de4ml_spark.queries.tsq2 import transition_matrix

    rng = random.Random(43)
    rows = []
    eid = 0
    for user in range(12):
        for _ in range(rng.randint(0, 15)):
            eid += 1
            # coarse time grid forces equal-ts ties broken by event_id
            rows.append((eid, user, rng.randint(0, 5), rng.choice("abcd")))
    ev = spark.createDataFrame(
        rows, "event_id BIGINT, user_id BIGINT, tus BIGINT, event_type STRING"
    ).select(
        "event_id",
        "user_id",
        F.timestamp_micros(F.col("tus")).alias("ts"),
        "event_type",
    )
    got = {
        (r["from_type"], r["to_type"]): (r["n"], r["prob_r"])
        for r in transition_matrix(ev).collect()
    }
    seqs = {}
    for eid_, user, t, sym in rows:
        seqs.setdefault(user, []).append((t, eid_, sym))
    counts = {}
    for user, seq in seqs.items():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + 1
    row_tot = {}
    for (a, _), n in counts.items():
        row_tot[a] = row_tot.get(a, 0) + n
    assert set(got) == set(counts)
    for (a, b), n in counts.items():
        frac = Fraction(n, row_tot[a])
        # half-up rounding at 6 decimals, exactly as exact_round_div_sql
        want_r = float((2 * frac.numerator * 10**6 + frac.denominator)
                       // (2 * frac.denominator)) / 10**6
        assert got[(a, b)] == (n, want_r), (a, b, got[(a, b)], (n, want_r))


def test_throttle_matches_python_reference(spark):
    """The applyInPandas trailing-throttle == the brute-force recurrence
    (keep iff >= gap after previous KEPT) on random bursty streams,
    including equal-timestamp ties (id order) and gap-exactly-equal
    boundaries — the case a lag-vs-previous-EVENT filter gets wrong."""
    from pyspark.sql import functions as F

    from de4ml_spark.operators.throttle import throttle

    rng = random.Random(47)
    GAP = 10
    rows = []
    eid = 0
    for key in range(10):
        t = 0
        for _ in range(rng.randint(0, 20)):
            eid += 1
            # increments cluster around the gap boundary (0 = ties)
            t += rng.choice([0, 1, 3, GAP - 1, GAP, GAP + 1])
            rows.append((eid, key, t))
    ev = spark.createDataFrame(
        rows, "event_id BIGINT, k BIGINT, tus BIGINT"
    ).select("event_id", "k", F.timestamp_micros(F.col("tus")).alias("ts"))
    got = {
        r["event_id"]
        for r in throttle(ev, ["k"], min_gap_us=GAP).collect()
    }
    want = set()
    by_key = {}
    for eid_, key, t in rows:
        by_key.setdefault(key, []).append((t, eid_))
    for seq in by_key.values():
        seq.sort()
        last = None
        for t, eid_ in seq:
            if last is None or t - last >= GAP:
                want.add(eid_)
                last = t
    assert got == want


def test_capped_sessions_match_python_reference(spark):
    """Gap-OR-cap sessionization == brute-force recurrence on random
    bursty streams: cap firing mid-burst, gap-exactly-equal and
    cap-exactly-equal boundaries (both use strict >), equal-ts ties."""
    from pyspark.sql import functions as F

    from de4ml_spark.operators.sessions import capped_sessions

    rng = random.Random(53)
    GAP, CAP = 10, 25
    rows = []
    eid = 0
    for key in range(12):
        t = 0
        for _ in range(rng.randint(0, 25)):
            eid += 1
            t += rng.choice([0, 2, 4, GAP, GAP + 1, CAP, CAP + 1])
            rows.append((eid, key, t))
    ev = spark.createDataFrame(
        rows, "event_id BIGINT, user_id BIGINT, tus BIGINT"
    ).select(
        "event_id", "user_id", F.timestamp_micros(F.col("tus")).alias("ts")
    )
    got = {
        (r["user_id"], r["session_start_us"], r["session_end_us"], r["n_events"])
        for r in capped_sessions(ev, gap_us=GAP, max_len_us=CAP).collect()
    }
    want = set()
    by_key = {}
    for eid_, key, t in rows:
        by_key.setdefault(key, []).append((t, eid_))
    for key, seq in by_key.items():
        seq.sort()
        start = prev = seq[0][0]
        count = 0
        for t, _ in seq:
            if count and (t - prev > GAP or t - start > CAP):
                want.add((key, start, prev, count))
                start = t
                count = 0
            prev = t
            count += 1
        want.add((key, start, prev, count))
    assert got == want


def test_incident_windows_match_python_reference(spark):
    """Hot-hour detection, gaps-and-islands window merging, and the
    bucketed interval join == brute force on random spiky hour loads —
    including windows merged across exactly-2h spacing and events at the
    half-open [w_start, w_end) boundaries."""
    import datetime

    from pyspark.sql import functions as F

    from de4ml_spark.queries.tsq2 import incident_windows

    rng = random.Random(59)
    base = datetime.datetime(2024, 5, 1)
    rows = []
    eid = 0
    for hour in range(72):
        # spiky load: most hours 1-2 events, some 8-12
        n = rng.choice([1, 1, 1, 2, 2, 9, 12])
        for _ in range(n):
            eid += 1
            rows.append(
                (eid, rng.randint(0, 20), hour, rng.randint(0, 3599))
            )
    ev = spark.createDataFrame(
        rows, "event_id BIGINT, user_id BIGINT, hr INT, sec INT"
    ).select(
        "event_id",
        "user_id",
        (
            F.lit(base).cast("timestamp")
            + F.make_interval(secs=F.col("hr") * 3600 + F.col("sec"))
        ).alias("ts"),
    )
    got = {
        (r["w_start"], r["w_end"], r["n_hot_hours"], r["n_events"], r["n_users"])
        for r in incident_windows(ev).collect()
    }

    # brute force
    by_hour = {}
    for _, _, hr, _ in rows:
        by_hour[hr] = by_hour.get(hr, 0) + 1
    total, n_hours = len(rows), len(by_hour)
    hot = sorted(h for h, n in by_hour.items() if n * n_hours * 10 > 11 * total)
    islands = []
    for h in hot:
        if islands and h - islands[-1][-1] <= 2:
            islands[-1].append(h)
        else:
            islands.append([h])
    want = set()
    for isl in islands:
        s = base + datetime.timedelta(hours=isl[0], minutes=-30)
        e = base + datetime.timedelta(hours=isl[-1], minutes=90)
        evs = [
            (eid_, uid)
            for eid_, uid, hr, sec in rows
            if s <= base + datetime.timedelta(seconds=hr * 3600 + sec) < e
        ]
        want.add((s, e, len(isl), len(evs), len({u for _, u in evs})))
    assert hot, "degenerate test data: no hot hours"
    assert got == want


def test_quota_admission_matches_python_reference(spark):
    """Quota-capped admission == brute-force recurrence on random bursty
    values: rejected events must NOT consume budget (a later smaller
    event can still be admitted after a rejection), exact quota-boundary
    admits (<=), day-boundary resets, equal-ts ties by id."""
    from pyspark.sql import functions as F

    from de4ml_spark.operators.quota import quota_admission

    rng = random.Random(61)
    Q = 1000  # cents
    rows = []
    eid = 0
    for key in range(10):
        for day in range(3):
            for _ in range(rng.randint(0, 12)):
                eid += 1
                # cents chosen so rejections + later-admits both occur,
                # including exact-boundary values
                cents = rng.choice([100, 250, 400, 500, 1000, 900])
                rows.append((eid, key, day, rng.randint(0, 86399), cents))
    ev = spark.createDataFrame(
        rows, "event_id BIGINT, user_id BIGINT, d INT, sec INT, cents BIGINT"
    ).select(
        "event_id",
        "user_id",
        F.timestamp_seconds(
            F.col("d") * 86400 + F.col("sec")
        ).alias("ts"),
        (F.col("cents") / 100.0).alias("value"),
    )
    got = {
        (r["user_id"], r["day"].isoformat(), r["n_accepted"], r["n_rejected"], r["consumed_c"])
        for r in quota_admission(ev, quota_cents=Q).collect()
    }
    import datetime

    by_kd = {}
    for eid_, key, day, sec, cents in rows:
        by_kd.setdefault((key, day), []).append((sec, eid_, cents))
    want = set()
    for (key, day), seq in by_kd.items():
        seq.sort()
        total = acc = rej = 0
        for _, _, cents in seq:
            if total + cents <= Q:
                total += cents
                acc += 1
            else:
                rej += 1
        d = (datetime.date(1970, 1, 1) + datetime.timedelta(days=day)).isoformat()
        want.add((key, d, acc, rej, total))
    assert got == want


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1),
                min_size=1, max_size=40, unique=True))
@settings(max_examples=20, deadline=None)
def test_hll_replica_matches_engine_rho(spark, members):
    """Fuzz: for arbitrary member values, the Python HLL replica's
    (bucket, rho) pairs must equal the engine's SQL derivation — the
    contract that makes streaming state mergeable into batch registers."""
    from de4ml_spark.queries.sketchq import HLL_M, _hll_rho_sql
    from de4ml_spark.operators.portable_hash import phash_spark_sql
    from de4ml_spark.streaming.sketches import phash58_py

    df = spark.createDataFrame([(str(m),) for m in members], "s STRING")
    got = {
        r["s"]: (r["bucket"], r["rho"])
        for r in df.selectExpr(
            "s", f"{phash_spark_sql('s', 58)} AS h"
        )
        .selectExpr(
            "s",
            f"h % {HLL_M} AS bucket",
            f"{_hll_rho_sql(f'(h DIV {HLL_M})', 'spark')} AS rho",
        )
        .collect()
    }
    for m in members:
        h = phash58_py(str(m))
        w = h // HLL_M
        rho = 53 if w == 0 else 53 - w.bit_length()
        assert got[str(m)] == (h % HLL_M, rho), m
