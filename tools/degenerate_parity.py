#!/usr/bin/env python
"""Degenerate-input cross-engine PARITY harness (round 14).

The round-13 degenerate sweeps pinned that no entry ABORTS on empty /
1-row / all-NULL / constant shards. This harness closes the remaining
blind spot: an entry that survives but silently DIVERGES from its
DuckDB oracle on degenerate input — e.g. an unguarded double 0.0/0.0
evaluating to NaN on Spark where DuckDB's division returns NULL
(exactly the class ADVICE r13 flagged in kappa's po /
mutual_info_nats). For every catalog entry with an oracle it runs BOTH
engines on the same degenerate tables and applies the driver-shaped
compare from tools/verify_oracle.py (row count, columns, type parity,
order-insensitive values with NaN distinct from NULL). The sweeps in
tests/test_empty_inputs.py now run THIS check per kind (the first runs
of the thirteen shapes found and fixed ~60 silent divergences / ANSI
aborts in total — see the per-shape notes in build_degenerate and
tests/test_empty_inputs.py), plus a no-abort-only sweep on the
out-of-contract 'dupconst' duplicate-key shape.

Usage: python tools/degenerate_parity.py [kind ...]   (kinds: empty
one null const oneclass negative emptytext unicode nonfinite ties
badjson epochs embnan nullkeys nulldocs nulltpch nullepochs nonfinone
mixed chaos emptyevents emptydocs missingcol extracol widened
driftmix driftcorrupt driftemb; default all twenty-eight —
nullepochs / nonfinone / mixed / chaos are round-15 COMPOSED shapes
(NULL keys x clock skew, nonfinite x one-class, one corruption kind
per table, and ALL event-level corruptions stacked in one table),
emptyevents / emptydocs are round-15 ASYMMETRIC-EMPTY shapes
(one table family empty while the rest stay populated), and
missingcol / extracol / widened are round-16 SCHEMA-DRIFT shapes
(a table directory mid-migration: a file missing a column, a file
with an unknown extra column, a file with a narrower physical type
than the manifest — both engines must null-fill / drop / widen
identically), driftmix composes one drift kind PER TABLE
(events missing props, documents + extra column, lineitem INT32
l_suppkey, orders missing o_orderpriority), driftcorrupt makes
the pre-migration events file ALSO corrupt (clock skew, NULL keys,
non-finite values inside the null-filled file), and driftemb drifts
the embeddings table (three-file directory: canonical +
missing-label + INT32 vec_id — found the cluster-purity
NULLS-FIRST/LAST majority-tie divergence). Exit 1 on any
divergence.
"""

from __future__ import annotations

import os
import sys
import tempfile

import duckdb

sys.path.insert(0, "/root/repo")

from tools.verify_oracle import canon, type_parity_errors  # noqa: E402

SRC = "/root/testdata/sf0.001"


def build_degenerate(kind: str, d: str) -> None:
    """Write a degenerate copy of every test table into ``d``:
    'empty' = zero rows, 'one' = LIMIT 1, 'null' = 5 rows with
    value/props all NULL, 'const' = five copies of one row with
    DISTINCT primary keys (event_id/doc_id/vec_id), 'nonfinite' =
    NaN/+-Inf in events.value, 'ties' = one repeated value across 20
    rows, 'dupconst' = five copies sharing one key (out-of-contract;
    no-abort checks only)."""
    con = duckdb.connect()
    base = (
        "region nation customer supplier part orders lineitem "
        "documents embeddings"
    ).split()
    if kind == "empty":
        lim, ev_extra = "LIMIT 0", "LIMIT 0"
    elif kind == "one":
        lim, ev_extra = "LIMIT 1", "LIMIT 1"
    elif kind in (
        "null", "oneclass", "negative", "emptytext", "unicode",
        "nonfinite", "ties", "badjson", "epochs", "embnan",
        "nullkeys", "nulldocs", "nulltpch",
        # round-15 composed shapes (VERDICT r14 #5): corruptions that
        # co-occur in one shard, the realistic 100 TB case
        "nullepochs", "nonfinone", "mixed", "chaos",
        # round-15 asymmetric-empty shapes: ONE table family empty
        # while the rest stay populated (a fresh landing zone or an
        # unavailable upstream — the all-empty shape cannot reach the
        # populated-joins-empty paths these probe)
        "emptyevents", "emptydocs",
        # round-16 schema-drift shapes (VERDICT r15 #2): a table that
        # is a DIRECTORY of files written across a schema migration —
        # one canonical-schema file plus one drifted file (missing
        # column / extra unknown column / narrower physical type).
        # Pins load_table's declared-manifest scan against the oracle's
        # union_by_name read: old files null-fill, extras drop,
        # INT32 widens to the BIGINT manifest, on BOTH engines.
        "missingcol", "extracol", "widened",
        # round-16 COMPOSED drift: one drift kind PER TABLE in the same
        # shard (a migration rolling through the lake table-by-table) —
        # events missing props, documents with an extra column,
        # lineitem with INT32 l_suppkey, orders missing o_orderpriority.
        # Reaches the relational tier the three single shapes don't
        # (NULL o_orderpriority exercises priority CASE/group paths).
        "driftmix",
        # round-16 drift x corruption: the PRE-MIGRATION events file is
        # also corrupt — no props column AND clock-skewed timestamps,
        # NULL keys, non-finite values (co-prime cycles, like chaos).
        # Pins that the manifest null-fill composes with every ingest
        # guard inside the same rows.
        "driftcorrupt",
        # round-16 embeddings drift: a THREE-file embeddings directory
        # (canonical + missing-label + INT32 vec_id) — NULL labels flow
        # into the centroid/purity/grouping entries, and the multi-file
        # union has more than one drifted schema at once.
        "driftemb",
    ):
        lim, ev_extra = "LIMIT 5", "LIMIT 5"
        if kind == "emptyevents":
            ev_extra = "LIMIT 0"
    elif kind in ("const", "dupconst"):
        # dupconst: the out-of-contract duplicate-key variant (five
        # rows sharing one doc_id/vec_id) — used by the no-abort sweep
        # only; doc-keyed entries legitimately diverge from their
        # oracles there (see KEYED below)
        lim, ev_extra = None, None
    else:
        raise ValueError(kind)
    # const keeps PRIMARY KEYS distinct (doc_id/vec_id, like the
    # builder already does for event_id): the sweep's target is
    # zero-variance VALUES with n > 1, not duplicate-key shards. Five
    # rows sharing one doc_id violate the key contract the checked-in
    # validation tier (contracts/validation.py, S11) enforces at
    # ingest, and under that invalid shape the doc-keyed dedup/text
    # entries legitimately disagree with their oracles (joins on a
    # 5-way duplicated key multiply differently across the two
    # independently-authored plans) — a documented out-of-contract
    # class, not an engine divergence.
    KEYED = (
        {"documents": "doc_id", "embeddings": "vec_id"}
        if kind == "const"
        else {}
    )
    for t in base:
        if kind == "emptydocs" and t in ("documents", "embeddings"):
            # asymmetric empty: the corpus tables are empty while the
            # relational/event tables stay populated
            con.execute(
                f"COPY (SELECT * FROM '{SRC}/{t}.parquet' LIMIT 0)"
                f" TO '{d}/{t}.parquet' (FORMAT PARQUET)"
            )
            continue
        if kind in ("emptytext", "unicode") and t == "documents":
            continue  # written by the text-shard branches below
        if kind == "driftmix" and t == "lineitem":
            # widened arm: l_suppkey written INT32 in the drifted file
            # (BIGINT manifest). LIMIT 12 + 8 keeps the usual 20 rows.
            ldir = f"{d}/lineitem.parquet"
            os.makedirs(ldir, exist_ok=True)
            con.execute(
                f"COPY (SELECT * FROM '{SRC}/lineitem.parquet' LIMIT 12)"
                f" TO '{ldir}/part-0.parquet' (FORMAT PARQUET)"
            )
            con.execute(
                "COPY (SELECT l_orderkey, l_partkey,"
                " CAST(l_suppkey AS INTEGER) AS l_suppkey, l_linenumber,"
                " l_quantity, l_extendedprice, l_discount, l_tax,"
                " l_returnflag, l_linestatus, l_shipdate"
                f" FROM '{SRC}/lineitem.parquet' LIMIT 8 OFFSET 12)"
                f" TO '{ldir}/part-1.parquet' (FORMAT PARQUET)"
            )
            continue
        if kind == "driftmix" and t == "orders":
            # missing-column arm: the drifted file predates the
            # o_orderpriority migration — old rows read NULL priority
            # (NULL group keys / CASE arms in the priority entries).
            odir = f"{d}/orders.parquet"
            os.makedirs(odir, exist_ok=True)
            con.execute(
                f"COPY (SELECT * FROM '{SRC}/orders.parquet' LIMIT 5)"
                f" TO '{odir}/part-0.parquet' (FORMAT PARQUET)"
            )
            con.execute(
                "COPY (SELECT o_orderkey, o_custkey, o_orderstatus,"
                " o_totalprice, o_orderdate"
                f" FROM '{SRC}/orders.parquet' LIMIT 5 OFFSET 5)"
                f" TO '{odir}/part-1.parquet' (FORMAT PARQUET)"
            )
            continue
        if kind == "driftemb" and t == "embeddings":
            edir = f"{d}/embeddings.parquet"
            os.makedirs(edir, exist_ok=True)
            con.execute(
                f"COPY (SELECT * FROM '{SRC}/embeddings.parquet' LIMIT 3)"
                f" TO '{edir}/part-0.parquet' (FORMAT PARQUET)"
            )
            con.execute(
                "COPY (SELECT vec_id, embedding"
                f" FROM '{SRC}/embeddings.parquet' LIMIT 1 OFFSET 3)"
                f" TO '{edir}/part-1.parquet' (FORMAT PARQUET)"
            )
            con.execute(
                "COPY (SELECT CAST(vec_id AS INTEGER) AS vec_id,"
                " embedding, label"
                f" FROM '{SRC}/embeddings.parquet' LIMIT 1 OFFSET 4)"
                f" TO '{edir}/part-2.parquet' (FORMAT PARQUET)"
            )
            continue
        if kind in (
            "missingcol", "extracol", "widened", "driftmix"
        ) and t == "documents":
            # schema-migration DIRECTORY: part-0 carries the canonical
            # schema, part-1 the drifted one (pre-migration file
            # missing `source` / unknown extra column / n_chars written
            # INT32 where the manifest says BIGINT). Both engines must
            # read the union null-filled / extras-dropped / widened.
            ddir = f"{d}/documents.parquet"
            os.makedirs(ddir, exist_ok=True)
            con.execute(
                f"COPY (SELECT * FROM '{SRC}/documents.parquet' LIMIT 3)"
                f" TO '{ddir}/part-0.parquet' (FORMAT PARQUET)"
            )
            drift = {
                "missingcol": "SELECT doc_id, text, lang, n_chars",
                "extracol": "SELECT *, CAST(7 AS BIGINT) AS crawl_batch",
                "driftmix": "SELECT *, CAST(7 AS BIGINT) AS crawl_batch",
                "widened": (
                    "SELECT doc_id, text, lang, source,"
                    " CAST(n_chars AS INTEGER) AS n_chars"
                ),
            }[kind]
            con.execute(
                f"COPY ({drift} FROM '{SRC}/documents.parquet'"
                f" LIMIT 2 OFFSET 3)"
                f" TO '{ddir}/part-1.parquet' (FORMAT PARQUET)"
            )
            continue
        if kind in ("nulltpch", "mixed", "chaos") and t == "lineitem":
            # relational-tier NULL shard: rows lose measures
            # (quantity/price/discount/tax), the part join key, or the
            # returnflag group key — probes the ~40 TPC-H-shape
            # entries' agg/join/group NULL semantics. LIMIT 20 keeps
            # several orders represented.
            con.execute(
                "COPY (SELECT l_orderkey,"
                " CASE (ROW_NUMBER() OVER (ORDER BY l_orderkey,"
                " l_linenumber)) % 5 WHEN 0 THEN NULL"
                " ELSE l_partkey END AS l_partkey,"
                " l_suppkey, l_linenumber,"
                " CASE (ROW_NUMBER() OVER (ORDER BY l_orderkey,"
                " l_linenumber)) % 5 WHEN 1 THEN NULL"
                " ELSE l_quantity END AS l_quantity,"
                " CASE (ROW_NUMBER() OVER (ORDER BY l_orderkey,"
                " l_linenumber)) % 5 WHEN 1 THEN NULL"
                " ELSE l_extendedprice END AS l_extendedprice,"
                " CASE (ROW_NUMBER() OVER (ORDER BY l_orderkey,"
                " l_linenumber)) % 5 WHEN 2 THEN NULL"
                " ELSE l_discount END AS l_discount,"
                " CASE (ROW_NUMBER() OVER (ORDER BY l_orderkey,"
                " l_linenumber)) % 5 WHEN 2 THEN NULL"
                " ELSE l_tax END AS l_tax,"
                " CASE (ROW_NUMBER() OVER (ORDER BY l_orderkey,"
                " l_linenumber)) % 5 WHEN 3 THEN NULL"
                " ELSE l_returnflag END AS l_returnflag,"
                " l_linestatus,"
                " CASE (ROW_NUMBER() OVER (ORDER BY l_orderkey,"
                " l_linenumber)) % 5 WHEN 4 THEN NULL"
                " ELSE l_shipdate END AS l_shipdate"
                f" FROM '{SRC}/lineitem.parquet' LIMIT 20)"
                f" TO '{d}/lineitem.parquet' (FORMAT PARQUET)"
            )
            continue
        if kind in ("nulltpch", "mixed", "chaos") and t == "orders":
            con.execute(
                "COPY (SELECT o_orderkey,"
                " CASE (ROW_NUMBER() OVER (ORDER BY o_orderkey)) % 5"
                " WHEN 0 THEN NULL ELSE o_custkey END AS o_custkey,"
                " o_orderstatus,"
                " CASE (ROW_NUMBER() OVER (ORDER BY o_orderkey)) % 5"
                " WHEN 1 THEN NULL ELSE o_totalprice END"
                " AS o_totalprice,"
                " o_orderdate, o_orderpriority"
                f" FROM '{SRC}/orders.parquet' LIMIT 10)"
                f" TO '{d}/orders.parquet' (FORMAT PARQUET)"
            )
            continue
        if kind in ("nulldocs", "mixed", "chaos") and t == "documents":
            # NULL-field document shard: rows lose text, lang, source,
            # or (one row) all three — a partially-ingested crawl
            # batch. The emptytext shape covered '' and whitespace;
            # NULL is the other arm (string_agg/COUNT/filter
            # semantics differ between '' and NULL).
            con.execute(
                "COPY (SELECT doc_id,"
                " CASE (ROW_NUMBER() OVER (ORDER BY doc_id)) % 5"
                " WHEN 0 THEN NULL WHEN 3 THEN NULL ELSE text END"
                " AS text,"
                " CASE (ROW_NUMBER() OVER (ORDER BY doc_id)) % 5"
                " WHEN 1 THEN NULL WHEN 3 THEN NULL ELSE lang END"
                " AS lang,"
                " CASE (ROW_NUMBER() OVER (ORDER BY doc_id)) % 5"
                " WHEN 2 THEN NULL WHEN 3 THEN NULL ELSE source END"
                " AS source,"
                " n_chars"
                f" FROM '{SRC}/documents.parquet' LIMIT 5)"
                f" TO '{d}/documents.parquet' (FORMAT PARQUET)"
            )
            continue
        if kind in ("embnan", "mixed", "chaos") and t == "embeddings":
            # corrupt-vector shard: one NaN element, one +Inf, one
            # -Inf, two clean (row 5 keeps the original) — the guard
            # must NULL the whole corrupted vector on both engines,
            # never repair or rank it.
            con.execute(
                "COPY (SELECT vec_id,"
                " CASE (ROW_NUMBER() OVER (ORDER BY vec_id)) % 5"
                " WHEN 0 THEN list_concat(['nan'::FLOAT], embedding[2:])"
                " WHEN 1 THEN list_concat(['inf'::FLOAT], embedding[2:])"
                " WHEN 2 THEN list_concat(['-inf'::FLOAT], embedding[2:])"
                " ELSE embedding END AS embedding, label"
                f" FROM '{SRC}/embeddings.parquet' LIMIT 5)"
                f" TO '{d}/embeddings.parquet' (FORMAT PARQUET)"
            )
            continue
        if kind in ("const", "dupconst"):
            con.execute(
                f"CREATE OR REPLACE VIEW one AS SELECT * FROM"
                f" '{SRC}/{t}.parquet' LIMIT 1"
            )
            if t in KEYED:
                cols = [
                    r[0]
                    for r in con.sql("DESCRIBE one").fetchall()
                ]
                proj = ", ".join(
                    "gs.g AS " + c if c == KEYED[t] else f"one.{c}"
                    for c in cols
                )
                con.execute(
                    f"COPY (SELECT {proj} FROM one,"
                    f" (SELECT unnest(generate_series(1, 5)) AS g) gs)"
                    f" TO '{d}/{t}.parquet' (FORMAT PARQUET)"
                )
            else:
                con.execute(
                    f"COPY (SELECT one.* FROM one, generate_series(1, 5))"
                    f" TO '{d}/{t}.parquet' (FORMAT PARQUET)"
                )
        else:
            con.execute(
                f"COPY (SELECT * FROM '{SRC}/{t}.parquet' {lim})"
                f" TO '{d}/{t}.parquet' (FORMAT PARQUET)"
            )
    if kind == "emptytext":
        # degenerate TEXT shard: empty / whitespace-only / single-char
        # documents (a scraped corpus routinely produces these). First
        # parity run found unanimous-rater cochran_q and one-token
        # simpson_lambda hitting ANSI DIVIDE_BY_ZERO — both fixed.
        con.execute(
            "COPY (SELECT doc_id,"
            " CASE (ROW_NUMBER() OVER (ORDER BY doc_id)) % 5"
            " WHEN 0 THEN '' WHEN 1 THEN '   ' WHEN 2 THEN 'a'"
            " WHEN 3 THEN chr(10) || chr(9) ELSE ' x ' END AS text,"
            " lang, source,"
            " CAST(CASE (ROW_NUMBER() OVER (ORDER BY doc_id)) % 5"
            " WHEN 0 THEN 0 WHEN 1 THEN 3 WHEN 2 THEN 1"
            " WHEN 3 THEN 2 ELSE 3 END AS BIGINT) AS n_chars"
            f" FROM '{SRC}/documents.parquet' LIMIT 5)"
            f" TO '{d}/documents.parquet' (FORMAT PARQUET)"
        )
    if kind == "unicode":
        # multibyte shard: CJK, accented latin, emoji, RTL, combining
        # marks — pins that the portable md5 hash (UTF-8 bytes),
        # length()/split() (codepoints), and every text entry agree
        # across engines on non-ASCII input. Clean on first run.
        texts = [
            "\u4e2d\u6587\u5206\u8bcd \u6d4b\u8bd5 \u6587\u672c",
            "caf\u00e9 na\u00efve r\u00e9sum\u00e9 \u00fcber",
            "\U0001f600 emoji \U0001f680 test",
            "\u05e9\u05dc\u05d5\u05dd \u05e2\u05d5\u05dc\u05dd rtl",
            "\u00e9 combining \u00e0 marks",
        ]
        con.execute(
            "COPY (SELECT doc_id,"
            " CASE (ROW_NUMBER() OVER (ORDER BY doc_id)) % 5"
            " WHEN 0 THEN ? WHEN 1 THEN ? WHEN 2 THEN ?"
            " WHEN 3 THEN ? ELSE ? END AS text,"
            " lang, source, CAST(10 AS BIGINT) AS n_chars"
            f" FROM '{SRC}/documents.parquet' LIMIT 5)"
            f" TO '{d}/documents.parquet' (FORMAT PARQUET)",
            texts,
        )
        con.execute(
            "COPY (SELECT event_id, CAST(epoch_ns(ts) AS BIGINT) AS ts,"
            " user_id, event_type, value, props"
            f" FROM '{SRC}/events.parquet' LIMIT 20)"
            f" TO '{d}/events.parquet' (FORMAT PARQUET)"
        )
        return
    # events ships as INT64 nanos in the real testdata; mirror that so
    # load_table's nanos normalization path is the one exercised
    if kind == "null":
        con.execute(
            "COPY (SELECT event_id, CAST(epoch_ns(ts) AS BIGINT) AS ts,"
            " user_id, event_type, CAST(NULL AS DOUBLE) AS value,"
            " CAST(NULL AS VARCHAR) AS props"
            f" FROM '{SRC}/events.parquet' {ev_extra})"
            f" TO '{d}/events.parquet' (FORMAT PARQUET)"
        )
    elif kind == "oneclass":
        # a shard window with NO clicks: the shape that empties one
        # side of every click-vs-purchase two-sample entry. The first
        # parity run here found 15 divergences (pair-existence
        # asymmetry between the shared pair frame and the oracle byval
        # CTEs; 3 ANSI aborts) — all fixed.
        con.execute(
            "COPY (SELECT event_id, CAST(epoch_ns(ts) AS BIGINT) AS ts,"
            " user_id, event_type, value, props"
            f" FROM '{SRC}/events.parquet'"
            " WHERE event_type != 'click' LIMIT 5)"
            f" TO '{d}/events.parquet' (FORMAT PARQUET)"
        )
    elif kind == "negative":
        # refund/chargeback shard: every value negated, both classes
        # present (LIMIT 20 of the real events covers click AND
        # purchase) — exercises negative cents through the battery and
        # the budget recurrences. First run caught quota_admission's
        # MAX(total) oracle overshooting the non-monotone running total
        # and 4 small-sample zero-variance ANSI aborts — all fixed.
        con.execute(
            "COPY (SELECT event_id, CAST(epoch_ns(ts) AS BIGINT) AS ts,"
            " user_id, event_type, -abs(value) AS value, props"
            f" FROM '{SRC}/events.parquet' LIMIT 20)"
            f" TO '{d}/events.parquet' (FORMAT PARQUET)"
        )
    elif kind in ("nonfinite", "mixed"):
        # corrupt-float shard: NaN / +Inf / -Inf landed in the value
        # column (an upstream 0.0/0.0 or overflow written to parquet —
        # IEEE doubles round-trip through parquet, so at 100 TB some
        # shard WILL contain them). Both classes present (LIMIT 20
        # covers click AND purchase); 1 in 4 rows keeps a finite value
        # so aggregates see a mix. The 'mixed' composed shape reuses
        # this events arm alongside nulldocs documents, embnan
        # embeddings and nulltpch lineitem/orders — one corruption
        # kind PER TABLE in the same shard, the realistic 100 TB case
        # (VERDICT r14 #5).
        con.execute(
            "COPY (SELECT event_id, CAST(epoch_ns(ts) AS BIGINT) AS ts,"
            " user_id, event_type,"
            " CASE (ROW_NUMBER() OVER (ORDER BY event_id)) % 4"
            " WHEN 0 THEN 'nan'::DOUBLE WHEN 1 THEN 'inf'::DOUBLE"
            " WHEN 2 THEN '-inf'::DOUBLE ELSE value END AS value, props"
            f" FROM '{SRC}/events.parquet' LIMIT 20)"
            f" TO '{d}/events.parquet' (FORMAT PARQUET)"
        )
    elif kind == "nullepochs":
        # composed shape (VERDICT r14 #5): NULL keys INSIDE a
        # clock-skewed shard. Rows lose user_id/event_type while other
        # rows (and one of the SAME rows) sit at the 1970 epoch
        # boundary or decades in the future — pins that the NULL-key
        # group/join semantics and the far-calendar date math hold
        # SIMULTANEOUSLY (a NULL-key row at 2100 must neither join nor
        # explode a calendar spine).
        con.execute(
            "COPY (SELECT event_id,"
            " CASE (ROW_NUMBER() OVER (ORDER BY event_id)) % 5"
            " WHEN 0 THEN CAST(86400000000000 AS BIGINT)"          # 1970-01-02
            " WHEN 1 THEN CAST(4102444800000000000 AS BIGINT)"     # 2100-01-01
            " ELSE CAST(epoch_ns(ts) AS BIGINT) END AS ts,"
            " CASE (ROW_NUMBER() OVER (ORDER BY event_id)) % 5"
            " WHEN 0 THEN NULL WHEN 2 THEN NULL ELSE user_id END"
            " AS user_id,"
            " CASE (ROW_NUMBER() OVER (ORDER BY event_id)) % 5"
            " WHEN 1 THEN NULL WHEN 2 THEN NULL ELSE event_type END"
            " AS event_type,"
            " value, props"
            f" FROM '{SRC}/events.parquet' LIMIT 20)"
            f" TO '{d}/events.parquet' (FORMAT PARQUET)"
        )
    elif kind == "chaos":
        # every event-level corruption stacked in ONE table (the worst
        # realistic shard): clock-skew timestamps, NULL keys,
        # non-finite values and malformed props TOGETHER, with
        # different cycle lengths (5/4/3) so rows carry varied
        # corruption combinations — one row is simultaneously
        # 1970-epoch, NULL-keyed, NaN-valued and bad-JSON. The other
        # tables carry the mixed arms (nulltpch/nulldocs/embnan), so
        # this is `mixed` with the events arm escalated from one
        # corruption to all four.
        con.execute(
            "COPY (SELECT event_id,"
            " CASE (ROW_NUMBER() OVER (ORDER BY event_id)) % 5"
            " WHEN 0 THEN CAST(86400000000000 AS BIGINT)"          # 1970-01-02
            " WHEN 1 THEN CAST(4102444800000000000 AS BIGINT)"     # 2100-01-01
            " ELSE CAST(epoch_ns(ts) AS BIGINT) END AS ts,"
            " CASE (ROW_NUMBER() OVER (ORDER BY event_id)) % 5"
            " WHEN 0 THEN NULL WHEN 2 THEN NULL ELSE user_id END"
            " AS user_id,"
            " CASE (ROW_NUMBER() OVER (ORDER BY event_id)) % 5"
            " WHEN 1 THEN NULL WHEN 2 THEN NULL ELSE event_type END"
            " AS event_type,"
            " CASE (ROW_NUMBER() OVER (ORDER BY event_id)) % 4"
            " WHEN 0 THEN 'nan'::DOUBLE WHEN 1 THEN 'inf'::DOUBLE"
            " WHEN 2 THEN '-inf'::DOUBLE ELSE value END AS value,"
            " CASE (ROW_NUMBER() OVER (ORDER BY event_id)) % 3"
            " WHEN 0 THEN 'not json at all'"
            " WHEN 1 THEN '{\"k\": 1.5}'"
            " ELSE props END AS props"
            f" FROM '{SRC}/events.parquet' LIMIT 20)"
            f" TO '{d}/events.parquet' (FORMAT PARQUET)"
        )
    elif kind == "nonfinone":
        # composed shape (VERDICT r14 #5): a corrupt-float shard that
        # ALSO empties one class — no clicks at all, and NaN/±Inf mixed
        # into the surviving class's values. The two-sample battery
        # must degrade to its empty-side convention AFTER the finite
        # guard NULLs the corrupt values, identically on both engines.
        con.execute(
            "COPY (SELECT event_id, CAST(epoch_ns(ts) AS BIGINT) AS ts,"
            " user_id, event_type,"
            " CASE (ROW_NUMBER() OVER (ORDER BY event_id)) % 4"
            " WHEN 0 THEN 'nan'::DOUBLE WHEN 1 THEN 'inf'::DOUBLE"
            " WHEN 2 THEN '-inf'::DOUBLE ELSE value END AS value, props"
            f" FROM '{SRC}/events.parquet'"
            " WHERE event_type != 'click' LIMIT 20)"
            f" TO '{d}/events.parquet' (FORMAT PARQUET)"
        )
    elif kind == "ties":
        # all-ties shard: distinct keys and timestamps but ONE repeated
        # value across every row (both classes present) — pins rank /
        # percentile / median interpolation and tie-break determinism
        # where the engines' window tie semantics could drift.
        con.execute(
            "COPY (SELECT event_id, CAST(epoch_ns(ts) AS BIGINT) AS ts,"
            " user_id, event_type, CAST(7.0 AS DOUBLE) AS value, props"
            f" FROM '{SRC}/events.parquet' LIMIT 20)"
            f" TO '{d}/events.parquet' (FORMAT PARQUET)"
        )
    elif kind == "badjson":
        # malformed-props shard: scraped/evolved producers routinely
        # write invalid JSON, wrong-typed fields, floats where the
        # contract says integer, or empty strings. Spark's from_json
        # is PERMISSIVE (NULL on malformed); DuckDB's -> operators
        # RAISE — the parity pin forces the oracle to the same
        # NULL-degrade semantics (json_valid + TRY_CAST).
        con.execute(
            "COPY (SELECT event_id, CAST(epoch_ns(ts) AS BIGINT) AS ts,"
            " user_id, event_type, value,"
            " CASE (ROW_NUMBER() OVER (ORDER BY event_id)) % 5"
            " WHEN 0 THEN 'not json at all'"
            " WHEN 1 THEN '{\"k\": \"abc\"}'"
            " WHEN 2 THEN '{\"k\": 1.5}'"
            " WHEN 3 THEN '{\"k\": 7}'"
            " ELSE '' END AS props"
            f" FROM '{SRC}/events.parquet' LIMIT 20)"
            f" TO '{d}/events.parquet' (FORMAT PARQUET)"
        )
    elif kind == "epochs":
        # clock-skew shard: timestamps at the 1970 epoch boundary and
        # decades in the future (a producer with a zeroed or corrupted
        # clock). Pins cross-engine date math (dow/week/epoch
        # arithmetic) far outside the 2024 test window and that
        # calendar-spine entries stay BOUNDED when one bad row spans
        # 80 years (a gapfill that explodes per-key spines would hang
        # here long before diverging).
        con.execute(
            "COPY (SELECT event_id,"
            " CASE (ROW_NUMBER() OVER (ORDER BY event_id)) % 5"
            " WHEN 0 THEN CAST(86400000000000 AS BIGINT)"          # 1970-01-02
            " WHEN 1 THEN CAST(4102444800000000000 AS BIGINT)"     # 2100-01-01
            " ELSE CAST(epoch_ns(ts) AS BIGINT) END AS ts,"
            " user_id, event_type, value, props"
            f" FROM '{SRC}/events.parquet' LIMIT 20)"
            f" TO '{d}/events.parquet' (FORMAT PARQUET)"
        )
    elif kind == "nullkeys":
        # NULL grouping/join keys (an anonymous or redacted producer):
        # some rows lose user_id, some event_type, one both. Both
        # engines group NULL keys together and never join-match them —
        # the divergence risk is ORDER-dependent plans (ROW_NUMBER /
        # LIMIT over a nullable key: Spark sorts NULLs FIRST ascending,
        # DuckDB LAST).
        con.execute(
            "COPY (SELECT event_id, CAST(epoch_ns(ts) AS BIGINT) AS ts,"
            " CASE (ROW_NUMBER() OVER (ORDER BY event_id)) % 5"
            " WHEN 0 THEN NULL WHEN 2 THEN NULL ELSE user_id END"
            " AS user_id,"
            " CASE (ROW_NUMBER() OVER (ORDER BY event_id)) % 5"
            " WHEN 1 THEN NULL WHEN 2 THEN NULL ELSE event_type END"
            " AS event_type,"
            " value, props"
            f" FROM '{SRC}/events.parquet' LIMIT 20)"
            f" TO '{d}/events.parquet' (FORMAT PARQUET)"
        )
    elif kind in ("const", "dupconst"):
        con.execute(
            "COPY (SELECT gs.g AS event_id, CAST(epoch_ns(ts) AS BIGINT)"
            " AS ts, user_id, event_type, value, props"
            f" FROM (SELECT * FROM '{SRC}/events.parquet' LIMIT 1),"
            " (SELECT unnest(generate_series(1, 5)) AS g) gs)"
            f" TO '{d}/events.parquet' (FORMAT PARQUET)"
        )
    elif kind in (
        "missingcol", "extracol", "widened", "driftmix", "driftcorrupt"
    ):
        # schema-migration DIRECTORY (same layout as the documents arm):
        # part-0 canonical, part-1 drifted — a pre-migration file
        # missing `props`, an unknown `ingest_shard` column, or user_id
        # written INT32 where the manifest says BIGINT. LIMIT 10 + 10
        # keeps the usual 20-row window (both classes present).
        edir = f"{d}/events.parquet"
        os.makedirs(edir, exist_ok=True)
        con.execute(
            "COPY (SELECT event_id, CAST(epoch_ns(ts) AS BIGINT) AS ts,"
            " user_id, event_type, value, props"
            f" FROM '{SRC}/events.parquet' LIMIT 10)"
            f" TO '{edir}/part-0.parquet' (FORMAT PARQUET)"
        )
        drift = {
            "missingcol": (
                "SELECT event_id, CAST(epoch_ns(ts) AS BIGINT) AS ts,"
                " user_id, event_type, value"
            ),
            "driftmix": (
                "SELECT event_id, CAST(epoch_ns(ts) AS BIGINT) AS ts,"
                " user_id, event_type, value"
            ),
            # pre-migration file (no props) that is ALSO corrupt:
            # clock-skew (%5), NULL keys (%5 offset), non-finite
            # values (%4) — co-prime with the 10-row window so rows
            # carry varied combinations (chaos discipline)
            "driftcorrupt": (
                "SELECT event_id,"
                " CASE (ROW_NUMBER() OVER (ORDER BY event_id)) % 5"
                " WHEN 0 THEN CAST(86400000000000 AS BIGINT)"
                " WHEN 1 THEN CAST(4102444800000000000 AS BIGINT)"
                " ELSE CAST(epoch_ns(ts) AS BIGINT) END AS ts,"
                " CASE (ROW_NUMBER() OVER (ORDER BY event_id)) % 5"
                " WHEN 0 THEN NULL WHEN 2 THEN NULL ELSE user_id END"
                " AS user_id,"
                " CASE (ROW_NUMBER() OVER (ORDER BY event_id)) % 5"
                " WHEN 1 THEN NULL WHEN 2 THEN NULL ELSE event_type END"
                " AS event_type,"
                " CASE (ROW_NUMBER() OVER (ORDER BY event_id)) % 4"
                " WHEN 0 THEN 'nan'::DOUBLE WHEN 1 THEN 'inf'::DOUBLE"
                " WHEN 2 THEN '-inf'::DOUBLE ELSE value END AS value"
            ),
            "extracol": (
                "SELECT event_id, CAST(epoch_ns(ts) AS BIGINT) AS ts,"
                " user_id, event_type, value, props,"
                " 'shard-b' AS ingest_shard"
            ),
            "widened": (
                "SELECT event_id, CAST(epoch_ns(ts) AS BIGINT) AS ts,"
                " CAST(user_id AS INTEGER) AS user_id, event_type,"
                " value, props"
            ),
        }[kind]
        con.execute(
            f"COPY ({drift} FROM '{SRC}/events.parquet'"
            " LIMIT 10 OFFSET 10)"
            f" TO '{edir}/part-1.parquet' (FORMAT PARQUET)"
        )
    else:
        con.execute(
            "COPY (SELECT event_id, CAST(epoch_ns(ts) AS BIGINT) AS ts,"
            " user_id, event_type, value, props"
            f" FROM '{SRC}/events.parquet' {ev_extra})"
            f" TO '{d}/events.parquet' (FORMAT PARQUET)"
        )


def oracle_con(d: str) -> duckdb.DuckDBPyConnection:
    """DuckDB views over a degenerate dir. The degenerate events table
    stores ts as plain BIGINT nanos (the builders above), so the view
    truncates to micro timestamps exactly like load_table's
    nanos-normalization (floor-div 1000) — without this the oracle SQL's
    TIMESTAMP comparisons would type-error where the real testdata's
    TIMESTAMP(NANOS) logical type reads as TIMESTAMP_NS."""
    from de4ml_spark.session import (
        EVENTS_TS_FROM_NANOS,
        TABLES,
        duckdb_view_sql,
    )

    con = duckdb.connect()
    for t in TABLES:
        ts = EVENTS_TS_FROM_NANOS if t == "events" else "ts"
        path = f"{d}/{t}.parquet"
        if os.path.isdir(path):
            # schema-migration directory shard: glob + union_by_name
            # (duckdb_view_sql renders read_parquet(..., union_by_name))
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS "
            + duckdb_view_sql(t, path, events_ts=ts)
        )
    return con


def _parity_one(spark, d: str, name, fn, sql, cur) -> str | None:
    """Compare one entry across engines; return a divergence string or
    None. ``cur`` is a per-thread DuckDB cursor sharing the view
    catalog of the kind's connection."""
    try:
        sdf = fn(spark, d)
        srows = [tuple(r) for r in sdf.collect()]
        scols = sdf.columns
    except Exception as e:  # noqa: BLE001
        return f"{name}: spark raised: {str(e).splitlines()[0][:90]}"
    try:
        rel = cur.sql(sql)
        ocols = list(rel.columns)
        otypes = [str(t) for t in rel.types]
        orows = rel.fetchall()
    except Exception as e:  # noqa: BLE001
        return f"{name}: duckdb raised: {str(e).splitlines()[0][:90]}"
    terrs = type_parity_errors(sdf.dtypes, ocols, otypes)
    if terrs:
        return f"{name}: type drift: {'; '.join(terrs[:2])}"
    if len(srows) != len(orows):
        return f"{name}: rowcount spark={len(srows)} oracle={len(orows)}"
    if sorted(scols) != sorted(ocols):
        return f"{name}: column drift"
    a, b = canon(srows, scols), canon(orows, ocols)
    if a != b:
        bad = [(x, y) for x, y in zip(a, b) if x != y][:1]
        return f"{name}: value divergence: {str(bad)[:160]}"
    return None


# Fleet width for the per-kind sweep (referenced by run_parity's
# docstring and the executor below so the two cannot drift). The sweep
# is LATENCY-bound, not CPU-bound (measured ~70 CPU-s over an 83 s
# wall on the chaos shape): per-entry driver work — plan build, py4j
# round trips, job scheduling on KB shards — dominates, so width is
# the lever, env-overridable for measurement.
MAX_WORKERS = int(os.environ.get("SPARK_GRAFT_PARITY_WORKERS", "16"))

# Per-process transient ledger: entry name -> how many times an
# in-fleet divergence vanished under an independent (fresh-plan)
# serial re-run. One clean independent retry downgrades the event to a
# logged transient; a SECOND flake of the same entry in the same
# process is reported as a failure — a genuinely nondeterministic
# cross-engine divergence must not be maskable by retries forever
# (ADVICE r14).
#
# Keyed by entry name ONLY, deliberately shared across all sweep kinds
# in one pytest process (ADVICE r15): two independent one-off races of
# the same entry under different shapes therefore hard-fail the gate.
# That direction of error is the acceptable one — it fails red on a
# ~1-in-25,000,000 double-coincidence instead of ever masking a real
# kind-dependent flake, and the live base rate (2 transient firings in
# ~6,700 entry-runs under deliberate 3x-concurrent stress, round 15)
# makes a same-process double-hit effectively unobservable. If CI ever
# reds on a genuine cross-kind double-transient, re-key to
# (entry, kind); until then the stricter ledger stands.
_TRANSIENTS: dict[str, int] = {}


def run_parity(spark, d: str, only: set[str] | None = None) -> list[str]:
    """Run every oracle-backed entry on both engines against dir ``d``;
    return divergence descriptions (empty = full parity). Entries that
    RAISE on either engine are also reported — the no-abort sweeps pin
    that separately, but a raise here means the compare didn't run.

    Entries run CONCURRENTLY (``MAX_WORKERS`` threads): Spark job
    submission is thread-safe and the shards are tiny, so the sweep is
    dominated by per-job scheduling latency that overlaps cleanly —
    measured ~4-5x faster per kind than the serial loop. DuckDB side
    uses one cursor per thread over the kind's shared view catalog.
    Deferred cache releases drain once at the end (entries cache
    KB-sized frames on these shards; draining mid-flight from another
    thread would only force a benign recompute anyway).

    Divergence triage (VERDICT r14 #1): anything that fails in-fleet is
    re-run serially on an INDEPENDENT plan — the entry's memoized
    prepared plan is evicted (``catalog.evict``) and deferred persists
    drained first, so the retry rebuilds from the parquet scan instead
    of re-collecting a corrupted checkpoint/persisted block (the
    round-14 flake class: a ~1-in-5000 local-mode race caches an empty
    block mid-fleet; the old retry reused the memoized frame and the
    corruption survived). A semantic divergence reproduces on the fresh
    plan and is reported; a race does not — it is logged as transient
    ONCE, and quarantined as a failure if the same entry flakes again
    in this process."""
    from concurrent.futures import ThreadPoolExecutor

    import __spark_entry__ as entrymod
    from de4ml_spark.cache import drain_deferred
    from de4ml_spark.queries import catalog

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    con = oracle_con(d)
    work = [
        (name, fn)
        for name, fn in qs.items()
        if name in oracles and (not only or name in only)
    ]

    def job(item):
        name, fn = item
        return _parity_one(spark, d, name, fn, oracles[name], con.cursor())

    try:
        with ThreadPoolExecutor(max_workers=MAX_WORKERS) as ex:
            results = list(ex.map(job, work))
    finally:
        drain_deferred()
    confirmed: list[str] = []
    for res, (name, fn) in zip(results, work):
        if res is None:
            continue
        # Independent serial re-run: evict the memoized plan and drain
        # deferred persists so the rebuild starts from clean state.
        catalog.evict(name, d)
        drain_deferred()
        retry = _parity_one(spark, d, name, fn, oracles[name], con.cursor())
        drain_deferred()
        if retry is not None:
            confirmed.append(retry)
            continue
        _TRANSIENTS[name] = _TRANSIENTS.get(name, 0) + 1
        if _TRANSIENTS[name] > 1:
            confirmed.append(
                f"{name}: flaky (in-fleet divergence x{_TRANSIENTS[name]}"
                f" this process; fresh-plan re-runs clean): {res}"
            )
        else:
            # keep one-off transients visible in CI logs without failing
            print(
                "  transient (in-fleet only; independent fresh-plan"
                f" re-run clean): {res}"
            )
    return confirmed


def main() -> int:
    from de4ml_spark.session import get_spark

    kinds = sys.argv[1:] or [
        "empty", "one", "null", "const", "oneclass", "negative",
        "emptytext", "unicode", "nonfinite", "ties", "badjson",
        "epochs", "embnan", "nullkeys", "nulldocs", "nulltpch",
        "nullepochs", "nonfinone", "mixed", "chaos",
        "emptyevents", "emptydocs",
        "missingcol", "extracol", "widened", "driftmix", "driftcorrupt",
        "driftemb",
    ]
    spark = get_spark("degenerate_parity", cpus=8)
    bad = 0
    for kind in kinds:
        with tempfile.TemporaryDirectory(prefix=f"degen_{kind}_") as d:
            build_degenerate(kind, d)
            fails = run_parity(spark, d)
            print(f"== {kind}: {len(fails)} divergences")
            for f in fails:
                print(f"  {f}")
            bad += len(fails)
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
