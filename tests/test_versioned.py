"""Versioned-table layer: snapshot commits, time travel, crash orphans,
vacuum retention, keyed upsert."""

from __future__ import annotations

import os

import pytest

from de4ml_spark.etl import versioned as vt


def _df(spark, rows):
    return spark.createDataFrame(rows, "k BIGINT, val STRING")


def test_commit_read_time_travel_history(spark, tmp_path):
    root = str(tmp_path / "tbl")
    v0 = vt.commit(spark, root, _df(spark, [(1, "a"), (2, "b")]))
    v1 = vt.commit(spark, root, _df(spark, [(1, "a2"), (3, "c")]))
    assert (v0, v1) == (0, 1)
    assert vt.latest_version(root) == 1
    assert {tuple(r) for r in vt.read(spark, root).collect()} == {
        (1, "a2"),
        (3, "c"),
    }
    # time travel to the first snapshot
    assert {tuple(r) for r in vt.read(spark, root, version=0).collect()} == {
        (1, "a"),
        (2, "b"),
    }
    hist = vt.history(root)
    assert [h["version"] for h in hist] == [0, 1]
    assert hist[1]["is_current"] and not hist[0]["is_current"]


def test_crashed_commit_leaves_orphan_and_reader_unaffected(spark, tmp_path):
    root = str(tmp_path / "tbl")
    vt.commit(spark, root, _df(spark, [(1, "a")]))
    # simulate a crash mid-commit: snapshot dir written, pointer never moved
    _df(spark, [(9, "half")]).write.parquet(os.path.join(root, "v=1"))
    assert vt.latest_version(root) == 0
    assert {tuple(r) for r in vt.read(spark, root).collect()} == {(1, "a")}
    # next commit skips past the orphan; vacuum removes it
    v = vt.commit(spark, root, _df(spark, [(2, "b")]))
    assert v == 2
    removed = vt.vacuum(root, keep=10)
    assert removed == [1]
    assert {tuple(r) for r in vt.read(spark, root).collect()} == {(2, "b")}


def test_vacuum_retention_and_time_travel_window(spark, tmp_path):
    root = str(tmp_path / "tbl")
    for i in range(4):
        vt.commit(spark, root, _df(spark, [(i, f"v{i}")]))
    removed = vt.vacuum(root, keep=2)
    assert removed == [0, 1]
    assert {h["version"] for h in vt.history(root)} == {2, 3}
    with pytest.raises(FileNotFoundError):
        vt.read(spark, root, version=0)
    assert {tuple(r) for r in vt.read(spark, root, version=2).collect()} == {
        (2, "v2")
    }


def test_upsert_composite_key_new_snapshot(spark, tmp_path):
    root = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(1, "x", 10.0), (1, "y", 20.0), (2, "x", 30.0)],
        "a BIGINT, b STRING, v DOUBLE",
    )
    vt.commit(spark, root, base)
    updates = spark.createDataFrame(
        [(1, "y", 99.0), (3, "z", 40.0)], "a BIGINT, b STRING, v DOUBLE"
    )
    v = vt.upsert(spark, root, updates, key=["a", "b"])
    assert v == 1
    got = {tuple(r) for r in vt.read(spark, root).collect()}
    # composite key: only (1, y) replaced — (1, x) must survive (the
    # single-key bug class ADVICE.md flagged)
    assert got == {(1, "x", 10.0), (1, "y", 99.0), (2, "x", 30.0), (3, "z", 40.0)}
    # previous snapshot untouched
    pre = {tuple(r) for r in vt.read(spark, root, version=0).collect()}
    assert pre == {(1, "x", 10.0), (1, "y", 20.0), (2, "x", 30.0)}


def test_versioned_snapshot_sink_streaming(spark, tmp_path):
    """File stream -> versioned sink: each epoch lands as a committed
    snapshot; the latest read sees the newest epoch, history keeps all."""
    import json

    from de4ml_spark.streaming.sinks import versioned_snapshot_sink

    src = tmp_path / "src"
    src.mkdir()
    root = str(tmp_path / "tbl")
    (src / "a.json").write_text(json.dumps({"k": 1, "val": "a"}) + "\n")
    stream = (
        spark.readStream.schema("k BIGINT, val STRING")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    q = versioned_snapshot_sink(stream, root, str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
        (src / "b.json").write_text(json.dumps({"k": 2, "val": "b"}) + "\n")
        q.processAllAvailable()
    finally:
        q.stop()
    versions = vt.committed_versions(root)
    assert len(versions) == 2
    latest = {tuple(r) for r in vt.read(spark, root).collect()}
    assert latest == {(2, "b")}
    first = {tuple(r) for r in vt.read(spark, root, version=versions[0]).collect()}
    assert first == {(1, "a")}


def test_snapshot_diff_cdf(spark, tmp_path):
    """CDF between snapshots: insert/delete/update classified per key,
    unchanged rows absent, payload taken from the correct side."""
    from pyspark.sql import functions as F

    from de4ml_spark.etl.versioned import commit, snapshot_diff, upsert

    root = str(tmp_path / "vt")
    v1 = commit(
        spark,
        root,
        spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
            "id BIGINT, name STRING, score DOUBLE",
        ),
    )
    # update id=2, insert id=4; then delete id=3 via a fresh commit
    upsert(
        spark,
        root,
        spark.createDataFrame(
            [(2, "b", 25.0), (4, "d", 40.0)],
            "id BIGINT, name STRING, score DOUBLE",
        ),
        key="id",
    )
    from de4ml_spark.etl.versioned import latest_version, read

    v2 = latest_version(root)
    v3 = commit(spark, root, read(spark, root).filter(F.col("id") != 3))

    d12 = {
        (r["id"], r["_change"], r["score"])
        for r in snapshot_diff(spark, root, v1, v2, key="id").collect()
    }
    assert d12 == {(2, "update", 25.0), (4, "insert", 40.0)}

    d23 = {
        (r["id"], r["_change"], r["score"])
        for r in snapshot_diff(spark, root, v2, v3, key="id").collect()
    }
    assert d23 == {(3, "delete", 30.0)}

    # full span: unchanged id=1 never appears
    d13 = {
        (r["id"], r["_change"])
        for r in snapshot_diff(spark, root, v1, v3, key="id").collect()
    }
    assert d13 == {(2, "update"), (4, "insert"), (3, "delete")}


def test_snapshot_diff_ignores_provenance_columns(spark, tmp_path):
    """__-prefixed provenance columns (e.g. __source_file) differ per
    commit by construction; the change fingerprint must exclude them or
    every key reports as an update, defeating the churn-bounded CDF
    contract."""
    from pyspark.sql import functions as F

    from de4ml_spark.etl.versioned import commit, snapshot_diff

    root = str(tmp_path / "vtp")
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], "id BIGINT, name STRING, score DOUBLE"
    )
    v1 = commit(spark, root, base.withColumn("__source_file", F.lit("f1")))
    v2 = commit(
        spark,
        root,
        base.withColumn("__source_file", F.lit("f2")).withColumn(
            "score", F.when(F.col("id") == 2, 25.0).otherwise(F.col("score"))
        ),
    )
    d = {
        (r["id"], r["_change"])
        for r in snapshot_diff(spark, root, v1, v2, key="id").collect()
    }
    # only the real content change surfaces; id=1 (provenance-only churn)
    # is absent
    assert d == {(2, "update")}


def test_compact_optimize(spark, tmp_path):
    """compact() rewrites the fragmented current snapshot into few files
    as a NEW snapshot; data identical, old version still readable."""
    from de4ml_spark.etl.versioned import commit, compact, history, read

    root = str(tmp_path / "vtc")
    frag = spark.range(0, 1000).repartition(16)
    v1 = commit(spark, root, frag)
    h1 = {h["version"]: h for h in history(root)}
    assert h1[v1]["n_files"] >= 16
    v2 = compact(spark, root, target_file_bytes=1 << 30)
    h2 = {h["version"]: h for h in history(root)}
    assert h2[v2]["n_files"] == 1
    assert {r["id"] for r in read(spark, root).collect()} == set(range(1000))
    # snapshot isolation: the fragmented version is still time-travelable
    assert read(spark, root, v1).count() == 1000
